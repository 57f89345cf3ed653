"""k-truss peeling (`ops/graph.ktruss_peel`): brute-force parity on
random graphs, cascade behavior (rounds matter), triangle-free full
peel, and support values on a planted chain+skip staircase."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.graph import ktruss_peel


def _ref_ktruss(edges: pd.DataFrame, k: int, rounds: int) -> pd.DataFrame:
    """Single-process reference: iterative support recount + filter."""
    # the op re-canonicalizes endpoints to STRING order — mirror it
    e = {
        tuple(sorted((str(a), str(b))))
        for a, b in edges[["a", "b"]].itertuples(index=False)
    }

    def support(es):
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {
            (a, b): len(adj[a] & adj[b]) for a, b in es
        }

    for _ in range(rounds):
        sup = support(e)
        keep = {ed for ed in e if sup[ed] >= k - 2}
        if keep == e:
            break
        e = keep
    sup = support(e)
    out = pd.DataFrame(
        [(a, b, sup[(a, b)]) for a, b in sorted(e)],
        columns=["a", "b", "support"],
    )
    out["support"] = out["support"].astype("int64")
    return out


def _rand_edges(n_nodes=40, n_edges=120, seed=7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    m = u != v
    a = np.minimum(u[m], v[m])
    b = np.maximum(u[m], v[m])
    df = pd.DataFrame(
        {"a": "n" + pd.Series(a).astype(str), "b": "n" + pd.Series(b).astype(str)}
    ).drop_duplicates()
    return df.reset_index(drop=True)


def _got(edges: pd.DataFrame, k: int, rounds: int) -> pd.DataFrame:
    df = ktruss_peel(
        ray.data.from_pandas(edges).repartition(3),
        k=k, rounds=rounds, n_buckets=4,
    ).to_pandas()
    if len(df) == 0:  # all-empty blocks lose their schema (NOTES 12)
        return pd.DataFrame(
            {"a": pd.Series([], dtype=object),
             "b": pd.Series([], dtype=object),
             "support": pd.Series([], dtype="int64")}
        )
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def test_ktruss_random_vs_reference(ray_session):
    edges = _rand_edges()
    for k, rounds in ((3, 3), (4, 3), (5, 4)):
        got = _got(edges, k, rounds)
        want = _ref_ktruss(edges, k, rounds)
        pd.testing.assert_frame_equal(got, want, check_dtype=False), (k, rounds)


def test_ktruss_staircase_cascade(ray_session):
    # chain 0-1-2-...-9 plus skips (i, i+2): interior chain edges sit in
    # 2 triangles, skips and end chain edges in 1. k=4 peels skips+ends
    # in round 1, which starves the interior — round 2 empties the graph.
    n = 10
    chain = pd.DataFrame(
        {"a": [f"n{i:02d}" for i in range(n - 1)],
         "b": [f"n{i+1:02d}" for i in range(n - 1)]}
    )
    skip = pd.DataFrame(
        {"a": [f"n{i:02d}" for i in range(n - 2)],
         "b": [f"n{i+2:02d}" for i in range(n - 2)]}
    )
    edges = pd.concat([chain, skip], ignore_index=True)
    one = _got(edges, 4, 1)
    two = _got(edges, 4, 2)
    assert len(one) > 0 and len(two) == 0  # the cascade needs round 2
    pd.testing.assert_frame_equal(one, _ref_ktruss(edges, 4, 1), check_dtype=False)
    # k=3 keeps every triangle edge with its exact support
    k3 = _got(edges, 3, 2)
    want = _ref_ktruss(edges, 3, 2)
    pd.testing.assert_frame_equal(k3, want, check_dtype=False)
    assert set(k3["support"]) == {1, 2}


def test_ktruss_triangle_free_peels_empty(ray_session):
    # a path has no triangles: k=3 drops everything in one round
    edges = pd.DataFrame(
        {"a": [f"n{i}" for i in range(6)], "b": [f"n{i+1}" for i in range(6)]}
    )
    got = _got(edges, 3, 2)
    assert len(got) == 0


def test_densest_rounds_vs_reference(ray_session):
    from fastie_ray.ops.graph import densest_rounds

    # planted: a K6 clique (density 2.5) buried in a sparse path
    clique = [
        (f"c{i}", f"c{j}") for i in range(6) for j in range(i + 1, 6)
    ]
    path = [(f"p{i}", f"p{i+1}") for i in range(30)]
    bridge = [("c0", "p0")]
    edges = pd.DataFrame(clique + path + bridge, columns=["a", "b"])
    got = densest_rounds(
        ray.data.from_pandas(edges).repartition(3),
        eps_e6=100_000, max_rounds=8, n_buckets=4,
    )

    # single-process reference
    e = {tuple(sorted(t)) for t in edges.itertuples(index=False)}
    want = []
    for rnd in range(8):
        deg = {}
        for a, b in e:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        if not deg:
            break
        n, m = len(deg), len(e)
        want.append((rnd, n, m))
        keep = {v for v, d in deg.items() if d * n * 10**6 > 2 * 1_100_000 * m}
        e = {(a, b) for a, b in e if a in keep and b in keep}
    want_df = pd.DataFrame(
        want, columns=["round", "n_nodes", "n_edges"]
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want_df)
    # the densest prefix must recover (at least) the clique's density
    dens = (got["n_edges"] * 1_000_000 // got["n_nodes"]).max()
    assert dens >= 2_000_000  # K6 density 2.5, path-diluted start ~1
