"""Fixed-point PageRank (`fastie_ray/ops/graph.py`): brute-force
single-process reference on hand-built graphs (chain, star, dangling
sinks, disconnected node), rank-mass conservation, and convergence
ordering on a known dominance structure."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.graph import node_table, pagerank

SCALE = 10**12


def _edges(pairs):
    return pd.DataFrame(pairs, columns=["src", "dst"])


def _ref_pagerank(pairs, n_iter=3, d_num=85, d_den=100, scale=SCALE):
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    out = {v: 0 for v in nodes}
    for s, _ in pairs:
        out[s] += 1
    n = len(nodes)
    base = scale // n
    rank = {v: base for v in nodes}
    for _ in range(n_iter):
        dang = sum(rank[v] for v in nodes if out[v] == 0)
        contrib = {v: 0 for v in nodes}
        for s, d in pairs:
            contrib[d] += rank[s] // out[s]
        rank = {
            v: ((d_den - d_num) * base + d_num * (contrib[v] + dang // n))
            // d_den
            for v in nodes
        }
    return (
        pd.DataFrame(
            {"node": nodes, "rank_scaled": [rank[v] for v in nodes]}
        ).astype({"rank_scaled": "int64"})
    )


GRAPH = [
    ("a", "b"), ("b", "c"), ("c", "a"),       # cycle
    ("a", "d"), ("b", "d"),                   # d: popular sink (outdeg 0)
    ("e", "a"),                               # e: source only
]


def test_pagerank_matches_bruteforce(ray_session):
    ds = ray.data.from_pandas(_edges(GRAPH))
    got = (
        pagerank(ds, n_iter=3, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref_pagerank(GRAPH))


def test_pagerank_mass_and_ordering(ray_session):
    # star: everyone points at h → h dominates
    star = [(f"x{i}", "h") for i in range(6)]
    ds = ray.data.from_pandas(_edges(star))
    got = pagerank(ds, n_iter=3, n_buckets=4).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("node").reset_index(drop=True), _ref_pagerank(star)
    )
    top = got.sort_values("rank_scaled", ascending=False).iloc[0]
    assert top["node"] == "h"
    # fixed-point floors only ever LOSE mass, never create it
    assert got["rank_scaled"].sum() <= SCALE
    assert got["rank_scaled"].sum() > SCALE * 0.98


def test_node_table_outdegrees(ray_session):
    ds = ray.data.from_pandas(_edges(GRAPH))
    nt = (
        node_table(ds, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = {"a": 2, "b": 2, "c": 1, "d": 0, "e": 1}
    assert dict(zip(nt["node"], nt["outdeg"])) == want


def test_pagerank_iteration_count_matters(ray_session):
    ds = ray.data.from_pandas(_edges(GRAPH))
    r1 = pagerank(ds, n_iter=1, n_buckets=4).to_pandas().sort_values("node")
    r3 = pagerank(ds, n_iter=3, n_buckets=4).to_pandas().sort_values("node")
    assert not r1["rank_scaled"].equals(r3["rank_scaled"])
    pd.testing.assert_frame_equal(
        r1.reset_index(drop=True), _ref_pagerank(GRAPH, n_iter=1)
    )


def test_triangle_count_known_graph():
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge (no new ones)
    edges = pd.DataFrame(
        {"a": [1, 1, 1, 2, 2, 3, 4], "b": [2, 3, 4, 3, 4, 4, 5]}
    ).astype("int64")
    ds = ray.data.from_pandas([p for p in np.array_split(edges, 3)])
    got = triangle_count(ds, n_buckets=4)
    assert got["n_triangles"].tolist() == [4]


def test_triangle_count_random_vs_bruteforce():
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.graph import triangle_count

    rng = np.random.default_rng(3)
    n = 25
    pairs = [(a, b) for a, b in itertools.combinations(range(n), 2)
             if rng.random() < 0.3]
    adj = set(pairs)
    brute = sum(
        1 for x, y, z in itertools.combinations(range(n), 3)
        if (x, y) in adj and (x, z) in adj and (y, z) in adj
    )
    edges = pd.DataFrame(pairs, columns=["a", "b"]).astype("int64")
    ds = ray.data.from_pandas([p for p in np.array_split(edges, 4)])
    got = triangle_count(ds, n_buckets=4)
    assert got["n_triangles"].tolist() == [brute]
