"""Common-neighbor link prediction (`ops/graph.link_prediction`):
brute-force parity on random graphs, planted-best-pair recovery, and
the max_degree hub cap."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.graph import link_prediction


def _ref(edges: pd.DataFrame, k: int, max_degree=None) -> pd.DataFrame:
    adj = {}
    for a, b in edges[["a", "b"]].itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    eset = {tuple(sorted(t)) for t in edges[["a", "b"]].itertuples(index=False)}
    cn = {}
    for c, ns in adj.items():
        if max_degree is not None and len(ns) > max_degree:
            continue
        ns = sorted(ns)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                p = (ns[i], ns[j])
                if p not in eset:
                    cn[p] = cn.get(p, 0) + 1
    rows = sorted(cn.items(), key=lambda t: (-t[1], t[0]))[:k]
    out = pd.DataFrame(
        [(u, v, c) for (u, v), c in rows], columns=["u", "v", "cn"]
    )
    out["cn"] = out["cn"].astype("int64")
    return out


def _edges(n_nodes=30, n_edges=90, seed=5) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    m = u != v
    lab = np.array([f"n{i:02d}" for i in range(n_nodes)], dtype=object)
    a = np.minimum(lab[u[m]], lab[v[m]])
    b = np.maximum(lab[u[m]], lab[v[m]])
    return pd.DataFrame({"a": a, "b": b}).drop_duplicates().reset_index(drop=True)


def test_link_prediction_vs_bruteforce(ray_session):
    edges = _edges()
    got = link_prediction(
        ray.data.from_pandas(edges).repartition(3), k=20, n_buckets=4
    )
    pd.testing.assert_frame_equal(got, _ref(edges, 20), check_dtype=False)


def test_link_prediction_planted_pair(ray_session):
    # u and v share 5 neighbors but no edge — must rank first
    star = pd.DataFrame(
        {"a": ["hubU"] * 5 + ["hubV"] * 5, "b": [f"m{i}" for i in range(5)] * 2}
    )
    canon = pd.DataFrame(
        {"a": np.minimum(star["a"], star["b"]), "b": np.maximum(star["a"], star["b"])}
    )
    got = link_prediction(ray.data.from_pandas(canon), k=3, n_buckets=4)
    assert (got.iloc[0]["u"], got.iloc[0]["v"]) == ("hubU", "hubV")
    assert got.iloc[0]["cn"] == 5


def test_link_prediction_max_degree_cap(ray_session):
    edges = _edges(seed=9)
    got = link_prediction(
        ray.data.from_pandas(edges).repartition(3), k=15,
        max_degree=4, n_buckets=4,
    )
    pd.testing.assert_frame_equal(
        got, _ref(edges, 15, max_degree=4), check_dtype=False
    )
