"""Landmark BFS distances (`ops/graph.landmark_distances`):
brute-force parity on random graphs (directed + undirected), one
traversal for all landmarks, hop cap."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.graph import landmark_distances


def _ref(edges, landmarks, k, directed):
    adj = {}
    for s, d in edges[["src", "dst"]].itertuples(index=False):
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    rows = []
    for lm in dict.fromkeys(landmarks):
        dist = {lm: 0}
        frontier = [lm]
        for hop in range(1, k + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = hop
                        nxt.append(v)
            frontier = nxt
        rows.extend((n, lm, h) for n, h in dist.items())
    out = pd.DataFrame(rows, columns=["node", "landmark", "hop"])
    out["hop"] = out["hop"].astype("int64")
    return out.sort_values(["landmark", "node"]).reset_index(drop=True)


def _edges(seed=7, n_nodes=30, n_edges=80):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    m = u != v
    return pd.DataFrame(
        {"src": [f"n{i}" for i in u[m]], "dst": [f"n{i}" for i in v[m]]}
    ).drop_duplicates().reset_index(drop=True)


def test_landmark_distances_vs_bfs(ray_session):
    edges = _edges()
    lms = ["n0", "n5", "n9"]
    for directed in (False, True):
        got = (
            landmark_distances(
                ray.data.from_pandas(edges).repartition(3),
                lms, k=3, directed=directed, n_buckets=4,
            )
            .to_pandas()
            .sort_values(["landmark", "node"])
            .reset_index(drop=True)
        )
        want = _ref(edges, lms, 3, directed)
        pd.testing.assert_frame_equal(got, want, check_dtype=False), directed


def test_landmark_distances_hop_cap_and_early_exit(ray_session):
    # path graph: hop cap truncates; full k converges with early exit
    edges = pd.DataFrame(
        {"src": [f"n{i}" for i in range(6)],
         "dst": [f"n{i+1}" for i in range(6)]}
    )
    got2 = landmark_distances(
        ray.data.from_pandas(edges), ["n0"], k=2, n_buckets=2
    ).to_pandas()
    assert got2["hop"].max() == 2 and len(got2) == 3
    got9 = landmark_distances(
        ray.data.from_pandas(edges), ["n0"], k=9, n_buckets=2
    ).to_pandas()
    assert len(got9) == 7 and got9["hop"].max() == 6
