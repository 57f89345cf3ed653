"""Brute-force parity tests for landmark Brandes betweenness
(integer pair-dependency formulation, ``ops.graph.brandes_betweenness``)."""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np
import pandas as pd

import ray
import ray.data


def _brute_betweenness(edges, landmarks, max_hops):
    """Reference: per landmark, hop-limited BFS DAG, forward sigma,
    all-pairs DAG path counts by DP, then the per-term floor sum."""
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    out = {}
    for s in landmarks:
        hop = {s: 0}
        q = deque([s])
        while q:
            u = q.popleft()
            if hop[u] == max_hops:
                continue
            for w in adj[u]:
                if w not in hop:
                    hop[w] = hop[u] + 1
                    q.append(w)
        sigma = defaultdict(int)
        sigma[s] = 1
        for h in range(1, max_hops + 1):
            for v in [x for x in hop if hop[x] == h]:
                sigma[v] = sum(
                    sigma[u] for u in adj[v] if hop.get(u) == h - 1
                )
        # P[v][t]: DAG paths v -> t (P[t][t] = 1)
        paths = defaultdict(dict)
        levels = sorted(hop, key=lambda x: -hop[x])
        for v in levels:
            paths[v][v] = 1
            for w in adj[v]:
                if hop.get(w) == hop[v] + 1:
                    for t, c in paths[w].items():
                        paths[v][t] = paths[v].get(t, 0) + c
        for v in hop:
            if v == s:
                continue
            acc, n_t = 0, 0
            for t, c in paths[v].items():
                if t == v or t == s:
                    continue
                acc += (1_000_000 * sigma[v] * c) // sigma[t]
                n_t += 1
            if n_t:
                out[(s, v)] = (acc, n_t)
    return out


def test_betweenness_brute_force():
    from fastie_ray.ops.graph import brandes_betweenness

    rng = np.random.RandomState(41)
    edges = set()
    while len(edges) < 120:
        a, b = rng.randint(0, 50, 2)
        if a != b:
            edges.add((f"n{min(a,b):02d}", f"n{max(a,b):02d}"))
    edges = sorted(edges)
    ds = ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"])
    )
    lms = ["n00", "n01"]
    got = (
        brandes_betweenness(ds, lms, max_hops=3)
        .to_pandas()
        .sort_values(["landmark", "node"])
        .reset_index(drop=True)
    )
    want_map = _brute_betweenness(edges, lms, 3)
    want = pd.DataFrame(
        [(s, v, bc, nt) for (s, v), (bc, nt) in sorted(want_map.items())],
        columns=["landmark", "node", "bc_floor_e6", "n_targets"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 10
    # multiple shortest paths must exist for this to be a real test
    assert (got["bc_floor_e6"] % 1_000_000 != 0).any()


def test_betweenness_path_graph():
    from fastie_ray.ops.graph import brandes_betweenness

    # a - b - c - d: unique shortest paths; delta(b) from a:
    # targets c, d both pass through b -> 2.0; delta(c) = 1.0 (target d)
    ds = ray.data.from_pandas(
        pd.DataFrame({"src": ["a", "b", "c"], "dst": ["b", "c", "d"]})
    )
    got = (
        brandes_betweenness(ds, ["a"], max_hops=3)
        .to_pandas()
        .set_index("node")
    )
    assert got.loc["b", "bc_floor_e6"] == 2_000_000
    assert got.loc["b", "n_targets"] == 2
    assert got.loc["c", "bc_floor_e6"] == 1_000_000
    # d is a leaf: no valid targets, so it emits no row
    assert "d" not in got.index
    assert "a" not in got.index


def test_betweenness_diamond_split():
    from fastie_ray.ops.graph import brandes_betweenness

    # a - {b1, b2} - c: two shortest a->c paths; each b carries 1/2
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"src": ["a", "a", "b1", "b2"], "dst": ["b1", "b2", "c", "c"]}
        )
    )
    got = (
        brandes_betweenness(ds, ["a"], max_hops=2)
        .to_pandas()
        .set_index("node")
    )
    assert got.loc["b1", "bc_floor_e6"] == 500_000
    assert got.loc["b2", "bc_floor_e6"] == 500_000
    assert "c" not in got.index  # targets beyond c are out of hop range


import pytest


@pytest.mark.parametrize("seed,n_nodes,n_edges,max_hops", [
    (7, 30, 40, 2),    # sparse, short horizon
    (13, 25, 90, 3),   # dense
    (29, 60, 55, 4),   # likely disconnected, deep horizon
])
def test_betweenness_random_graphs(ray_session, seed, n_nodes, n_edges,
                                   max_hops):
    from fastie_ray.ops.graph import brandes_betweenness

    rng = np.random.RandomState(seed)
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.randint(0, n_nodes, 2)
        if a != b:
            edges.add((f"n{min(a,b):02d}", f"n{max(a,b):02d}"))
    edges = sorted(edges)
    lms = [f"n{i:02d}" for i in range(3)]
    got = (
        brandes_betweenness(
            ray.data.from_pandas(pd.DataFrame(edges, columns=["src", "dst"])),
            lms, max_hops=max_hops,
        )
        .to_pandas()
        .sort_values(["landmark", "node"])
        .reset_index(drop=True)
    )
    want_map = _brute_betweenness(edges, lms, max_hops)
    want = pd.DataFrame(
        [(s, v, bc, nt) for (s, v), (bc, nt) in sorted(want_map.items())],
        columns=["landmark", "node", "bc_floor_e6", "n_targets"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
