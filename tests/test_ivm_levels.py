"""Tests: incremental join delta == full-join recompute, and
condensation levels vs a brute-force longest-path oracle."""

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 3):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def test_incremental_join_delta_matches_full():
    from fastie_ray.ops.join import hash_join, incremental_join_delta

    rng = np.random.default_rng(21)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 30, 200).astype(np.int64),
            "lv": np.arange(200, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": rng.integers(0, 30, 120).astype(np.int64),
            "rv": np.arange(120, dtype=np.int64),
        }
    )
    lb, ld = left[left["lv"] % 4 != 0], left[left["lv"] % 4 == 0]
    rb, rd = right[right["rv"] % 3 != 0], right[right["rv"] % 3 == 0]

    kw = dict(on="k", right_on="rk", left_cols=["k", "lv"],
              right_cols=["rk", "rv"], n_buckets=4)
    old = hash_join(_ds(lb), _ds(rb), **kw).to_pandas()
    delta = incremental_join_delta(
        _ds(lb), _ds(ld), _ds(rb), _ds(rd), **kw
    ).to_pandas()
    got = (
        pd.concat([old, delta], ignore_index=True)
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    want = (
        hash_join(_ds(left), _ds(right), **kw)
        .to_pandas()
        .sort_values(["k", "lv", "rv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype("int64"), want.astype("int64")
    )


def test_condensation_levels_bruteforce():
    from fastie_ray.ops.graph import condensation_levels

    # cycles {0,1}, {10,11,12}, {20}, chain 1->10, 12->20, 0->20,
    # plus isolated-from-cycles tail 30 (source singleton)
    rows = [(0, 1), (1, 0), (10, 11), (11, 12), (12, 10),
            (1, 10), (12, 20), (0, 20), (30, 10)]
    edges = pd.DataFrame(rows, columns=["src", "dst"]).astype("int64")
    got = (
        condensation_levels(_ds(edges, 2), n_phases=5, max_rounds=12,
                            n_buckets=4)
        .to_pandas()
        .sort_values("comp")
        .reset_index(drop=True)
    )
    # comps: {0,1}->0, {10,11,12}->10, {20}->20, {30}->30
    # levels: 0:0, 30:0, 10:max(0,30)+1=1, 20: via 12->20 = 2
    want = pd.DataFrame(
        {"comp": [0, 10, 20, 30], "level": [0, 1, 2, 0]}
    ).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), want)


def test_sssp_matches_dijkstra():
    import heapq

    from fastie_ray.ops.graph import sssp

    rng = np.random.default_rng(71)
    rows = []
    for _ in range(120):
        a, b = rng.integers(0, 30, 2)
        if a != b:
            w = int(rng.integers(1, 9))
            rows.append((int(a), int(b), w))
            rows.append((int(b), int(a), w))
    edges = pd.DataFrame(rows, columns=["src", "dst", "w"]).drop_duplicates(
        ["src", "dst"]
    ).astype("int64")
    seeds = pd.DataFrame({"node": np.array([0, 7], dtype=np.int64)})

    got = (
        sssp(_ds(edges, 3), _ds(seeds, 1), max_rounds=32, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )

    adj: dict = {}
    for s, d, w in edges.itertuples(index=False):
        adj.setdefault(s, []).append((d, w))
    dist = {0: 0, 7: 0}
    pq = [(0, 0), (0, 7)]
    while pq:
        dd, u = heapq.heappop(pq)
        if dd > dist.get(u, 1 << 60):
            continue
        for v, w in adj.get(u, ()):
            nd = dd + w
            if nd < dist.get(v, 1 << 60):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    want = (
        pd.DataFrame(sorted(dist.items()), columns=["node", "dist"])
        .astype("int64")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want)
