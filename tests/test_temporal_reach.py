"""Time-respecting reachability (`ops/graph.temporal_reach`):
brute-force parity, the must-wait semantics (an early edge is unusable
after a late arrival), and fixpoint short-circuit."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.graph import temporal_reach


def _ref(edges: pd.DataFrame, seeds: pd.DataFrame, rounds: int) -> pd.DataFrame:
    lab = dict(zip(seeds["node"].astype(int), seeds["arrival_us"].astype(int)))
    for _ in range(rounds):
        new = dict(lab)
        for s, d, t in edges[["src", "dst", "ts_us"]].itertuples(index=False):
            if s in lab and t >= lab[s] and t < new.get(d, np.inf):
                new[d] = int(t)
        if new == lab:
            break
        lab = new
    out = pd.DataFrame(
        sorted(lab.items()), columns=["node", "arrival_us"]
    ).astype("int64")
    return out


def _got(edges, seeds, rounds):
    return (
        temporal_reach(
            ray.data.from_pandas(edges).repartition(3),
            seeds, rounds=rounds, n_buckets=4,
        )
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype("int64")
    )


def test_temporal_reach_bruteforce(ray_session):
    rng = np.random.default_rng(17)
    n = 250
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 25, n).astype("int64"),
            "dst": rng.integers(0, 25, n).astype("int64"),
            "ts_us": rng.integers(0, 10_000, n).astype("int64"),
        }
    )
    edges = edges[edges["src"] != edges["dst"]].reset_index(drop=True)
    seeds = pd.DataFrame({"node": [0, 1], "arrival_us": [0, 500]})
    for rounds in (1, 2, 4):
        pd.testing.assert_frame_equal(
            _got(edges, seeds, rounds), _ref(edges, seeds, rounds)
        ), rounds


def test_temporal_reach_respects_time_order(ray_session):
    # a -(t=10)-> b -(t=5)-> c : c is NOT reachable (5 < 10), but
    # a -(t=10)-> b -(t=20)-> d is
    edges = pd.DataFrame(
        {
            "src": pd.Series([1, 2, 2], dtype="int64"),
            "dst": pd.Series([2, 3, 4], dtype="int64"),
            "ts_us": pd.Series([10, 5, 20], dtype="int64"),
        }
    )
    seeds = pd.DataFrame({"node": [1], "arrival_us": [0]})
    got = _got(edges, seeds, 3)
    want = pd.DataFrame(
        {"node": [1, 2, 4], "arrival_us": [0, 10, 20]}
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_temporal_reach_fixpoint_short_circuit(ray_session):
    # a tiny converged graph: rounds=2 and rounds=10 agree exactly
    edges = pd.DataFrame(
        {
            "src": pd.Series([1, 2], dtype="int64"),
            "dst": pd.Series([2, 3], dtype="int64"),
            "ts_us": pd.Series([1, 2], dtype="int64"),
        }
    )
    seeds = pd.DataFrame({"node": [1], "arrival_us": [0]})
    pd.testing.assert_frame_equal(_got(edges, seeds, 2), _got(edges, seeds, 10))
