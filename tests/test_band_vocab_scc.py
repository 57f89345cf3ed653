"""Tests for ops.interval.band_join, ops.vocab.build_vocab and
ops.graph.scc — against brute-force pandas / Tarjan oracles."""

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def _brute_band(left, right, w_us, direction):
    m = left.merge(right, on="user_id", suffixes=("_l", "_r"))
    d = (
        m["ts_r"].astype("datetime64[us]").astype("int64")
        - m["ts_l"].astype("datetime64[us]").astype("int64")
    )
    ok = (d >= 0) & (d <= w_us) if direction == "forward" else d.abs() <= w_us
    out = pd.DataFrame(
        {
            "k": m.loc[ok, "user_id"].astype("int64"),
            "id_left": m.loc[ok, "event_id_l"].astype("int64"),
            "id_right": m.loc[ok, "event_id_r"].astype("int64"),
            "delta_us": d[ok].astype("int64"),
        }
    )
    return out.sort_values(["k", "id_left", "id_right"]).reset_index(drop=True)


def test_band_join_forward_and_both():
    from fastie_ray.ops.interval import band_join

    rng = np.random.default_rng(9)
    def mk(n, seed0):
        return pd.DataFrame(
            {
                "event_id": np.arange(seed0, seed0 + n, dtype=np.int64),
                "user_id": rng.integers(0, 8, n).astype(np.int64),
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(rng.integers(0, 3_600_000, n), unit="ms"),
            }
        )

    left, right = mk(150, 0), mk(150, 1000)
    w_us = int(pd.Timedelta("5min").value // 1000)
    for direction in ("forward", "both"):
        got = (
            band_join(
                _ds(left, 3), _ds(right, 3), key_col="user_id",
                ts_col="ts", band="5min", direction=direction, n_buckets=4,
            )
            .to_pandas()
            .sort_values(["k", "id_left", "id_right"])
            .reset_index(drop=True)
        )
        want = _brute_band(left, right, w_us, direction)
        pd.testing.assert_frame_equal(got, want)


def test_build_vocab_matches_row_number():
    from fastie_ray.ops.vocab import build_vocab

    rng = np.random.default_rng(4)
    vocab = [f"w{i:02d}" for i in range(40)]
    p = np.linspace(1.0, 0.05, 40)
    p /= p.sum()
    docs = [
        (d, " ".join(rng.choice(vocab, size=30, p=p)))
        for d in range(80)
    ]
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    got = (
        build_vocab(_ds(df, 4), min_count=5, n_buckets=4)
        .to_pandas()
        .sort_values("token_id")
        .reset_index(drop=True)
    )
    counts = (
        df["text"].str.split().explode().value_counts().rename_axis("token")
        .reset_index(name="n")
    )
    counts = counts[counts["n"] >= 5].sort_values(
        ["n", "token"], ascending=[False, True]
    )
    want = pd.DataFrame(
        {
            "token": counts["token"].to_numpy(),
            "n": counts["n"].to_numpy(dtype=np.int64),
            "token_id": np.arange(len(counts), dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(got, want)


def _tarjan_scc_min(edges: pd.DataFrame) -> pd.DataFrame:
    import sys

    adj: dict = {}
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    for n in nodes:
        adj[n] = []
    for s, d in edges.itertuples(index=False):
        adj[s].append(d)
    sys.setrecursionlimit(10000)
    index = {}
    low = {}
    onstack = set()
    stack = []
    out = {}
    counter = [0]

    def strongconnect(v):
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        onstack.add(v)
        for w in adj[v]:
            if w not in index:
                strongconnect(w)
                low[v] = min(low[v], low[w])
            elif w in onstack:
                low[v] = min(low[v], index[w])
        if low[v] == index[v]:
            comp = []
            while True:
                w = stack.pop()
                onstack.discard(w)
                comp.append(w)
                if w == v:
                    break
            m = min(comp)
            for w in comp:
                out[w] = m

    for v in nodes:
        if v not in index:
            strongconnect(v)
    return pd.DataFrame(
        {"node": nodes, "scc_id": [out[n] for n in nodes]}
    ).astype("int64")


def test_scc_cycles_and_dag():
    from fastie_ray.ops.graph import scc

    rows = []
    # three cycles at increasing id ranges, DAG links between them,
    # plus tree tails (singleton SCCs)
    for c in [(0, 1, 2), (10, 11, 12, 13), (20, 21)]:
        for i in range(len(c)):
            rows.append((c[i], c[(i + 1) % len(c)]))
    rows += [(2, 10), (13, 20), (1, 11), (12, 25), (25, 26), (5, 0)]
    edges = pd.DataFrame(rows, columns=["src", "dst"]).astype("int64")

    got = (
        scc(_ds(edges, 3), n_phases=5, max_rounds=10, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype("int64")
    )
    want = (
        _tarjan_scc_min(edges).sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_scc_raises_when_phases_exhausted():
    from fastie_ray.ops.graph import scc
    import pytest

    # chain of 3 two-cycles: needs 3 phases
    rows = [(0, 1), (1, 0), (0, 10), (10, 11), (11, 10), (11, 20),
            (20, 21), (21, 20)]
    edges = pd.DataFrame(rows, columns=["src", "dst"]).astype("int64")
    with pytest.raises(RuntimeError):
        scc(_ds(edges, 2), n_phases=1, max_rounds=10, n_buckets=4)
