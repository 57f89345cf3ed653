"""Interval-overlap join (`fastie_ray/ops/interval.py`): brute-force
parity on random intervals (self and two-dataset modes), intervals
spanning many chunks (the canonical-chunk rule must emit each pair
exactly once), and bucket-size invariance."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.interval import interval_overlap_join


def _intervals(n, seed, keys=6, max_len_h=72):
    rng = np.random.default_rng(seed)
    s = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 86400 * 30, n), unit="s"
    )
    return pd.DataFrame(
        {
            "iid": np.arange(n, dtype=np.int64),
            "k": rng.integers(0, keys, n).astype(np.int64),
            "s": s,
            "e": s + pd.to_timedelta(rng.integers(1, max_len_h * 3600, n), unit="s"),
        }
    )


def _ref_pairs(a, b=None):
    self_mode = b is None
    b = a if self_mode else b
    m = a.merge(b, on="k", suffixes=("_a", "_b"))
    ok = (m["s_a"] <= m["e_b"]) & (m["s_b"] <= m["e_a"])
    if self_mode:
        ok &= m["iid_a"] < m["iid_b"]
    out = m[ok][["k", "iid_a", "iid_b"]].rename(
        columns={"iid_a": "id_a", "iid_b": "id_b"}
    )
    return out.sort_values(["k", "id_a", "id_b"]).reset_index(drop=True)


def _sorted(ds):
    return (
        ds.to_pandas()[["k", "id_a", "id_b"]]
        .sort_values(["k", "id_a", "id_b"])
        .reset_index(drop=True)
    )


def test_self_pairs_match_bruteforce(ray_session):
    df = _intervals(250, seed=1)
    ds = ray.data.from_pandas(df).repartition(4)
    out = _sorted(interval_overlap_join(ds, bucket="2d", self_pairs=True))
    pd.testing.assert_frame_equal(out, _ref_pairs(df))
    assert len(out) > 0


def test_two_sided_match_bruteforce(ray_session):
    a = _intervals(150, seed=2)
    b = _intervals(120, seed=3)
    b["iid"] += 10_000
    dsa = ray.data.from_pandas(a).repartition(3)
    dsb = ray.data.from_pandas(b).repartition(2)
    out = _sorted(interval_overlap_join(dsa, dsb, bucket="3d"))
    pd.testing.assert_frame_equal(out, _ref_pairs(a, b))


def test_long_intervals_and_bucket_invariance(ray_session):
    # intervals up to 20 days vs 1-day buckets → 20× replication, the
    # canonical-chunk rule must still emit each pair exactly once
    df = _intervals(120, seed=4, keys=3, max_len_h=480)
    ref = _ref_pairs(df)
    for bucket in ("1d", "5d", "30d"):
        ds = ray.data.from_pandas(df).repartition(3)
        out = _sorted(interval_overlap_join(ds, bucket=bucket, self_pairs=True))
        pd.testing.assert_frame_equal(out, ref)
