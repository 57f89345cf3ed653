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


# ------------------------------------------------------- range_lookup


def _rl_ranges(n=20, width=90, gap=30, start=-500):
    lo = start + np.arange(n, dtype=np.int64) * (width + gap)
    return pd.DataFrame(
        {
            "range_id": np.arange(n, dtype=np.int64),
            "lo": lo,
            "hi": lo + width - 1,
        }
    )


def _rl_ref(pts, rng_df):
    m = pts.assign(_k=1).merge(rng_df.assign(_k=1), on="_k")
    m = m[(m["lo"] <= m["x"]) & (m["x"] <= m["hi"])]
    return (
        m[["x", "range_id"]]
        .astype("int64")
        .sort_values(["x", "range_id"])
        .reset_index(drop=True)
    )


def test_range_lookup_modes_parity_and_bruteforce(ray_session):
    from fastie_ray.ops.interval import range_lookup

    rng = np.random.default_rng(11)
    pts = pd.DataFrame(
        {"x": rng.integers(-600, 2500, 3000).astype(np.int64)}
    )
    rngs = _rl_ranges()
    ref = _rl_ref(pts, rngs)
    for mode, kw in (("broadcast", {}), ("exchange", {"chunk": 100})):
        got = (
            range_lookup(
                ray.data.from_pandas(pts).repartition(4),
                ray.data.from_pandas(rngs),
                "x",
                mode=mode,
                **kw,
            )
            .to_pandas()
            .sort_values(["x", "range_id"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref, check_dtype=False), mode


def test_range_lookup_overlapping_ranges(ray_session):
    from fastie_ray.ops.interval import range_lookup

    # overlapping ranges: exchange emits one row per match,
    # broadcast refuses
    rngs = pd.DataFrame(
        {
            "range_id": np.array([0, 1], dtype=np.int64),
            "lo": np.array([0, 50], dtype=np.int64),
            "hi": np.array([100, 150], dtype=np.int64),
        }
    )
    pts = pd.DataFrame({"x": np.array([75, 120, 200], dtype=np.int64)})
    got = (
        range_lookup(
            ray.data.from_pandas(pts),
            ray.data.from_pandas(rngs),
            "x",
            mode="exchange",
            chunk=64,
        )
        .to_pandas()
        .sort_values(["x", "range_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _rl_ref(pts, rngs), check_dtype=False)
    import pytest

    with pytest.raises(ValueError):
        range_lookup(
            ray.data.from_pandas(pts),
            ray.data.from_pandas(rngs),
            "x",
            mode="broadcast",
        )


# --------------------------------------------------- interval_coalesce


def _ref_coalesce(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for k, grp in df.groupby("k"):
        ivs = sorted(
            (int(s), int(e))
            for s, e in grp[["s_us", "e_us"]].itertuples(index=False)
            if e > s
        )
        cur = None
        for s, e in ivs:
            if cur is None:
                cur = [s, e]
            elif s <= cur[1]:
                cur[1] = max(cur[1], e)
            else:
                rows.append((k, cur[0], cur[1]))
                cur = [s, e]
        if cur is not None:
            rows.append((k, cur[0], cur[1]))
    out = pd.DataFrame(rows, columns=["k", "s", "e"]).astype("int64")
    return out.sort_values(["k", "s"]).reset_index(drop=True)


def test_interval_coalesce_bruteforce_and_chunk_invariance(ray_session):
    from fastie_ray.ops.interval import interval_coalesce

    rng = np.random.default_rng(31)
    n = 800
    s = rng.integers(0, 5000, n).astype(np.int64)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 6, n).astype(np.int64),
            "s_us": s,
            "e_us": s + rng.integers(1, 400, n).astype(np.int64),
        }
    )
    want = _ref_coalesce(df)
    for chunk in (100, 1000, 10**9):  # spans crossing many/no chunks
        got = (
            interval_coalesce(
                ray.data.from_pandas(df).repartition(4),
                chunk=chunk, n_buckets=4,
            )
            .to_pandas()
            .sort_values(["k", "s"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False), chunk


def test_interval_coalesce_touch_and_boundary(ray_session):
    from fastie_ray.ops.interval import interval_coalesce

    # [0,100) + [100,200) touch across a chunk boundary at 100;
    # [300,301) is isolated; inverted interval drops
    df = pd.DataFrame(
        {
            "k": pd.Series([1, 1, 1, 1], dtype="int64"),
            "s_us": pd.Series([0, 100, 300, 50], dtype="int64"),
            "e_us": pd.Series([100, 200, 301, 40], dtype="int64"),
        }
    )
    got = (
        interval_coalesce(ray.data.from_pandas(df), chunk=100, n_buckets=2)
        .to_pandas()
        .sort_values(["k", "s"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"k": [1, 1], "s": [0, 300], "e": [200, 301]}
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
