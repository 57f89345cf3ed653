"""Tests for ops.rolling.grouped_running_sum, ops.stats.decayed_counts
and ops.dedup.cross_source_overlap against brute-force pandas oracles."""

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def test_grouped_running_sum_matches_window():
    from fastie_ray.ops.rolling import grouped_running_sum

    rng = np.random.default_rng(2)
    n = 400
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 10, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10 * 86400_000, n), unit="ms"),
            "value": np.round(rng.uniform(0, 40, n), 2),
        }
    )
    got = (
        grouped_running_sum(
            _ds(ev, 4), "user_id", "ts", "event_id", "value",
            bucket="1d", n_buckets=4,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = ev.sort_values(["user_id", "ts", "event_id"]).copy()
    want["cents"] = (want["value"] * 100).round().astype("int64")
    want["running_e2"] = want.groupby("user_id")["cents"].cumsum()
    want = (
        want[["event_id", "user_id", "running_e2"]]
        .rename(columns={"event_id": "id", "user_id": "k"})
        .sort_values("id")
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want)


def test_decayed_counts_matches_bruteforce():
    from fastie_ray.ops.stats import decayed_counts

    rng = np.random.default_rng(8)
    n = 300
    ev = pd.DataFrame(
        {
            "key": rng.choice(["a", "b", "c"], n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 50 * 86400_000, n), unit="ms"),
        }
    )
    ref = "2024-02-10"
    got = (
        decayed_counts(
            _ds(ev, 4), "key", "ts", ref_ts=ref, unit="1d",
            scale_bits=30, clamp=35, n_buckets=4,
        )
        .to_pandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    ref_us = pd.Timestamp(ref).value // 1000
    t_us = ev["ts"].astype("datetime64[us]").astype("int64")
    age = np.clip((ref_us - t_us) // 86400_000_000, 0, 35)
    w = np.int64(1 << 30) >> age.astype("int64")
    want = (
        pd.DataFrame({"key": ev["key"], "decayed": w})
        .groupby("key", as_index=False)["decayed"]
        .sum()
        .astype({"decayed": "int64"})
        .sort_values("key")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_cross_source_overlap_matches_bruteforce():
    from fastie_ray.ops.dedup import cross_source_overlap
    import hashlib

    rng = np.random.default_rng(6)
    n = 200
    df = pd.DataFrame(
        {
            "source": rng.choice(["s1", "s2", "s3", "s4"], n),
            "text": [
                f"shared {i % 12}" if i % 3 == 0 else f"unique {i}"
                for i in range(n)
            ],
        }
    )
    got = (
        cross_source_overlap(_ds(df, 4), "text", "source", n_buckets=4)
        .to_pandas()
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    f = df.assign(
        h=df["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    )[["h", "source"]].drop_duplicates()
    m = f.merge(f, on="h", suffixes=("_a", "_b"))
    m = m[m["source_a"] < m["source_b"]]
    want = (
        m.groupby(["source_a", "source_b"], as_index=False)
        .agg(n_shared=("h", "count"))
        .astype({"n_shared": "int64"})
        .sort_values(["source_a", "source_b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_decayed_counts_composite_key_matches_single(ray_session):
    # composite (g, k) totals must equal per-slice single-key totals
    from fastie_ray.ops.stats import decayed_counts

    rng = np.random.default_rng(41)
    n = 600
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], n),
            "k": rng.integers(0, 8, n).astype("int64"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s"),
        }
    )
    both = (
        decayed_counts(
            ray.data.from_pandas(df).repartition(3),
            ["g", "k"], "ts", ref_ts="2024-01-31", n_buckets=4,
        )
        .to_pandas()
        .sort_values(["g", "k"])
        .reset_index(drop=True)
    )
    for gv in ("x", "y"):
        single = (
            decayed_counts(
                ray.data.from_pandas(df[df["g"] == gv].reset_index(drop=True)),
                "k", "ts", ref_ts="2024-01-31", n_buckets=4,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        sub = both[both["g"] == gv][["k", "decayed"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(sub, single, check_dtype=False)


def test_hopping_window_distinct_bruteforce(ray_session):
    from fastie_ray.ops.windows import hopping_window_distinct

    rng = np.random.default_rng(43)
    n = 900
    df = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 3 * 86400, n), unit="s"),
            "event_type": rng.choice(["a", "b"], n),
            "user_id": rng.integers(0, 30, n).astype("int64"),
        }
    )
    got = (
        hopping_window_distinct(
            ray.data.from_pandas(df).repartition(4),
            size="1h", hop="30min", n_buckets=4,
        )
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    frames = []
    for i in range(2):
        f = df.copy()
        f["window_start"] = f["ts"].dt.floor("30min") - pd.Timedelta(
            "30min"
        ) * i
        frames.append(f)
    rep = pd.concat(frames, ignore_index=True)
    want = (
        rep.groupby(["window_start", "event_type"], as_index=False)
        .agg(n_distinct=("user_id", "nunique"))
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    want["window_start"] = want["window_start"].astype("datetime64[us]")
    want["n_distinct"] = want["n_distinct"].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
