"""Oracles for `fastie_ray/ops/sequence.py`: lag-window brute-force
parity under any partitioning, and single-exchange vs two-phase parity
(including cross-bucket chains and single-event buckets)."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.sequence import transition_counts, transition_counts_scalable


def _brute(df):
    d = df.sort_values(["user_id", "ts", "event_id"])
    prev = d.groupby("user_id")["event_type"].shift()
    out = (
        pd.DataFrame({"prev_type": prev, "next_type": d["event_type"]})
        .dropna()
        .groupby(["prev_type", "next_type"], as_index=False)
        .size()
        .rename(columns={"size": "n_trans"})
    )
    out["n_trans"] = out["n_trans"].astype("int64")
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def _events(n=2000, users=37, seed=79):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.integers(0, users, n).astype("int64"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 14 * 24 * 3600, n), unit="s"),
            "event_type": rng.choice(["view", "click", "purchase"], n),
        }
    )


def test_transition_counts_match_brute_force_any_partitioning():
    df = _events()
    want = _brute(df)
    for parts in (1, 8):
        got = transition_counts(ray.data.from_pandas(df).repartition(parts))
        pd.testing.assert_frame_equal(got, want)


def test_scalable_matches_single_exchange():
    df = _events(seed=83)
    want = _brute(df)
    got = transition_counts_scalable(
        ray.data.from_pandas(df).repartition(8), bucket="1d"
    )
    pd.testing.assert_frame_equal(got, want)


def test_scalable_cross_bucket_chains_and_gaps():
    # one user whose events span buckets with an empty bucket between:
    # last(b0) -> first(b2) must count exactly once
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype="int64"),
            "user_id": np.array([1, 1, 1, 2], dtype="int64"),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 23:59:00",
                    "2024-01-03 00:01:00",
                    "2024-01-03 00:02:00",
                    "2024-01-05 12:00:00",
                ]
            ),
            "event_type": ["view", "click", "purchase", "view"],
        }
    )
    want = _brute(df)
    got = transition_counts_scalable(ray.data.from_pandas(df), bucket="1d")
    pd.testing.assert_frame_equal(got, want)
    # user 2 has a single single-event bucket: contributes nothing
    assert int(got["n_trans"].sum()) == 2


def test_empty_input():
    df = _events(n=0)
    got = transition_counts(ray.data.from_pandas(df))
    assert len(got) == 0 and list(got.columns) == ["prev_type", "next_type", "n_trans"]


def test_burst_windows_integer_threshold(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.windows import burst_windows

    # key 'a': 10 quiet hours with 2 events + one hour with 30
    rows = []
    for h in range(10):
        for i in range(2):
            rows.append({"k": "a", "ts": pd.Timestamp(2024, 1, 1, h, i)})
    rows += [{"k": "a", "ts": pd.Timestamp(2024, 1, 2, 5, i % 60)} for i in range(30)]
    rows += [{"k": "b", "ts": pd.Timestamp(2024, 1, 1, 0, 0)}]
    ds = ray.data.from_items(rows).repartition(4)
    out = burst_windows(
        ds, key_col="k", ts_col="ts", window_us=3_600_000_000,
        factor_num=2, factor_den=1, n_buckets=4,
    )
    # avg for 'a' = 50/11; only the 30-event hour is > 2x that
    assert len(out) == 1
    r = out.iloc[0]
    assert r["k"] == "a" and r["n"] == 30 and r["total"] == 50 and r["n_windows"] == 11
    # 'b' has one window == its own average: never a burst
    assert (out["k"] != "b").all()
