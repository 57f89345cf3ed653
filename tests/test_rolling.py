"""Bounded-lookback window frames (`fastie_ray/ops/rolling.py`):
single-exchange vs two-phase scalable parity, exact match with the
SQL ROWS BETWEEN frame (DuckDB), frames spanning several sparse time
buckets (the boundary-union reconstruction), and the k=1 edge."""

import duckdb
import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.rolling import rolling_frame, rolling_frame_scalable


def _events(n=2500, users=20, seed=6):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "user_id": rng.integers(0, users, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 86400 * 15, n), unit="s"),
            "event_id": np.arange(n, dtype=np.int64),
            "value": rng.normal(10, 3, n).round(2),
        }
    )


def _sql_ref(df, k):
    con = duckdb.connect()
    ref = con.execute(
        f"""
        SELECT event_id AS id, count(*) OVER w AS n_window,
               round(sum(value) OVER w, 4) AS roll_sum,
               round(avg(value) OVER w, 4) AS roll_avg
        FROM df WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)
        ORDER BY id
        """
    ).df()
    ref["id"] = ref["id"].astype("int64")
    ref["n_window"] = ref["n_window"].astype("int64")
    return ref.reset_index(drop=True)


def _sorted(ds):
    return ds.to_pandas().sort_values("id").reset_index(drop=True)


def test_rolling_parity_and_sql(ray_session):
    df = _events()
    ds = ray.data.from_pandas(df).repartition(6)
    a = _sorted(rolling_frame(ds, k=4))
    b = _sorted(rolling_frame_scalable(ds, k=4, bucket="1d"))
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, _sql_ref(df, 4))


def test_rolling_sparse_buckets_window_spans_many_days(ray_session):
    # one event per key per day → every frame crosses 3 bucket edges;
    # a second key is dense inside one day
    rows = []
    for d in range(8):
        rows.append(("u1", pd.Timestamp("2024-02-01") + pd.Timedelta(days=2 * d), d))
    for j in range(6):
        rows.append(("u2", pd.Timestamp("2024-02-03") + pd.Timedelta(minutes=j), 100 + j))
    df = pd.DataFrame(rows, columns=["user_id", "ts", "event_id"])
    df["value"] = (df["event_id"] % 7 + 1).astype("float64")
    ds = ray.data.from_pandas(df).repartition(3)
    a = _sorted(rolling_frame(ds, k=4))
    b = _sorted(rolling_frame_scalable(ds, k=4, bucket="1d"))
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, _sql_ref(df, 4))


def test_rolling_k1_identity(ray_session):
    df = _events(n=300, users=5, seed=8)
    ds = ray.data.from_pandas(df).repartition(2)
    out = _sorted(rolling_frame_scalable(ds, k=1, bucket="1d"))
    assert (out["n_window"] == 1).all()
    expect = df.sort_values("event_id")["value"].round(4).to_numpy()
    assert np.allclose(out["roll_sum"].to_numpy(), expect)


def test_trailing_window_sums_bruteforce(ray_session):
    from fastie_ray.ops.rolling import trailing_window_sums

    rng = np.random.default_rng(51)
    n = 1200
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 10, n).astype("int64"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 40 * 86400, n), unit="s"),
            "cents": rng.integers(1, 500, n).astype("int64"),
        }
    )
    got = (
        trailing_window_sums(
            ray.data.from_pandas(df).repartition(4),
            "user_id", "ts", "cents", window_days=7, n_buckets=4,
        )
        .to_pandas()
        .sort_values(["user_id", "day"])
        .reset_index(drop=True)
    )
    daily = df.assign(
        day=df["ts"].dt.floor("D").astype("datetime64[s]").astype("int64")
        // 86400
    ).groupby(["user_id", "day"], as_index=False)["cents"].sum()
    rows = []
    for u, grp in daily.groupby("user_id"):
        for _, r in grp.iterrows():
            m = (grp["day"] > r["day"] - 7) & (grp["day"] <= r["day"])
            rows.append((u, r["day"], int(grp.loc[m, "cents"].sum())))
    want = pd.DataFrame(rows, columns=["user_id", "day", "sum_7d"]).astype(
        "int64"
    ).sort_values(["user_id", "day"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_trailing_window_sums_window_one_is_daily(ray_session):
    from fastie_ray.ops.rolling import trailing_window_sums

    df = pd.DataFrame(
        {
            "user_id": pd.Series([1, 1, 1], dtype="int64"),
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 09:00", "2024-01-03 00:00"]
            ),
            "cents": pd.Series([10, 5, 7], dtype="int64"),
        }
    )
    got = trailing_window_sums(
        ray.data.from_pandas(df), "user_id", "ts", "cents",
        window_days=1, n_buckets=2,
    ).to_pandas().sort_values("day")
    assert got["sum_1d"].tolist() == [15, 7]
