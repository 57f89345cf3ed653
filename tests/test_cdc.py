"""Oracles for `fastie_ray/ops/cdc.py` and
`fastie_ray.ops.sequence.validity_intervals`: brute-force parity under
any partitioning, tie-breaking, delete/insert/pass-through semantics."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.cdc import cdc_apply
from fastie_ray.ops.sequence import validity_intervals


def test_cdc_apply_semantics():
    base = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10.0, 20.0, 30.0, 40.0]})
    changes = pd.DataFrame(
        {
            "k": [2, 2, 3, 5, 5],
            "v": [21.0, 22.0, 0.0, 50.0, 51.0],
            "ts": pd.to_datetime(
                ["2024-01-02", "2024-01-03", "2024-01-01", "2024-01-01", "2024-01-01"]
            ),
            "seq": np.array([1, 2, 3, 4, 5], dtype="int64"),
            "op": ["upsert", "upsert", "delete", "upsert", "delete"],
        }
    )
    out = (
        cdc_apply(
            ray.data.from_pandas(base).repartition(3),
            ray.data.from_pandas(changes).repartition(2),
            "k",
            ["v"],
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # k=1,4 pass through; k=2 latest upsert 22.0; k=3 deleted;
    # k=5 latest change (seq=5) is delete → not inserted
    assert out["k"].tolist() == [1, 2, 4]
    assert out["v"].tolist() == [10.0, 22.0, 40.0]


def test_cdc_apply_insert_new_key():
    base = pd.DataFrame({"k": [1], "v": [1.0]})
    changes = pd.DataFrame(
        {
            "k": [9],
            "v": [9.0],
            "ts": pd.to_datetime(["2024-01-01"]),
            "seq": np.array([1], dtype="int64"),
            "op": ["upsert"],
        }
    )
    out = cdc_apply(
        ray.data.from_pandas(base), ray.data.from_pandas(changes), "k", ["v"]
    ).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 9]


def test_validity_intervals_match_lead_window():
    rng = np.random.default_rng(97)
    n = 3000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.integers(0, 40, n).astype("int64"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10 * 24 * 3600, n), unit="s"),
            "event_type": rng.choice(["a", "b", "c"], n),
        }
    )
    want = df.sort_values(["user_id", "ts", "event_id"]).copy()
    want["valid_from"] = want["ts"]
    want["valid_to"] = want.groupby("user_id")["ts"].shift(-1)
    want = want[["user_id", "event_type", "valid_from", "valid_to"]].reset_index(
        drop=True
    )
    for parts in (1, 8):
        got = (
            validity_intervals(ray.data.from_pandas(df).repartition(parts))
            .to_pandas()
            .sort_values(["user_id", "valid_from"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_merge_tumbling_aggregates_equals_full_recompute():
    from fastie_ray.ops.windows import merge_tumbling_aggregates, tumbling_window_agg

    rng = np.random.default_rng(101)
    n = 4000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 3 * 24 * 3600, n), unit="s"),
            "event_type": rng.choice(["a", "b", "c"], n),
            "value": rng.random(n) * 100,
        }
    )
    full = (
        tumbling_window_agg(ray.data.from_pandas(df), freq="1h")
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    base = tumbling_window_agg(
        ray.data.from_pandas(df[df["event_id"] % 2 == 0]),
        freq="1h",
        round_output=False,
    )
    inc = (
        merge_tumbling_aggregates(
            base, ray.data.from_pandas(df[df["event_id"] % 2 == 1]), freq="1h"
        )
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert inc["n_events"].tolist() == full["n_events"].tolist()
    assert np.allclose(inc["sum_value"], full["sum_value"], atol=1e-3)
    pd.testing.assert_frame_equal(
        inc[["window_start", "event_type"]], full[["window_start", "event_type"]]
    )


def test_asof_state_replays_change_prefix(ray_session):
    import datetime as dt

    import pandas as pd
    import ray.data

    from fastie_ray.ops.cdc import asof_state, cdc_apply

    base = ray.data.from_items(
        [{"k": 1, "v": 10}, {"k": 2, "v": 20}, {"k": 3, "v": 30}]
    )
    t = dt.datetime(2024, 1, 1)

    def chg(rows):
        return ray.data.from_items(rows)

    changes = chg(
        [
            {"k": 1, "v": 11, "ts": t, "seq": 1, "op": "upsert"},
            {"k": 2, "v": 0, "ts": t, "seq": 2, "op": "delete"},
            # later than the as_of cut: must be invisible
            {"k": 1, "v": 99, "ts": dt.datetime(2024, 6, 1), "seq": 3, "op": "upsert"},
            {"k": 3, "v": 0, "ts": dt.datetime(2024, 6, 1), "seq": 4, "op": "delete"},
        ]
    )
    snap = (
        asof_state(base, changes, "k", ["v"], as_of=dt.datetime(2024, 3, 1))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(snap["k"]) == [1, 3] and list(snap["v"]) == [11, 30]
    # as-of "now" equals the plain CDC merge
    now = asof_state(
        base, changes, "k", ["v"], as_of=dt.datetime(2030, 1, 1)
    ).to_pandas().sort_values("k").reset_index(drop=True)
    full = cdc_apply(base, changes, "k", ["v"]).to_pandas().sort_values(
        "k"
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(now, full)


def test_grid_fill_resample_locf(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.windows import grid_fill_resample

    rows = [
        # u1 observes on day 1 and day 4; u2 only on day 3
        (1, "2024-05-01 10:00", 10.0),
        (1, "2024-05-04 09:00", 40.0),
        (2, "2024-05-03 23:59", 7.0),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    ds = ray.data.from_pandas(df).repartition(2)
    out = (
        grid_fill_resample(ds, step="1d")
        .to_pandas()
        .sort_values(["user_id", "slot_ts"])
        .reset_index(drop=True)
    )
    # grid: floor(min ts)=May-1 .. max ts=May-4 09:00 → 4 daily slots
    assert len(out) == 8
    u1 = out[out["user_id"] == 1]["value"].tolist()
    u2 = out[out["user_id"] == 2]["value"].tolist()
    # slot at May-1 00:00 precedes u1's 10:00 observation → null
    assert np.isnan(u1[0]) and u1[1] == 10.0 and u1[2] == 10.0 and u1[3] == 10.0
    assert np.isnan(u2[0]) and np.isnan(u2[1]) and np.isnan(u2[2]) and u2[3] == 7.0
