"""purged_time_folds: brute-force parity + purge/embargo semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def _brute(df: pd.DataFrame, k: int, emb: int, purge: int) -> pd.DataFrame:
    n = len(df)
    order = df.sort_values(["ts", "event_id"]).reset_index(drop=True)
    fold = (np.arange(n) * k) // n
    ts = order["ts"].to_numpy()
    rows = []
    for f in range(k):
        hi = ts[fold == f].max()
        in_f = fold == f
        if f > 0 and purge > 0:
            lo = ts[fold == f - 1].max()
            p = (~in_f) & (ts <= lo) & (ts + purge > lo)
        else:
            p = np.zeros(n, dtype=bool)
        # embargo lower bound INCLUSIVE (boundary ties embargoed)
        e = (~in_f) & ~p & (ts >= hi) & (ts <= hi + emb)
        rows.append((f, int(in_f.sum()), int(p.sum()), int(e.sum()),
                     int((~in_f & ~p & ~e).sum())))
    return pd.DataFrame(
        rows,
        columns=["test_fold", "n_test", "n_purged", "n_embargo", "n_train"],
    )


def test_purged_folds_brute_force(ray_session):
    from fastie_ray.ops.splits import purged_time_folds

    rng = np.random.default_rng(3)
    n, k = 500, 4
    ts = np.sort(rng.integers(0, 10**12, n))
    # duplicate timestamps exercise the (ts, id) tie-break
    ts[10:20] = ts[10]
    df = pd.DataFrame({"event_id": np.arange(n), "ts": ts.astype("int64")})
    emb, purge = 10**10, 4 * 10**9
    got = (
        purged_time_folds(
            ray.data.from_pandas(df), ts_col="ts", id_col="event_id",
            k=k, embargo_us=emb, purge_us=purge,
        )
        .to_pandas().sort_values("test_fold").reset_index(drop=True)
    )
    want = _brute(df, k, emb, purge)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (
        got["n_test"] + got["n_purged"] + got["n_embargo"] + got["n_train"]
        == n
    ).all()
    # embargo actually bites for interior folds; purge bites for f>0
    assert got.loc[got["test_fold"] < k - 1, "n_embargo"].sum() > 0
    assert got.loc[got["test_fold"] > 0, "n_purged"].sum() > 0


def test_purged_folds_boundary_tie_embargoed(ray_session):
    """ADVICE r4: a next-fold row sharing the fold-boundary timestamp
    is EMBARGOED (inclusive lower bound), not silently trained."""
    from fastie_ray.ops.splits import purged_time_folds

    # 8 rows, k=2: rows 0-3 fold 0, rows 4-7 fold 1; row 4 ties row 3's ts
    ts = np.array([10, 20, 30, 40, 40, 500, 600, 700], dtype="int64")
    df = pd.DataFrame({"event_id": np.arange(8), "ts": ts})
    got = (
        purged_time_folds(
            ray.data.from_pandas(df), ts_col="ts", id_col="event_id",
            k=2, embargo_us=5, purge_us=0,
        )
        .to_pandas().sort_values("test_fold").reset_index(drop=True)
    )
    f0 = got[got["test_fold"] == 0].iloc[0]
    # row 4 (ts 40 == fold-0 hi) falls in [40, 45] → embargoed
    assert f0["n_embargo"] == 1
    assert f0["n_train"] == 3


def test_purged_folds_k_exceeds_rows_raises(ray_session):
    """ADVICE r4: k > n_total raised KeyError deep in count_roles;
    now a clear ValueError at plan time."""
    from fastie_ray.ops.splits import purged_time_folds

    df = pd.DataFrame({"event_id": [0, 1], "ts": [10, 20]})
    with pytest.raises(ValueError, match="would leave a fold empty"):
        purged_time_folds(
            ray.data.from_pandas(df), ts_col="ts", id_col="event_id", k=5
        )
