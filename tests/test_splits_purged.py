"""purged_time_folds: brute-force parity + embargo semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def test_purged_folds_brute_force(ray_session):
    from fastie_ray.ops.splits import purged_time_folds

    rng = np.random.default_rng(3)
    n, k = 500, 4
    ts = np.sort(rng.integers(0, 10**12, n))
    # duplicate timestamps exercise the (ts, id) tie-break
    ts[10:20] = ts[10]
    df = pd.DataFrame({"event_id": np.arange(n), "ts": ts.astype("int64")})
    emb = 10**10
    got = (
        purged_time_folds(
            ray.data.from_pandas(df), ts_col="ts", id_col="event_id",
            k=k, embargo_us=emb,
        )
        .to_pandas().sort_values("test_fold").reset_index(drop=True)
    )
    # brute force
    order = df.sort_values(["ts", "event_id"]).reset_index(drop=True)
    fold = (np.arange(n) * k) // n
    rows = []
    for f in range(k):
        hi = order.loc[fold == f, "ts"].max()
        in_f = fold == f
        e = (~in_f) & (order["ts"] > hi) & (order["ts"] <= hi + emb)
        rows.append((f, int(in_f.sum()), int(e.sum()),
                     int((~in_f & ~e.to_numpy()).sum())))
    want = pd.DataFrame(
        rows, columns=["test_fold", "n_test", "n_embargo", "n_train"]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_test"] + got["n_embargo"] + got["n_train"] == n).all()
    # embargo actually bites for interior folds
    assert got.loc[got["test_fold"] < k - 1, "n_embargo"].sum() > 0
