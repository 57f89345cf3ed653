"""srm_audit: integer chi-square parity with brute force + the flag
bit on a planted mismatch."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def test_srm_audit_brute_force_and_flag(ray_session):
    from fastie_ray.ops.stats import srm_audit

    rng = np.random.default_rng(11)
    rows = []
    # balanced group: users uniform; skewed group: 80/20 variants
    for i in range(1000):
        rows.append({"event_type": "ok", "user_id": int(rng.integers(1e6))})
    for i in range(1000):
        u = int(rng.integers(1e6))
        u = u - (u % 2) if rng.random() < 0.8 else u | 1  # mostly even
        rows.append({"event_type": "skewed", "user_id": u})
    df = pd.DataFrame(rows)
    got = (
        srm_audit(ray.data.from_pandas(df).repartition(8))
        .to_pandas().sort_values("event_type").reset_index(drop=True)
    )
    # brute force
    want_rows = []
    for grp, sub in df.groupby("event_type"):
        o = (sub["user_id"] % 2).value_counts().reindex([0, 1], fill_value=0)
        n = int(o.sum())
        num = int(((2 * o - n) ** 2).sum())
        chi2 = (1_000_000 * num) // (2 * n)
        want_rows.append((grp, n, chi2, chi2 > 3_841_459))
    want = pd.DataFrame(
        want_rows, columns=["event_type", "n", "chi2_e6", "srm"]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert bool(got.set_index("event_type").loc["skewed", "srm"])
    assert not bool(got.set_index("event_type").loc["ok", "srm"])
