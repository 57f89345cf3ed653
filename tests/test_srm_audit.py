"""srm_audit: integer chi-square parity with brute force + the flag
bit on a planted mismatch + distinct-unit counting + df scaling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def _brute(df: pd.DataFrame, m: int = 2, crit: int = 3_841_459):
    want_rows = []
    for grp, sub in df.groupby("event_type"):
        units = sub["user_id"].drop_duplicates()
        o = (units % m).value_counts().reindex(range(m), fill_value=0)
        n = int(o.sum())
        num = int(((m * o - n) ** 2).sum())
        chi2 = (1_000_000 * num) // (m * n)
        want_rows.append((grp, n, chi2, chi2 > crit))
    return pd.DataFrame(
        want_rows, columns=["event_type", "n", "chi2_e6", "srm"]
    )


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
    want = _brute(df)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert bool(got.set_index("event_type").loc["skewed", "srm"])
    assert not bool(got.set_index("event_type").loc["ok", "srm"])


def test_srm_audit_counts_distinct_units(ray_session):
    """ADVICE r4: one heavy even-variant user emitting 10k events over a
    perfectly balanced unit assignment must NOT flag SRM — units are
    counted once, across batches."""
    from fastie_ray.ops.stats import srm_audit

    rows = [
        {"event_type": "exp", "user_id": u} for u in range(400)
    ]  # 200 even / 200 odd — perfectly balanced units
    rows += [{"event_type": "exp", "user_id": 2}] * 10_000  # heavy user
    df = pd.DataFrame(rows)
    got = srm_audit(
        ray.data.from_pandas(df).repartition(16)
    ).to_pandas()
    assert int(got.loc[0, "n"]) == 400  # distinct units, not 10400 events
    assert int(got.loc[0, "chi2_e6"]) == 0
    assert not bool(got.loc[0, "srm"])


def test_srm_audit_df_scaled_critical_value(ray_session):
    """ADVICE r4: default critical value is chi2(0.95, df=m-1), not the
    df=1 constant — a 3-variant split slightly above the df=1 value but
    below the df=2 value must not flag."""
    from fastie_ray.ops.stats import _CHI2_95_E6, srm_audit

    # engineer counts: m=3, o = (a, b, c); chi2_e6 strictly between
    # chi2(0.95,1)=3.841e6 and chi2(0.95,2)=5.991e6
    o = (360, 300, 340)  # n=1000, chi2 = ((80)^2+(-100)^2+(20)^2)/(3*1000)
    chi2_e6 = (1_000_000 * sum((3 * x - 1000) ** 2 for x in o)) // 3000
    assert _CHI2_95_E6[0] < chi2_e6 < _CHI2_95_E6[1]
    rows = []
    uid = 0
    for v, cnt in enumerate(o):
        for _ in range(cnt):
            while uid % 3 != v:
                uid += 1
            rows.append({"event_type": "exp", "user_id": uid})
            uid += 1
    got = srm_audit(
        ray.data.from_pandas(pd.DataFrame(rows)), n_variants=3
    ).to_pandas()
    assert int(got.loc[0, "chi2_e6"]) == chi2_e6
    assert not bool(got.loc[0, "srm"])  # df=2 critical value applies
    # df beyond the embedded table demands an explicit critical value
    with pytest.raises(ValueError, match="alpha_chi2_e6"):
        srm_audit(
            ray.data.from_pandas(pd.DataFrame(rows)), n_variants=18
        )
