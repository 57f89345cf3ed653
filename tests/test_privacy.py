"""Noisy aggregate release (ops/privacy)."""

import math

import numpy as np
import ray.data

from fastie_ray.ops.privacy import dp_group_counts, laplace_noise


def test_laplace_noise_distributional_shape():
    draws = np.array([laplace_noise(f"k{i}", 1.0) for i in range(4000)])
    # symmetric around 0, Laplace(1) stdev = sqrt(2)
    assert abs(float(np.mean(draws))) < 0.08
    assert abs(float(np.std(draws)) - math.sqrt(2)) < 0.1
    # scale parameter scales the draw linearly for the same key
    assert laplace_noise("x", 3.0) == 3.0 * laplace_noise("x", 1.0)


def test_dp_group_counts_exact_plus_bounded_noise(ray_session):
    ds = ray.data.from_items(
        [{"g": "a"} for _ in range(100)]
        + [{"g": "b"} for _ in range(40)]
    ).repartition(4)
    out = dp_group_counts(ds, "g", epsilon=1.0)
    assert list(out["g"]) == ["a", "b"]
    assert list(out["n"]) == [100, 40]
    noise = out["n_noisy"] - out["n"]
    assert (noise != 0).all()
    # deterministic across runs
    out2 = dp_group_counts(ds, "g", epsilon=1.0)
    assert out.equals(out2)
    # tighter epsilon -> larger scale
    loose = dp_group_counts(ds, "g", epsilon=0.1)
    assert (abs(loose["n_noisy"] - loose["n"]) >= abs(noise)).all()


def test_privacy_audits_keep_null_classes(ray_session):
    """Rows with null quasi-identifiers form their own equivalence
    classes (ADVICE r2): a release gate that drops them leaves exactly
    those rows unaudited. SQL GROUP BY keeps NULL classes."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.privacy import k_anonymity_audit, l_diversity_audit

    rows = (
        [{"zip": "94110", "age": 30, "dx": "flu"}] * 6  # safe class (k=5)
        + [{"zip": None, "age": 41, "dx": "flu"}] * 2   # risky null class
        + [{"zip": "10001", "age": 22, "dx": "cold"}]   # risky small class
    )
    ds = ray.data.from_items(rows).repartition(3)

    ka = (
        k_anonymity_audit(ds, ["zip", "age"], k=5, n_buckets=4)
        .to_pandas()
        .sort_values("n_rows")
        .reset_index(drop=True)
    )
    assert len(ka) == 2
    assert ka["n_rows"].tolist() == [1, 2]
    assert ka["zip"].isna().sum() == 1  # the null class is audited

    # l-diversity: the safe-k class is homogeneous (1 distinct dx < 2)
    ld = l_diversity_audit(ds, ["zip", "age"], "dx", l=2, n_buckets=4).to_pandas()
    assert (ld["n_sensitive"] < 2).all()
    assert len(ld) == 3  # all three classes are homogeneous
    assert ld["zip"].isna().sum() == 1


def test_dp_group_counts_release_only_drops_exact_n(ray_session):
    import ray.data

    from fastie_ray.ops.privacy import dp_group_counts

    ds = ray.data.from_items([{"g": "a"}] * 10 + [{"g": None}] * 3)
    full = dp_group_counts(ds, "g", epsilon=1.0)
    rel = dp_group_counts(ds, "g", epsilon=1.0, release_only=True)
    assert "n" in full.columns and "n" not in rel.columns
    assert list(rel.columns) == ["g", "n_noisy"]
    # the null group key is counted (SQL GROUP BY semantics)
    assert len(full) == 2 and full["n"].sum() == 13
