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
