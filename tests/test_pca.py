"""Oracles for `fastie_ray/ops/pca.py`: moment-table parity with numpy
under any partitioning, eigen-equation residuals for the fitted model,
and variance capture of the projection."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.pca import embedding_moments, pca_model, pca_project


def _data(n=800, d=12, seed=109):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: two dominant directions
    base = rng.normal(size=(n, d))
    base[:, 0] *= 6.0
    base[:, 1] *= 3.0
    mix = rng.normal(size=(d, d)) * 0.1 + np.eye(d)
    X = (base @ mix + rng.normal(scale=0.01, size=(n, d))).astype(np.float32)
    df = pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"), "embedding": list(X)}
    )
    return df, X.astype(np.float64)


def test_moments_match_numpy_any_partitioning():
    df, X = _data()
    want = X.T @ X
    for parts in (1, 8):
        got = embedding_moments(ray.data.from_pandas(df).repartition(parts))
        G = np.zeros_like(want)
        G[got["i"], got["j"]] = got["sum_xy"]
        assert np.allclose(G, want, atol=1e-3)


def test_pca_model_solves_eigen_equation():
    df, X = _data()
    m = pca_model(ray.data.from_pandas(df).repartition(4), k=4)
    cov = np.cov(X, rowvar=False)
    # eigen-equation residual per component
    for r in range(4):
        v, lam = m.components[r], m.explained_var[r]
        assert np.allclose(cov @ v, lam * v, atol=1e-6 * max(1.0, lam))
    # orthonormal, descending variance
    assert np.allclose(m.components @ m.components.T, np.eye(4), atol=1e-9)
    assert (np.diff(m.explained_var) <= 1e-9).all()


def test_pca_project_captures_variance():
    df, X = _data()
    ds = ray.data.from_pandas(df).repartition(4)
    m = pca_model(ds, k=2)
    proj = pca_project(ds, m).to_pandas().sort_values("id")
    # variance along pc_r equals the eigenvalue
    for r in range(2):
        assert np.isclose(
            np.var(proj[f"pc_{r}"], ddof=1), m.explained_var[r], rtol=1e-6
        )
    # ids preserved
    assert proj["id"].tolist() == list(range(len(df)))
