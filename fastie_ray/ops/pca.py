"""Distributed PCA over an embedding column — the
whitening / dimensionality-reduction step of an embedding pipeline
(compression before ANN indexing, decorrelation before cosine dedup).

Scale shape (the mergeable-moment pattern): PCA needs only the mean
vector and the second-moment matrix, both FIXED-SIZE regardless of
corpus size — each batch contributes (n, Σx, ΣxxT) as d + d² + 1
numbers (one vectorized ``X.T @ X`` per batch), partials merge by
element-wise sum on the driver (blocks × d² rows, the
bounded-small-side pattern), and the d×d eigendecomposition runs once
on the driver. Projection is then a broadcast model (``ray.put`` once)
applied per batch with one matmul — the same broadcast-small-side
shape as ``ops.similarity.knn_bruteforce``.

Float determinism: the SECOND-MOMENT table is the SQL-verifiable
surface (sum of products, round(4) absorbs summation-order noise —
the repo's float-aggregate convention); eigenvectors have arbitrary
sign/order under ties, so the model and projection are pytest-pinned
(orthonormality, eigen-equation residual, variance capture), not
driver-compared."""

from __future__ import annotations

from typing import TYPE_CHECKING, NamedTuple

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _X(df: pd.DataFrame, col: str) -> np.ndarray:
    return np.asarray(df[col].to_list(), dtype=np.float64)


def embedding_moments(
    ds: "ray.data.Dataset",
    col: str = "embedding",
) -> pd.DataFrame:
    """Exact second-moment matrix Σ x_i·x_j over the corpus as
    (i, j, sum_xy) rows, rounded to 4 decimals (SQL-reproducible via a
    self-join on the unnested vector index)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"i": pd.Series([], dtype="int64"),
                 "j": pd.Series([], dtype="int64"),
                 "sum_xy": pd.Series([], dtype="float64")}
            )
        X = _X(df, col)
        m2 = X.T @ X
        d = m2.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        return pd.DataFrame(
            {"i": ii.ravel().astype("int64"),
             "j": jj.ravel().astype("int64"),
             "sum_xy": m2.ravel()}
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"i": pd.Series([], dtype="int64"),
             "j": pd.Series([], dtype="int64"),
             "sum_xy": pd.Series([], dtype="float64")}
        )
    out = parts.groupby(["i", "j"], as_index=False)["sum_xy"].sum()
    out["sum_xy"] = out["sum_xy"].round(4)
    return out.sort_values(["i", "j"]).reset_index(drop=True)


class PCAModel(NamedTuple):
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (k, d) rows = top eigenvectors
    explained_var: np.ndarray  # (k,) descending eigenvalues


def pca_model(
    ds: "ray.data.Dataset",
    k: int,
    col: str = "embedding",
) -> PCAModel:
    """Fit PCA from one pass of fixed-size moment partials: each batch
    emits (n, Σx, ΣxxT); the driver merges and eigendecomposes the d×d
    covariance. Deterministic component sign: the largest-|.| entry of
    each eigenvector is made positive."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        X = _X(df, col)
        if X.size == 0:
            return pd.DataFrame({"payload": pd.Series([], dtype=object)})
        rec = {
            "n": int(X.shape[0]),
            "sum_x": X.sum(axis=0).tolist(),
            "m2": (X.T @ X).ravel().tolist(),
        }
        return pd.DataFrame({"payload": [rec]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    recs = list(parts["payload"]) if len(parts) else []
    if not recs:
        raise ValueError("pca_model: empty input")
    n = sum(r["n"] for r in recs)
    sum_x = np.sum([r["sum_x"] for r in recs], axis=0)
    d = sum_x.shape[0]
    m2 = np.sum([r["m2"] for r in recs], axis=0).reshape(d, d)
    mean = sum_x / n
    cov = (m2 - n * np.outer(mean, mean)) / max(n - 1, 1)
    w, v = np.linalg.eigh(cov)          # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T               # (k, d)
    # sign convention: max-|entry| positive
    for r in range(comps.shape[0]):
        m = np.argmax(np.abs(comps[r]))
        if comps[r, m] < 0:
            comps[r] = -comps[r]
    return PCAModel(mean=mean, components=comps, explained_var=w[order])


def pca_project(
    ds: "ray.data.Dataset",
    model: PCAModel,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Project every vector onto the model's components — the model
    broadcasts once via ``ray.put``; one centered matmul per batch.
    Output: (id, pc_0 … pc_{k-1})."""
    import ray

    model_ref = ray.put(model)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        m: PCAModel = ray.get(model_ref)
        X = _X(df, col)
        out = {"id": df[id_col].to_numpy()}
        if len(df):
            Z = (X - m.mean) @ m.components.T
        else:
            Z = np.zeros((0, m.components.shape[0]))
        for r in range(m.components.shape[0]):
            out[f"pc_{r}"] = Z[:, r]
        return pd.DataFrame(out)

    return ds.map_batches(project, batch_format="pandas")
