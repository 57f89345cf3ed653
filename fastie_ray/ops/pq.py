"""Product quantization (PQ) for embedding compression + approximate
nearest-neighbour scan — completes the similarity family
(`ops/similarity.py`: brute force → LSH → IVF → SQ8) with the
Jégou et al. (2011) codebook-compression path that production ANN
indexes (FAISS IVF-PQ) use at billion-vector scale.

Deterministic by construction, so the code assignment is exactly
SQL-reproducible: codebooks are NOT Lloyd-trained (float iteration
order would be irreproducible across engines) but SAMPLED — the
``n_codes`` corpus rows with the smallest ``md5(salt + id)`` serve as
codewords (the k-minimum-values sample of ``ops/sampling``), sliced
per subspace.  Sampled codebooks cost a few % recall vs trained ones
and keep every downstream number integer/argmin-exact; swap in
Lloyd-refined centroids (``ops/clustering``) when bit-for-bit SQL
parity is not required.

Scale shape:

- codebook selection is the no-exchange bottom-k sketch (per-batch
  local bottom-k, driver merges blocks × k rows — n_codes ≤ 256 rows
  total), then the tiny codebook rides into the encode stage as a
  closure (broadcast once per worker, never per batch);
- encoding is one streaming ``map_batches`` pass: per subspace a
  vectorized |batch| × n_codes distance matrix, argmin with
  ties → smallest code (matches SQL ``row_number() ORDER BY dist,
  code``);
- the ADC top-k scan mirrors ``knn_bruteforce``: per query a
  subspace × n_codes lookup table (built once per batch), per-batch
  local top-k via LUT gather + sum, driver merges only
  ``blocks × n_queries × k`` candidate rows.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import hashlib

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def sample_codebook(
    ds: "ray.data.Dataset",
    n_codes: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    salt: str = "pq:",
) -> np.ndarray:
    """The ``n_codes`` rows with the smallest md5(salt + id), as a
    float64 matrix (n_codes × dim) in (hash, id) order — code i is the
    i-th sampled row, matching the SQL ``row_number() - 1``."""
    from fastie_ray.ops.sampling import bottom_k_sample

    out = bottom_k_sample(
        ds, k=n_codes, id_col=id_col, keep_cols=[id_col, emb_col], salt=salt
    )
    return np.stack(
        [np.asarray(v, dtype=np.float64) for v in out[emb_col]]
    )


def pq_encode(
    ds: "ray.data.Dataset",
    codebook: np.ndarray,
    n_sub: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """Long-format code assignment (id, sub, code): per subspace the
    nearest codeword (squared L2, ties → smallest code)."""
    dim = codebook.shape[1]
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    d_sub = dim // n_sub

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "sub": pd.Series([], dtype="int64"),
                    "code": pd.Series([], dtype="int64"),
                }
            )
        v = np.stack([np.asarray(x, dtype=np.float64) for x in df[emb_col]])
        ids = df[id_col].to_numpy(dtype=np.int64)
        frames = []
        for m in range(n_sub):
            sl = slice(m * d_sub, (m + 1) * d_sub)
            # |batch| × n_codes squared distances
            diff = v[:, None, sl] - codebook[None, :, sl]
            d2 = np.einsum("ijk,ijk->ij", diff, diff)
            frames.append(
                pd.DataFrame(
                    {
                        id_col: ids,
                        "sub": np.int64(m),
                        "code": d2.argmin(axis=1).astype(np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    return ds.map_batches(encode, batch_format="pandas")


def pq_adc_topk(
    ds: "ray.data.Dataset",
    codebook: np.ndarray,
    queries: np.ndarray,
    query_ids: list[int],
    k: int = 5,
    n_sub: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Asymmetric-distance top-k: approximate distance = Σ_m
    LUT[m, code_m] where LUT holds exact query-to-codeword subspace
    distances.  Per-batch encode + LUT gather + local top-k; the
    driver merges blocks × n_queries × k rows.  Returns
    (query_id, neighbor_id, rank) ranked by (adc asc, id asc)."""
    dim = codebook.shape[1]
    d_sub = dim // n_sub
    q = np.asarray(queries, dtype=np.float64)
    # lut[q, m, c] = squared L2 between query q and codeword c in sub m
    lut = np.empty((q.shape[0], n_sub, codebook.shape[0]))
    for m in range(n_sub):
        sl = slice(m * d_sub, (m + 1) * d_sub)
        diff = q[:, None, sl] - codebook[None, :, sl]
        lut[:, m, :] = np.einsum("qck,qck->qc", diff, diff)
    qids = np.asarray(query_ids, dtype=np.int64)

    def local(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "adc": pd.Series([], dtype="float64"),
                }
            )
        v = np.stack([np.asarray(x, dtype=np.float64) for x in df[emb_col]])
        ids = df[id_col].to_numpy(dtype=np.int64)
        codes = np.empty((len(df), n_sub), dtype=np.int64)
        for m in range(n_sub):
            sl = slice(m * d_sub, (m + 1) * d_sub)
            diff = v[:, None, sl] - codebook[None, :, sl]
            codes[:, m] = np.einsum("ijk,ijk->ij", diff, diff).argmin(axis=1)
        # adc[q, row] = Σ_m lut[q, m, codes[row, m]]
        adc = sum(lut[:, m, codes[:, m]] for m in range(n_sub))
        frames = []
        kk = min(k, len(df))
        for qi in range(len(qids)):
            order = np.lexsort((ids, adc[qi]))[:kk]
            frames.append(
                pd.DataFrame(
                    {
                        "query_id": qids[qi],
                        "neighbor_id": ids[order],
                        "adc": adc[qi][order],
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["query_id", "adc", "neighbor_id"], kind="mergesort"
    )
    top = cand.groupby("query_id", sort=False).head(k).copy()
    top["rank"] = (top.groupby("query_id", sort=False).cumcount() + 1).astype(
        "int64"
    )
    return top[["query_id", "neighbor_id", "rank"]].reset_index(drop=True)
