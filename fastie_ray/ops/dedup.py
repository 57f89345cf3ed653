"""Exact deduplication, hash-partitioned (SURVEY §2.7 D1).

The reference dedups by building Python ``set``s per document
(``modeling_gp.py:166-168``, ``gplinker/decode_utils.py:198``). At
engine scale that becomes: bucket rows by a stable hash of the dedup
key (ONE shuffle on a coarse bucket column, so groups stay large and
the per-group work is vectorized pandas ``drop_duplicates``), keep the
first row per key.

``pd.util.hash_pandas_object`` is deterministic across processes
(fixed default hash key), so bucket assignment is stable for resume.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_BUCKET = "__dedup_bucket"


def dedup_exact(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distinct rows by ``keys`` (first-wins); other columns carried.

    ``n_buckets`` bounds shuffle fan-out — size it ≈ cluster cores at
    real scale so each bucket is one vectorized pandas task.
    """
    keys = list(keys)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df[_BUCKET] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df = df.copy()
        df[_BUCKET] = (h % np.uint64(n_buckets)).astype(np.int64)
        # pre-dedup inside the batch: shrinks the shuffle for free
        return df.drop_duplicates(subset=keys)

    def drop_dupes(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=keys)

    out = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby(_BUCKET)
        .map_groups(drop_dupes, batch_format="pandas")
    )
    return out.drop_columns([_BUCKET])


def dedup_docs_exact(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact document dedup by content hash: per distinct text emit
    (fingerprint, first_doc_id=min id, n_copies). Partial aggregate per
    batch (combiner) → hash-bucketed final — the same skew-safe shape
    as every wide aggregate in this engine. Fingerprint is md5 hex so
    the DuckDB oracle can recompute it (``md5(text)``)."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        fp = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df[text_col]]
        tmp = pd.DataFrame({"fingerprint": fp, id_col: df[id_col]})
        return tmp.groupby("fingerprint", as_index=False).agg(
            first_doc_id=(id_col, "min"), n_copies=(id_col, "count")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["fingerprint"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("fingerprint", as_index=False).agg(
            first_doc_id=("first_doc_id", "min"), n_copies=("n_copies", "sum")
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(lambda g: final(g.drop(columns="__b")), batch_format="pandas")
    )
