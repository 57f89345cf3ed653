"""CCNet-style line-level deduplication: drop every line whose
occurrence count across the WHOLE corpus exceeds a threshold —
the boilerplate-removal pass (cookie banners, nav menus, share
buttons) that CCNet / C4-class web-corpus pipelines run before any
document-level filter (CCNet, Wenzek et al. 2020 §3.1 "deduplication
... removing duplicated lines").

Scale shape (three task-based exchanges, nothing driver-sized):

1. **Count** — per-batch combiner collapses duplicate lines inside the
   batch, ONE line-bucketed exchange finishes the counts. Only
   distinct-lines-per-batch rows cross the wire.
2. **Mark** — lines with count > ``max_count`` form the *heavy* table.
   Its size is bounded by total_lines / max_count (a line needs
   > max_count copies to qualify), which is NOT driver-bounded at
   corpus scale, so heavy lines are joined back (``hash_join``
   how="left", heavy side ships distinct rows only), never collected
   into a driver set.
3. **Rebuild** — one doc-bucketed exchange reorders each document's
   surviving lines by their original index and emits per-doc stats +
   an md5 of the cleaned text. Documents are never materialized
   driver-side.

At 100 TB the count exchange is the big one; its payload is the
corpus's distinct-line set per batch (boilerplate collapses inside
every batch first). A production variant would count 64-bit line
hashes instead of line bytes to cut payload ~10×; counts here keep
the raw line so the result is exactly SQL-reproducible (the driver
oracle counts the same strings).
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.join import hash_join

if TYPE_CHECKING:
    import ray.data


def _bucket(keys: pd.Series, n_buckets: int) -> np.ndarray:
    if len(keys) == 0:
        return np.array([], dtype=np.int64)
    h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int64)


def line_dedup(
    lines: "ray.data.Dataset",
    max_count: int = 16,
    id_col: str = "doc_id",
    idx_col: str = "idx",
    line_col: str = "line",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """``lines`` is one row per (document, line index, line text).
    Returns one row per document: ``(id_col, n_lines, n_kept,
    clean_md5)`` where ``clean_md5`` hashes the '\\n'-join of the
    surviving lines in original order. A line survives iff its total
    occurrence count over the whole corpus is ≤ ``max_count``."""

    # ---- 1. corpus-wide line counts (combiner → one exchange)
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(line_col, as_index=False).agg(n=(line_col, "count"))
        return g

    def count_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(line_col, as_index=False)["n"].sum()
        # only heavy lines leave this exchange — the kept majority
        # never ships again
        out = out[out["n"] > max_count][[line_col]]
        out["__hv"] = np.int64(1)
        return out

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket(df[line_col], n_buckets)
        return df

    heavy = (
        lines.select_columns([line_col])
        .map_batches(count_partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: count_final(g.drop(columns="__b")), batch_format="pandas"
        )
    )

    # ---- 2. mark heavy lines on the full line stream (left join —
    # heavy rows are few; no driver set)
    marked = hash_join(
        lines,
        heavy,
        on=line_col,
        how="left",
        left_cols=[id_col, idx_col, line_col],
        right_cols=[line_col, "__hv"],
        n_buckets=n_buckets,
    )

    # ---- 3. per-document rebuild (one doc-bucketed exchange)
    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values([id_col, idx_col])
        kept = g[g["__hv"].isna()]
        joined = kept.groupby(id_col)[line_col].agg("\n".join)
        out = pd.DataFrame(
            {
                id_col: g.groupby(id_col)[idx_col].count().index,
                "n_lines": g.groupby(id_col)[idx_col]
                .count()
                .to_numpy(dtype=np.int64),
            }
        )
        nk = kept.groupby(id_col)[idx_col].count()
        out["n_kept"] = (
            out[id_col].map(nk).fillna(0).astype("int64")
        )
        out["clean_md5"] = (
            out[id_col]
            .map(joined)
            .fillna("")
            .map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())
        )
        return out.reset_index(drop=True)

    def add_db(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket(df[id_col], n_buckets)
        return df

    return (
        marked.map_batches(add_db, batch_format="pandas")
        .groupby("__b")
        .map_groups(rebuild, batch_format="pandas")
    )
