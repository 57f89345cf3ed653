"""Corpus snapshot diff: added / removed / changed docs between two
corpus versions — the incremental-ingest primitive (what changed since
the last crawl / the last training-set build?).

One task-based tag-union exchange, never a join actor and never doc
text through the shuffle: each side reduces to (doc_id, md5
fingerprint, side) per batch — 16 bytes of payload per row — then one
hash-bucket exchange classifies each doc_id locally:

  only in v1            → removed
  only in v2            → added
  in both, fp differs   → changed
  in both, fp equal     → (dropped)

Scale-safe by construction: shuffle volume is O(corpus ids), not
O(corpus bytes), and classification is vectorized pandas per bucket.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _fp_side(side: int, id_col: str, text_col: str):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df[id_col].astype("int64"),
                "fp": [
                    hashlib.md5(t.encode("utf-8")).hexdigest()
                    for t in df[text_col]
                ],
                "side": np.int64(side),
            }
        )

    return fn


def corpus_diff(
    v1: "ray.data.Dataset",
    v2: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """(doc_id, status) rows with status ∈ {added, removed, changed};
    unchanged docs produce no output. Assumes ids are unique per side
    (dedup upstream if not)."""
    tagged = v1.map_batches(
        _fp_side(0, id_col, text_col), batch_format="pandas"
    ).union(v2.map_batches(_fp_side(1, id_col, text_col), batch_format="pandas"))

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = (
            df["doc_id"].to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int64)
        return df

    def classify(g: pd.DataFrame) -> "pa.Table":
        # typed Arrow out: zero-row pandas blocks lose their schema
        # (Ray sentinel blocks) and break downstream consumers
        import pyarrow as pa

        p = g.pivot_table(
            index="doc_id", columns="side", values="fp", aggfunc="first"
        )
        f1 = p[0] if 0 in p.columns else pd.Series(index=p.index, dtype=object)
        f2 = p[1] if 1 in p.columns else pd.Series(index=p.index, dtype=object)
        status = np.where(
            f1.isna(), "added", np.where(f2.isna(), "removed", "changed")
        )
        keep = ~(f1.notna() & f2.notna() & (f1 == f2)).to_numpy()
        return pa.table(
            {
                "doc_id": pa.array(
                    p.index.to_numpy()[keep].astype(np.int64), pa.int64()
                ),
                "status": pa.array(status[keep], pa.string()),
            }
        )

    out = (
        tagged.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(classify, batch_format="pandas")
    )

    def pin_schema(t) -> "object":
        # empty sort groups surface as schema-less sentinel pandas
        # blocks (NOTES r2 fact 3); re-type them so an all-unchanged
        # diff still yields (doc_id, status)
        import pyarrow as pa

        if t.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "status": pa.array([], pa.string()),
                }
            )
        return t

    return out.map_batches(pin_schema, batch_format="pyarrow")
