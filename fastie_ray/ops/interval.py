"""Interval-overlap join: all pairs of intervals sharing an equi-key
that overlap in time (a.start ≤ b.end AND b.start ≤ a.end, inclusive)
— the sessions / validity-window / genomics join shape.  Completes the
temporal-join family (``ops/windows.range_join`` joins point events
within a lookback window; this joins INTERVAL × INTERVAL).

Scale shape — chunked replication with a canonical-chunk rule, ONE
exchange, no pair dedup pass:

- each interval is replicated to every time chunk it covers
  (``bucket`` granularity; replication factor = interval length /
  bucket + 1, so pick ``bucket`` at or above the typical interval
  length);
- two overlapping intervals both cover the chunk containing
  ``max(a.start, b.start)``, so every overlapping pair co-locates in
  at least one (key, chunk) group;
- the pair is EMITTED only in that one chunk (the canonical-chunk
  test ``chunk == floor(max(a.start, b.start))`` inside the group),
  so no pair is produced twice and no dedup exchange is needed;
- groups are keyed (equi-key, chunk): a hot key's intervals spread
  over its chunks; within a group the pair search is a vectorized
  pandas merge + mask, bounded by in-chunk density².

``self_pairs=True`` mines unordered pairs within ONE dataset
(``id_a < id_b``); otherwise all overlapping left × right pairs are
emitted.  Output is a Dataset of pair rows — never collected on the
driver."""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:
    import ray.data


def _replicate(
    df: pd.DataFrame,
    id_col: str,
    key_col: str,
    start_col: str,
    end_col: str,
    bucket_td: pd.Timedelta,
    n_buckets: int,
    side: str,
) -> pd.DataFrame:
    out_cols = {
        "id": np.array([], dtype=np.int64),
        "k": np.array([], dtype=object),
        "s": pd.Series([], dtype="datetime64[us]"),
        "e": pd.Series([], dtype="datetime64[us]"),
        "__chunk": pd.Series([], dtype="datetime64[us]"),
        "__side": np.array([], dtype=object),
        "__b": np.array([], dtype=np.int64),
    }
    if len(df) == 0:
        return pd.DataFrame(out_cols)
    s = pd.to_datetime(df[start_col])
    e = pd.to_datetime(df[end_col])
    c0 = s.dt.floor(bucket_td)
    c1 = e.dt.floor(bucket_td)
    n_chunks = ((c1 - c0) // bucket_td).to_numpy() + 1
    idx = np.repeat(np.arange(len(df)), n_chunks)
    offs = np.concatenate([np.arange(n) for n in n_chunks]) if len(df) else np.array([], dtype=np.int64)
    chunk = c0.to_numpy()[idx] + offs * bucket_td.to_numpy()
    out = pd.DataFrame(
        {
            "id": df[id_col].to_numpy()[idx],
            "k": df[key_col].to_numpy()[idx],
            "s": s.to_numpy()[idx],
            "e": e.to_numpy()[idx],
            "__chunk": chunk,
            "__side": side,
        }
    )
    h = (
        pd.util.hash_pandas_object(out["k"], index=False).to_numpy()
        ^ pd.util.hash_pandas_object(out["__chunk"], index=False).to_numpy()
    )
    out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
    return out


def interval_overlap_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset | None" = None,
    id_col: str = "iid",
    key_col: str = "k",
    start_col: str = "s",
    end_col: str = "e",
    bucket: str = "7d",
    n_buckets: int = 16,
    self_pairs: bool = False,
) -> "ray.data.Dataset":
    """Overlapping interval pairs per equi-key.  With
    ``self_pairs=True`` (``right`` ignored) emits unordered pairs
    ``id_a < id_b`` from ``left`` alone.  Returns pair rows
    (k, id_a, id_b)."""
    bucket_td = pd.Timedelta(bucket)

    def rep_side(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return _replicate(
                df, id_col, key_col, start_col, end_col,
                bucket_td, n_buckets, side,
            )

        return fn

    if self_pairs:
        tagged = left.map_batches(rep_side("a"), batch_format="pandas")
    else:
        if right is None:
            raise ValueError("right dataset required unless self_pairs=True")
        tagged = left.map_batches(rep_side("a"), batch_format="pandas").union(
            right.map_batches(rep_side("b"), batch_format="pandas")
        )

    schema = pa.schema(
        [("k", pa.int64()), ("id_a", pa.int64()), ("id_b", pa.int64())]
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        a = g[g["__side"] == "a"]
        b = a if self_pairs else g[g["__side"] == "b"]
        if len(a) == 0 or len(b) == 0:
            return schema.empty_table()
        m = a.merge(b, on=["k", "__chunk"], suffixes=("_a", "_b"))
        if len(m) == 0:
            return schema.empty_table()
        ok = (m["s_a"] <= m["e_b"]) & (m["s_b"] <= m["e_a"])
        # canonical chunk: emit only where both copies sit in the
        # chunk of the later start — exactly one group per pair
        later = np.maximum(m["s_a"].to_numpy(), m["s_b"].to_numpy())
        canon = pd.Series(later).dt.floor(bucket_td).to_numpy()
        ok &= m["__chunk"].to_numpy() == canon
        if self_pairs:
            ok &= m["id_a"].to_numpy() < m["id_b"].to_numpy()
        m = m[ok]
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "k": m["k"].astype("int64"),
                    "id_a": m["id_a"].astype("int64"),
                    "id_b": m["id_b"].astype("int64"),
                }
            ),
            preserve_index=False,
            schema=schema,
        )

    return (
        tagged.groupby("__b")
        .map_groups(
            lambda g: pairs(g.drop(columns="__b")), batch_format="pandas"
        )
    )
