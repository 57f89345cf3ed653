"""Sequence packing for LLM training: concatenate the corpus token
stream in doc_id order and split it into fixed-size context windows
(the "concat-and-chunk" packing used by GPT-style pre-training
loaders). The interesting part at scale is the GLOBAL PREFIX SUM —
every doc's window assignment depends on the token count of every doc
before it — implemented here as the classic two-pass distributed scan:

pass 1 (range totals): docs are range-partitioned on contiguous
  ``doc_id // range_size`` ranges; a per-batch combiner emits one
  (range, token_sum) row per range per batch, and the driver reduces
  the tiny range table (|ranges| = max_id / range_size — bounded by a
  CHOSEN constant per 10⁶+ docs, never by corpus rows) into an
  exclusive scan that is broadcast once via ``ray.put``;
pass 2 (local scan): ONE range-bucketed exchange co-locates each
  range; within the partition a vectorized sort + cumsum + the
  broadcast range offset yields every doc's absolute start offset —
  no global sort, no driver materialization of doc rows.

Window math is integer-exact (floor division), so the whole operator
is reproducible bit-for-bit in SQL window functions
(``SUM(...) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)``).

Token counting matches ``ops.text_index`` (ASCII ``[A-Za-z0-9]+``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = r"[A-Za-z0-9]+"


def _doc_counts(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            "n_tokens": df[text_col].str.count(_TOKEN_RE).astype("int64"),
        }
    )


def _range_offsets(
    ds: "ray.data.Dataset", text_col: str, range_size: int
) -> dict[int, int]:
    """Exclusive prefix sum of token totals per doc_id range. The
    reduced table has one row per RANGE (a chosen granularity knob,
    not a data-driven count), so collecting it on the driver is the
    bounded-small-side pattern, same as a vocab broadcast."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = _doc_counts(df, text_col)
        c["rid"] = c["doc_id"] // range_size
        return c.groupby("rid", as_index=False)["n_tokens"].sum()

    totals = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("rid", as_index=False)["n_tokens"]
        .sum()
        .sort_values("rid")
    )
    excl = np.concatenate([[0], np.cumsum(totals["n_tokens"].to_numpy())[:-1]])
    return dict(zip(totals["rid"].astype(int), excl.astype(int)))


def pack_offsets(
    ds: "ray.data.Dataset",
    ctx_len: int = 2048,
    text_col: str = "text",
    range_size: int = 1000,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-doc packing coordinates: (doc_id, n_tokens, start_offset,
    first_window, last_window). ``start_offset`` is the doc's position
    in the concatenated corpus token stream (doc_id order);
    ``first_window``/``last_window`` are the context-window ids its
    tokens land in (empty docs: both = the window at start_offset)."""
    import ray

    off_ref = ray.put(_range_offsets(ds, text_col, range_size))

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        c = _doc_counts(df, text_col)
        c["rid"] = c["doc_id"] // range_size
        if len(c):
            h = pd.util.hash_pandas_object(c["rid"], index=False).to_numpy()
            c["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        else:
            c["__b"] = np.array([], dtype=np.int64)
        return c

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.drop(columns="__b").sort_values(["rid", "doc_id"])
        local = g.groupby("rid", sort=False)["n_tokens"].cumsum() - g["n_tokens"]
        g = g.assign(
            start_offset=(local + g["rid"].map(offs)).astype("int64")
        )
        g["first_window"] = (g["start_offset"] // ctx_len).astype("int64")
        last = (g["start_offset"] + np.maximum(g["n_tokens"] - 1, 0)) // ctx_len
        g["last_window"] = last.astype("int64")
        return g[
            ["doc_id", "n_tokens", "start_offset", "first_window", "last_window"]
        ]

    return (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(scan, batch_format="pandas")
    )


def pack_segments(
    ds: "ray.data.Dataset",
    ctx_len: int = 2048,
    text_col: str = "text",
    range_size: int = 1000,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """The exploded packing plan a training loader consumes:
    (window_id, doc_id, seg_start, seg_len) — for every context window
    a doc overlaps, the doc-local token slice [seg_start, seg_start +
    seg_len) that fills it. Windows per doc = n_tokens/ctx_len + 1 at
    most, so the explosion is stream-sized, produced inside the same
    pass as the scan (no extra exchange). Empty docs emit nothing."""
    offsets = pack_offsets(ds, ctx_len, text_col, range_size, n_buckets)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_tokens"] > 0]
        if not len(df):
            return pd.DataFrame(
                {
                    "window_id": pd.Series([], dtype="int64"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "seg_start": pd.Series([], dtype="int64"),
                    "seg_len": pd.Series([], dtype="int64"),
                }
            )
        n_win = (df["last_window"] - df["first_window"] + 1).to_numpy()
        doc = np.repeat(df["doc_id"].to_numpy(), n_win)
        start = np.repeat(df["start_offset"].to_numpy(), n_win)
        ntok = np.repeat(df["n_tokens"].to_numpy(), n_win)
        first = np.repeat(df["first_window"].to_numpy(), n_win)
        k = np.concatenate([np.arange(m) for m in n_win])
        win = first + k
        seg_start = np.maximum(win * ctx_len - start, 0)
        seg_end = np.minimum((win + 1) * ctx_len, start + ntok) - start
        return pd.DataFrame(
            {
                "window_id": win.astype("int64"),
                "doc_id": doc.astype("int64"),
                "seg_start": seg_start.astype("int64"),
                "seg_len": (seg_end - seg_start).astype("int64"),
            }
        )

    return offsets.map_batches(explode, batch_format="pandas")
