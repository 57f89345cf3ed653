"""Length-bucketed inference batching — the padding-minimizing batch
plan of large-scale model serving: group documents into length buckets
(power-of-two token-count ranges), then assign each doc a deterministic
``(bucket, batch_id, slot)`` so every emitted batch holds same-bucket
docs and pads at most to its bucket ceiling.

Distributed shape = the grouped two-pass prefix scan (``ops.mixture``):
pass 1 reduces per-(bucket, id-range) doc counts (range count is a
granularity knob — the driver offset table is the bounded-small-side
pattern); pass 2 buckets ranges and finishes local rank cumsums in
parallel. Deterministic (rank = position in doc_id order within the
length bucket) and SQL-exact via
``row_number() OVER (PARTITION BY bucket ORDER BY doc_id)``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = r"[A-Za-z0-9]+"


def _len_bucket(n_tokens: np.ndarray) -> np.ndarray:
    """Power-of-two length bucket: 0 for ≤8 tokens, then one per
    doubling (9-16 → 1, 17-32 → 2, ...)."""
    n = np.maximum(n_tokens, 1)
    return np.maximum(np.ceil(np.log2(n / 8.0)), 0).astype(np.int64)


def length_bucketed_batches(
    ds: "ray.data.Dataset",
    batch_size: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    range_size: int = 1000,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """(doc_id, n_tokens, len_bucket, batch_id, slot): docs are ranked
    by id within their length bucket; ``batch_id`` = rank // batch_size
    (globally unique via bucket * 10^6 + local batch), ``slot`` = rank %
    batch_size."""
    import ray

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        n = df[text_col].str.count(_TOKEN_RE).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "n_tokens": n,
                "len_bucket": _len_bucket(n),
                "rid": (df[id_col] // range_size).astype("int64"),
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return counts(df).groupby(["len_bucket", "rid"], as_index=False).agg(
            n=(id_col, "count")
        )

    totals = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["len_bucket", "rid"], as_index=False)["n"]
        .sum()
        .sort_values(["len_bucket", "rid"])
    )
    grp = totals.groupby("len_bucket", sort=False)["n"]
    totals["off"] = (grp.cumsum() - totals["n"]).astype("int64")
    offs = {
        (int(b), int(r)): int(o)
        for b, r, o in zip(totals["len_bucket"], totals["rid"], totals["off"])
    }
    off_ref = ray.put(offs)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        c = counts(df)
        if len(c):
            h = (
                pd.util.hash_pandas_object(c["len_bucket"], index=False).to_numpy()
                ^ pd.util.hash_pandas_object(c["rid"], index=False).to_numpy()
            )
            c["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        else:
            c["__b"] = np.array([], dtype=np.int64)
        return c

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(off_ref)
        g = g.drop(columns="__b").sort_values(["len_bucket", "rid", id_col])
        local = g.groupby(["len_bucket", "rid"], sort=False).cumcount()
        base = np.asarray(
            [o[(int(b), int(r))] for b, r in zip(g["len_bucket"], g["rid"])],
            dtype=np.int64,
        )
        rank = local.to_numpy(dtype=np.int64) + base
        g = g.assign(
            batch_id=(
                g["len_bucket"].to_numpy() * 1_000_000 + rank // batch_size
            ).astype("int64"),
            slot=(rank % batch_size).astype("int64"),
        )
        return g[[id_col, "n_tokens", "len_bucket", "batch_id", "slot"]]

    return (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(scan, batch_format="pandas")
    )
