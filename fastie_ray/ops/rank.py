"""Distributed global row numbering (the ``zipWithIndex`` /
``ROW_NUMBER() OVER (ORDER BY ...)`` primitive) without a global sort
barrier.

A full ``ds.sort`` materializes a total order only to throw it away
when the consumer just needs each row's POSITION. Instead the order is
decomposed into (coarse value range, position within range):

pass 1: a per-batch combiner emits (rid, n) counts for coarse key
  ranges ``rid = key // range_size`` — the reduced table is bounded by
  the key span / range_size, never corpus rows — and the driver
  exclusive-scans it in rank order into per-range offsets (broadcast
  once via ``ray.put``);
pass 2: ONE rid-bucketed exchange sorts each range locally
  ((key, tie) within rid) and adds the broadcast offset — every row's
  global rank is offset + local position.

Partitioning assumption: all rows of one rid land in one task, so
``range_size`` must be chosen so no single coarse range dwarfs worker
memory (for Zipf-valued keys, shrink ``range_size`` near the head).
Rank ties are broken by ``tie_col``, making output deterministic and
bit-for-bit reproducible as
``ROW_NUMBER() OVER (ORDER BY key [DESC], tie)``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def global_rank(
    ds: "ray.data.Dataset",
    key_col: str,
    tie_col: str,
    descending: bool = False,
    range_size: int = 64,
    n_buckets: int = 16,
    keep_cols: list[str] | None = None,
    rank_col: str = "rank",
) -> "ray.data.Dataset":
    """Assign each row its 1-based global rank by
    ``(key_col [DESC], tie_col)``. Both key and tie must be integral.
    Output columns: ``keep_cols`` (default: key + tie) + ``rank_col``."""
    import ray

    keep_cols = list(keep_cols) if keep_cols is not None else [tie_col, key_col]
    if key_col not in keep_cols:
        keep_cols = keep_cols + [key_col]
    if tie_col not in keep_cols:
        keep_cols = keep_cols + [tie_col]

    def rid_of(keys: pd.Series) -> pd.Series:
        return (keys.astype("int64") // range_size).astype("int64")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"rid": rid_of(df[key_col])})
        return out.groupby("rid", as_index=False).agg(n=("rid", "count"))

    totals = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("rid", as_index=False)["n"]
        .sum()
        .sort_values("rid", ascending=not descending)
    )
    totals["off"] = (totals["n"].cumsum() - totals["n"]).astype("int64")
    offs = {int(r): int(o) for r, o in zip(totals["rid"], totals["off"])}
    off_ref = ray.put(offs)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keep_cols].copy()
        out["__rid"] = rid_of(df[key_col])
        out["__b"] = (
            out["__rid"].to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int64)
        return out

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(off_ref)
        g = g.sort_values(
            ["__rid", key_col, tie_col],
            ascending=[not descending, not descending, True],
        )
        local = g.groupby("__rid", sort=False).cumcount().to_numpy()
        base = np.asarray([o[int(r)] for r in g["__rid"]], dtype=np.int64)
        g = g.drop(columns=["__rid", "__b"])
        g[rank_col] = (base + local + 1).astype("int64")
        return g

    return (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(scan, batch_format="pandas")
    )


def grouped_rank(
    ds: "ray.data.Dataset",
    group_col: str,
    key_col: str,
    tie_col: str,
    descending: bool = False,
    range_size: int = 64,
    n_buckets: int = 16,
    keep_cols: list[str] | None = None,
    rank_col: str = "rank",
) -> "ray.data.Dataset":
    """Per-group global row numbering —
    ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY key [DESC], tie)``
    — with the same no-sort-barrier decomposition as ``global_rank``,
    keyed by (group, coarse range): the count combiner emits one row
    per (group, rid) (bounded by groups × key-span/range_size, never
    corpus rows), the driver exclusive-scans WITHIN each group, and one
    (group, rid)-bucketed exchange ranks locally. Hot groups never
    co-locate whole: a Zipf-headed group spreads across its key ranges,
    so the partitioning assumption is per-(group, rid) volume, not
    per-group volume."""
    import ray

    keep_cols = list(keep_cols) if keep_cols is not None else [group_col, tie_col, key_col]
    for c in (group_col, key_col, tie_col):
        if c not in keep_cols:
            keep_cols = keep_cols + [c]

    def rid_of(keys: pd.Series) -> pd.Series:
        return (keys.astype("int64") // range_size).astype("int64")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"g": df[group_col], "rid": rid_of(df[key_col])})
        return out.groupby(["g", "rid"], as_index=False).agg(n=("rid", "count"))

    totals = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["g", "rid"], as_index=False)["n"]
        .sum()
        .sort_values(["g", "rid"], ascending=[True, not descending])
    )
    grp = totals.groupby("g", sort=False)["n"]
    totals["off"] = (grp.cumsum() - totals["n"]).astype("int64")
    offs = {
        (g, int(r)): int(o)
        for g, r, o in zip(totals["g"], totals["rid"], totals["off"])
    }
    off_ref = ray.put(offs)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keep_cols].copy()
        out["__rid"] = rid_of(df[key_col])
        h = pd.util.hash_pandas_object(
            df[group_col].astype(str) + "\x00" + out["__rid"].astype(str),
            index=False,
        ).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(off_ref)
        g = g.sort_values(
            [group_col, "__rid", key_col, tie_col],
            ascending=[True, not descending, not descending, True],
        )
        local = g.groupby([group_col, "__rid"], sort=False).cumcount().to_numpy()
        base = np.asarray(
            [o[(gv, int(r))] for gv, r in zip(g[group_col], g["__rid"])],
            dtype=np.int64,
        )
        g = g.drop(columns=["__rid", "__b"])
        g[rank_col] = (base + local + 1).astype("int64")
        return g

    return (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(scan, batch_format="pandas")
    )


def grouped_ntile(
    ds: "ray.data.Dataset",
    group_col: str,
    key_col: str,
    tie_col: str,
    k: int,
    descending: bool = False,
    range_size: int = 64,
    n_buckets: int = 16,
    keep_cols: list[str] | None = None,
) -> "ray.data.Dataset":
    """Curriculum bucketing: split each group's key order into ``k``
    equal-share buckets — ``bucket = (rank-1)·k // n_group`` (the
    contiguous-quantile formula; deterministic, unlike SQL NTILE's
    front-loaded remainder, and expressible in SQL as exactly that
    floor arithmetic). Built on ``grouped_rank`` (no sort barrier) plus
    a broadcast group-size map (group-domain-bounded)."""
    import ray

    ranked = grouped_rank(
        ds, group_col, key_col, tie_col,
        descending=descending, range_size=range_size,
        n_buckets=n_buckets, keep_cols=keep_cols,
    )

    def sizes(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(group_col, as_index=False).agg(n=(group_col, "count"))

    totals = (
        ds.map_batches(sizes, batch_format="pandas")
        .to_pandas()
        .groupby(group_col)["n"]
        .sum()
        .to_dict()
    )
    tot_ref = ray.put(totals)

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(tot_ref)
        df = df.copy()
        n_g = df[group_col].map(t).astype("int64")
        df["bucket"] = ((df["rank"] - 1) * k // n_g).astype("int64")
        return df

    return ranked.map_batches(cut, batch_format="pandas")
