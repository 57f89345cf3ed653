"""Sorted-neighborhood blocking for entity resolution — generate
candidate string pairs for the KG linker beyond exact alias hits: sort
the distinct surface vocabulary, pair each value with its successor,
and keep pairs sharing a long common prefix (typo/variant candidates:
"acme corp" / "acme corporation").

Exchange-clean distribution without boundary stitching: a qualifying
pair shares ≥ ``min_prefix`` characters, hence its FIRST character —
and the global sort order restricted to one first-character class is
contiguous — so bucketing by first character, sorting within the
bucket, and pairing in-bucket successors yields EXACTLY the global
successor pairs that can pass the prefix filter (cross-bucket
successors share no prefix and are filtered anyway). One bucketed
exchange over the DISTINCT vocabulary (vocab-bounded, never corpus);
the in-bucket sort is a vectorized pandas sort. SQL-reproducible via
``LEAD() OVER (ORDER BY value)`` + prefix equality.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.dedup import dedup_exact

if TYPE_CHECKING:
    import ray.data


def sorted_neighborhood_pairs(
    ds: "ray.data.Dataset",
    col: str,
    min_prefix: int = 4,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """(a, b, prefix_len) candidate pairs: b is a's successor in the
    globally sorted distinct values of ``col`` and they share ≥
    ``min_prefix`` leading characters. Empty values are ignored."""

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna()
        v = v[v.str.len() > 0].drop_duplicates()
        return pd.DataFrame({"v": v})

    uniq = dedup_exact(
        ds.map_batches(distinct, batch_format="pandas"), ["v"], n_buckets
    )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        # first character IS the co-location key (see module docstring)
        df["__b"] = df["v"].str[0].map(ord).astype("int64") % 251
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one first-char class per group key; sort = the global order
        # restricted to this contiguous class
        out_frames = []
        for _, grp in g.groupby("__b"):
            v = grp["v"].sort_values(kind="mergesort").to_numpy()
            if len(v) < 2:
                continue
            a, b = v[:-1], v[1:]
            plen = np.fromiter(
                (len(_common_prefix(x, y)) for x, y in zip(a, b)),
                dtype=np.int64,
                count=len(a),
            )
            keep = plen >= min_prefix
            out_frames.append(
                pd.DataFrame(
                    {"a": a[keep], "b": b[keep], "prefix_len": plen[keep]}
                )
            )
        if not out_frames:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=object),
                    "b": pd.Series([], dtype=object),
                    "prefix_len": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out_frames, ignore_index=True)

    return (
        uniq.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
    )


def _common_prefix(x: str, y: str) -> str:
    n = min(len(x), len(y))
    i = 0
    while i < n and x[i] == y[i]:
        i += 1
    return x[:i]
