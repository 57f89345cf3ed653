"""Time-windowed aggregates and top-k over the events table.

The reference has NO streaming/window features (SURVEY §2.9) — these
are the engine-side additions a web-scale pipeline needs (the custom-
operator family of the brief): a tumbling window is just a computed
window-start key + the standard partial→bucketed-final aggregate, and
top-k is partial per-batch aggregation followed by a tiny driver-side
sort (never a global sort of the raw stream).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def tumbling_window_agg(
    ds: "ray.data.Dataset",
    freq: str = "1h",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Tumbling-window counts and sums per (window_start, key):
    window assignment is a vectorized ``dt.floor`` inside the partial
    combiner — the shuffle only ever sees one row per (window, key)
    per batch."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "window_start": df[ts_col].dt.floor(freq),
                key_col: df[key_col],
                value_col: df[value_col],
            }
        )
        return out.groupby(["window_start", key_col], as_index=False).agg(
            n_events=(value_col, "count"), sum_value=(value_col, "sum")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["window_start"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["window_start", key_col], as_index=False
        ).agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        out["sum_value"] = out["sum_value"].round(4)
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def top_k_by_sum(
    ds: "ray.data.Dataset",
    k: int = 10,
    key_col: str = "user_id",
    value_col: str = "value",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Top-k keys by total value: per-batch combiner → bucketed exact
    per-key totals → per-bucket local top-k → driver-side merge of
    ``n_buckets × k`` candidate rows (never the full key space).
    Deterministic tie-break on the key."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key_col, as_index=False).agg(
            sum_value=(value_col, "sum")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(key_col, as_index=False)[
            "sum_value"
        ].sum()
        out = out.sort_values(
            ["sum_value", key_col], ascending=[False, True]
        ).head(k)
        return out

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(local_topk, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(["sum_value", key_col], ascending=[False, True]).head(k)
    cand["sum_value"] = cand["sum_value"].round(4)
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand.reset_index(drop=True)
