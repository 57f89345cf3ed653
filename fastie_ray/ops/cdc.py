"""Change-data-capture merge (the lakehouse MERGE INTO primitive):
apply a change log (upserts + deletes, latest change per key wins) onto
a base table — the incremental-refresh step that keeps a 100-TB derived
table (KG node/edge state, dedup registry, feature store) current
without recomputing it (complements ``pipelines.kg.merge_edge_aggregates``,
which is additive-only).

Scale shape: ONE tag-union exchange on hash(key) — base and change
rows co-locate per key bucket; the final task reduces the change log
to its latest row per key (sort + drop_duplicates, vectorized) and
emits surviving base rows + upserts. No Acero join actors, no driver
materialization; output is corpus-sized and streams.

Semantics (deterministic, SQL-reproducible):
- latest change per key = max (ts, seq) — seq breaks timestamp ties;
- latest op 'delete'  → key absent from the output;
- latest op 'upsert'  → the change's payload replaces the base row
  (keys absent from base become inserts);
- keys with no change → base row passes through unchanged.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def cdc_apply(
    base: "ray.data.Dataset",
    changes: "ray.data.Dataset",
    key_col: str,
    payload_cols: list[str],
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """MERGE the latest change per key onto ``base``; returns the new
    table with columns [key_col] + payload_cols."""
    out_cols = [key_col] + list(payload_cols)

    def tag_base(df: pd.DataFrame) -> pd.DataFrame:
        out = df[out_cols].copy()
        out[ts_col] = pd.NaT
        out[seq_col] = np.int64(0)
        out[op_col] = None
        out["__side"] = "b"
        return _add_b(out, key_col, n_buckets)

    def tag_chg(df: pd.DataFrame) -> pd.DataFrame:
        out = df[out_cols + [ts_col, seq_col, op_col]].copy()
        out["__side"] = "c"
        return _add_b(out, key_col, n_buckets)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        b = g[g["__side"] == "b"]
        c = g[g["__side"] == "c"]
        last = (
            c.sort_values([ts_col, seq_col], ascending=False)
            .drop_duplicates(subset=[key_col])
        )
        changed = set(last[key_col])
        keep = b[~b[key_col].isin(changed)][out_cols]
        ups = last[last[op_col] == "upsert"][out_cols]
        out = pd.concat([keep, ups], ignore_index=True)
        return out

    tagged = base.map_batches(tag_base, batch_format="pandas").union(
        changes.map_batches(tag_chg, batch_format="pandas")
    )
    return tagged.groupby("__b").map_groups(merge_bucket, batch_format="pandas")


def _add_b(df: pd.DataFrame, key_col: str, n_buckets: int) -> pd.DataFrame:
    if len(df) == 0:
        df["__b"] = np.array([], dtype=np.int64)
        return df
    h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
    df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
    return df


def asof_state(
    base: "ray.data.Dataset",
    changes: "ray.data.Dataset",
    key_col: str,
    payload_cols: list[str],
    as_of,
    ts_col: str = "ts",
    seq_col: str = "seq",
    op_col: str = "op",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Time travel: the table state AS OF ``as_of`` — ``cdc_apply``
    restricted to changes with ``ts <= as_of`` (the lakehouse
    ``SELECT … FOR TIMESTAMP AS OF`` read). Pushing the timestamp
    filter BEFORE the exchange means the merge only ships the change
    prefix, so reading an old snapshot gets cheaper, not costlier."""

    def upto(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[ts_col] <= as_of]

    return cdc_apply(
        base,
        changes.map_batches(upto, batch_format="pandas"),
        key_col,
        payload_cols,
        ts_col=ts_col,
        seq_col=seq_col,
        op_col=op_col,
        n_buckets=n_buckets,
    )
