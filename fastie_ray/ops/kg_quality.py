"""KG quality / consistency checks over the materialized edge table —
the validation pass a production KG build runs before publishing:

- **functional-constraint violations**: a predicate expected to be
  functional (one object per subject: birthplace, capital-of) with
  multiple distinct objects for one subject flags either an extraction
  error or a genuine conflict to adjudicate.
- **2-hop relation composition**: the (p1, p2) path census used for
  rule mining / link-prediction candidates (AMIE-style heads).

Both consume the edge AGGREGATE (graph-sized, never corpus-sized):
violations are one hash-bucketed exchange keyed on subject (the edge
table is already distinct per (s, p, o), so the per-group row count IS
the distinct-object count); paths are ONE task-based self-join on the
mid-node plus a predicate-pair census that combines per batch and
merges ≤ |P|² rows on the driver.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.join import hash_join

if TYPE_CHECKING:
    import ray.data


def functional_violations(
    edges: "ray.data.Dataset",
    predicates: list[str] | None = None,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """(subject_id, predicate, n_objects, total_support) rows where a
    (subject, predicate) pair has >1 distinct object. ``predicates``
    restricts the check (None = all predicates are treated as
    functional). Input must be the distinct edge aggregate with an
    ``n_support`` column."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if predicates is not None:
            df = df[df["predicate"].isin(predicates)]
        return df.groupby(["subject_id", "predicate"], as_index=False).agg(
            n_objects=("object_id", "count"), total_support=("n_support", "sum")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["subject_id"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["subject_id", "predicate"], as_index=False
        ).agg(n_objects=("n_objects", "sum"), total_support=("total_support", "sum"))
        out = out[out["n_objects"] > 1]
        return out.astype({"n_objects": "int64", "total_support": "int64"})

    return (
        edges.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def relation_path_census(
    edges: "ray.data.Dataset", n_buckets: int = 16
) -> pd.DataFrame:
    """(p1, p2, n_paths): count of 2-hop paths s -p1-> m -p2-> o over
    the distinct edge set. One mid-node self-join exchange; the census
    combines per batch and the driver merges ≤ |P|² rows."""
    cols = ["subject_id", "predicate", "object_id"]
    j = hash_join(
        edges, edges, on="object_id", right_on="subject_id",
        left_cols=cols, right_cols=cols,
        n_buckets=n_buckets,
    )

    def census(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["predicate", "predicate_r"], as_index=False
        ).agg(n_paths=("subject_id", "count"))

    parts = j.map_batches(census, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"p1": pd.Series([], dtype=object), "p2": pd.Series([], dtype=object),
             "n_paths": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(["predicate", "predicate_r"], as_index=False)[
        "n_paths"
    ].sum()
    out.columns = ["p1", "p2", "n_paths"]
    out["n_paths"] = out["n_paths"].astype("int64")
    return out.sort_values(["p1", "p2"]).reset_index(drop=True)
