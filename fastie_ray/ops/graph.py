"""Distributed PageRank over an edge table — the engine's iterative
graph-algorithm family (the brief's "iterative algorithms" custom-op
category; the KG pipeline produces exactly this node/edge shape).

Semantics are FIXED-POINT (integer) PageRank so every step is
order-independent and reproducible bit-for-bit in SQL:

    rank₀(v)   = scale // N
    contrib(e) = rank(src) // outdeg(src)           (integer division)
    dang       = Σ rank(v) over outdeg(v) = 0
    rankᵢ₊₁(v) = ((dden−dnum)·(scale//N)
                  + dnum·(Σ contrib + dang//N)) // dden

with d = dnum/dden (default 85/100). Float PageRank's cross-partition
sums have unspecified addition order; integer sums don't — that is
what makes a driver-level SQL oracle possible (unrolled one CTE pair
per iteration).

Scale shape per iteration (edges never leave their partitioning):
- ONE task-based ``hash_join`` of edges against the node-sized rank
  table on src (all rows of a src co-locate — the hash-join contract);
- contrib partials combine per batch by dst, then ONE bucketed
  exchange merges them with the zero-tagged node table (tag-union —
  carrying outdeg forward costs no extra join) and applies the rank
  update in place.
- the dangling mass and N are driver SCALARS (one tiny aggregate per
  iteration over the node-sized table), never a broadcast of rows.

The rank table is materialized once per iteration — it is node-sized
(two ints per node), orders of magnitude below the edge stream.
"""

from __future__ import annotations

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


def node_table(
    edges: "ray.data.Dataset", n_buckets: int = 32
) -> "ray.data.Dataset":
    """(node, outdeg) over distinct src ∪ dst — per-batch combiner
    (distinct nodes + src counts per batch) then one bucketed final."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        deg = df.groupby("src", as_index=False).agg(outdeg=("dst", "count"))
        deg = deg.rename(columns={"src": "node"})
        sinks = pd.DataFrame(
            {"node": df["dst"].drop_duplicates(), "outdeg": np.int64(0)}
        )
        return pd.concat([deg, sinks], ignore_index=True)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket(df["node"], n_buckets)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("node", as_index=False)["outdeg"].sum()
        out["outdeg"] = out["outdeg"].astype("int64")
        return out

    return (
        edges.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def pagerank(
    edges: "ray.data.Dataset",
    n_iter: int = 3,
    d_num: int = 85,
    d_den: int = 100,
    scale: int = 10**12,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """(node, rank_scaled) after ``n_iter`` fixed-point iterations.
    ``edges`` must be DISTINCT (src, dst) rows — multi-edges would
    count double (dedup upstream with ``dedup_exact`` if needed)."""
    ranks = node_table(edges, n_buckets).materialize()
    n = ranks.count()
    base = scale // n

    def init(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(rank=np.int64(base))

    ranks = ranks.map_batches(init, batch_format="pandas").materialize()

    for _ in range(n_iter):
        dang = int(
            ranks.map_batches(
                lambda df: pd.DataFrame(
                    {"s": [np.int64(df.loc[df["outdeg"] == 0, "rank"].sum())]}
                ),
                batch_format="pandas",
            )
            .to_pandas()["s"]
            .sum()
        )
        joined = hash_join(
            edges, ranks, on="src", right_on="node",
            left_cols=["src", "dst"],
            right_cols=["node", "rank", "outdeg"],
            n_buckets=n_buckets,
        )

        def contrib_partial(df: pd.DataFrame) -> pd.DataFrame:
            c = pd.DataFrame(
                {
                    "node": df["dst"],
                    "contrib": (
                        df["rank"].astype("int64") // df["outdeg"].astype("int64")
                    ),
                }
            )
            out = c.groupby("node", as_index=False)["contrib"].sum()
            out["outdeg"] = np.int64(0)
            return out[["node", "contrib", "outdeg"]]

        def node_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "contrib": np.int64(0),
                    "outdeg": df["outdeg"].astype("int64"),
                }
            )

        def add_b(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__b"] = _bucket(df["node"], n_buckets)
            return df

        def update(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns="__b").groupby("node", as_index=False).agg(
                contrib=("contrib", "sum"), outdeg=("outdeg", "max")
            )
            g["rank"] = (
                (d_den - d_num) * base
                + d_num * (g["contrib"].astype("int64") + dang // n)
            ) // d_den
            g["rank"] = g["rank"].astype("int64")
            g["outdeg"] = g["outdeg"].astype("int64")
            return g[["node", "outdeg", "rank"]]

        both = joined.map_batches(contrib_partial, batch_format="pandas").union(
            ranks.map_batches(node_rows, batch_format="pandas")
        )
        ranks = (
            both.map_batches(add_b, batch_format="pandas")
            .groupby("__b")
            .map_groups(update, batch_format="pandas")
            .materialize()
        )

    return ranks.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"], "rank_scaled": df["rank"].astype("int64")}
        ),
        batch_format="pandas",
    )
