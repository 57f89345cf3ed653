"""Domain-mixture construction: cap each source's contribution to the
training corpus at a token budget (the mixture-reweighting step of
DoReMi/Pile-style pre-training data assembly — downsample
over-represented domains, keep the rest whole).

Selection rule (deterministic, order-independent to compute): within
each source, docs are taken in doc_id order while the source's
RUNNING token total (inclusive of the candidate doc) stays within the
budget; the first doc that would overflow — and everything after it —
is dropped. The rule is a per-group prefix sum, so the whole operator
is the grouped variant of ``ops.packing``'s two-pass distributed scan:

pass 1: per-batch combiner emits (source, rid, token_sum) for
  contiguous ``doc_id // range_size`` ranges; the reduced
  (sources × ranges) table — bounded by a chosen granularity, never
  corpus rows — is exclusively scanned per source on the driver and
  broadcast once;
pass 2: ONE (source, rid)-bucketed exchange computes each doc's
  in-source prefix inclusive total (local sort + cumsum + broadcast
  offset) and keeps rows with ``running <= budget[source]``. A hot
  source splits across ranges, so no partition holds more than one
  (source, range) of rows.

Reproducible bit-for-bit in SQL:
``SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) <= budget``.
Token counting matches ``ops.text_index`` (ASCII ``[A-Za-z0-9]+``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Mapping

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = r"[A-Za-z0-9]+"


def budget_sample(
    ds: "ray.data.Dataset",
    budgets: Mapping[str, int],
    default_budget: int | None = None,
    source_col: str = "source",
    text_col: str = "text",
    range_size: int = 1000,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Keep (doc_id, source, n_tokens, running) rows whose in-source
    running token total stays within ``budgets[source]`` (sources
    missing from ``budgets`` use ``default_budget``; None = unlimited)."""
    import ray

    budgets = dict(budgets)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "source": df[source_col],
                "n_tokens": df[text_col].str.count(_TOKEN_RE).astype("int64"),
                "rid": (df["doc_id"] // range_size).astype("int64"),
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return counts(df).groupby(["source", "rid"], as_index=False)[
            "n_tokens"
        ].sum()

    totals = (
        ds.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby(["source", "rid"], as_index=False)["n_tokens"]
        .sum()
        .sort_values(["source", "rid"])
    )
    grp = totals.groupby("source", sort=False)["n_tokens"]
    totals["off"] = (grp.cumsum() - totals["n_tokens"]).astype("int64")
    offs = {
        (s, int(r)): int(o)
        for s, r, o in zip(totals["source"], totals["rid"], totals["off"])
    }
    off_ref = ray.put(offs)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        c = counts(df)
        if len(c):
            h = (
                pd.util.hash_pandas_object(c["source"], index=False).to_numpy()
                ^ pd.util.hash_pandas_object(c["rid"], index=False).to_numpy()
            )
            c["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        else:
            c["__b"] = np.array([], dtype=np.int64)
        return c

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        o = ray.get(off_ref)
        g = g.drop(columns="__b").sort_values(["source", "rid", "doc_id"])
        local = (
            g.groupby(["source", "rid"], sort=False)["n_tokens"].cumsum()
        )
        base = [o[(s, int(r))] for s, r in zip(g["source"], g["rid"])]
        g = g.assign(running=(local + np.asarray(base, dtype=np.int64)))
        g["running"] = g["running"].astype("int64")
        cap = g["source"].map(
            lambda s: budgets.get(s, default_budget)
        )
        keep = cap.isna() | (g["running"] <= cap.fillna(np.iinfo(np.int64).max).astype("int64"))
        return g[keep][["doc_id", "source", "n_tokens", "running"]]

    return (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(scan, batch_format="pandas")
    )
