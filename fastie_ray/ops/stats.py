"""Distribution statistics over a column: exact value counts and exact
discrete quantiles — the corpus-profiling step of a data pipeline
(length/score distributions drive chunking, filtering and sampling
decisions; no reference counterpart).

Scale shape: a (value, count) aggregate is bounded by the DISTINCT
value domain, not the corpus — for the columns this targets (lengths,
integer scores, bucketed floats) that domain is small by construction,
so the combiner → coarse-bucket final → tiny driver cumsum shape is
exact AND shuffle-light. For genuinely continuous columns, quantize
first (the caller picks the resolution); quantiles of the quantized
column are then exact for the stated resolution. This avoids both a
global sort (all-to-all over the corpus) and an approximate sketch
(not oracle-checkable).

Quantile semantics match SQL ``quantile_disc`` / ``percentile_disc``:
the smallest value whose cumulative distribution reaches q, with the
boundary k = ceil(q·n) computed in EXACT integer arithmetic
(``Fraction``) — no float-boundary off-by-ones."""

from __future__ import annotations

from fractions import Fraction
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def value_counts(
    ds: "ray.data.Dataset",
    col: str,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """(value, n) exact counts; the exchange carries one row per
    distinct value per batch (combiner-first)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(col, as_index=False).size()
        return out.rename(columns={"size": "n"})

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(col, as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def exact_quantiles(
    ds: "ray.data.Dataset",
    col: str,
    qs: list[float],
    n_buckets: int = 16,
) -> pd.DataFrame:
    """(q, value) discrete quantiles: value-count aggregate → driver
    cumsum over the (domain-bounded) distinct values. ``qs`` values
    are parsed as exact decimals so boundary cases (q·n integral)
    match SQL percentile_disc bit-for-bit."""
    counts = value_counts(ds, col, n_buckets).to_pandas()
    counts = counts.sort_values(col).reset_index(drop=True)
    cum = counts["n"].cumsum().to_numpy()
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        f = Fraction(str(q))
        k = -(-(f.numerator * n) // f.denominator)  # ceil(q*n), exact
        k = min(max(1, k), n)
        idx = int(np.searchsorted(cum, k, side="left"))
        out_q.append(float(q))
        out_v.append(counts[col].iloc[idx])
    return pd.DataFrame({"q": np.array(out_q, dtype=np.float64), "value": out_v})
