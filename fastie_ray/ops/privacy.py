"""Noisy aggregate release — the DP-shaped publication step for corpus
statistics (per-group counts released with Laplace noise calibrated to
``sensitivity / epsilon``).

Exact counts reduce with the usual per-batch combiner + one tiny
group-keyed exchange; the noise draw is the md5-grid convention
(``ops/splits``): ``u = (md5int(salt+group) + 0.5) / 2^32`` and the
Laplace inverse CDF ``-b * sign(u-.5) * ln(1 - 2|u-.5|)``. That makes
the release deterministic, resumable, and SQL-auditable.

HONESTY NOTE: deriving the draw from the group key is reproducible
pseudo-noise, not a calibrated DP mechanism — real epsilon-DP needs a
fresh secret random draw per release (swap ``_uniform`` for a CSPRNG
and keep everything else). The pipeline shape (exact combiner +
bounded exchange + pointwise noise) is the production shape either way.
Additionally, ``dp_group_counts`` by default returns the EXACT count
``n`` next to ``n_noisy`` (useful for auditing the mechanism); a frame
containing ``n`` provides ZERO privacy if released. Pass
``release_only=True`` to get a frame with the noisy column only —
that is the only variant that may leave the trust boundary.
"""

from __future__ import annotations

import hashlib
import math
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _uniform(key: str) -> float:
    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return (h + 0.5) / 2.0**32


def laplace_noise(key: str, scale: float) -> float:
    u = _uniform(key) - 0.5
    return -scale * math.copysign(1.0, u) * math.log(1.0 - 2.0 * abs(u))


def dp_group_counts(
    ds: "ray.data.Dataset",
    group_col: str,
    epsilon: float = 1.0,
    sensitivity: float = 1.0,
    salt: str = "dp:",
    n_buckets: int = 8,
    release_only: bool = False,
) -> pd.DataFrame:
    """(group, n, n_noisy): exact count per group plus the
    Laplace(sensitivity/epsilon)-noised release, rounded to 4 decimals.
    One combiner pass + one bucketed exchange; noise is added once per
    GROUP on the reduced table, never per row. Null group keys form
    their own class (SQL GROUP BY semantics). The default frame
    carries the EXACT ``n`` and must never be released as-is (see the
    module HONESTY NOTE); ``release_only=True`` drops ``n``."""
    b = sensitivity / epsilon

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(group_col, dropna=False).size().reset_index(name="n")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df[group_col].astype(str), index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.drop(columns="__b")
            .groupby(group_col, as_index=False, dropna=False)["n"]
            .sum()
        )
        out["n"] = out["n"].astype("int64")
        out["n_noisy"] = [
            round(n + laplace_noise(salt + str(k), b), 4)
            for k, n in zip(out[group_col], out["n"])
        ]
        return out

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        out = pd.DataFrame(
            {
                group_col: pd.Series([], dtype=str),
                "n": pd.Series([], dtype="int64"),
                "n_noisy": pd.Series([], dtype="float64"),
            }
        )
    out = out.sort_values(group_col).reset_index(drop=True)
    if release_only:
        out = out.drop(columns=["n"])
    return out


def k_anonymity_audit(
    ds: "ray.data.Dataset",
    quasi_cols: list[str],
    k: int = 5,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """k-anonymity audit (Sweeney 2002): rows whose quasi-identifier
    combination is shared by fewer than ``k`` records are re-
    identifiable — the release gate a privacy review runs before
    publishing microdata. Returns the RISKY equivalence classes
    (quasi values + ``n_rows < k``); the publisher suppresses or
    generalizes exactly these.

    Scale shape: per-batch combiner on the quasi tuple → ONE bucketed
    exchange summing group sizes with the ``< k`` filter applied
    inside it — only risky classes (rare by definition) leave the
    exchange; the corpus never does. Null quasi values form their own
    equivalence classes (``dropna=False`` / SQL GROUP BY semantics) —
    a release gate that silently skipped null-bearing rows would leave
    exactly those rows unaudited."""
    quasi_cols = list(quasi_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(quasi_cols, dropna=False).size().reset_index(name="n_rows")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        key = df[quasi_cols[0]].astype(str)
        for c in quasi_cols[1:]:
            key = key + "\x00" + df[c].astype(str)
        h = pd.util.hash_pandas_object(key, index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            quasi_cols, as_index=False, dropna=False
        )["n_rows"].sum()
        out = out[out["n_rows"] < k]
        out["n_rows"] = out["n_rows"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def l_diversity_audit(
    ds: "ray.data.Dataset",
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """l-diversity audit (Machanavajjhala 2007) — k-anonymity's
    companion: an equivalence class whose SENSITIVE attribute takes
    fewer than ``l`` distinct values leaks it even when the class is
    large (homogeneity attack). Returns the risky classes
    (quasi values, class size, n_sensitive < l).

    Distinct (quasi, sensitive) combiner + class-size combiner → ONE
    quasi-bucketed exchange counting both; only risky classes leave.
    Null quasi values form their own equivalence classes
    (``dropna=False`` / SQL GROUP BY); null SENSITIVE values count
    toward class size but not toward ``n_sensitive`` (SQL
    COUNT(DISTINCT) semantics), so an all-null-sensitive class reports
    n_sensitive=0 and is flagged."""
    quasi_cols = list(quasi_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(quasi_cols + [sensitive_col], dropna=False)
            .size()
            .reset_index(name="n_rows")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        key = df[quasi_cols[0]].astype(str)
        for c in quasi_cols[1:]:
            key = key + "\x00" + df[c].astype(str)
        h = pd.util.hash_pandas_object(key, index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").groupby(
            quasi_cols + [sensitive_col], as_index=False, dropna=False
        )["n_rows"].sum()
        out = g.groupby(quasi_cols, as_index=False, dropna=False).agg(
            n_rows=("n_rows", "sum"),
            n_sensitive=(sensitive_col, "nunique"),
        )
        out = out[out["n_sensitive"] < l]
        return out.astype({"n_rows": "int64", "n_sensitive": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
