"""Leakage-safe dataset splitting — assign train/val/test by hashing a
GROUP key (site/host/domain), not the row, so near-duplicate documents
from the same origin can never straddle a split boundary (the classic
eval-contamination failure of row-wise random splits).

Deterministic and infrastructure-free: ``bucket = int(md5(salt +
group)[:8], 16) % granularity`` and cumulative-fraction thresholds
assign the split. No shuffle, no state — a pure streaming
``map_batches`` pass, embarrassingly parallel at any scale, and
reproducible in SQL (``CAST('0x' || substr(md5(...), 1, 8) AS
BIGINT)``), so the assignment is auditable after the fact.

Per batch the hash is computed once per DISTINCT group (groups ≪ rows)
and mapped back — the Python md5 loop touches group cardinality, not
row count.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

GRANULARITY = 10_000


def _group_bucket(groups: pd.Series, salt: str) -> pd.Series:
    uniq = pd.unique(groups)
    lut = {
        g: int(hashlib.md5((salt + str(g)).encode()).hexdigest()[:8], 16)
        % GRANULARITY
        for g in uniq
    }
    return groups.map(lut)


def leakage_safe_split(
    ds: "ray.data.Dataset",
    group_col: str,
    fractions: dict[str, float] | None = None,
    salt: str = "split:",
) -> "ray.data.Dataset":
    """Adds ``split_bucket`` (int64 in [0, GRANULARITY)) and ``split``
    (name from ``fractions``, assigned by cumulative thresholds in dict
    order) to every row. All rows sharing ``group_col`` get the same
    split."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(fractions)
    # integer thresholds: cum fraction * GRANULARITY, last forced to top
    cums, acc = [], 0.0
    for n in names:
        acc += fractions[n]
        cums.append(int(round(acc * GRANULARITY)))
    cums[-1] = GRANULARITY

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        b = _group_bucket(df[group_col], salt).astype("int64")
        df["split_bucket"] = b
        idx = np.searchsorted(np.array(cums), b.to_numpy(), side="right")
        df["split"] = np.array(names, dtype=object)[idx]
        return df

    return ds.map_batches(assign, batch_format="pandas")
