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


def shuffle_shards(
    ds: "ray.data.Dataset",
    id_col: str,
    shard_size: int,
    salt: str = "shard:",
    keep_cols: list[str] | None = None,
    range_size: int = 1 << 26,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Global-shuffle shard export — the canonical pretraining-data
    step: give every row a uniform pseudo-random position (md5-grid of
    ``salt + id``), cut the shuffled order into fixed ``shard_size``
    shards, emit ``(…, shard, pos)``.

    Order comes from ``ops.rank.global_rank`` on the 32-bit md5-prefix
    key (per-range count combiner + ONE exchange — never a full sort
    barrier), ties broken by the id itself, so the assignment is
    deterministic, resumable, and SQL-reproducible as
    ``ROW_NUMBER() OVER (ORDER BY md5int(salt||id), id)``. A writer can
    then stream each shard to its own file; shard membership never
    changes across reruns.
    """
    from fastie_ray.ops.rank import global_rank

    keep_cols = list(keep_cols) if keep_cols is not None else [id_col]

    def add_key(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keep_cols].copy()
        out["__shuf"] = [
            int(hashlib.md5((salt + str(v)).encode()).hexdigest()[:8], 16)
            for v in df[id_col]
        ]
        return out

    ranked = global_rank(
        ds.map_batches(add_key, batch_format="pandas"),
        key_col="__shuf",
        tie_col=id_col,
        range_size=range_size,
        n_buckets=n_buckets,
        keep_cols=keep_cols + ["__shuf"],
    )

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keep_cols].copy()
        r = df["rank"].to_numpy() - 1
        out["shard"] = (r // shard_size).astype("int64")
        out["pos"] = (r % shard_size).astype("int64")
        return out

    return ranked.map_batches(cut, batch_format="pandas")
