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


def kfold_assign(
    ds: "ray.data.Dataset",
    group_col: str,
    k: int = 5,
    salt: str = "fold:",
) -> "ray.data.Dataset":
    """LEAKAGE-SAFE k-fold cross-validation assignment: adds ``fold``
    (int64 in [0, k)) with every row of a ``group_col`` value (site,
    host, author) in the SAME fold, so no group straddles a train/eval
    boundary — the CV analogue of :func:`leakage_safe_split`.
    Exchange-free (md5 of the group key per batch) and auditable in
    ANSI SQL: fold = md5(salt || group)[:8] as int % k."""

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        uniq = pd.unique(df[group_col])
        lut = {
            g: int(hashlib.md5((salt + str(g)).encode()).hexdigest()[:8], 16)
            % k
            for g in uniq
        }
        df["fold"] = df[group_col].map(lut).astype("int64")
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


def split_leakage_audit(
    pairs: "ray.data.Dataset",
    fractions: dict[str, float] | None = None,
    salt: str = "split:",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
) -> pd.DataFrame:
    """Contamination audit: count near-duplicate pairs whose endpoints
    landed in DIFFERENT splits under a row-keyed assignment — the check
    that proves (or disproves) a split is leakage-safe. Group-hashed
    splits score zero here by construction; row-hashed splits of a
    dup-heavy corpus leak, and this measures how much.

    Each endpoint's split is recomputed from the pure md5 grid (no join
    — assignment is a function, not a table); a per-batch combiner
    reduces to the splits × splits matrix and the driver merges
    blocks × |matrix| rows. Returns (split_a, split_b, n_pairs) with
    split_a ≤ split_b (unordered pair orientation), leaks = rows with
    split_a ≠ split_b."""
    fractions = fractions or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(fractions)
    cums, acc = [], 0.0
    for n in names:
        acc += fractions[n]
        cums.append(int(round(acc * GRANULARITY)))
    cums[-1] = GRANULARITY
    edges = np.array(cums)

    def split_of(ids: pd.Series) -> np.ndarray:
        b = _group_bucket(ids, salt).to_numpy()
        return np.array(names, dtype=object)[np.searchsorted(edges, b, side="right")]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sa = split_of(df[a_col])
        sb = split_of(df[b_col])
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        out = pd.DataFrame({"split_a": lo, "split_b": hi})
        return out.groupby(["split_a", "split_b"], as_index=False).agg(
            n_pairs=("split_a", "count")
        )

    parts = pairs.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "split_a": pd.Series([], dtype=str),
                "split_b": pd.Series([], dtype=str),
                "n_pairs": pd.Series([], dtype="int64"),
            }
        )
    out = parts.groupby(["split_a", "split_b"], as_index=False)["n_pairs"].sum()
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.sort_values(["split_a", "split_b"]).reset_index(drop=True)


def purged_time_folds(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    id_col: str = "event_id",
    k: int = 4,
    embargo_us: int = 6 * 3600 * 1_000_000,
    purge_us: int = 0,
    range_size: int = 10**11,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Leakage-safe time-series cross-validation audit — purge +
    embargo (the López-de-Prado CV shape the financial-ML and
    forecasting stacks use): folds are CONTIGUOUS time blocks
    (``fold = (rank-1)·k // N`` over the (ts, id) global rank — the
    deterministic floor formula ``grouped_ntile`` uses), and for each
    test fold:

    - **embargo**: candidate training rows in ``[fold_max_ts,
      fold_max_ts + embargo]`` are EXCLUDED (they leak the test
      period's immediate future into training). Tie rule: the lower
      bound is INCLUSIVE (``ts >= fold_max_ts``), so a later-fold row
      sharing the fold-boundary timestamp is embargoed, not trained
      (ADVICE r4).
    - **purge** (``purge_us`` > 0, the label-horizon half): an
      earlier-fold row whose label window ``[ts, ts + purge_us]``
      crosses the fold's lower boundary (``ts <= prev_fold_max_ts <
      ts + purge_us``) has its label computed FROM the test period —
      purged from training. ``purge_us=0`` disables (point labels).
      Purge wins over embargo when massive boundary ties make both
      apply.

    Emits the integer audit (test_fold, n_test, n_purged, n_embargo,
    n_train) — per-row role assignment is the same broadcast
    comparison, materialized here as exact counts. Raises ``ValueError``
    when ``k`` exceeds the row count (a fold would be empty).

    Scale shape: one ``global_rank`` pass (no sort barrier — coarse
    time-range combiner + one bucketed exchange; ``range_size`` in ts
    units bounds the per-range task), a k-row fold-boundary combiner
    broadcast back, then one streaming counting pass (k·blocks partial
    rows). Nothing corpus-sized moves."""
    import ray

    from fastie_ray.ops.rank import global_rank

    def to_int(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ts_us": df[ts_col].astype("datetime64[us]").astype("int64")
            if not pd.api.types.is_integer_dtype(df[ts_col])
            else df[ts_col].astype("int64"),
            id_col: df[id_col].astype("int64"),
        })

    ints = ds.map_batches(to_int, batch_format="pandas")
    n_total = ints.count()
    if n_total < k:
        raise ValueError(
            f"purged_time_folds: k={k} folds over n_total={n_total} rows "
            "would leave a fold empty — lower k or supply more rows"
        )
    ranked = global_rank(
        ints, "ts_us", id_col, range_size=range_size, n_buckets=n_buckets,
    )

    def fold_of(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["fold"] = ((df["rank"] - 1) * k // n_total).astype("int64")
        return df[["ts_us", id_col, "fold"]]

    folded = ranked.map_batches(fold_of, batch_format="pandas").materialize()

    # k-row boundary table (combiner -> driver -> broadcast)
    def hi_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("fold", as_index=False).agg(hi=("ts_us", "max"))

    his = (
        folded.map_batches(hi_partial, batch_format="pandas")
        .to_pandas().groupby("fold")["hi"].max().to_dict()
    )
    hi_ref = ray.put(his)

    def count_roles(df: pd.DataFrame) -> pd.DataFrame:
        hi = ray.get(hi_ref)
        rows = []
        ts = df["ts_us"].to_numpy()
        fold = df["fold"].to_numpy()
        for f in range(k):
            in_f = fold == f
            if f > 0 and purge_us > 0:
                lo = hi[f - 1]
                purge = (~in_f) & (ts <= lo) & (ts + purge_us > lo)
            else:
                purge = np.zeros(len(ts), dtype=bool)
            emb = (
                (~in_f) & ~purge
                & (ts >= hi[f]) & (ts <= hi[f] + embargo_us)
            )
            rows.append((f, int(in_f.sum()), int(purge.sum()),
                         int(emb.sum()),
                         int((~in_f & ~purge & ~emb).sum())))
        return pd.DataFrame(
            rows,
            columns=["test_fold", "n_test", "n_purged", "n_embargo",
                     "n_train"],
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("test_fold", as_index=False).sum()
        return out.astype("int64")

    return (
        folded.map_batches(count_roles, batch_format="pandas")
        .map_batches(
            lambda df: df.assign(__b=df["test_fold"] % 4),
            batch_format="pandas",
        )
        .groupby("__b")
        .map_groups(
            lambda g: final(g.drop(columns="__b")), batch_format="pandas"
        )
    )
