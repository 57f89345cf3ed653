"""Deterministic sampling and per-group selection operators for
training-corpus curation (engine-side additions; the reference has no
sampling surface beyond UIE negative sampling, `fastie/data/uie/`).

Design points for 100-TB inputs:
- sampling is HASH-deterministic (md5 of the id), never RNG-state
  dependent — a resumed or re-sharded run selects the identical rows,
  and the selection is reproducible in ANSI SQL for auditing;
- stratified rates ride in a broadcast dict (strata are vocabulary-
  bounded: language, source, quality bin), so the filter is one
  embarrassingly-parallel `map_batches` with NO shuffle;
- grouped top-k is per-batch local top-k (combiner) → one bucketed
  exchange on the group key → per-group final top-k: the exchange
  carries at most ``k × n_groups_per_batch`` rows per input batch,
  never the corpus.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

# md5-prefix width used for rate thresholds: 4 hex chars = 16 bits.
_PREFIX_BITS = 16
_PREFIX_CHARS = 4


def rate_threshold(rate: float) -> str:
    """Hex-string threshold T such that ``md5(id)[:4] < T`` keeps a
    ``rate`` fraction of uniformly-hashed ids (granularity 1/65536).
    String comparison of lowercase hex is identical in Python and SQL,
    so the same predicate is expressible in DuckDB for the oracle."""
    ticks = int(round(rate * (1 << _PREFIX_BITS)))
    ticks = max(0, min(1 << _PREFIX_BITS, ticks))
    if ticks >= 1 << _PREFIX_BITS:
        return "g"  # sorts after every 4-char hex string: keep-all
    return format(ticks, "04x")


def _md5_prefix(ids: pd.Series) -> np.ndarray:
    return np.array(
        [hashlib.md5(s.encode("utf-8")).hexdigest()[:_PREFIX_CHARS]
         for s in ids.astype(str)],
        dtype=object,
    )


def hash_sample(
    ds: "ray.data.Dataset",
    rate: float,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Uniform deterministic sample: keep rows with
    ``md5(str(id))[:4] < rate_threshold(rate)``. Shuffle-free."""
    thr = rate_threshold(rate)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        pref = _md5_prefix(df[id_col])
        return df[pref < thr].reset_index(drop=True)

    return ds.map_batches(keep, batch_format="pandas")


def stratified_sample(
    ds: "ray.data.Dataset",
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> "ray.data.Dataset":
    """Per-stratum deterministic sample (e.g. downsample head languages,
    keep all of tail ones): ``rates`` maps stratum value → keep rate.
    Strata are vocab-bounded, so the thresholds travel as a plain
    closure-captured dict (broadcast with the task); no shuffle."""
    thr = {s: rate_threshold(r) for s, r in rates.items()}
    thr_default = rate_threshold(default_rate)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        pref = _md5_prefix(df[id_col])
        limits = df[stratum_col].map(lambda s: thr.get(s, thr_default)).to_numpy()
        return df[pref < limits].reset_index(drop=True)

    return ds.map_batches(keep, batch_format="pandas")


def class_balanced_sample(
    ds: "ray.data.Dataset",
    label_col: str,
    id_col: str,
    per_class: int = 50,
    n_buckets: int = 8,
    salt: str = "bal:",
) -> "ray.data.Dataset":
    """CLASS-BALANCED downsampling: keep at most ``per_class`` rows per
    label, selected by md5 rank (deterministic, resume-stable, and
    SQL-auditable: row_number() over (partition by label order by
    md5(salt || id), id) ≤ per_class). The skew-killer for long-tailed
    label distributions before classifier training.

    Scale shape: a hot class never co-locates in full — each batch
    keeps its local ``per_class`` smallest (md5, id) rows per label
    (combiner), so the exchange carries ≤ batches × labels ×
    per_class rows; the per-label final selection happens in one
    label-keyed exchange."""
    import ray.data  # noqa: F401

    from fastie_ray.state.exchange import BlockSet

    def local(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "label": df[label_col].to_numpy(),
                "id": df[id_col].astype("int64"),
            }
        )
        out["h"] = np.array(
            [hashlib.md5((salt + str(i)).encode()).hexdigest()
             for i in out["id"]],
            dtype=object,
        )
        out = out.sort_values(["label", "h", "id"], kind="mergesort")
        return out.groupby("label", sort=False).head(per_class)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["label", "h", "id"], kind="mergesort")
        out = g.groupby("label", sort=False).head(per_class)
        return out[["label", "id"]].reset_index(drop=True)

    return (
        BlockSet.from_dataset(ds)
        .exchange(["label"], final, n_buckets=n_buckets, map_fn=local)
        .to_dataset()
    )


def grouped_topk(
    ds: "ray.data.Dataset",
    k: int,
    group_col: str = "lang",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    extra_cols: list[str] | None = None,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Top-k rows per group by ``value_col`` desc (ties broken by
    ``id_col`` asc — deterministic, SQL ``row_number()`` reproducible).

    Combiner-first: each batch emits its own per-group top-k, the
    bucketed exchange on the group key sees ≤ k rows per (group, batch),
    and the per-bucket final re-ranks exactly. Output columns:
    group, id, value (+ extra_cols), rank (1-based)."""
    cols = [group_col, id_col, value_col] + list(extra_cols or [])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].sort_values(
            [group_col, value_col, id_col], ascending=[True, False, True]
        )
        return df.groupby(group_col, as_index=False, sort=False).head(k)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values(
            [group_col, value_col, id_col], ascending=[True, False, True]
        )
        out = g.groupby(group_col, as_index=False, sort=False).head(k).copy()
        out["rank"] = out.groupby(group_col, sort=False).cumcount() + 1
        out["rank"] = out["rank"].astype("int64")
        return out

    return (
        ds.map_batches(local_topk, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def systematic_resample(
    ds: "ray.data.Dataset",
    weight_col: str,
    m: int,
    id_col: str = "doc_id",
    range_size: int = 1000,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Deterministic systematic resampling (the selection step of
    importance resampling): over docs in ``id_col`` order with integer
    weights ``w``, doc i receives

        n_copies = floor(cum_i * m / W) - floor((cum_i - w_i) * m / W)

    copies (``cum_i`` = inclusive weight prefix sum, ``W`` = total) —
    the zero-offset systematic sampler: expected multiplicity
    proportional to weight, integer-exact, reproducible as a SQL
    window function ``sum(w) OVER (ORDER BY id)``.

    Distributed shape = the two-pass prefix scan (``ops.packing``):
    pass 1 reduces per-RANGE weight totals (range count is a knob, not
    data-sized — the driver table is the bounded-small-side pattern),
    pass 2 buckets ranges and finishes local cumsums in parallel; rows
    with ``n_copies = 0`` are dropped in-task. No global sort.
    Requires non-negative integer weights and ids unique per row."""
    import ray

    def wpartial(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.DataFrame(
            {
                "rid": (df[id_col] // range_size).astype("int64"),
                "w": df[weight_col].astype("int64"),
            }
        )
        return c.groupby("rid", as_index=False)["w"].sum()

    totals = (
        ds.map_batches(wpartial, batch_format="pandas")
        .to_pandas()
        .groupby("rid", as_index=False)["w"]
        .sum()
        .sort_values("rid")
    )
    grand = int(totals["w"].sum())
    if grand <= 0:
        raise ValueError("systematic_resample needs positive total weight")
    excl = np.concatenate([[0], np.cumsum(totals["w"].to_numpy())[:-1]])
    off_ref = ray.put(dict(zip(totals["rid"].astype(int), excl.astype(int))))

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        c = pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "w": df[weight_col].astype("int64"),
            }
        )
        c["rid"] = (c[id_col] // range_size).astype("int64")
        if len(c):
            h = pd.util.hash_pandas_object(c["rid"], index=False).to_numpy()
            c["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        else:
            c["__b"] = np.array([], dtype=np.int64)
        return c

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.drop(columns="__b").sort_values(["rid", id_col])
        local = g.groupby("rid", sort=False)["w"].cumsum()
        cum = (local + g["rid"].map(offs)).to_numpy(dtype=np.int64)
        w = g["w"].to_numpy(dtype=np.int64)
        n = (cum * m) // grand - ((cum - w) * m) // grand
        out = pd.DataFrame(
            {id_col: g[id_col], "weight": w, "n_copies": n.astype("int64")}
        )
        return out[out["n_copies"] > 0]

    return (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(scan, batch_format="pandas")
    )


def bottom_k_sample(
    ds: "ray.data.Dataset",
    k: int,
    id_col: str,
    keep_cols: list[str] | None = None,
    salt: str = "bk:",
) -> pd.DataFrame:
    """EXACT-size uniform sample without a shuffle: keep the k rows
    with the smallest ``md5(salt + id)`` values — the bottom-k sketch
    (each batch pre-reduces to its local bottom-k, the driver merges
    ``blocks × k`` candidate rows). Unlike ``hash_sample`` (rate-based,
    size varies), the sample size is exactly ``min(k, n)``; unlike
    ``ds.random_shuffle().limit(k)`` there is no exchange at all.
    Deterministic and SQL-reproducible (``ORDER BY md5int, id LIMIT k``).
    The same bottom-k values double as a set-similarity sketch (the
    k-minimum-values distinct estimator)."""
    import hashlib

    keep_cols = list(keep_cols) if keep_cols is not None else [id_col]

    def local_bk(df: pd.DataFrame) -> pd.DataFrame:
        out = df[keep_cols].copy()
        out["__h"] = [
            int(hashlib.md5((salt + str(v)).encode()).hexdigest()[:8], 16)
            for v in df[id_col]
        ]
        return out.sort_values(["__h", id_col]).head(k)

    cand = ds.map_batches(local_bk, batch_format="pandas").to_pandas()
    out = cand.sort_values(["__h", id_col]).head(k).drop(columns="__h")
    return out.reset_index(drop=True)


def grouped_bottom_k_sample(
    ds: "ray.data.Dataset",
    k: int,
    group_col: str,
    id_col: str,
    salt: str = "gbk:",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """EXACT-size uniform sample PER GROUP (stratified reservoir): keep
    each group's k rows with the smallest ``md5(salt + id)`` — the
    per-group bottom-k sketch.  Same combiner-first shape as
    ``grouped_topk`` (each batch pre-reduces to its own per-group
    bottom-k, the single bucketed exchange on the group key sees at
    most k rows per (group, batch)), so a hot group never concentrates
    raw rows.  Unlike ``stratified_sample`` (rate-based, size varies)
    the per-group size is exactly ``min(k, n_g)``.  Deterministic and
    SQL-reproducible: ``row_number() OVER (PARTITION BY group ORDER BY
    md5int, id) <= k``.  Output: (group, id, rank)."""
    import hashlib

    def local_bk(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group_col, id_col]].copy()
        out["__h"] = np.array(
            [
                int(hashlib.md5((salt + str(v)).encode()).hexdigest()[:8], 16)
                for v in df[id_col]
            ],
            dtype=np.int64,
        )
        out = out.sort_values([group_col, "__h", id_col])
        return out.groupby(group_col, as_index=False, sort=False).head(k)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values([group_col, "__h", id_col])
        out = g.groupby(group_col, as_index=False, sort=False).head(k).copy()
        out["rank"] = (
            out.groupby(group_col, sort=False).cumcount() + 1
        ).astype("int64")
        return out.drop(columns="__h")

    return (
        ds.map_batches(local_bk, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def proportional_sample(
    ds: "ray.data.Dataset",
    total_k: int,
    group_col: str,
    id_col: str,
    salt: str = "prop:",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """EXACT proportional stratified allocation: a total budget of
    ``total_k`` rows split across strata by the LARGEST-REMAINDER
    (Hamilton) method — ⌊total_k·n_g/N⌋ each, the leftover seats going
    to the biggest remainders (ties → larger group, then group asc) —
    then each stratum's exact quota drawn with the per-group bottom-k
    md5 sketch. Deterministic end-to-end, so the SQL oracle replays
    both the apportionment arithmetic and the draw.

    Scale shape: group sizes via a per-batch combiner merged on the
    driver (STRATA-bounded, the established group-table contract); the
    draw is one group-bucketed exchange where each batch pre-reduces
    to its own per-group bottom-max(k_g) rows. Output
    (group, id, rank ≤ k_g)."""
    import hashlib

    import ray

    sizes = (
        ds.map_batches(
            lambda df: df.groupby(group_col, as_index=False).agg(
                n=(group_col, "count")
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(group_col, as_index=False)["n"]
        .sum()
    )
    n_total = int(sizes["n"].sum())
    base = (sizes["n"] * total_k) // n_total
    rem_num = sizes["n"] * total_k - base * n_total  # remainder · N
    order = sizes.assign(base=base, rem=rem_num).sort_values(
        ["rem", "n", group_col], ascending=[False, False, True]
    )
    leftover = total_k - int(base.sum())
    order["extra"] = 0
    order.iloc[:leftover, order.columns.get_loc("extra")] = 1
    k_map = {
        g: int(min(b + e, n))
        for g, n, b, e in zip(
            order[group_col], order["n"], order["base"], order["extra"]
        )
    }
    k_ref = ray.put(k_map)
    k_max = max(k_map.values()) if k_map else 0

    def local_bk(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[group_col, id_col]].copy()
        out["__h"] = np.array(
            [
                int(hashlib.md5((salt + str(v)).encode()).hexdigest()[:8], 16)
                for v in df[id_col]
            ],
            dtype=np.int64,
        )
        out = out.sort_values([group_col, "__h", id_col])
        return out.groupby(group_col, as_index=False, sort=False).head(k_max)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        km = ray.get(k_ref)
        g = g.drop(columns="__b").sort_values([group_col, "__h", id_col])
        g["rank"] = g.groupby(group_col, sort=False).cumcount() + 1
        g["__k"] = g[group_col].map(km).fillna(0).astype("int64")
        out = g[g["rank"] <= g["__k"]][[group_col, id_col, "rank"]]
        out["rank"] = out["rank"].astype("int64")
        return out

    return (
        ds.map_batches(local_bk, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def priority_sample(
    ds: "ray.data.Dataset",
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "psample",
) -> pd.DataFrame:
    """Deterministic WEIGHTED sampling without replacement (priority
    sampling, Duffield-Lund-Thorup style with a hash in place of the
    RNG): each row gets the integer priority

        prio = hash60(salt:id) // max(weight, 1)

    and the ``k`` smallest (prio, id) rows win — heavier rows draw
    proportionally smaller priorities, so inclusion probability rises
    with weight, yet the draw is a pure function of the data
    (reproducible across re-shards/resumes, auditable in ANSI SQL via
    the same md5-prefix arithmetic — no RNG state anywhere).

    Scale shape: per-block bottom-k combiner → driver merges
    ``n_blocks × k`` rows; no shuffle. Weights must be positive
    integers (raises otherwise — float weights would demand float
    division whose SQL parity is not guaranteed)."""
    import hashlib as _h

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=df[id_col].dtype if id_col in df else "int64"),
                 weight_col: pd.Series([], dtype="int64"),
                 "prio": pd.Series([], dtype="int64")}
            )
        if not pd.api.types.is_integer_dtype(df[weight_col]):
            raise TypeError(
                f"priority_sample requires an integer weight_col; got "
                f"{df[weight_col].dtype!r} for {weight_col!r} — scale float "
                f"weights to integers upstream (e.g. floor(w * 1e6))"
            )
        w = df[weight_col].to_numpy(dtype=np.int64)
        if (w <= 0).any():
            raise ValueError("priority_sample weights must be positive")
        h = np.fromiter(
            (int(_h.md5(f"{salt}:{v}".encode()).hexdigest()[:15], 16)
             for v in df[id_col].astype(str)),
            dtype=np.int64, count=len(df),
        )
        out = pd.DataFrame(
            {id_col: df[id_col].to_numpy(), weight_col: w, "prio": h // w}
        )
        return out.nsmallest(k, ["prio", id_col])

    cand = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = cand.sort_values(["prio", id_col]).head(k).reset_index(drop=True)
    return out.astype({weight_col: "int64", "prio": "int64"})
