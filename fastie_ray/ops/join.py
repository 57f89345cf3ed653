"""General equi-join between two LARGE datasets as one task-based
tag-union exchange — the engine's relational join primitive when
neither side fits a ``ray.put`` broadcast (for a small side, broadcast
+ ``map_batches`` lookup is strictly better — see the
orders_by_segment pattern).

Why not ``ds.join``: Ray Data's hash join spawns ``num_partitions``
aggregator ACTORS that must all schedule before progress (measured
deadlock when partitions > cluster CPUs, ~1-2 s fixed spawn cost
otherwise, and a crash on fully-empty inputs — NOTES.md r2 facts 1-2).
This primitive is pure tasks on the same exchange volume: tag rows
with their side, hash-bucket on the join key, per-partition pandas
merge.

Skew: all rows of one key land in one bucket — the standard hash-join
contract. For Zipf-headed keys prefer pre-aggregation before the join
or a broadcast of the dimension side; ``n_buckets`` only spreads
DISTINCT keys, not a single hot key.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _exchange_tagged(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    tag_left,
    tag_right,
    merge,
    n_buckets: int,
) -> "ray.data.Dataset":
    """Tag-union exchange on raw tasks instead of
    ``groupby("__b").map_groups``: the Ray Data all-to-all is a SORT
    barrier (~1-3 s fixed, and post-sort block count is size-driven so
    small inputs single-task the merge — NOTES facts 10/11); the
    BlockSet split/reduce is the same data movement minus the sort and
    operator bring-up (measured 5.4 s → 2.6 s on a 100k×100k
    self-join). Buckets key on the per-side "__b" hash, so rows of a
    key co-locate; the per-bucket pandas merge joins on the real key
    values, so multiple key-hashes sharing a bucket is harmless.
    Empty buckets emit column-less empty blocks, which Ray Data map /
    groupby operators skip (pinned by tests/test_join.py)."""
    from fastie_ray.state.exchange import BlockSet

    tagged = BlockSet.from_dataset(left).map(tag_left).union(
        BlockSet.from_dataset(right).map(tag_right)
    )
    return tagged.exchange(["__b"], merge, n_buckets=n_buckets).to_dataset()


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    n_buckets: int = 32,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Equi-join ``left`` ⋈ ``right`` on ``on`` (= ``right_on`` on the
    right side). ``how`` ∈ {inner, left, full, semi, anti}: full keeps
    unmatched rows from BOTH sides (the key column is total — filled
    from whichever side has it); semi keeps left
    rows WITH a right match (no right columns, no 1:N fan-out), anti
    keeps left rows WITHOUT one — the scale shape for existence filters
    (drop flagged dups, keep unmatched) where a broadcast set would be
    corpus-bounded. Pass ``left_cols`` / ``right_cols`` explicitly when
    a side's lineage is expensive — ``ds.schema()`` executes upstream
    stages to infer names.

    Right-side columns colliding with left names get ``suffix``. The
    right join key column is dropped from the output (it equals the
    left key by construction)."""
    if how not in ("inner", "left", "full", "semi", "anti"):
        raise ValueError(f"how must be inner|left|full|semi|anti, got {how!r}")
    right_on = right_on or on
    left_cols = list(left_cols) if left_cols is not None else list(left.schema().names)
    if how in ("semi", "anti"):
        # only the right key participates; payload columns never ship
        right_cols = [right_on]
    right_cols = (
        list(right_cols) if right_cols is not None else list(right.schema().names)
    )
    # output naming for right columns (join key under right_on's name)
    right_out = {
        c: (c + suffix if c in left_cols else c) for c in right_cols
    }
    out_cols = left_cols + [right_out[c] for c in right_cols if c != right_on]
    all_cols = left_cols + [right_out[c] for c in right_cols]

    def _bucket(keys: pd.Series) -> np.ndarray:
        if len(keys) == 0:
            return np.array([], dtype=np.int64)
        h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
        return (h % np.uint64(n_buckets)).astype(np.int64)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[left_cols].copy()
        for c in all_cols:
            if c not in out.columns:
                out[c] = pd.NA
        out["__side"] = "l"
        out["__b"] = _bucket(out[on])
        return out[all_cols + ["__side", "__b"]]

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[right_cols].rename(columns=right_out)
        if how in ("semi", "anti"):
            # existence only — per-batch distinct shrinks the shuffle
            out = out.drop_duplicates()
        for c in all_cols:
            if c not in out.columns:
                out[c] = pd.NA
        out["__side"] = "r"
        out["__b"] = _bucket(out[right_out[right_on]])
        return out[all_cols + ["__side", "__b"]]

    r_key = right_out[right_on]
    r_val_cols = [right_out[c] for c in right_cols if c != right_on]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"][left_cols]
        if how in ("semi", "anti"):
            mask = lg[on].isin(g[g["__side"] == "r"][r_key].to_numpy())
            out = lg[mask if how == "semi" else ~mask]
            return out.reset_index(drop=True).infer_objects()
        rg = g[g["__side"] == "r"][[r_key] + r_val_cols]
        out = lg.merge(
            rg,
            how="outer" if how == "full" else how,
            left_on=on,
            right_on=r_key,
            sort=False,
        )
        if how == "full":
            # right-only rows carry the key only in r_key; surface it
            # under the left key column so the output key is total
            out[on] = out[on].where(out[on].notna(), out[r_key])
        if r_key != on and r_key not in out_cols:
            out = out.drop(columns=[r_key])
        # union-block concat degrades numerics to object; restore
        return out[out_cols].infer_objects()

    return _exchange_tagged(left, right, tag_left, tag_right, merge, n_buckets)


def salted_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    n_salts: int = 8,
    hot_top: int = 32,
    hot_share: float = 0.01,
    n_buckets: int = 32,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Skew-defusing equi-join: like ``hash_join`` but a Zipf-headed
    join key no longer concentrates in one partition. A cheap pre-pass
    estimates the left side's hot keys (per-batch top-``hot_top``
    counts, bounded partials, driver merge — a HEURISTIC: correctness
    never depends on which keys it flags); hot LEFT rows spread across
    ``n_salts`` salts while their RIGHT matches replicate to every
    salt, so the exchange bucket is (key, salt) and the hot key's work
    fans out ``n_salts``-wide. Cold keys pay nothing (salt 0, no
    replication). Supports inner and left joins (each left row lands in
    exactly one bucket, so no duplicate output; semi/anti don't fan out
    and belong on ``hash_join``).

    Cost: right rows for hot keys ship ``n_salts``× (hot keys are few
    by construction); everything else is ``hash_join`` volume. The
    pre-pass re-executes the left lineage once (key column only) —
    ``materialize()`` an expensive left first (NOTES fact 19)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    right_on = right_on or on
    left_cols = list(left_cols) if left_cols is not None else list(left.schema().names)
    right_cols = (
        list(right_cols) if right_cols is not None else list(right.schema().names)
    )
    right_out = {c: (c + suffix if c in left_cols else c) for c in right_cols}
    out_cols = left_cols + [right_out[c] for c in right_cols if c != right_on]
    all_cols = left_cols + [right_out[c] for c in right_cols]
    r_key = right_out[right_on]
    r_val_cols = [right_out[c] for c in right_cols if c != right_on]

    # ---- pass 1: approximate hot-key detection on the left key column
    def top_counts(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[on].value_counts().head(hot_top)
        out = pd.DataFrame({"key": vc.index.astype(object),
                            "n": vc.to_numpy(dtype=np.int64)})
        # marker row: batch row count (key None), so the driver total
        # is exact even when batches share a size
        return pd.concat(
            [out, pd.DataFrame({"key": [None], "n": [np.int64(len(df))]})],
            ignore_index=True,
        )

    import ray

    tops = (
        left.select_columns([on])
        .map_batches(top_counts, batch_format="pandas")
        .to_pandas()
    )
    if len(tops):
        total = int(tops[tops["key"].isna()]["n"].sum()) or 1
        agg = tops[~tops["key"].isna()].groupby("key")["n"].sum()
        hot = set(agg[agg >= hot_share * total].index[:hot_top])
    else:
        hot = set()
    hot_ref = ray.put(hot)

    _SALT_MIX = np.uint64(2654435761)

    def _bucket(keys: pd.Series, salts: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.array([], dtype=np.int64)
        h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
        h = h + salts.astype(np.uint64) * _SALT_MIX
        return (h % np.uint64(n_buckets)).astype(np.int64)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[left_cols].copy()
        for c in all_cols:
            if c not in out.columns:
                out[c] = pd.NA
        hset = ray.get(hot_ref)
        salts = np.zeros(len(out), dtype=np.int64)
        if hset and len(out):
            is_hot = out[on].isin(hset).to_numpy()
            salts[is_hot] = np.arange(int(is_hot.sum())) % n_salts
        out["__side"] = "l"
        out["__salt"] = salts
        out["__b"] = _bucket(out[on], salts)
        return out[all_cols + ["__side", "__salt", "__b"]]

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = df[right_cols].rename(columns=right_out)
        for c in all_cols:
            if c not in out.columns:
                out[c] = pd.NA
        hset = ray.get(hot_ref)
        is_hot = out[r_key].isin(hset).to_numpy() if len(out) else np.array([], bool)
        cold = out[~is_hot]
        frames = [cold.assign(__salt=np.int64(0))]
        hot_rows = out[is_hot]
        if len(hot_rows):
            frames += [hot_rows.assign(__salt=np.int64(s)) for s in range(n_salts)]
        out = pd.concat(frames, ignore_index=True)
        out["__side"] = "r"
        out["__b"] = _bucket(out[r_key], out["__salt"].to_numpy())
        return out[all_cols + ["__side", "__salt", "__b"]]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # join on (key, salt): the raw-task exchange merges whole hash
        # BUCKETS (not exact __b groups), so a hot key's per-salt right
        # replicas can share a bucket — the salt in the join key keeps
        # each left row matching its key's right rows exactly once
        lg = g[g["__side"] == "l"][left_cols + ["__salt"]]
        rg = g[g["__side"] == "r"][[r_key, "__salt"] + r_val_cols]
        out = lg.merge(
            rg, how=how, left_on=[on, "__salt"],
            right_on=[r_key, "__salt"], sort=False,
        )
        if r_key != on and r_key not in out_cols:
            out = out.drop(columns=[r_key])
        return out[out_cols].infer_objects()

    return _exchange_tagged(left, right, tag_left, tag_right, merge, n_buckets)


def _bloom_key(values: pd.Series) -> pd.Series:
    """Canonicalize a join-key series before Bloom hashing so both
    sides hash equal-comparing values identically. pandas ``merge``
    compares numerics across dtypes (int64 1 == float64 1.0), but
    ``hash_pandas_object`` hashes bit patterns — without this, a
    mixed-dtype key pair silently fails every Bloom probe and the
    prefilter drops genuine matches. Numerics (incl. bool) go to
    float64 (merge's own common dtype); ``+ 0.0`` folds -0.0 into
    +0.0 so the two equal-comparing zero patterns hash alike."""
    if pd.api.types.is_numeric_dtype(values) or pd.api.types.is_bool_dtype(values):
        return values.astype("float64") + 0.0
    return values


def bloom_bits(
    ds: "ray.data.Dataset",
    col: str,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> np.ndarray:
    """Bloom filter of a key column: per-batch partial bit arrays
    (fixed ``m_bits/8`` bytes each), OR-merged on the driver —
    blocks × constant payload, never key-count-sized. The classic
    runtime-filter build side. Keys pass through ``_bloom_key`` so
    the probe side (``_bloom_test``) matches across numeric dtypes."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        v = _bloom_key(df[col].dropna())
        if len(v):
            h1 = pd.util.hash_pandas_object(v, index=False).to_numpy()
            h2 = pd.util.hash_pandas_object(
                v.astype(str) + "\x01", index=False
            ).to_numpy()
            for i in range(k):
                idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                np.bitwise_or.at(
                    bits, (idx // 8).astype(np.int64),
                    np.left_shift(np.uint8(1), (idx % 8).astype(np.uint8)),
                )
        return pd.DataFrame({"bits": [bits.tobytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    acc = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in parts["bits"]:
        acc |= np.frombuffer(b, dtype=np.uint8)
    return acc


def _bloom_test(values: pd.Series, bits: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    values = _bloom_key(values)
    h1 = pd.util.hash_pandas_object(values, index=False).to_numpy()
    h2 = pd.util.hash_pandas_object(
        values.astype(str) + "\x01", index=False
    ).to_numpy()
    ok = np.ones(len(values), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
        ok &= (
            bits[(idx // 8).astype(np.int64)]
            & np.left_shift(np.uint8(1), (idx % 8).astype(np.uint8))
        ) != 0
    return ok


def bloom_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    n_buckets: int = 32,
    m_bits: int = 1 << 20,
    k: int = 4,
) -> "ray.data.Dataset":
    """Runtime-filtered equi-join: build a Bloom filter from the RIGHT
    keys (one constant-payload reduction), broadcast it, and drop left
    rows that cannot match BEFORE the join exchange — the standard
    optimization when the left side is much larger than the match set.
    False positives are eliminated by the exact ``hash_join`` that
    follows, so the result is identical to the unfiltered join
    (pytest-pinned); only the exchange volume changes. ``how`` is
    inner or semi (filter-reducible joins; left/anti need every left
    row and gain nothing from a prefilter)."""
    import ray

    if how not in ("inner", "semi"):
        raise ValueError(f"bloom_join supports inner|semi, got {how!r}")
    right_on = right_on or on
    bits_ref = ray.put(bloom_bits(right, right_on, m_bits=m_bits, k=k))

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        bits = ray.get(bits_ref)
        return df[_bloom_test(df[on], bits, m_bits, k)]

    left_f = left.map_batches(prefilter, batch_format="pandas")
    return hash_join(
        left_f, right, on=on, right_on=right_on, how=how,
        left_cols=left_cols, right_cols=right_cols, n_buckets=n_buckets,
    )


def incremental_join_delta(
    base_left: "ray.data.Dataset",
    delta_left: "ray.data.Dataset",
    base_right: "ray.data.Dataset",
    delta_right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
    n_buckets: int = 32,
    suffix: str = "_r",
) -> "ray.data.Dataset":
    """Incremental VIEW MAINTENANCE for an inner equi-join under
    append-only updates (the lakehouse "don't recompute the join"
    primitive): with L' = L ∪ ΔL and R' = R ∪ ΔR (disjoint appends),

        L'⋈R' − L⋈R  =  ΔL⋈R  ∪  L⋈ΔR  ∪  ΔL⋈ΔR

    and the three terms are disjoint, so the returned DELTA unioned
    with the old materialized result is EXACTLY the fresh full join
    (parity-pinned in pytest; the driver oracle runs the full join).

    All three delta terms share the join key, so they are computed in
    ONE raw-task :class:`~fastie_ray.state.exchange.BlockSet` exchange
    over the four tagged inputs — each table crosses the wire exactly
    once (|L|+|R|+|ΔL|+|ΔΡ| total; the previous three-hash_join form
    shipped each delta twice and paid three sort barriers). Rows of a
    key co-locate, so each bucket materializes its slice of the three
    merge terms locally and the union is complete."""
    from fastie_ray.state.exchange import BlockSet

    right_on = right_on or on
    left_cols = (
        list(left_cols) if left_cols is not None
        else list(base_left.schema().names)
    )
    right_cols = (
        list(right_cols) if right_cols is not None
        else list(base_right.schema().names)
    )
    right_out = {
        c: (c + suffix if c in left_cols else c)
        for c in right_cols if c != right_on
    }
    r_val_cols = [right_out[c] for c in right_cols if c != right_on]
    out_cols = left_cols + r_val_cols
    all_cols = list(out_cols)

    def tag(t: int, cols_in: list, rename: dict):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df[cols_in].rename(columns=rename)
            for c in all_cols:
                if c not in out.columns:
                    out[c] = pd.NA
            out["__t"] = np.int8(t)
            return out[all_cols + ["__t"]]
        return f

    r_rename = dict(right_out)
    r_rename[right_on] = on
    r_in = right_cols

    parts = [
        BlockSet.from_dataset(base_left).map(tag(0, left_cols, {})),
        BlockSet.from_dataset(delta_left).map(tag(1, left_cols, {})),
        BlockSet.from_dataset(base_right).map(tag(2, r_in, r_rename)),
        BlockSet.from_dataset(delta_right).map(tag(3, r_in, r_rename)),
    ]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        def side(t: int, cols: list) -> pd.DataFrame:
            return g.loc[g["__t"] == t, cols].infer_objects()

        lb = side(0, left_cols)
        ld = side(1, left_cols)
        rcols = [on] + r_val_cols
        rb = side(2, rcols)
        rd = side(3, rcols)
        terms = []
        if len(ld) and len(rb):
            terms.append(ld.merge(rb, on=on, sort=False))
        if len(lb) and len(rd):
            terms.append(lb.merge(rd, on=on, sort=False))
        if len(ld) and len(rd):
            terms.append(ld.merge(rd, on=on, sort=False))
        if not terms:
            return pd.DataFrame()
        return pd.concat(terms, ignore_index=True)[out_cols]

    return (
        parts[0].union(*parts[1:])
        .exchange([on], merge, n_buckets)
        .to_dataset()
    )


def join_size_estimate(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: str | None = None,
    n_buckets: int = 16,
) -> "pd.DataFrame":
    """EXACT inner-join output cardinality WITHOUT running the join —
    the planner primitive behind join ordering and skew decisions:

        |L ⋈ R| = Σ_k cnt_L(k) · cnt_R(k)

    Per-key count combiner on each side (key-domain-sized partials),
    one task hash join of the two count tables, per-batch product
    partials summed to a driver scalar. Also reports each side's row
    and distinct-key counts and the MAX single-key product — the
    number a salting decision actually needs. All integer."""
    right_on = right_on or on

    def counts(ds, col):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(col, as_index=False).agg(n=(col, "count"))
            return out.rename(columns={col: "k"})

        def add_b(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            if len(df) == 0:
                df["__b"] = np.array([], dtype=np.int64)
                return df
            h = pd.util.hash_pandas_object(df["k"], index=False).to_numpy()
            df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
            return df

        def final(g: pd.DataFrame) -> pd.DataFrame:
            out = g.drop(columns="__b").groupby("k", as_index=False)["n"].sum()
            out["n"] = out["n"].astype("int64")
            return out

        return (
            ds.map_batches(partial, batch_format="pandas")
            .map_batches(add_b, batch_format="pandas")
            .groupby("__b")
            .map_groups(final, batch_format="pandas")
        )

    # each count table is consumed twice (join + totals): pin once
    cl = counts(left, on).materialize()
    cr = counts(right, right_on).materialize()
    j = hash_join(
        cl, cr, on="k", left_cols=["k", "n"], right_cols=["k", "n"],
        n_buckets=n_buckets, suffix="_r",
    )

    def prod(df: pd.DataFrame) -> pd.DataFrame:
        p = df["n"].astype("int64") * df["n_r"].astype("int64")
        return pd.DataFrame(
            {"s": [np.int64(p.sum())],
             "mx": [np.int64(p.max()) if len(p) else np.int64(0)],
             "nk": [np.int64(len(p))]}
        )

    agg = j.map_batches(prod, batch_format="pandas").to_pandas()
    nl = int(
        cl.map_batches(
            lambda df: pd.DataFrame(
                {"n": [np.int64(df["n"].sum())], "d": [np.int64(len(df))]}
            ),
            batch_format="pandas",
        ).to_pandas().agg({"n": "sum", "d": "sum"})["n"]
    )
    nr = int(
        cr.map_batches(
            lambda df: pd.DataFrame({"n": [np.int64(df["n"].sum())]}),
            batch_format="pandas",
        ).to_pandas()["n"].sum()
    )
    return pd.DataFrame(
        {
            "join_rows": [np.int64(agg["s"].sum())],
            "n_left": [np.int64(nl)],
            "n_right": [np.int64(nr)],
            "n_match_keys": [np.int64(agg["nk"].sum())],
            "max_key_product": [np.int64(agg["mx"].max() if len(agg) else 0)],
        }
    )
