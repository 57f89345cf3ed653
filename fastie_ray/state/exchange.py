"""Low-latency raw-task hash exchange over plasma-resident pandas
blocks — the primitive behind the iterative graph fixpoint loops
(k-truss, MIS, SCC, densest-subgraph, ...).

Why not `groupby("__b").map_groups`: a Ray Data all-to-all is a SORT
barrier plus operator bring-up; measured ~0.24 s per exchange on a
16-block toy input and ~0.7-1 s inside real chained lineages (NOTES
fact 11). An iterative algorithm runs 3-7 exchanges per round for
k-30 rounds, so the *barrier floor*, not payload, dominates wall time
at small-to-medium scale. The same exchange expressed as raw tasks —
one split task per block with ``num_returns=n_buckets``, one reduce
task per bucket — measures ~0.05 s: it is exactly the map-reduce
shuffle Ray Data performs internally, minus the sort, the operator
graph bring-up and the per-stage driver synchronization.

Scale shape (100 TB): identical data movement to the Dataset exchange
— every row crosses the wire once, partitioned by key hash, objects
live in (and spill from) the object store. `n_buckets` plays the role
of output partitions; size it to the cluster (tasks = blocks +
n_buckets per exchange) AND to worker memory: each reduce concatenates
its whole bucket into one pandas frame, so n_buckets must keep the
largest bucket inside a worker heap — the standard hash-join partition
contract, checked by the caller, not spilled for you (Ray Data's
sort-based shuffle spills; prefer it when a single reduce bucket can
exceed memory). What is *lost* vs Dataset is streaming backpressure
between pipeline stages — acceptable because the loops this serves
materialize per round anyway (their fixpoint tests need counts), and
per-round state (edge/label tables) is a bounded fraction of the
corpus, not the corpus itself. Use Datasets for the wide streaming
pipelines; use this for tight fixpoint loops over already-reduced
state and medium-cardinality exchanges.

Correctness notes: buckets are `hash_pandas_object(key) % n_buckets`
— ALL rows of a key land in one bucket, so a per-bucket pandas
group_fn sees every row of each of its keys (same contract as the
`groupby("__b").map_groups` idiom used elsewhere). Empty buckets stay
typed: split emits `df[mask]` slices which preserve dtypes, and the
reduce concat of typed empties keeps the schema (avoids the Ray
zero-row sentinel problem of NOTES facts 12/18 by construction).

Determinism: reduce concatenates its parts in input-block order, so
any group_fn that is order-sensitive must sort internally (the same
discipline all map_groups consumers here already follow).
"""

from __future__ import annotations

from typing import Callable, Sequence, TYPE_CHECKING

import numpy as np
import pandas as pd

import ray

if TYPE_CHECKING:
    import ray.data


def _hash_bucket(df: pd.DataFrame, cols: Sequence[str], n: int) -> np.ndarray:
    if len(df) == 0:
        return np.array([], dtype=np.int64)
    h = pd.util.hash_pandas_object(df[cols[0]], index=False).to_numpy()
    for c in cols[1:]:
        h = h + np.uint64(0x9E3779B97F4A7C15) * pd.util.hash_pandas_object(
            df[c], index=False
        ).to_numpy()
    return (h % np.uint64(n)).astype(np.int64)


@ray.remote
def _split(df: pd.DataFrame, cols: tuple, n: int):
    # zero-row blocks can be column-less Ray sentinels (NOTES fact 12)
    # — never hash/slice them, they contribute nothing downstream
    if len(df) == 0:
        return df if n == 1 else tuple(df for _ in range(n))
    b = _hash_bucket(df, cols, n)
    if n == 1:
        return df
    return tuple(df[b == i] for i in range(n))


@ray.remote
def _split_mapped(df: pd.DataFrame, map_fn, cols: tuple, n: int):
    if len(df) == 0:
        return df if n == 1 else tuple(df for _ in range(n))
    df = map_fn(df)
    b = _hash_bucket(df, cols, n)
    if n == 1:
        return df
    return tuple(df[b == i] for i in range(n))


@ray.remote
def _reduce(group_fn, *parts):
    live = [p for p in parts if len(p)]
    if not live:
        # Empty bucket: split slices preserve dtypes, so feed group_fn
        # a TYPED zero-row input to get a typed zero-row OUTPUT block —
        # column-less empties break downstream Acero joins (NOTES fact
        # 3). Fall back to the bare sentinel if group_fn assumes rows.
        typed = next((p for p in parts if len(p.columns)), None)
        if typed is None:
            return pd.DataFrame()
        try:
            # head(0): schema only — an empty bucket must emit NO rows
            # even when group_fn would synthesize summary rows
            return group_fn(typed).head(0).reset_index(drop=True)
        except Exception:
            return pd.DataFrame()
    g = pd.concat(live, ignore_index=True) if len(live) > 1 else live[0]
    return group_fn(g).reset_index(drop=True)


@ray.remote
def _reduce_budget(group_fn, cols: tuple, max_bytes: int, *parts):
    """Budget-guarded reduce (VERDICT r3 #6): when the bucket's rows
    exceed ``max_bytes``, sub-partition by a SALTED hash of the same
    key columns and run ``group_fn`` once per sub-group instead of
    once over the whole bucket. All rows of a key still share a
    sub-group (the hash is per-key), so the group contract holds; what
    the guard caps is the concat + group_fn working set — the 2-3×
    heap term that OOMs a reduce task on a skewed bucket. A bucket
    whose RAW rows exceed worker heap outright needs the Dataset
    sort-based shuffle instead (module docstring trade-off)."""
    live = [p for p in parts if len(p)]
    if not live:
        typed = next((p for p in parts if len(p.columns)), None)
        if typed is None:
            return pd.DataFrame()
        try:
            return group_fn(typed).head(0).reset_index(drop=True)
        except Exception:
            return pd.DataFrame()
    total = sum(int(p.memory_usage(deep=True).sum()) for p in live)
    if total <= max_bytes:
        g = pd.concat(live, ignore_index=True) if len(live) > 1 else live[0]
        return group_fn(g).reset_index(drop=True)
    n_sub = min(int(np.ceil(total / max_bytes)), 256)
    outs = []
    for s in range(n_sub):
        sub_parts = []
        for p in live:
            h = pd.util.hash_pandas_object(p[cols[0]], index=False).to_numpy()
            for c in cols[1:]:
                h = h + np.uint64(0x9E3779B97F4A7C15) * pd.util.hash_pandas_object(
                    p[c], index=False
                ).to_numpy()
            # salt ^ keeps this split independent of the bucket hash
            sub = (np.uint64(0xA5A5A5A5A5A5A5A5) ^ h) % np.uint64(n_sub)
            part = p[sub.astype(np.int64) == s]
            if len(part):
                sub_parts.append(part)
        if not sub_parts:
            continue
        g = (
            pd.concat(sub_parts, ignore_index=True)
            if len(sub_parts) > 1
            else sub_parts[0]
        )
        outs.append(group_fn(g))
    if not outs:
        return group_fn(live[0].head(0)).reset_index(drop=True)
    return pd.concat(outs, ignore_index=True).reset_index(drop=True)


@ray.remote
def _reduce_side(group_fn, side, *parts):
    """Reduce with a pinned per-bucket side table: ``group_fn(g, side)``.
    Unlike plain ``_reduce``, runs even when the exchanged rows are
    empty (the side table alone can produce output, e.g. a frontier
    that died in this bucket but whose edges must still pass through)
    UNLESS both are empty."""
    parts = [p for p in parts if len(p)]
    if not parts and len(side) == 0:
        return pd.DataFrame()
    g = (
        pd.concat(parts, ignore_index=True)
        if len(parts) > 1
        else (parts[0] if parts else pd.DataFrame())
    )
    return group_fn(g, side).reset_index(drop=True)


@ray.remote
def _apply(fn, df: pd.DataFrame):
    if len(df) == 0:
        return df
    return fn(df).reset_index(drop=True)


@ray.remote
def _count(df: pd.DataFrame) -> int:
    return len(df)


@ray.remote
def _scalar(fn, df: pd.DataFrame):
    return fn(df)


@ray.remote
def _concat(*parts):
    live = [p for p in parts if len(p)]
    if not live:
        # keep a typed schema if any part has one (sentinels don't)
        for p in parts:
            if len(p.columns):
                return p
        return pd.DataFrame()
    if len(live) == 1:
        return live[0].reset_index(drop=True)
    return pd.concat(live, ignore_index=True)


class BlockSet:
    """A list of plasma ObjectRefs of pandas DataFrames with raw-task
    bulk operators. All operators are lazy task submissions; only
    `count()` / `to_pandas()` block the driver."""

    def __init__(self, refs: list):
        self.refs = list(refs)

    # -- construction / export ------------------------------------
    @classmethod
    def from_dataset(cls, ds: "ray.data.Dataset") -> "BlockSet":
        return cls(ds.to_pandas_refs())

    @classmethod
    def from_pandas(cls, df: pd.DataFrame, n_blocks: int = 1) -> "BlockSet":
        n_blocks = max(1, min(n_blocks, max(1, len(df))))
        parts = np.array_split(df, n_blocks)
        return cls([ray.put(p.reset_index(drop=True)) for p in parts])

    def to_dataset(self, drop_empty: bool = True) -> "ray.data.Dataset":
        """Export as a Dataset. ``drop_empty`` (default) filters
        zero-row blocks first: Ray Data map operators BYPASS empty
        blocks, so a zero-row block would flow past every downstream
        map_batches with its PRE-map schema and crash schema-sensitive
        consumers (Acero joins: "no match for FieldRef"). Costs one
        blocking count round on the refs."""
        import ray.data as rd

        if drop_empty:
            counts = ray.get([_count.remote(r) for r in self.refs])
            live = [r for r, c in zip(self.refs, counts) if c]
            if live:
                return rd.from_pandas_refs(live)
            blocks = ray.get(self.refs)
            typed = next((b for b in blocks if len(b.columns)), blocks[0])
            # an all-empty result must keep its schema: zero-row PANDAS
            # blocks lose columns in Ray's metadata path (NOTES fact
            # 3), zero-row ARROW tables don't
            import pyarrow as pa

            return rd.from_arrow(pa.Table.from_pandas(
                typed, preserve_index=False
            ))
        return rd.from_pandas_refs(self.refs)

    def to_pandas(self) -> pd.DataFrame:
        parts = ray.get(self.refs)
        return pd.concat(parts, ignore_index=True)

    # -- bulk ops --------------------------------------------------
    def map(self, fn: Callable[[pd.DataFrame], pd.DataFrame]) -> "BlockSet":
        """Per-block task — the map_batches analogue."""
        return BlockSet([_apply.remote(fn, r) for r in self.refs])

    def exchange(
        self,
        key_cols: Sequence[str],
        group_fn: Callable[[pd.DataFrame], pd.DataFrame],
        n_buckets: int = 16,
        map_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
        side: list | None = None,
        max_bucket_bytes: int | None = None,
    ) -> "BlockSet":
        """Hash-partition on ``key_cols`` and apply ``group_fn`` once
        per bucket (all rows of a key co-locate). ``map_fn`` fuses a
        per-block transform into the split task (no extra task wave).

        ``max_bucket_bytes`` turns the docstring's "caller-checked
        contract" into a runtime guard: a reduce whose bucket exceeds
        the budget sub-partitions by a salted key hash and runs
        ``group_fn`` per sub-group (keys never split), capping the
        concat+group working set instead of OOMing. Costs one
        memory_usage scan per reduce; incompatible with ``side=``
        (a pinned side table is already bucket-sized by construction).

        ``side``: per-bucket pinned ObjectRefs from :meth:`partition`
        (same ``n_buckets`` AND same key hash — i.e. key columns whose
        values hash identically). ``group_fn(g, side_df)`` then joins
        the moving rows against a STATIC table that never re-ships —
        the iterative-loop shape where the edge table is partitioned
        once and only the (shrinking) per-round state crosses the wire."""
        cols = tuple(key_cols)
        if map_fn is None:
            outs = [
                _split.options(num_returns=n_buckets if n_buckets > 1 else 1).remote(
                    r, cols, n_buckets
                )
                for r in self.refs
            ]
        else:
            outs = [
                _split_mapped.options(
                    num_returns=n_buckets if n_buckets > 1 else 1
                ).remote(r, map_fn, cols, n_buckets)
                for r in self.refs
            ]
        if side is not None:
            if max_bucket_bytes is not None:
                raise ValueError("max_bucket_bytes is not supported with side=")
            if len(side) != n_buckets:
                raise ValueError(
                    f"side has {len(side)} buckets, exchange has {n_buckets}"
                )
            if n_buckets == 1:
                return BlockSet([_reduce_side.remote(group_fn, side[0], *outs)])
            return BlockSet(
                [
                    _reduce_side.remote(group_fn, side[i], *[o[i] for o in outs])
                    for i in range(n_buckets)
                ]
            )
        if max_bucket_bytes is not None:
            if n_buckets == 1:
                return BlockSet(
                    [_reduce_budget.remote(group_fn, cols, max_bucket_bytes, *outs)]
                )
            return BlockSet(
                [
                    _reduce_budget.remote(
                        group_fn, cols, max_bucket_bytes, *[o[i] for o in outs]
                    )
                    for i in range(n_buckets)
                ]
            )
        if n_buckets == 1:
            return BlockSet([_reduce.remote(group_fn, *outs)])
        return BlockSet(
            [_reduce.remote(group_fn, *[o[i] for o in outs]) for i in range(n_buckets)]
        )

    def partition(
        self,
        key_cols: Sequence[str],
        n_buckets: int = 16,
        map_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    ) -> list:
        """Materialize ONE hash partitioning as ``n_buckets`` pinned
        per-bucket ObjectRefs (each one concatenated DataFrame) for use
        as an :meth:`exchange` ``side=``. Pays the shuffle once; every
        later exchange against it ships only the moving side."""
        cols = tuple(key_cols)
        split = _split if map_fn is None else _split_mapped
        args = (cols, n_buckets) if map_fn is None else (map_fn, cols, n_buckets)
        outs = [
            split.options(num_returns=n_buckets if n_buckets > 1 else 1).remote(
                r, *args
            )
            for r in self.refs
        ]
        if n_buckets == 1:
            return [_concat.remote(*outs)]
        return [_concat.remote(*[o[i] for o in outs]) for i in range(n_buckets)]

    def union(self, *others: "BlockSet") -> "BlockSet":
        refs = list(self.refs)
        for o in others:
            refs.extend(o.refs)
        return BlockSet(refs)

    def compact(self, n_blocks: int) -> "BlockSet":
        """Fold blocks into ``n_blocks`` concat tasks (block-count
        discipline for loops — NOTES fact 15)."""
        if len(self.refs) <= n_blocks:
            return self
        groups = np.array_split(np.arange(len(self.refs)), n_blocks)
        return BlockSet(
            [_concat.remote(*[self.refs[i] for i in g]) for g in groups if len(g)]
        )

    def count(self) -> int:
        return int(sum(ray.get([_count.remote(r) for r in self.refs])))

    def scalar(self, fn: Callable[[pd.DataFrame], object]) -> list:
        """Apply a per-block scalar probe and return the list of
        results (driver combines — the fixpoint-test primitive:
        e.g. sum of per-block label sums)."""
        return ray.get([_scalar.remote(fn, r) for r in self.refs])
