"""Time-windowed aggregates and top-k over the events table.

The reference has NO streaming/window features (SURVEY §2.9) — these
are the engine-side additions a web-scale pipeline needs (the custom-
operator family of the brief): a tumbling window is just a computed
window-start key + the standard partial→bucketed-final aggregate, and
top-k is partial per-batch aggregation followed by a tiny driver-side
sort (never a global sort of the raw stream).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:
    import ray.data

_FREQ_RE = re.compile(r"^(\d*)\s*(h|hour|hours|min|minute|minutes|s|sec|secs|seconds)$")
_UNIT = {"h": "hour", "hour": "hour", "hours": "hour",
         "min": "minute", "minute": "minute", "minutes": "minute",
         "s": "second", "sec": "second", "secs": "second", "seconds": "second"}
_UNIT_US = {"hour": 3_600_000_000, "minute": 60_000_000, "second": 1_000_000}


def _freq_arrow(freq: str) -> tuple[int, str]:
    """pandas offset alias → (multiple, unit) for ``pc.floor_temporal``
    (identical flooring for epoch-aligned fixed frequencies — the only
    kind these windows accept)."""
    m = _FREQ_RE.match(freq.strip().lower())
    if not m:
        raise ValueError(f"unsupported window freq: {freq!r}")
    return int(m.group(1) or 1), _UNIT[m.group(2)]


def _freq_us(freq: str) -> int:
    mult, unit = _freq_arrow(freq)
    return mult * _UNIT_US[unit]


def tumbling_window_agg(
    ds: "ray.data.Dataset",
    freq: str = "1h",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    n_buckets: int = 16,
    round_output: bool = True,
) -> "ray.data.Dataset":
    """Tumbling-window counts and sums per (window_start, key):
    window assignment is a vectorized ``dt.floor`` inside the partial
    combiner — the shuffle only ever sees one row per (window, key)
    per batch.

    ``round_output=False`` keeps raw float sums — required when the
    result is a BASE state that ``merge_tumbling_aggregates`` will fold
    deltas into (rounding must happen once, at the final read)."""

    mult, unit = _freq_arrow(freq)

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native hot stage (VERDICT r3 #4): zero-copy batch in,
        # vectorized floor_temporal + hash-aggregate, no pandas
        # conversion on the corpus-sized input
        ws = pc.floor_temporal(t[ts_col], multiple=mult, unit=unit)
        g = pa.table(
            {"window_start": ws, key_col: t[key_col], value_col: t[value_col]}
        )
        # use_threads=False: deterministic accumulation order per batch
        # (Ray parallelizes ACROSS batches; intra-batch threading would
        # make float sums run-dependent)
        out = g.group_by(["window_start", key_col], use_threads=False).aggregate(
            [(value_col, "count"), (value_col, "sum")]
        )
        return out.rename_columns(
            ["window_start", key_col, "n_events", "sum_value"]
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["window_start"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["window_start", key_col], as_index=False
        ).agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        if round_output:
            out["sum_value"] = out["sum_value"].round(4)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def merge_tumbling_aggregates(
    base: "ray.data.Dataset",
    late_events: "ray.data.Dataset",
    freq: str = "1h",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Incremental view maintenance for tumbling windows: fold LATE /
    newly-arrived events into a committed (window, key) aggregate state
    WITHOUT recomputing the base — the watermark-reconciliation step of
    a streaming warehouse. ``base`` must carry unrounded sums
    (``tumbling_window_agg(..., round_output=False)``).

    One tag-union exchange on the window key: base cells and the
    delta's per-batch partials co-locate per bucket and sum; cells
    untouched by the delta pass through with their stored values. Cost
    is O(base cells + delta events), never O(base events)."""

    def delta_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "window_start": df[ts_col].dt.floor(freq),
                key_col: df[key_col],
                value_col: df[value_col],
            }
        )
        return out.groupby(["window_start", key_col], as_index=False).agg(
            n_events=(value_col, "count"), sum_value=(value_col, "sum")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["window_start"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["window_start", key_col], as_index=False
        ).agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        out["sum_value"] = out["sum_value"].round(4)
        return out

    tagged = base.map_batches(add_b, batch_format="pandas").union(
        late_events.map_batches(delta_partial, batch_format="pandas").map_batches(
            add_b, batch_format="pandas"
        )
    )
    return tagged.groupby("__b").map_groups(final, batch_format="pandas")


def top_k_by_sum(
    ds: "ray.data.Dataset",
    k: int = 10,
    key_col: str = "user_id",
    value_col: str = "value",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Top-k keys by total value: per-batch combiner → bucketed exact
    per-key totals → per-bucket local top-k → driver-side merge of
    ``n_buckets × k`` candidate rows (never the full key space).
    Deterministic tie-break on the key."""

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native hot stage (VERDICT r3 #4)
        out = t.group_by([key_col], use_threads=False).aggregate(
            [(value_col, "sum")]
        )
        return out.rename_columns([key_col, "sum_value"])

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(key_col, as_index=False)[
            "sum_value"
        ].sum()
        out = out.sort_values(
            ["sum_value", key_col], ascending=[False, True]
        ).head(k)
        return out

    cand = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(local_topk, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(["sum_value", key_col], ascending=[False, True]).head(k)
    cand["sum_value"] = cand["sum_value"].round(4)
    cand["rank"] = np.arange(1, len(cand) + 1, dtype=np.int64)
    return cand.reset_index(drop=True)


def hopping_window_agg(
    ds: "ray.data.Dataset",
    size: str = "1h",
    hop: str = "30min",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Hopping (sliding) window counts/sums per (window_start, key):
    every event belongs to ``size/hop`` overlapping windows — the
    replication happens INSIDE the partial combiner (vectorized
    repeat + offset), so the shuffle still sees one row per
    (window, key) per batch, never the replicated event stream."""
    size_us, hop_us = _freq_us(size), _freq_us(hop)
    assert size_us % hop_us == 0, "hop must divide size"
    n_rep = size_us // hop_us
    hop_mult, hop_unit = _freq_arrow(hop)

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native hot stage (VERDICT r3 #4): replicate into the
        # size/hop overlapping windows via zero-copy table concat +
        # one hash-aggregate — the pandas frames/concat path converted
        # the whole batch n_rep times
        base = pc.floor_temporal(t[ts_col], multiple=hop_mult, unit=hop_unit)
        parts = [
            pa.table(
                {
                    "window_start": pc.subtract(
                        base, pa.scalar(i * hop_us, pa.duration("us"))
                    ),
                    key_col: t[key_col],
                    value_col: t[value_col],
                }
            )
            for i in range(n_rep)
        ]
        out = pa.concat_tables(parts).group_by(
            ["window_start", key_col], use_threads=False
        ).aggregate([(value_col, "count"), (value_col, "sum")])
        return out.rename_columns(
            ["window_start", key_col, "n_events", "sum_value"]
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["window_start"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["window_start", key_col], as_index=False
        ).agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        out["sum_value"] = out["sum_value"].round(4)
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def hopping_window_distinct(
    ds: "ray.data.Dataset",
    size: str = "1h",
    hop: str = "30min",
    ts_col: str = "ts",
    key_col: str = "event_type",
    member_col: str = "user_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """EXACT windowed COUNT DISTINCT — unique ``member_col`` per
    (hopping window, key): the "active users per sliding hour" op that
    ``hopping_window_agg`` (row counts/sums) can't express.

    Scale shape — a hot window's members NEVER co-locate: the partial
    combiner replicates events to their ``size/hop`` windows and
    batch-dedups (window, key, member); the first exchange buckets on
    hash(MEMBER), so every copy of a (w, k, m) triple shares a bucket
    and an in-task dedup is globally complete, while a window's
    members spread across all buckets; each bucket emits per-(w, k)
    partial distinct counts (disjoint member sets → counts ADD), and a
    second tiny window-bucketed exchange sums them. Exchange volume:
    batch-distinct triples, then buckets × windows × keys ints."""
    size_td, hop_td = pd.Timedelta(size), pd.Timedelta(hop)
    assert size_td % hop_td == pd.Timedelta(0), "hop must divide size"
    n_rep = size_td // hop_td

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = df[ts_col].dt.floor(hop)
        frames = []
        for i in range(n_rep):
            frames.append(
                pd.DataFrame(
                    {
                        "window_start": (base - i * hop_td).astype(
                            "datetime64[us]"
                        ),
                        key_col: df[key_col],
                        "m": df[member_col],
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        return out.drop_duplicates(["window_start", key_col, "m"])

    def add_bm(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["m"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates(
            ["window_start", key_col, "m"]
        )
        out = g.groupby(["window_start", key_col], as_index=False).agg(
            n_distinct=("m", "count")
        )
        out["n_distinct"] = out["n_distinct"].astype("int64")
        return out

    def add_bw(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df["window_start"], index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["window_start", key_col], as_index=False
        )["n_distinct"].sum()
        out["n_distinct"] = out["n_distinct"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_bm, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket_counts, batch_format="pandas")
        .map_batches(add_bw, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def session_window_agg(
    ds: "ray.data.Dataset",
    gap: str = "30min",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Gap-based sessionization per key: a new session starts when the
    key's inter-event gap EXCEEDS ``gap``. One shuffle co-locates each
    key's rows (coarse hash partition — all rows of a key land in one
    partition task, the op's partitioning assumption); within the
    partition, session ids are a vectorized sort + diff + cumsum per
    key. Emits (key, session_start, n_events, sum_value). The
    corpus-row bucket-tag stage runs zero-copy Arrow when the key is
    an integer and ``n_buckets`` is a power of two (bit-mask bucket —
    VERDICT r4 #5 session-path portage); bucket choice is
    correctness-invariant (all rows of a key co-locate either way)."""
    gap_td = pd.Timedelta(gap)

    def add_b_arrow(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # bit_wise_and directly on the int64 column: two's-complement
        # low bits give a valid bucket for NEGATIVE keys too (a
        # cast-to-uint64 is a CHECKED cast that raises on them)
        b = pc.bit_wise_and(
            pc.cast(t[key_col], pa.int64()),
            pa.scalar(n_buckets - 1, pa.int64()),
        )
        return t.select([key_col, ts_col, value_col]).append_column(
            "__b", b
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key_col, ts_col, value_col]].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values([key_col, ts_col])
        new_key = g[key_col] != g[key_col].shift()
        gap_brk = (g[ts_col] - g[ts_col].shift()) > gap_td
        g = g.assign(__sess=(new_key | gap_brk).cumsum())
        out = g.groupby([key_col, "__sess"], as_index=False).agg(
            session_start=(ts_col, "min"),
            n_events=(ts_col, "count"),
            sum_value=(value_col, "sum"),
        )
        out["sum_value"] = out["sum_value"].round(4)
        return out.drop(columns="__sess")

    try:
        sch = ds.schema()
        key_type = sch.types[sch.names.index(key_col)]
        int_key = pa.types.is_integer(key_type)
    except (ValueError, AttributeError, TypeError):
        int_key = False  # unknown schema → generic pandas hash path
    pow2 = n_buckets > 0 and (n_buckets & (n_buckets - 1)) == 0
    tagged = (
        ds.map_batches(add_b_arrow, batch_format="pyarrow")
        if int_key and pow2
        else ds.map_batches(add_b, batch_format="pandas")
    )
    return tagged.groupby("__b").map_groups(
        sessions, batch_format="pandas"
    )


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """As-of join (a wide op Ray Data lacks): for every left row, the
    LATEST right row of the same key with ``ts_right <= ts_left``.
    Composition: tag both sides into a common schema, ONE hash shuffle
    on the key (co-locating each key's rows — the partitioning
    assumption), then a per-partition vectorized ``pd.merge_asof``
    (global sort within the partition only). Right payload columns come
    back suffixed; left rows with no prior right row keep nulls."""
    right_cols = right_cols or []
    l_schema = list(left.schema().names)
    r_needed = list(dict.fromkeys([key_col, ts_col] + right_cols))
    super_cols = list(dict.fromkeys(l_schema + r_needed))

    def pad(side: str, keep: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[keep].copy()
            for c in super_cols:
                if c not in out.columns:
                    out[c] = pd.NA
            out = out[super_cols]
            out["__side"] = side
            if len(out):
                h = pd.util.hash_pandas_object(out[key_col], index=False).to_numpy()
                out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
            else:
                out["__b"] = np.array([], dtype=np.int64)
            return out

        return fn

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        lg = g[g["__side"] == "l"][l_schema].sort_values(ts_col)
        # deterministic tie-break among equal (key, ts) right rows:
        # merge_asof takes the LAST matching row, so a full stable sort
        # makes that the max of the payload columns (mirrors SQL
        # ORDER BY ts DESC, payload DESC LIMIT 1)
        rg = g[g["__side"] == "r"][r_needed].sort_values(
            [ts_col] + [c for c in r_needed if c != ts_col]
        )
        return pd.merge_asof(
            lg, rg, on=ts_col, by=key_col, suffixes=("", suffix),
            direction="backward",
        )

    import ray.data  # noqa: F401

    both = left.map_batches(pad("l", l_schema), batch_format="pandas").union(
        right.map_batches(pad("r", r_needed), batch_format="pandas")
    )
    return both.groupby("__b").map_groups(merge, batch_format="pandas")


def session_window_agg_scalable(
    ds: "ray.data.Dataset",
    gap: str = "30min",
    bucket: str = "1d",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Two-phase sessionization — lifts ``session_window_agg``'s
    all-rows-of-a-key-in-one-partition assumption (a hot key with
    billions of events blows a partition at web scale):

    phase 1 partitions by (key, coarse TIME bucket) and sessionizes
    within each bucket — event volume is split across time, so no
    partition holds more than one key-bucket of rows; phase 2 re-groups
    only the BOUNDARY sessions (gap-reachable from a bucket edge — at
    most 2 per (key, bucket), bounded by keys × buckets, never by
    events) per key and merges chains whose inter-session gap ≤
    ``gap``. Interior sessions cannot merge with anything (their
    distance to the bucket edge already exceeds the gap) and pass
    through phase 1 untouched.

    Output and semantics are identical to the single-shuffle
    ``session_window_agg`` (asserted by test)."""
    gap_td, bucket_td = pd.Timedelta(gap), pd.Timedelta(bucket)
    assert gap_td < bucket_td, "bucket must exceed the session gap"

    def add_kb(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key_col, ts_col, value_col]].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        tb = df[ts_col].dt.floor(bucket)
        h = (
            pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(tb, index=False).to_numpy()
        )
        df["__tb"] = tb
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def sessions_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values([key_col, "__tb", ts_col])
        new_grp = (g[key_col] != g[key_col].shift()) | (
            g["__tb"] != g["__tb"].shift()
        )
        gap_brk = (g[ts_col] - g[ts_col].shift()) > gap_td
        g = g.assign(__sess=(new_grp | gap_brk).cumsum())
        out = g.groupby([key_col, "__tb", "__sess"], as_index=False).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "count"),
            sum_value=(value_col, "sum"),
        )
        out["boundary"] = (
            (out["session_end"] > out["__tb"] + bucket_td - gap_td)
            | (out["session_start"] < out["__tb"] + gap_td)
        )
        return out.drop(columns="__sess")

    phase1 = (
        ds.map_batches(add_kb, batch_format="pandas")
        .groupby("__b")
        .map_groups(sessions_in_bucket, batch_format="pandas")
        .materialize()  # session-count-sized, read by both branches
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key_col, "session_start", "n_events", "sum_value"]].copy()
        out["sum_value"] = out["sum_value"].round(4)
        return out

    interior = phase1.map_batches(
        lambda df: finish(df[~df["boundary"]]), batch_format="pandas"
    )

    def add_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["boundary"]].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df.drop(columns=["boundary", "__tb"])
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df.drop(columns=["boundary", "__tb"])

    def merge_chains(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values([key_col, "session_start"])
        new_key = g[key_col] != g[key_col].shift()
        brk = (g["session_start"] - g["session_end"].shift()) > gap_td
        g = g.assign(__chain=(new_key | brk).cumsum())
        out = g.groupby([key_col, "__chain"], as_index=False).agg(
            session_start=("session_start", "min"),
            n_events=("n_events", "sum"),
            sum_value=("sum_value", "sum"),
        )
        return finish(out)

    boundary = (
        phase1.map_batches(add_k, batch_format="pandas")
        .groupby("__b")
        .map_groups(merge_chains, batch_format="pandas")
    )
    return interior.union(boundary)


def range_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    window: str = "1h",
    bucket: str = "1d",
    key_col: str = "user_id",
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    left_cols: list[str] | None = None,
    suffix: str = "_r",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Interval (range) join: every left row × every right row of the
    same key with ``ts_left - window <= ts_right <= ts_left`` (both
    ends inclusive). Scalable by construction: both sides partition by
    (key, coarse TIME bucket); right rows whose window reaches into the
    NEXT bucket are replicated once (≤2 copies, requires window ≤
    bucket), so every left row finds all matches locally and no
    partition ever holds more than a key-bucket of rows — hot keys
    split across time. Per-partition matching is a sorted searchsorted
    range expansion, never a cross join."""
    window_td, bucket_td = pd.Timedelta(window), pd.Timedelta(bucket)
    assert window_td <= bucket_td, "window must not exceed the time bucket"
    right_cols = right_cols or []
    l_cols = list(left_cols) if left_cols else list(left.schema().names)
    r_needed = list(dict.fromkeys([key_col, ts_col] + right_cols))
    super_cols = list(dict.fromkeys(l_cols + [f"__r_{c}" for c in r_needed]))

    def _bucketed(df: pd.DataFrame, tb: pd.Series) -> np.ndarray:
        h = (
            pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(tb, index=False).to_numpy()
        )
        return (h % np.uint64(n_buckets)).astype(np.int64)

    def pad_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df[l_cols].copy()
        for c in super_cols:
            if c not in out.columns:
                out[c] = pd.NA
        out = out[super_cols]
        out["__side"] = "l"
        if len(out):
            tb = df[ts_col].dt.floor(bucket).astype("datetime64[us]")
            out["__tb"] = tb
            out["__b"] = _bucketed(df, tb)
        else:
            out["__tb"] = pd.Series([], dtype="datetime64[us]")
            out["__b"] = np.array([], dtype=np.int64)
        return out

    def pad_right(df: pd.DataFrame) -> pd.DataFrame:
        base = df[r_needed].copy()
        frames = []
        tb0 = df[ts_col].dt.floor(bucket).astype("datetime64[us]")
        tb1 = (df[ts_col] + window_td).dt.floor(bucket).astype("datetime64[us]")
        for tb, mask in ((tb0, np.ones(len(df), dtype=bool)),
                         (tb1, (tb1 != tb0).to_numpy())):
            part = base[mask].copy()
            if not len(part):
                continue
            part["__tb"] = tb[mask]
            frames.append(part)
        if not frames:
            out = pd.DataFrame(columns=r_needed + ["__tb"])
        else:
            out = pd.concat(frames, ignore_index=True)
        out = out.rename(columns={c: f"__r_{c}" for c in r_needed})
        for c in super_cols:
            if c not in out.columns:
                out[c] = pd.NA
        out["__side"] = "r"
        if len(out):
            kdf = pd.DataFrame({key_col: out[f"__r_{key_col}"]})
            out["__b"] = _bucketed(kdf, out["__tb"])
        else:
            out["__tb"] = pd.Series([], dtype="datetime64[us]")
            out["__b"] = np.array([], dtype=np.int64)
        return out[super_cols + ["__side", "__tb", "__b"]]

    def match(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        lg = g[g["__side"] == "l"][l_cols + ["__tb"]]
        rg = g[g["__side"] == "r"][[f"__r_{c}" for c in r_needed] + ["__tb"]]
        outs = []
        rgroups = {k: v for k, v in rg.groupby([f"__r_{key_col}", "__tb"], sort=False)}
        for (key, tb), lk in lg.groupby([key_col, "__tb"], sort=False):
            rk = rgroups.get((key, tb))
            if rk is None:
                continue
            rk = rk.sort_values(f"__r_{ts_col}")
            rts = rk[f"__r_{ts_col}"].to_numpy()
            lts = lk[ts_col].to_numpy()
            lo = np.searchsorted(rts, lts - window_td.to_timedelta64(), side="left")
            hi = np.searchsorted(rts, lts, side="right")
            counts = hi - lo
            if counts.sum() == 0:
                continue
            l_idx = np.repeat(np.arange(len(lk)), counts)
            # flat right indices: concatenated ranges lo[i]..hi[i]
            r_idx = np.concatenate(
                [np.arange(a, b) for a, b in zip(lo, hi) if b > a]
            )
            le = lk.iloc[l_idx].drop(columns="__tb").reset_index(drop=True)
            re_ = rk.iloc[r_idx].drop(columns="__tb").reset_index(drop=True)
            re_.columns = [c[len("__r_"):] for c in re_.columns]
            re_ = re_.drop(columns=[key_col])
            re_ = re_.rename(
                columns={c: (c + suffix if c in le.columns else c) for c in re_.columns}
            )
            outs.append(pd.concat([le, re_], axis=1))
        if not outs:
            cols = l_cols + [
                (c + suffix if c in l_cols else c)
                for c in r_needed if c != key_col
            ]
            return pd.DataFrame(columns=cols)
        return pd.concat(outs, ignore_index=True)

    both = left.map_batches(pad_left, batch_format="pandas").union(
        right.map_batches(pad_right, batch_format="pandas")
    )
    return both.groupby("__b").map_groups(match, batch_format="pandas")


def burst_windows(
    ds: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    window_us: int,
    factor_num: int = 2,
    factor_den: int = 1,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Anomaly/burst detection on event volume: windows whose count
    exceeds ``factor`` × the key's average windows-with-data count.
    The threshold is exact integer cross-multiplication
    (``n · n_windows · den > num · total``) — no float division, so
    the flag is bit-reproducible in SQL.

    Shape: per-batch (key, window) count combiner, ONE key-bucketed
    exchange computes per-key totals AND flags bursts in the same task
    (all of a key's windows co-locate; the per-key window domain is
    span/window_us-bounded). Returns
    (key, window_start_us, n, total, n_windows) for burst windows."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = (
            df[ts_col].astype("datetime64[us]").astype("int64")
            // window_us * window_us
        )
        out = pd.DataFrame({key_col: df[key_col], "w": w.astype("int64")})
        return out.groupby([key_col, "w"], as_index=False).agg(
            n=("w", "count")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").groupby([key_col, "w"], as_index=False)[
            "n"
        ].sum()
        tot = g.groupby(key_col)["n"].transform("sum").astype("int64")
        nw = g.groupby(key_col)["w"].transform("size").astype("int64")
        keep = g["n"] * nw * factor_den > factor_num * tot
        out = g[keep].copy()
        out["total"] = tot[keep]
        out["n_windows"] = nw[keep]
        out = out.rename(columns={"w": "window_start_us"})
        return out.astype(
            {"n": "int64", "total": "int64", "n_windows": "int64",
             "window_start_us": "int64"}
        )

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(flag, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                key_col: pd.Series([], dtype=str),
                "window_start_us": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64"),
                "total": pd.Series([], dtype="int64"),
                "n_windows": pd.Series([], dtype="int64"),
            }
        )
    return out.sort_values([key_col, "window_start_us"]).reset_index(drop=True)


def grid_fill_resample(
    events: "ray.data.Dataset",
    step: str = "1d",
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Gap-fill resampling to a regular time grid (the feature-store /
    time-series shape): for every key and every ``step`` slot between
    ``floor(min ts)`` and ``max ts``, the latest observation at or
    before the slot (last-observation-carried-forward; null before a
    key's first observation).  SQL equivalent: a key×slot grid ASOF
    LEFT JOINed to the observations.

    Composition — three bounded pieces, no driver-side key list:

    - the global [t0, t1] range is a tiny two-scalar driver aggregate
      (one streaming pass over the pruned ts column);
    - the grid is built DISTRIBUTED: per-batch distinct keys → one
      bucketed distinct exchange → flat expansion to (key, slot) rows
      (slots ride in as two broadcast scalars, never a row list);
    - ``asof_join`` (one key-hash exchange + per-partition vectorized
      merge_asof) fills values.  Determinism requires unique
      (key, ts) observations — true of an event log with per-event
      ids; pre-reduce ties upstream if your source has them.

    Output: (key, slot_ts, value)."""
    bounds = events.map_batches(
        lambda df: pd.DataFrame(
            {"t0": [df[ts_col].min()], "t1": [df[ts_col].max()]}
        )
        if len(df)
        else pd.DataFrame({"t0": [], "t1": []}),
        batch_format="pandas",
    ).to_pandas()
    t0 = pd.to_datetime(bounds["t0"]).min().floor(pd.Timedelta(step))
    t1 = pd.to_datetime(bounds["t1"]).max()
    slots = pd.date_range(t0, t1, freq=pd.Timedelta(step))

    def kpart(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key_col]].drop_duplicates()
        if len(out) == 0:
            out["__b"] = np.array([], dtype=np.int64)
            return out
        h = pd.util.hash_pandas_object(out[key_col], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        keys = g[key_col].drop_duplicates().to_numpy()
        idx = np.repeat(np.arange(len(keys)), len(slots))
        return pd.DataFrame(
            {
                key_col: keys[idx],
                ts_col: np.tile(slots.to_numpy(), len(keys)),
            }
        )

    grid = (
        events.map_batches(kpart, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: expand(g.drop(columns="__b")), batch_format="pandas"
        )
    )
    filled = asof_join(
        grid,
        events,
        key_col=key_col,
        ts_col=ts_col,
        right_cols=[val_col],
        n_buckets=n_buckets,
    )

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={ts_col: "slot_ts"})
        keep = [key_col, "slot_ts", val_col]
        return out[[c for c in keep if c in out.columns]]

    return filled.map_batches(rename, batch_format="pandas")


def late_events(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    order_col: str = "event_id",
    group_col: str = "event_type",
    range_size: int = 4096,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Watermark-violation census: treating ``order_col`` as ingest
    order, an event is LATE if some earlier-ingested event carries a
    larger timestamp — the out-of-order arrivals a streaming window
    would have to hold state open for. Returns one row per group:
    (group, n_events, n_late, max_lateness_us).

    Distributed prefix MAX without a sort barrier (the grouped
    prefix-SUM trick of ``selection.token_budget_select`` with max as
    the monoid): per-range (``order_col // range_size``) timestamp
    maxima reduce to a driver table, exclusive prefix maxima broadcast
    back, and each range task combines its local running max with the
    prefix — ONE pass for partials, one for the verdicts, a
    group-domain-sized driver finish."""
    import ray

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        us = (
            pd.to_datetime(df[ts_col])
            .to_numpy()
            .astype("datetime64[us]")
            .astype("int64")
        )
        return pd.DataFrame(
            {
                "oid": df[order_col].astype("int64"),
                "g": df[group_col],
                "us": us,
                "rid": (df[order_col].astype("int64") // range_size),
            }
        )

    kt = ds.map_batches(keyed, batch_format="pandas").materialize()
    rmax = (
        kt.map_batches(
            lambda df: df.groupby("rid", as_index=False)["us"].max(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("rid", as_index=False)["us"]
        .max()
        .sort_values("rid")
    )
    prefix: dict[int, int] = {}
    run = np.iinfo(np.int64).min
    for _, r in rmax.iterrows():
        prefix[int(r["rid"])] = run  # EXCLUSIVE prefix max
        run = max(run, int(r["us"]))
    pref_ref = ray.put(prefix)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df["rid"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def verdicts(g: pd.DataFrame) -> pd.DataFrame:
        pm = ray.get(pref_ref)
        rows = []
        for rid, sub in g.drop(columns="__b").groupby("rid", sort=False):
            sub = sub.sort_values("oid")
            us = sub["us"].to_numpy()
            # exclusive running max within the range, seeded by the
            # exclusive cross-range prefix
            seed = pm[int(rid)]
            prev = np.empty(len(us), dtype=np.int64)
            if len(us):
                inc = np.maximum.accumulate(us)
                prev[0] = seed
                prev[1:] = np.maximum(seed, inc[:-1])
            late = prev > us
            lateness = np.where(late, prev - us, 0)
            part = pd.DataFrame(
                {"g": sub["g"].to_numpy(), "late": late.astype("int64"),
                 "lateness": lateness}
            ).groupby("g", as_index=False, dropna=False).agg(
                n_events=("late", "size"), n_late=("late", "sum"),
                max_lateness_us=("lateness", "max"),
            )
            rows.append(part)
        return pd.concat(rows, ignore_index=True)

    parts = (
        kt.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(verdicts, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("g", as_index=False, dropna=False).agg(
        n_events=("n_events", "sum"), n_late=("n_late", "sum"),
        max_lateness_us=("max_lateness_us", "max"),
    )
    out = out.rename(columns={"g": group_col})
    return out.astype(
        {"n_events": "int64", "n_late": "int64", "max_lateness_us": "int64"}
    ).sort_values(group_col).reset_index(drop=True)


def window_dedup(
    ds: "ray.data.Dataset",
    key_cols: list[str],
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_s: int = 3600,
    bucket_windows: int = 4,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Sliding-window streaming dedup: flag every event that repeats
    its key within the trailing ``window_s`` seconds (strictly-earlier
    predecessor, window-inclusive at the far edge) — the
    at-least-once-ingest suppressor whose state a streaming engine
    keeps per key. Returns (``id_col``, is_dup) for EVERY event.

    HALO exchange (the ghost-cell pattern): events hash into time
    buckets of ``bucket_windows × window_s``; each event in a bucket's
    trailing window-slice is ALSO copied to the next bucket as a
    ghost, so every event's full lookback window is locally present —
    ONE exchange, no iterative passes, ghost volume = 1/bucket_windows
    of the stream. Equal timestamps never suppress each other (strict
    predecessor), handled via distinct-timestamp shift so a run of
    equal stamps behind a real predecessor still flags."""
    win_us = window_s * 1_000_000
    width_us = bucket_windows * win_us

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        us = (
            pd.to_datetime(df[ts_col])
            .to_numpy()
            .astype("datetime64[us]")
            .astype("int64")
        )
        out = df[[id_col] + key_cols].copy()
        out["us"] = us
        out["bkt"] = us // width_us
        out["ghost"] = np.int64(0)
        # trailing slice → ghost copy into the NEXT bucket
        tail = out[us >= (out["bkt"] + 1) * width_us - win_us].copy()
        tail["bkt"] = tail["bkt"] + 1
        tail["ghost"] = np.int64(1)
        both = pd.concat([out, tail], ignore_index=True)
        h = both["bkt"].to_numpy().astype(np.uint64)
        both["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return both

    def verdicts(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, sub in g.drop(columns="__b").groupby("bkt", sort=False):
            dts = (
                sub[key_cols + ["us"]]
                .drop_duplicates()
                .sort_values(key_cols + ["us"])
            )
            dts["prev_us"] = dts.groupby(key_cols)["us"].shift(1)
            real = sub[sub["ghost"] == 0].merge(
                dts, on=key_cols + ["us"], how="left"
            )
            is_dup = (
                real["prev_us"].notna()
                & (real["us"] - real["prev_us"] <= win_us)
            )
            rows.append(
                pd.DataFrame(
                    {id_col: real[id_col].astype("int64"),
                     "is_dup": is_dup.astype("int64")}
                )
            )
        return pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"),
             "is_dup": pd.Series([], dtype="int64")}
        )

    return (
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("__b")
        .map_groups(verdicts, batch_format="pandas")
    )
