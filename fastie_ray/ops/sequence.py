"""Event-sequence transition mining: per-key Markov transition counts
(prev event type → next event type) over a timestamp-ordered event
stream — the clickstream / user-journey statistic behind next-event
prediction and funnel discovery (no reference counterpart; completes
the funnel / cohort / session family in this repo).

Ordering is deterministic: (ts, id) within a key, matching SQL
``lag(type) OVER (PARTITION BY key ORDER BY ts, id)``.

Two implementations with identical output (parity-tested):

- ``transition_counts``: ONE exchange on hash(key) — every row of a
  key co-located, vectorized sort + shift per bucket. The right shape
  when no key is pathologically hot.

- ``transition_counts_scalable``: the two-phase trick shared with
  ``ops.windows.session_window_agg_scalable`` — phase 1 partitions by
  (key, coarse TIME bucket), counts in-bucket adjacent pairs locally
  and emits one (first_type, last_type) boundary record per
  (key, bucket); phase 2 re-groups only the boundary records (bounded
  by keys × buckets, never by events) per key and counts the
  cross-bucket transitions last(b) → first(next occupied b'). A hot
  key with billions of events never concentrates in one partition.

Both return a driver DataFrame: the output is bounded by the event-type
domain squared (types², the bounded-small-side pattern)."""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_OUT_COLS = ["prev_type", "next_type", "n_trans"]


def _empty() -> pd.DataFrame:
    return pd.DataFrame(
        {"prev_type": pd.Series([], dtype=object),
         "next_type": pd.Series([], dtype=object),
         "n_trans": pd.Series([], dtype="int64")}
    )


def _finalize(parts: pd.DataFrame) -> pd.DataFrame:
    if len(parts) == 0:
        return _empty()
    out = parts.groupby(["prev_type", "next_type"], as_index=False)["n_trans"].sum()
    out["n_trans"] = out["n_trans"].astype("int64")
    return out.sort_values(["prev_type", "next_type"]).reset_index(drop=True)


def _pair_counts(prev: pd.Series, nxt: pd.Series) -> pd.DataFrame:
    d = pd.DataFrame({"prev_type": prev.to_numpy(), "next_type": nxt.to_numpy()})
    out = d.groupby(["prev_type", "next_type"], as_index=False).size()
    return out.rename(columns={"size": "n_trans"})


def transition_counts(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """(prev_type, next_type, n_trans) over consecutive events per key,
    ordered by (ts, id) — one key-bucketed exchange."""
    cols = [key_col, ts_col, type_col, id_col]

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def count_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col])
        same = (g[key_col] == g[key_col].shift()).to_numpy()
        if not same.any():
            return _empty()
        return _pair_counts(g[type_col].shift()[same], g[type_col][same])

    parts = (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(count_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    return _finalize(parts)


def transition_counts_scalable(
    ds: "ray.data.Dataset",
    bucket: str = "1d",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Same output as ``transition_counts`` without ever co-locating
    all rows of a key: in-bucket pairs count locally; only one
    (first_type, last_type) record per (key, time-bucket) crosses the
    second exchange."""
    cols = [key_col, ts_col, type_col, id_col]
    bucket_td = pd.Timedelta(bucket)

    def add_kb(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            df["__tb"] = pd.Series([], dtype="datetime64[us]")
            return df
        tb = df[ts_col].dt.floor(bucket_td)
        h = (
            pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(tb, index=False).to_numpy()
        )
        df["__tb"] = tb
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """Emit in-bucket pair counts (kind='pair') and one boundary
        record per (key, tb) (kind='edge') as a single typed frame."""
        g = g.sort_values([key_col, "__tb", ts_col, id_col])
        same = (
            (g[key_col] == g[key_col].shift())
            & (g["__tb"] == g["__tb"].shift())
        ).to_numpy()
        pairs = (
            _pair_counts(g[type_col].shift()[same], g[type_col][same])
            if same.any()
            else _empty()
        )
        heads = g.groupby([key_col, "__tb"], as_index=False, sort=False).agg(
            first_type=(type_col, "first"), last_type=(type_col, "last")
        )
        out = pd.DataFrame(
            {
                "kind": ["pair"] * len(pairs) + ["edge"] * len(heads),
                "prev_type": list(pairs["prev_type"]) + list(heads["last_type"]),
                "next_type": list(pairs["next_type"]) + list(heads["first_type"]),
                "n_trans": list(pairs["n_trans"]) + [0] * len(heads),
                "key": [None] * len(pairs) + list(heads[key_col]),
                "tb": [pd.NaT] * len(pairs) + list(heads["__tb"]),
            }
        )
        out["n_trans"] = out["n_trans"].astype("int64")
        out["tb"] = pd.to_datetime(out["tb"])
        return out

    phase1 = (
        ds.map_batches(add_kb, batch_format="pandas")
        .groupby("__b")
        .map_groups(in_bucket, batch_format="pandas")
        .materialize()  # bounded: pairs ≤ types² per bucket + one edge per (key, tb)
    )

    in_pairs = phase1.map_batches(
        lambda df: df[df["kind"] == "pair"][_OUT_COLS], batch_format="pandas"
    ).to_pandas()

    def add_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["kind"] == "edge"][["key", "tb", "prev_type", "next_type"]].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["key"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def cross_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # prev_type column holds last_type of the bucket, next_type its
        # first_type; consecutive occupied buckets of one key chain
        # last(b) → first(b')
        g = g.sort_values(["key", "tb"])
        same = (g["key"] == g["key"].shift()).to_numpy()
        if not same.any():
            return _empty()
        return _pair_counts(g["prev_type"].shift()[same], g["next_type"][same])

    cross = (
        phase1.map_batches(add_k, batch_format="pandas")
        .groupby("__b")
        .map_groups(cross_bucket, batch_format="pandas")
        .to_pandas()
    )
    frames = [f for f in (in_pairs, cross) if len(f)]
    if not frames:
        return _empty()
    return _finalize(pd.concat(frames, ignore_index=True))


def validity_intervals(
    ds: "ray.data.Dataset",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """SCD2 validity intervals from a change log: each event becomes a
    (key, value, valid_from, valid_to) row where valid_to is the NEXT
    event's timestamp for the key (open interval → NaT) — the
    slowly-changing-dimension reconstruction step of an incremental
    warehouse, SQL ``lead(ts) OVER (PARTITION BY key ORDER BY ts, id)``.

    One key-bucketed exchange; the per-bucket lead is a vectorized
    sort + shift(-1). (For pathologically hot keys apply the same
    (key, time-bucket) two-phase trick as ``transition_counts_scalable``
    — only the LAST row per bucket needs the next bucket's first ts.)"""
    cols = [key_col, ts_col, type_col, id_col]

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def lead_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values([key_col, ts_col, id_col])
        nxt = g[ts_col].shift(-1)
        same = (g[key_col] == g[key_col].shift(-1)).to_numpy()
        out = pd.DataFrame(
            {
                key_col: g[key_col].to_numpy(),
                type_col: g[type_col].to_numpy(),
                "valid_from": g[ts_col].to_numpy(),
                "valid_to": nxt.where(same).to_numpy(),
            }
        )
        return out

    return (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(lead_in_bucket, batch_format="pandas")
    )


def markov_next_eval(
    ds: "ray.data.Dataset",
    cut_ts: str,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Temporal TRAIN-ON-PAST / EVALUATE-ON-FUTURE for the first-order
    Markov next-event model — the backtest shape every sequence model
    ships with: consecutive (prev → next) pairs split at ``cut_ts`` by
    the NEXT event's time, the train side fit as per-prev argmax
    (count DESC, type ASC — deterministic), the test side scored
    against it. Returns (prev_type, n_test, n_correct).

    Scale shape: pair generation is ONE key-bucketed exchange
    (per-key sort + shift), materialized once for its two consumers
    (NOTES fact 19); model and metrics are TYPE-VOCABULARY-bounded
    driver tables (the documented small-table contract)."""
    import ray

    cols = [key_col, ts_col, type_col, id_col]
    cut_us = int(
        pd.Timestamp(cut_ts).to_datetime64().astype("datetime64[us]")
        .astype(np.int64)
    )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values([key_col, ts_col, id_col])
        same = g[key_col].eq(g[key_col].shift(-1))
        t_next = (
            pd.to_datetime(g[ts_col]).shift(-1).to_numpy()
            .astype("datetime64[us]").astype(np.int64)
        )
        out = pd.DataFrame(
            {
                "prev": g[type_col].to_numpy(),
                "nxt": g[type_col].shift(-1).to_numpy(),
                "t_next": t_next,
            }
        )
        return out[same.to_numpy()].reset_index(drop=True)

    pair_ds = (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
        .materialize()
    )

    train = (
        pair_ds.map_batches(
            lambda df: df.loc[df["t_next"] < cut_us]
            .groupby(["prev", "nxt"], as_index=False)
            .agg(n=("t_next", "count")),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(["prev", "nxt"], as_index=False)["n"]
        .sum()
    )
    model = dict(
        train.sort_values(["prev", "n", "nxt"],
                          ascending=[True, False, True])
        .drop_duplicates("prev")[["prev", "nxt"]]
        .itertuples(index=False)
    )
    model_ref = ray.put(model)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(model_ref)
        t = df[df["t_next"] >= cut_us]
        if len(t) == 0:
            return pd.DataFrame(
                {"prev": pd.Series([], dtype=object),
                 "n_test": pd.Series([], dtype="int64"),
                 "n_correct": pd.Series([], dtype="int64")}
            )
        pred = t["prev"].map(m)
        ok = (pred == t["nxt"]).astype("int64")
        out = pd.DataFrame({"prev": t["prev"], "ok": ok})
        g = out.groupby("prev", as_index=False).agg(
            n_test=("ok", "count"), n_correct=("ok", "sum")
        )
        return g

    res = (
        pair_ds.map_batches(score, batch_format="pandas")
        .to_pandas()
        .groupby("prev", as_index=False)[["n_test", "n_correct"]]
        .sum()
    )
    res = res.rename(columns={"prev": "prev_type"})
    return res.astype({"n_test": "int64", "n_correct": "int64"}).sort_values(
        "prev_type"
    ).reset_index(drop=True)

def _ngram_counts_frame(
    g: pd.DataFrame, n: int, type_col: str, mask_cols: list[str]
) -> pd.DataFrame:
    """Count n-grams of ``type_col`` over consecutive SORTED rows whose
    ``mask_cols`` values all match across the window (vectorized
    shifted-compare — no groupby.apply)."""
    ok = np.ones(len(g), dtype=bool)
    for j in range(1, n):
        for c in mask_cols:
            ok &= (g[c] == g[c].shift(j)).to_numpy()
    if not ok.any():
        return pd.DataFrame(
            {f"t{i}": pd.Series([], dtype=object) for i in range(n)}
        ).assign(n_paths=pd.Series([], dtype="int64"))
    cols = {
        f"t{i}": g[type_col].shift(n - 1 - i).to_numpy()[ok]
        for i in range(n)
    }
    out = pd.DataFrame(cols)
    out = out.groupby(list(cols), as_index=False).size().rename(
        columns={"size": "n_paths"}
    )
    out["n_paths"] = out["n_paths"].astype("int64")
    return out


def path_counts(
    ds: "ray.data.Dataset",
    n: int = 3,
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Counts of length-``n`` event-type PATHS (consecutive per key,
    ordered by (ts, id)) — the product-analytics sequence-mining table
    behind "top user journeys". One key-bucketed exchange; a hot key
    lands in one task (see ``path_counts_scalable`` for the two-phase
    shape). Returns (t0..t{n-1}, n_paths), type-domain bounded."""
    cols = [key_col, ts_col, type_col, id_col]

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def count_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, ts_col, id_col])
        return _ngram_counts_frame(g, n, type_col, [key_col])

    parts = (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(count_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    tcols = [f"t{i}" for i in range(n)]
    if len(parts) == 0:
        return pd.DataFrame(
            {**{c: pd.Series([], dtype=object) for c in tcols},
             "n_paths": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(tcols, as_index=False)["n_paths"].sum()
    out["n_paths"] = out["n_paths"].astype("int64")
    return out.sort_values(tcols).reset_index(drop=True)


def path_counts_scalable(
    ds: "ray.data.Dataset",
    n: int = 3,
    bucket: str = "1d",
    ts_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Same output as ``path_counts`` WITHOUT co-locating a key's whole
    history (the ``transition_counts_scalable`` shape generalized to
    n-grams): phase 1 buckets on (key, time-chunk) and counts n-grams
    fully inside a chunk; only each (key, chunk)'s FIRST and LAST
    ``n-1`` events (with their in-chunk rank and chunk size) cross the
    second key-bucketed exchange, where an n-gram is counted iff its
    events are pairwise GLOBALLY consecutive — same chunk with rank
    step 1, or chunk-boundary step last→first — and it spans ≥ 2
    chunks (in-chunk n-grams were counted in phase 1, so no double
    count). Boundary volume is O(keys × chunks touched × (n−1)),
    independent of in-chunk density."""
    cols = [key_col, ts_col, type_col, id_col]
    bucket_td = pd.Timedelta(bucket)
    keep = n - 1
    tcols = [f"t{i}" for i in range(n)]

    def add_kb(df: pd.DataFrame) -> pd.DataFrame:
        df = df[cols].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            df["__tb"] = pd.Series([], dtype="datetime64[us]")
            return df
        tb = pd.to_datetime(df[ts_col]).dt.floor(bucket_td)
        h = (
            pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(tb, index=False).to_numpy()
        )
        df["__tb"] = tb
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def in_chunk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "__tb", ts_col, id_col]).reset_index(
            drop=True
        )
        grams = _ngram_counts_frame(g, n, type_col, [key_col, "__tb"])
        grp = g.groupby([key_col, "__tb"], sort=False)
        r = grp.cumcount().to_numpy() + 1
        sz = grp[type_col].transform("size").to_numpy()
        edge_m = (r <= keep) | (r > sz - keep)
        edges = pd.DataFrame(
            {
                "key": g[key_col].to_numpy()[edge_m],
                "tb": g["__tb"].to_numpy()[edge_m],
                "ts": g[ts_col].to_numpy()[edge_m],
                "eid": g[id_col].to_numpy()[edge_m],
                "typ": g[type_col].to_numpy()[edge_m],
                "r": r[edge_m],
                "sz": sz[edge_m],
            }
        )
        out = pd.DataFrame(
            {
                "kind": ["gram"] * len(grams) + ["edge"] * len(edges),
                **{
                    c: list(grams[c]) + [None] * len(edges)
                    for c in tcols
                },
                "n_paths": list(grams["n_paths"]) + [0] * len(edges),
                "key": [None] * len(grams) + list(edges["key"]),
                "tb": [pd.NaT] * len(grams) + list(edges["tb"]),
                "ts": [pd.NaT] * len(grams) + list(edges["ts"]),
                "eid": [0] * len(grams) + list(edges["eid"]),
                "typ": [None] * len(grams) + list(edges["typ"]),
                "r": [0] * len(grams) + list(edges["r"]),
                "sz": [0] * len(grams) + list(edges["sz"]),
            }
        )
        out["n_paths"] = out["n_paths"].astype("int64")
        for c in ("eid", "r", "sz"):
            out[c] = out[c].astype("int64")
        out["tb"] = pd.to_datetime(out["tb"])
        out["ts"] = pd.to_datetime(out["ts"])
        return out

    phase1 = (
        ds.map_batches(add_kb, batch_format="pandas")
        .groupby("__b")
        .map_groups(in_chunk, batch_format="pandas")
        .materialize()
    )
    in_grams = phase1.map_batches(
        lambda df: df[df["kind"] == "gram"][tcols + ["n_paths"]],
        batch_format="pandas",
    ).to_pandas()

    def add_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["kind"] == "edge"][
            ["key", "tb", "ts", "eid", "typ", "r", "sz"]
        ].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["key"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def cross_chunk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values(
            ["key", "tb", "ts", "eid"]
        ).reset_index(drop=True)
        same_key1 = (g["key"] == g["key"].shift()).to_numpy()
        # adjacent-position global consecutiveness
        same_tb = (g["tb"] == g["tb"].shift()).to_numpy()
        step_in = same_tb & (g["r"].to_numpy() == g["r"].shift().to_numpy() + 1)
        step_x = (
            ~same_tb
            & (g["r"].shift().to_numpy() == g["sz"].shift().to_numpy())
            & (g["r"].to_numpy() == 1)
        )
        consec = (step_in | step_x) & same_key1
        # window ending at i is valid iff all n-1 adjacent steps are
        # consecutive: win[i] = AND_j consec[i-j], j = 0..n-2
        win = np.ones(len(g), dtype=bool)
        for j in range(0, n - 1):
            shifted = np.concatenate(
                [[False] * j, consec[: len(g) - j]]
            ) if j else consec
            win &= shifted
        # spans >= 2 chunks: NOT all same tb across the window
        all_same_tb = np.ones(len(g), dtype=bool)
        for j in range(1, n):
            all_same_tb &= (g["tb"] == g["tb"].shift(j)).to_numpy()
        win &= ~all_same_tb
        if not win.any():
            return pd.DataFrame(
                {**{c: pd.Series([], dtype=object) for c in tcols},
                 "n_paths": pd.Series([], dtype="int64")}
            )
        cols_ = {
            f"t{i}": g["typ"].shift(n - 1 - i).to_numpy()[win]
            for i in range(n)
        }
        out = pd.DataFrame(cols_)
        out = out.groupby(tcols, as_index=False).size().rename(
            columns={"size": "n_paths"}
        )
        out["n_paths"] = out["n_paths"].astype("int64")
        return out

    cross = (
        phase1.map_batches(add_k, batch_format="pandas")
        .groupby("__b")
        .map_groups(cross_chunk, batch_format="pandas")
        .to_pandas()
    )
    frames = [f for f in (in_grams, cross) if len(f)]
    if not frames:
        return pd.DataFrame(
            {**{c: pd.Series([], dtype=object) for c in tcols},
             "n_paths": pd.Series([], dtype="int64")}
        )
    out = pd.concat(frames, ignore_index=True).groupby(
        tcols, as_index=False
    )["n_paths"].sum()
    out["n_paths"] = out["n_paths"].astype("int64")
    return out.sort_values(tcols).reset_index(drop=True)

def gap_regularity(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gaps: int = 8,
    cv2_thresh_e6: int = 10_000,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Bot / scripted-traffic detector from INTER-EVENT GAP regularity:
    humans are bursty, schedulers are metronomes. Per key, over
    consecutive event gaps g_i (µs, ordered by (ts, id)):

        var_num = n·Σg² − (Σg)²          (scaled variance numerator)
        cv2_e6  = ⌊var_num·10⁶ / (Σg)²⌋  (squared coefficient of
                                          variation — dimensionless,
                                          so fast AND slow metronomes
                                          both flag)

    flagged = (n ≥ min_gaps) AND (cv2_e6 < cv2_thresh_e6). Gaps are
    WHOLE SECONDS (µs floor-divided — g² in µs overflows int64 at
    month-scale gaps; both sides floor identically). All integer
    arithmetic — SQL-exact via lag() + HUGEINT aggregates.

    Scale shape: ONE key-bucketed exchange; per-key volume is the
    key's event count (the sessionization contract — for adversarial
    hot keys use the two-phase (key, time-chunk) boundary pattern of
    ``transition_counts_scalable``). Keys with Σg = 0 (all identical
    timestamps) get cv2_e6 = 0 (perfectly regular). Returns
    (key, n_gaps, gap_sum_s, var_num, cv2_e6, flagged)."""

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key_col, ts_col, id_col]].copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[key_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values([key_col, ts_col, id_col])
        t = (
            pd.to_datetime(g[ts_col]).to_numpy().astype("datetime64[us]")
            .astype(np.int64)
        )
        same = (g[key_col] == g[key_col].shift()).to_numpy()
        gaps = pd.DataFrame(
            {
                "k": g[key_col].to_numpy()[same],
                "g": ((t - np.concatenate([[0], t[:-1]]))
                      // 1_000_000)[same],
            }
        )
        rows = []
        for k, grp in gaps.groupby("k", sort=False):
            gv = grp["g"].to_numpy(dtype=np.int64)
            n = len(gv)
            s = int(gv.sum())
            ss = int((gv.astype(object) ** 2).sum())  # bigint-safe
            var_num = n * ss - s * s
            cv2 = (var_num * 1_000_000) // (s * s) if s else 0
            rows.append(
                (k, n, s, var_num,
                 cv2, int(n >= min_gaps and cv2 < cv2_thresh_e6))
            )
        out = pd.DataFrame(
            rows,
            columns=[key_col, "n_gaps", "gap_sum_s", "var_num",
                     "cv2_e6", "flagged"],
        )
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    return (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_key, batch_format="pandas")
    )


def ordered_pair_support(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Sequential-pattern support counts (the 2-item PrefixSpan core):
    for every ORDERED event-type pair (x, y), the number of keys whose
    stream contains some x strictly before some y — the ordered
    sibling of the unordered ``itemsets3`` co-occurrence query.
    Self-pairs (x, x) count keys with ≥ 2 occurrences of x.

    The existence test reduces to per-(key, type) extrema:
    ∃ x before y  ⇔  min_ts(x) < max_ts(y)  (for x = y: min < max).
    So per-key state is TYPE-vocabulary-sized, never event-sized.

    Returns (first_type, then_type, n_keys). Scale shape: per-batch
    (key, type, min, max, n) combiner → ONE key-bucketed exchange →
    per-key vocabulary² pair generation + count partials, summed on a
    type-pair-bounded second exchange.

    Tie discipline: STRICT ts inequality (equal-timestamp pairs do not
    count — document and match in the oracle)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            pd.DataFrame(
                {"k": df[key_col], "t": df[type_col], "ts": df[ts_col]}
            )
            .groupby(["k", "t"], as_index=False)
            .agg(mn=("ts", "min"), mx=("ts", "max"))
        )
        h = pd.util.hash_pandas_object(out["k"], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def per_key_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.drop(columns="__b")
            .groupby(["k", "t"], as_index=False)
            .agg(mn=("mn", "min"), mx=("mx", "max"))
        )
        m = g.merge(g, on="k", suffixes=("_x", "_y"))
        m = m[m["mn_x"] < m["mx_y"]]
        out = (
            pd.DataFrame({"first_type": m["t_x"], "then_type": m["t_y"]})
            .groupby(["first_type", "then_type"], as_index=False)
            .size()
            .rename(columns={"size": "n_keys"})
        )
        out["n_keys"] = out["n_keys"].astype("int64")
        out["__b"] = np.zeros(len(out), dtype=np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["first_type", "then_type"], as_index=False
        )["n_keys"].sum()
        out["n_keys"] = out["n_keys"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_key_pairs, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def ordered_triple_support(
    ds: "ray.data.Dataset",
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Sequential-pattern support for ORDERED TYPE TRIPLES (the 3-item
    PrefixSpan level): for every (x, y, z) of pairwise-distinct event
    types, the number of keys whose stream contains some x strictly
    before some y strictly before some z. Level-2 extrema are not
    enough here — the middle element must actually sit INSIDE the
    (min x, max z) interval — so each key's events ship through ONE
    key-bucketed exchange and the triple test runs vectorized per key:
    with per-type min/max vectors and the key's event matrix,
    flags(y) = Aᵀ_y·B_y > 0 where A = (mn < t_e), B = (mx > t_e) —
    O(events · types²) bit-work per key, types³-bounded output.
    Returns (first_type, mid_type, then_type, n_keys)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"k": df[key_col], "t": df[type_col],
             "ts": pd.to_datetime(df[ts_col]).to_numpy()
             .astype("datetime64[us]").astype("int64")}
        )
        h = pd.util.hash_pandas_object(out["k"], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, sub in g.drop(columns="__b").groupby("k", sort=False):
            types = sorted(sub["t"].unique())
            if len(types) < 3:
                continue
            idx = {t: i for i, t in enumerate(types)}
            T = len(types)
            ts = sub["ts"].to_numpy()
            ty = sub["t"].map(idx).to_numpy()
            mn = np.full(T, np.iinfo(np.int64).max, dtype=np.int64)
            mx = np.full(T, np.iinfo(np.int64).min, dtype=np.int64)
            np.minimum.at(mn, ty, ts)
            np.maximum.at(mx, ty, ts)
            A = mn[None, :] < ts[:, None]   # events × types: x before e
            B = mx[None, :] > ts[:, None]   # events × types: z after e
            for yi in range(T):
                m = ty == yi
                if not m.any():
                    continue
                flags = (A[m].astype(np.int64).T @ B[m].astype(np.int64)) > 0
                xs, zs = np.nonzero(flags)
                for xi, zi in zip(xs, zs):
                    if xi != yi and zi != yi and xi != zi:
                        rows.append((types[xi], types[yi], types[zi]))
        if not rows:
            return pd.DataFrame(
                {"first_type": pd.Series([], dtype=object),
                 "mid_type": pd.Series([], dtype=object),
                 "then_type": pd.Series([], dtype=object),
                 "n_keys": pd.Series([], dtype="int64")}
            )
        out = pd.DataFrame(
            rows, columns=["first_type", "mid_type", "then_type"]
        )
        out = out.groupby(
            ["first_type", "mid_type", "then_type"], as_index=False
        ).size().rename(columns={"size": "n_keys"})
        return out.astype({"n_keys": "int64"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["first_type", "mid_type", "then_type"], as_index=False
        )["n_keys"].sum()
        return out.astype({"n_keys": "int64"})

    per = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_key, batch_format="pandas")
    )
    return per.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )
