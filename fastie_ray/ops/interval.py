"""Interval-overlap join: all pairs of intervals sharing an equi-key
that overlap in time (a.start ≤ b.end AND b.start ≤ a.end, inclusive)
— the sessions / validity-window / genomics join shape.  Completes the
temporal-join family (``ops/windows.range_join`` joins point events
within a lookback window; this joins INTERVAL × INTERVAL).

Scale shape — chunked replication with a canonical-chunk rule, ONE
exchange, no pair dedup pass:

- each interval is replicated to every time chunk it covers
  (``bucket`` granularity; replication factor = interval length /
  bucket + 1, so pick ``bucket`` at or above the typical interval
  length);
- two overlapping intervals both cover the chunk containing
  ``max(a.start, b.start)``, so every overlapping pair co-locates in
  at least one (key, chunk) group;
- the pair is EMITTED only in that one chunk (the canonical-chunk
  test ``chunk == floor(max(a.start, b.start))`` inside the group),
  so no pair is produced twice and no dedup exchange is needed;
- groups are keyed (equi-key, chunk): a hot key's intervals spread
  over its chunks; within a group the pair search is a vectorized
  pandas merge + mask, bounded by in-chunk density².

``self_pairs=True`` mines unordered pairs within ONE dataset
(``id_a < id_b``); otherwise all overlapping left × right pairs are
emitted.  Output is a Dataset of pair rows — never collected on the
driver."""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:
    import ray.data


def _replicate(
    df: pd.DataFrame,
    id_col: str,
    key_col: str,
    start_col: str,
    end_col: str,
    bucket_td: pd.Timedelta,
    n_buckets: int,
    side: str,
) -> pd.DataFrame:
    out_cols = {
        "id": np.array([], dtype=np.int64),
        "k": np.array([], dtype=object),
        "s": pd.Series([], dtype="datetime64[us]"),
        "e": pd.Series([], dtype="datetime64[us]"),
        "__chunk": pd.Series([], dtype="datetime64[us]"),
        "__side": np.array([], dtype=object),
        "__b": np.array([], dtype=np.int64),
    }
    if len(df) == 0:
        return pd.DataFrame(out_cols)
    s = pd.to_datetime(df[start_col])
    e = pd.to_datetime(df[end_col])
    c0 = s.dt.floor(bucket_td)
    c1 = e.dt.floor(bucket_td)
    n_chunks = ((c1 - c0) // bucket_td).to_numpy() + 1
    idx = np.repeat(np.arange(len(df)), n_chunks)
    offs = np.concatenate([np.arange(n) for n in n_chunks]) if len(df) else np.array([], dtype=np.int64)
    chunk = c0.to_numpy()[idx] + offs * bucket_td.to_numpy()
    out = pd.DataFrame(
        {
            "id": df[id_col].to_numpy()[idx],
            "k": df[key_col].to_numpy()[idx],
            "s": s.to_numpy()[idx],
            "e": e.to_numpy()[idx],
            "__chunk": chunk,
            "__side": side,
        }
    )
    h = (
        pd.util.hash_pandas_object(out["k"], index=False).to_numpy()
        ^ pd.util.hash_pandas_object(out["__chunk"], index=False).to_numpy()
    )
    out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
    return out


def interval_overlap_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset | None" = None,
    id_col: str = "iid",
    key_col: str = "k",
    start_col: str = "s",
    end_col: str = "e",
    bucket: str = "7d",
    n_buckets: int = 16,
    self_pairs: bool = False,
) -> "ray.data.Dataset":
    """Overlapping interval pairs per equi-key.  With
    ``self_pairs=True`` (``right`` ignored) emits unordered pairs
    ``id_a < id_b`` from ``left`` alone.  Returns pair rows
    (k, id_a, id_b)."""
    bucket_td = pd.Timedelta(bucket)

    def rep_side(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return _replicate(
                df, id_col, key_col, start_col, end_col,
                bucket_td, n_buckets, side,
            )

        return fn

    if self_pairs:
        tagged = left.map_batches(rep_side("a"), batch_format="pandas")
    else:
        if right is None:
            raise ValueError("right dataset required unless self_pairs=True")
        tagged = left.map_batches(rep_side("a"), batch_format="pandas").union(
            right.map_batches(rep_side("b"), batch_format="pandas")
        )

    schema = pa.schema(
        [("k", pa.int64()), ("id_a", pa.int64()), ("id_b", pa.int64())]
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        a = g[g["__side"] == "a"]
        b = a if self_pairs else g[g["__side"] == "b"]
        if len(a) == 0 or len(b) == 0:
            return schema.empty_table()
        m = a.merge(b, on=["k", "__chunk"], suffixes=("_a", "_b"))
        if len(m) == 0:
            return schema.empty_table()
        ok = (m["s_a"] <= m["e_b"]) & (m["s_b"] <= m["e_a"])
        # canonical chunk: emit only where both copies sit in the
        # chunk of the later start — exactly one group per pair
        later = np.maximum(m["s_a"].to_numpy(), m["s_b"].to_numpy())
        canon = pd.Series(later).dt.floor(bucket_td).to_numpy()
        ok &= m["__chunk"].to_numpy() == canon
        if self_pairs:
            ok &= m["id_a"].to_numpy() < m["id_b"].to_numpy()
        m = m[ok]
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "k": m["k"].astype("int64"),
                    "id_a": m["id_a"].astype("int64"),
                    "id_b": m["id_b"].astype("int64"),
                }
            ),
            preserve_index=False,
            schema=schema,
        )

    return (
        tagged.groupby("__b")
        .map_groups(
            lambda g: pairs(g.drop(columns="__b")), batch_format="pandas"
        )
    )


def range_lookup(
    points: "ray.data.Dataset",
    ranges: "ray.data.Dataset",
    x_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    range_id_col: str = "range_id",
    mode: str = "broadcast",
    chunk: int | None = None,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Point-in-range LOOKUP join — enrich a point stream with the id
    of the range ``[lo, hi]`` (inclusive) containing it: the GeoIP /
    tax-bracket / tier-table shape (reference analogue: the alias-dict
    enrichment of stages/link.py generalized from equality to interval
    containment). Points matching no range are dropped (inner
    semantics); a point matching several ranges emits one row per
    match in ``exchange`` mode (``broadcast`` mode requires
    non-overlapping ranges and raises otherwise).

    Two scale shapes, parity-tested against each other:

    - ``mode="broadcast"`` (the production lookup-table case): the
      range table is dimension-sized → ``ray.put`` its sorted
      (lo, hi, id) arrays ONCE, every task resolves batches with one
      ``np.searchsorted`` against plasma-shared arrays — streaming,
      ZERO exchanges, no per-batch re-ship. Requires sorted
      NON-overlapping ranges (checked at build).
    - ``mode="exchange"`` (range table itself corpus-sized): the
      integer domain is chunked at ``chunk`` width; each range
      replicates to the chunks it covers (factor = len/chunk + 1 —
      pick ``chunk`` at or above typical range length), each point
      sits in exactly ITS OWN chunk, and the containing range always
      has a copy there — one (chunk-bucketed) exchange, single
      emission, no dedup pass (same canonical-chunk argument as
      ``interval_overlap_join``, degenerate because a point is a
      zero-length interval).

    Returns points' rows (x, range_id)."""
    import ray

    if mode == "broadcast":
        rdf = ranges.to_pandas().sort_values(lo_col).reset_index(drop=True)
        los = rdf[lo_col].to_numpy(dtype=np.int64)
        his = rdf[hi_col].to_numpy(dtype=np.int64)
        if np.any(his[:-1] >= los[1:]) or np.any(his < los):
            raise ValueError(
                "broadcast mode requires sorted non-overlapping ranges"
            )
        ids = rdf[range_id_col].to_numpy(dtype=np.int64)
        tab_ref = ray.put((los, his, ids))

        def lookup(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame(
                    {
                        "x": np.array([], dtype=np.int64),
                        range_id_col: np.array([], dtype=np.int64),
                    }
                )
            lo_a, hi_a, id_a = ray.get(tab_ref)
            x = df[x_col].to_numpy(dtype=np.int64)
            j = np.searchsorted(lo_a, x, side="right") - 1
            jc = np.clip(j, 0, None)
            ok = (j >= 0) & (x <= hi_a[jc])
            return pd.DataFrame(
                {"x": x[ok], range_id_col: id_a[jc[ok]]}
            )

        return points.map_batches(lookup, batch_format="pandas")

    if mode != "exchange":
        raise ValueError(f"mode must be broadcast|exchange, got {mode!r}")
    if chunk is None or chunk <= 0:
        raise ValueError("exchange mode requires a positive chunk width")

    def _b(c: np.ndarray) -> np.ndarray:
        h = pd.util.hash_pandas_object(
            pd.Series(c), index=False
        ).to_numpy()
        return (h % np.uint64(n_buckets)).astype(np.int64)

    def rep_ranges(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "x": np.array([], dtype=np.int64),
                    "rid": np.array([], dtype=np.int64),
                    "lo": np.array([], dtype=np.int64),
                    "hi": np.array([], dtype=np.int64),
                    "__chunk": np.array([], dtype=np.int64),
                    "__side": np.array([], dtype=object),
                    "__b": np.array([], dtype=np.int64),
                }
            )
        lo = df[lo_col].to_numpy(dtype=np.int64)
        hi = df[hi_col].to_numpy(dtype=np.int64)
        c0 = np.floor_divide(lo, chunk)
        n_chunks = np.floor_divide(hi, chunk) - c0 + 1
        idx = np.repeat(np.arange(len(df)), n_chunks)
        offs = np.concatenate([np.arange(n) for n in n_chunks])
        out = pd.DataFrame(
            {
                "x": np.int64(0),
                "rid": df[range_id_col].to_numpy(dtype=np.int64)[idx],
                "lo": lo[idx],
                "hi": hi[idx],
                "__chunk": c0[idx] + offs,
                "__side": "r",
            }
        )
        out["__b"] = _b(out["__chunk"].to_numpy())
        return out

    def rep_points(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return rep_ranges(df)
        x = df[x_col].to_numpy(dtype=np.int64)
        out = pd.DataFrame(
            {
                "x": x,
                "rid": np.int64(0),
                "lo": np.int64(0),
                "hi": np.int64(0),
                "__chunk": np.floor_divide(x, chunk),
                "__side": "p",
            }
        )
        out["__b"] = _b(out["__chunk"].to_numpy())
        return out

    tagged = points.map_batches(rep_points, batch_format="pandas").union(
        ranges.map_batches(rep_ranges, batch_format="pandas")
    )
    schema = pa.schema([("x", pa.int64()), (range_id_col, pa.int64())])

    def match(g: pd.DataFrame) -> pa.Table:
        p = g[g["__side"] == "p"]
        r = g[g["__side"] == "r"]
        if len(p) == 0 or len(r) == 0:
            return schema.empty_table()
        m = p[["x", "__chunk"]].merge(
            r[["rid", "lo", "hi", "__chunk"]], on="__chunk"
        )
        m = m[(m["lo"] <= m["x"]) & (m["x"] <= m["hi"])]
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "x": m["x"].astype("int64"),
                    range_id_col: m["rid"].astype("int64"),
                }
            ),
            preserve_index=False,
            schema=schema,
        )

    return tagged.groupby("__b").map_groups(
        lambda g: match(g.drop(columns="__b")), batch_format="pandas"
    )


def _coalesce_frame(df: pd.DataFrame, by: list[str]) -> pd.DataFrame:
    """Vectorized gaps-and-islands union of half-open [s, e) intervals
    within each ``by`` group (touch semantics: s == prev max e merges)."""
    df = df.sort_values(by + ["s", "e"]).reset_index(drop=True)
    me = df.groupby(by)["e"].transform(lambda x: x.cummax().shift(1))
    new_grp = (me.isna() | (df["s"] > me)).astype(np.int64)
    gid = new_grp.groupby([df[c] for c in by]).cumsum()
    out = df.groupby(by + [gid.rename("__g")], as_index=False).agg(
        s=("s", "min"), e=("e", "max")
    )
    return out[by + ["s", "e"]]


def interval_coalesce(
    ds: "ray.data.Dataset",
    key_col: str = "k",
    s_col: str = "s_us",
    e_col: str = "e_us",
    chunk: int = 86_400_000_000,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Coalesce overlapping-or-touching half-open intervals ``[s, e)``
    per key into their union spans (uptime/SLA accounting, session
    unions, covered-time dedup). Touch semantics: ``[1,5)`` and
    ``[5,9)`` merge. Columns are INT64 microseconds (never bucket on
    datetimes - pandas promotes us->ns batch-dependently and the bucket
    hash flips, NOTES fact 23). Empty/inverted intervals (e <= s) drop.

    Two-phase scalable shape (the ``rolling_avg`` pattern - a hot
    key's spans never land in one task whole):

    - Phase 1: each interval replicates CLIPPED to the time chunks it
      covers (batch-local pre-coalesce acts as a combiner), then ONE
      (key, chunk)-bucketed exchange coalesces each chunk's fragments
      with a vectorized running-max scan. A span strictly interior to
      its chunk (s > chunk_lo AND e < chunk_hi) is separated from
      every other chunk's content by a positive gap, so it is FINAL
      and streams out. Spans touching a chunk edge (<= 2 per
      (key, chunk) after coalescing) continue.
    - Phase 2: ONE key-bucketed exchange over boundary spans only -
      per key a sorted linear coalesce stitches cross-chunk chains.
      Volume is O(keys x chunks touched), independent of per-chunk
      interval density.

    Returns (k, s, e) union spans."""
    out_schema = pa.schema(
        [("k", pa.int64()), ("s", pa.int64()), ("e", pa.int64())]
    )
    edge_schema = pa.schema(
        [("k", pa.int64()), ("s", pa.int64()), ("e", pa.int64()),
         ("__edge", pa.int64())]
    )

    _EMPTY_KSE = pd.DataFrame(
        {"k": pd.Series([], dtype="int64"),
         "__chunk": pd.Series([], dtype="int64"),
         "s": pd.Series([], dtype="int64"),
         "e": pd.Series([], dtype="int64")}
    )

    def replicate(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY_KSE.copy()
        s = df[s_col].to_numpy(dtype=np.int64)
        e = df[e_col].to_numpy(dtype=np.int64)
        k = df[key_col].to_numpy(dtype=np.int64)
        ok = e > s
        s, e, k = s[ok], e[ok], k[ok]
        if len(s) == 0:
            return _EMPTY_KSE.copy()
        c0 = s // chunk
        c1 = (e - 1) // chunk  # half-open: e on a boundary stays left
        n_chunks = c1 - c0 + 1
        idx = np.repeat(np.arange(len(s)), n_chunks)
        offs = np.concatenate([np.arange(n) for n in n_chunks])
        cid = c0[idx] + offs
        lo = cid * chunk
        hi = lo + chunk
        out = pd.DataFrame(
            {
                "k": k[idx],
                "__chunk": cid,
                "s": np.maximum(s[idx], lo),
                "e": np.minimum(e[idx], hi),
            }
        )
        return _coalesce_frame(out, ["k", "__chunk"])  # batch combiner

    def chunk_final(g: pd.DataFrame) -> pd.DataFrame:
        out = _coalesce_frame(g, ["k", "__chunk"])
        lo = out["__chunk"].to_numpy() * chunk
        hi = lo + chunk
        edge = (
            (out["s"].to_numpy() == lo) | (out["e"].to_numpy() == hi)
        ).astype(np.int64)
        return pd.DataFrame(
            {"k": out["k"].astype("int64"), "s": out["s"].astype("int64"),
             "e": out["e"].astype("int64"), "__edge": edge}
        )

    def interiors_only(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["__edge"] == 0, ["k", "s", "e"]].reset_index(
            drop=True
        )

    def edges_only(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["__edge"] == 1, ["k", "s", "e"]]

    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        res = _coalesce_frame(g, ["k"])
        return res[["k", "s", "e"]].astype(
            {"k": "int64", "s": "int64", "e": "int64"}
        )

    # two raw-task exchanges (no sort barriers, no mid-pipeline
    # materialize): phase 1 keyed (k, chunk) — the replicate combiner
    # fused into the split — phase 2 keyed k over boundary spans only;
    # interior spans stream straight out of the phase-1 buckets
    from fastie_ray.state.exchange import BlockSet

    per_chunk = BlockSet.from_dataset(ds).exchange(
        ["k", "__chunk"], chunk_final, n_buckets=n_buckets,
        map_fn=replicate,
    )
    interiors = per_chunk.map(interiors_only).to_dataset()
    stitched = per_chunk.exchange(
        ["k"], stitch, n_buckets=n_buckets, map_fn=edges_only
    ).to_dataset()
    return interiors.union(stitched)


def band_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_col: str,
    ts_col: str,
    band: str = "30min",
    direction: str = "forward",
    id_col: str = "event_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Stream-stream BAND join (the point×point member of the temporal
    family; ``range_join`` is point-in-lookback, ``asof_join`` is
    nearest-one, ``interval_overlap_join`` is interval×interval): all
    (left, right) pairs sharing ``key_col`` whose timestamps fall
    within ``band`` of each other. ``direction='forward'`` keeps
    0 ≤ ts_right − ts_left ≤ band (click → purchase attribution);
    ``'both'`` keeps |Δ| ≤ band.

    Scale shape — ONE exchange, single emission, payload-free
    replication: time is chunked at ``band`` width; a RIGHT row sits in
    exactly its own chunk, a LEFT row is replicated to its chunk and
    the next (``forward``; previous too for ``both``), and every
    qualifying pair co-locates in the RIGHT row's chunk — which is
    unique, so no pair is emitted twice and no dedup pass runs. Groups
    are (key, chunk): a hot key's events spread over its chunks; the
    in-group pair search is a vectorized merge bounded by in-chunk
    density². Replication factor is a constant 2 (forward) / 3 (both).

    Returns (key, id_left, id_right, delta_us) — payloads rejoin by id
    downstream if needed, so the exchange never ships them."""
    if direction not in ("forward", "both"):
        raise ValueError(f"direction must be forward|both, got {direction!r}")
    band_td = pd.Timedelta(band)

    # chunk ids are INTEGER microsecond floor-divisions, never
    # timestamps: pandas silently promotes datetime64[us] arithmetic to
    # [ns] batch-dependently, and a dtype flip changes
    # hash_pandas_object — left and right copies of the same chunk then
    # land in different buckets (measured: zero pairs emitted)
    w_us = int(band_td.to_numpy().astype("timedelta64[us]").astype(np.int64))

    def _t_us(s: pd.Series) -> np.ndarray:
        return (
            pd.to_datetime(s).to_numpy().astype("datetime64[us]")
            .astype(np.int64)
        )

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": np.array([], dtype=np.int64),
                "k": np.array([], dtype=np.int64),
                "t_us": np.array([], dtype=np.int64),
                "__chunk": np.array([], dtype=np.int64),
                "__side": np.array([], dtype=object),
                "__b": np.array([], dtype=np.int64),
            }
        )

    def rep_left(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _empty()
        t = _t_us(df[ts_col])
        c0 = t // w_us
        offs = [0, 1] if direction == "forward" else [-1, 0, 1]
        frames = []
        for o in offs:
            frames.append(
                pd.DataFrame(
                    {
                        "id": df[id_col].to_numpy(),
                        "k": df[key_col].to_numpy(),
                        "t_us": t,
                        "__chunk": c0 + o,
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        out["__side"] = "l"
        h = (
            pd.util.hash_pandas_object(out["k"], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(out["__chunk"], index=False).to_numpy()
        )
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def rep_right(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _empty()
        t = _t_us(df[ts_col])
        out = pd.DataFrame(
            {
                "id": df[id_col].to_numpy(),
                "k": df[key_col].to_numpy(),
                "t_us": t,
                "__chunk": t // w_us,
            }
        )
        out["__side"] = "r"
        h = (
            pd.util.hash_pandas_object(out["k"], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(out["__chunk"], index=False).to_numpy()
        )
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    tagged = left.map_batches(rep_left, batch_format="pandas").union(
        right.map_batches(rep_right, batch_format="pandas")
    )

    schema = pa.schema(
        [
            ("k", pa.int64()),
            ("id_left", pa.int64()),
            ("id_right", pa.int64()),
            ("delta_us", pa.int64()),
        ]
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        lg = g[g["__side"] == "l"]
        rg = g[g["__side"] == "r"]
        if len(lg) == 0 or len(rg) == 0:
            return schema.empty_table()
        m = lg.merge(rg, on=["k", "__chunk"], suffixes=("_l", "_r"))
        if len(m) == 0:
            return schema.empty_table()
        delta = m["t_us_r"].to_numpy() - m["t_us_l"].to_numpy()
        if direction == "forward":
            ok = (delta >= 0) & (delta <= w_us)
        else:
            ok = np.abs(delta) <= w_us
        m = m[ok]
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "k": m["k"].astype("int64"),
                    "id_left": m["id_l"].astype("int64"),
                    "id_right": m["id_r"].astype("int64"),
                    "delta_us": delta[ok],
                }
            ),
            preserve_index=False,
            schema=schema,
        )

    return tagged.groupby("__b").map_groups(
        lambda g: pairs(g.drop(columns="__b")), batch_format="pandas"
    )
