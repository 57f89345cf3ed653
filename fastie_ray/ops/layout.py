"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for zone-map pruning, the third layout primitive next to
``ops/bucketed_io`` (hash layout: exchange-free joins) and
``stages/materialize`` (1-D range layout: single-key pruned reads).

Why: a table range-laid-out on one key prunes reads on that key only;
queries filtering the OTHER dimension scan everything. Sorting by the
interleaved-bit Morton code of two keys gives every fixed-size block a
small bounding box in BOTH dimensions, so per-block min/max zone maps
prune two-dimensional point/range predicates (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` operation).

Shape at 100 TB:

- the Morton code is a vectorized per-batch bit-interleave (no shuffle);
- the total order comes from ``ops.rank.global_rank`` — per-range count
  combiner + driver exclusive scan + ONE rid-bucketed exchange (never a
  full sort barrier); its partitioning assumption (no coarse z-range
  dwarfs a worker) is inherited;
- block zone maps reduce with a per-batch combiner and finish in one
  block-bucketed exchange carrying ~n_blocks rows (corpus/block_size —
  at real scale this IS the manifest table, written not collected).

Deterministic: rank ties break on ``tie_col``, so block assignment is
``ROW_NUMBER() OVER (ORDER BY z, tie)`` — bit-for-bit SQL-reproducible.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def interleave2(x: np.ndarray, y: np.ndarray, bits: int = 8) -> np.ndarray:
    """Morton code of two non-negative int arrays (< 2**bits): x takes
    the even bit positions, y the odd."""
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    z = np.zeros(x.shape, dtype=np.int64)
    for j in range(bits):
        z |= ((x >> j) & 1) << (2 * j)
        z |= ((y >> j) & 1) << (2 * j + 1)
    return z


def zorder_blocks(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
    tie_col: str,
    block_size: int = 512,
    bits: int = 8,
    range_size: int = 64,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Assign every row to a fixed-size block of the z-order layout and
    return the block zone-map table:
    ``(block, n, min_x, max_x, min_y, max_y, min_z, max_z)`` sorted by
    block. ``x_col``/``y_col`` must already be integers in
    ``[0, 2**bits)``; ``tie_col`` breaks rank ties."""
    from fastie_ray.ops.rank import global_rank

    def add_z(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[x_col, y_col, tie_col]].copy()
        out["z"] = interleave2(
            df[x_col].to_numpy(), df[y_col].to_numpy(), bits=bits
        )
        return out

    ranked = global_rank(
        ds.map_batches(add_z, batch_format="pandas"),
        key_col="z",
        tie_col=tie_col,
        range_size=range_size,
        n_buckets=n_buckets,
        keep_cols=[x_col, y_col, tie_col, "z"],
    )

    agg = {
        "n": (tie_col, "count"),
        "min_x": (x_col, "min"),
        "max_x": (x_col, "max"),
        "min_y": (y_col, "min"),
        "max_y": (y_col, "max"),
        "min_z": ("z", "min"),
        "max_z": ("z", "max"),
    }

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["block"] = (df["rank"] - 1) // block_size
        out = df.groupby("block", as_index=False).agg(**agg)
        return out

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        b = df["block"].to_numpy() if len(df) else np.array([], dtype=np.int64)
        df["__b"] = (b.astype(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop(columns="__b")
            .groupby("block", as_index=False)
            .agg(
                n=("n", "sum"),
                min_x=("min_x", "min"),
                max_x=("max_x", "max"),
                min_y=("min_y", "min"),
                max_y=("max_y", "max"),
                min_z=("min_z", "min"),
                max_z=("max_z", "max"),
            )
        )

    out = (
        ranked.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    cols = ["block", "n", "min_x", "max_x", "min_y", "max_y", "min_z", "max_z"]
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    out = out[cols].astype({c: "int64" for c in cols})
    return out.sort_values("block").reset_index(drop=True)


def prune_fraction(
    blocks: pd.DataFrame, x_lo: int, x_hi: int, y_lo: int, y_hi: int
) -> float:
    """Fraction of blocks a 2-D range predicate must read under the
    given zone maps (the layout-quality metric: lower is better)."""
    if len(blocks) == 0:
        return 0.0
    hit = (
        (blocks["max_x"] >= x_lo)
        & (blocks["min_x"] <= x_hi)
        & (blocks["max_y"] >= y_lo)
        & (blocks["min_y"] <= y_hi)
    )
    return float(hit.sum()) / float(len(blocks))


def sorted_range_export(
    ds: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    out_dir: str | None = None,
    n_parts: int = 8,
    sample_k: int = 256,
    salt: str = "srt",
) -> "ray.data.Dataset":
    """TeraSort-shape GLOBALLY SORTED export: sample-based range
    partitioning + per-partition local sort — the distributed sort
    every engine ships as its ORDER BY writer, here with NO driver
    sort barrier and a DETERMINISTIC sampler so the layout is
    SQL-reproducible:

    1. sample = the ``sample_k`` rows with smallest md5(salt:id)
       (bottom-k = k-minimum-values; per-batch bottom-k combiner,
       driver merges blocks × k rows);
    2. bounds = the sorted sample's keys at positions
       ⌊j·m/n_parts⌋, j = 1..n_parts−1 (broadcast, n_parts-bounded);
    3. part(key) = #bounds ≤ key — a vectorized searchsorted per
       batch; ONE part-bucketed exchange sorts each part by
       (key, id) and (optionally) writes ``part-<i>.parquet``;
    4. returns the part summary (part_id, n_rows, min_key, max_key)
       — the manifest a reader range-prunes with; part i's keys all
       ≤ part i+1's (global order across files, sorted within).

    INTEGER keys. Skew note: duplicate-heavy keys concentrate in one
    part (range partitioning's contract); the zone-map summary makes
    that visible — re-cut with higher ``n_parts`` or switch to
    ``zorder_blocks`` for multi-dim spread."""
    import hashlib
    import os

    import ray

    def bottomk(df: pd.DataFrame) -> pd.DataFrame:
        h = np.array(
            [hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
             for i in df[id_col].astype("int64")],
            dtype=object,
        )
        out = pd.DataFrame(
            {"h": h, "k": df[key_col].astype("int64"),
             "i": df[id_col].astype("int64")}
        )
        return out.sort_values(["h", "i"]).head(sample_k)

    samp = (
        ds.map_batches(bottomk, batch_format="pandas")
        .to_pandas()
        .sort_values(["h", "i"])
        .head(sample_k)
    )
    keys = np.sort(samp["k"].to_numpy(dtype=np.int64))
    m = len(keys)
    bounds = (
        keys[[(j * m) // n_parts for j in range(1, n_parts)]]
        if m
        else np.array([], dtype=np.int64)
    )
    bounds_ref = ray.put(bounds)

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bounds_ref)
        k = df[key_col].to_numpy(dtype=np.int64)
        part = np.searchsorted(b, k, side="right")
        out = pd.DataFrame(
            {"part": part.astype(np.int64), "k": k,
             "i": df[id_col].astype("int64")}
        )
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["part", "k", "i"])
        outs = []
        for p, gp in g.groupby("part", sort=True):
            if out_dir is not None:
                gp[["k", "i"]].rename(
                    columns={"k": key_col, "i": id_col}
                ).to_parquet(os.path.join(out_dir, f"part-{int(p):05d}.parquet"))
            outs.append(
                {
                    "part_id": np.int64(p),
                    "n_rows": np.int64(len(gp)),
                    "min_key": np.int64(gp["k"].iloc[0]),
                    "max_key": np.int64(gp["k"].iloc[-1]),
                }
            )
        return pd.DataFrame(outs) if outs else pd.DataFrame(
            {"part_id": pd.Series([], dtype="int64"),
             "n_rows": pd.Series([], dtype="int64"),
             "min_key": pd.Series([], dtype="int64"),
             "max_key": pd.Series([], dtype="int64")}
        )

    tagged = ds.map_batches(assign, batch_format="pandas")

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = df["part"].astype("int64")
        return df

    return (
        tagged.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: finish(g.drop(columns="__b")), batch_format="pandas"
        )
    )


def morton2(x: np.ndarray, y: np.ndarray, bits: int = 16) -> np.ndarray:
    """Interleave the low ``bits`` of x (even positions) and y (odd).
    Wider sibling of ``interleave2`` (16-bit dims for the pruning
    census below)."""
    x = x.astype(np.int64)
    y = y.astype(np.int64)
    m = np.zeros(len(x), dtype=np.int64)
    for i in range(bits):
        m |= ((x >> i) & 1) << (2 * i)
        m |= ((y >> i) & 1) << (2 * i + 1)
    return m


def zorder_prune_census(
    ds: "ray.data.Dataset",
    x_col: str,
    y_col: str,
    tie_col: str,
    query: tuple[int, int, int, int],
    block_rows: int = 256,
    bits: int = 16,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Z-order vs row-order zone-map pruning census — the measured
    version of the OPTIMIZE ZORDER decision (``zorder_blocks`` above
    builds the layout; this quantifies what it buys): for the rect
    query ``(x_lo, x_hi, y_lo, y_hi)``, how many ``block_rows``-row
    blocks must be scanned under (a) Morton order, (b) the natural
    row order — touched = the block's (min, max) zone-map intervals
    intersect the query on BOTH dimensions. Returns one row per
    layout: (layout, n_blocks, n_blocks_touched).

    Scale shape: Morton coding is a vectorized per-batch map; each
    layout costs one ``global_rank`` (range-partitioned prefix counts,
    no sort barrier) plus a block-keyed min/max combine; the zone-map
    table (rows / block_rows entries — the metadata a table format
    keeps per file anyway) is the only driver-side structure. Ties
    inside equal sort keys break on ``tie_col`` (unique integer)."""
    from fastie_ray.ops.rank import global_rank

    x_lo, x_hi, y_lo, y_hi = query

    def code(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.int64)
        y = df[y_col].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "x": x,
                "y": y,
                "tie": df[tie_col].to_numpy(dtype=np.int64),
                "m": morton2(x, y, bits),
            }
        )

    base = ds.map_batches(code, batch_format="pandas").materialize()

    rows = []
    for layout, key, rng in (
        ("zorder", "m", 1 << max(bits * 2 - 8, 1)),
        ("row", "tie", None),
    ):
        if rng is None:
            rng = max(int(base.max("tie")) // 256, 1)
        ranked = global_rank(
            base, key_col=key, tie_col="tie", range_size=rng,
            keep_cols=["x", "y"], n_buckets=n_buckets,
        )

        def zone_partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["blk"] = (df["rank"] - 1) // block_rows
            return df.groupby("blk", as_index=False).agg(
                mnx=("x", "min"), mxx=("x", "max"),
                mny=("y", "min"), mxy=("y", "max"),
            )

        zones = (
            ranked.map_batches(zone_partial, batch_format="pandas")
            .to_pandas()
            .groupby("blk", as_index=False)
            .agg(mnx=("mnx", "min"), mxx=("mxx", "max"),
                 mny=("mny", "min"), mxy=("mxy", "max"))
        )
        touched = (
            (zones["mxx"] >= x_lo) & (zones["mnx"] <= x_hi)
            & (zones["mxy"] >= y_lo) & (zones["mny"] <= y_hi)
        ).sum()
        rows.append((layout, len(zones), int(touched)))
    return pd.DataFrame(
        rows, columns=["layout", "n_blocks", "n_blocks_touched"]
    ).astype({"n_blocks": "int64", "n_blocks_touched": "int64"})


def encoding_census(
    ds: "ray.data.Dataset",
    int_cols: list[str],
    tie_col: str,
    block_rows: int = 1024,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Lightweight-compression advisor (the FastLanes/Parquet-encoding
    decision, measured per block): cut the table into
    ``block_rows``-row blocks in canonical ``tie_col`` order and, for
    every integer column and block, estimate the encoded size under

    - ``plain``: 8 bytes/value,
    - ``for``:   frame-of-reference — bits(max−min) per value + a
                 16-byte frame header,
    - ``rle``:   run-length — 10 bytes per run (8 value + 2 length),

    then count which scheme wins each block (ties → scheme name asc)
    and the per-scheme total bytes. Returns one row per
    (column, scheme): (column, scheme, n_blocks_best, est_bytes) —
    the table a writer consults before committing an encoding.

    Integer-exact: bit widths via ``bit_length`` (= length(bin(x)) in
    SQL, 0 for a zero range), runs counted block-locally (no
    cross-boundary state by construction). One ``global_rank`` for the
    canonical order + ONE block-keyed exchange; output is
    columns × 3 rows."""
    from fastie_ray.ops.rank import global_rank

    ranked = global_rank(
        ds, key_col=tie_col, tie_col=tie_col,
        range_size=max(int(ds.max(tie_col)) // 256, 1),
        keep_cols=int_cols, n_buckets=n_buckets,
    )

    def add_blk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["blk"] = (df["rank"] - 1) // block_rows
        h = df["blk"].to_numpy().astype(np.uint64)
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def block_stats(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for blk, sub in g.drop(columns="__b").groupby("blk", sort=False):
            sub = sub.sort_values("rank")
            n = len(sub)
            for c in int_cols:
                v = sub[c].to_numpy(dtype=np.int64)
                rng = int(v.max() - v.min())
                bits = rng.bit_length() if rng > 0 else 0
                n_runs = int(1 + (v[1:] != v[:-1]).sum()) if n else 0
                plain = 8 * n
                forb = (bits * n + 7) // 8 + 16
                rle = 10 * n_runs
                best = min(
                    [("for", forb), ("plain", plain), ("rle", rle)],
                    key=lambda kv: (kv[1], kv[0]),
                )[0]
                for scheme, sz in (
                    ("plain", plain), ("for", forb), ("rle", rle)
                ):
                    rows.append(
                        (c, scheme, 1 if scheme == best else 0, sz)
                    )
        if not rows:
            return pd.DataFrame(
                {"column": pd.Series([], dtype=object),
                 "scheme": pd.Series([], dtype=object),
                 "n_blocks_best": pd.Series([], dtype="int64"),
                 "est_bytes": pd.Series([], dtype="int64")}
            )
        out = pd.DataFrame(
            rows,
            columns=["column", "scheme", "n_blocks_best", "est_bytes"],
        )
        return out.groupby(
            ["column", "scheme"], as_index=False
        ).sum().astype({"n_blocks_best": "int64", "est_bytes": "int64"})

    parts = (
        ranked.map_batches(add_blk, batch_format="pandas")
        .groupby("__b")
        .map_groups(block_stats, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby(["column", "scheme"], as_index=False).sum()
    return out.astype(
        {"n_blocks_best": "int64", "est_bytes": "int64"}
    ).sort_values(["column", "scheme"]).reset_index(drop=True)
