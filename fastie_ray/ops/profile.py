"""Table profiling — the data-quality audit pass (Deequ/GE-style) a
production lake runs on every ingested table: per column, row count,
null count, exact distinct count, and min/max.

Scale shape: null/min/max reduce per batch and merge on the driver
(columns × blocks rows); the exact distinct count is ONE tag-union
hash-bucketed exchange over the DISTINCT (column, value) pairs —
per-batch ``drop_duplicates`` combiner first, so the exchange carries
per-column vocabularies, never the corpus.

Determinism notes: min/max are carried NATIVELY through the per-batch
partials and the driver merge (string comparison would order "10"
before "9") and stringified only in the final report, and only for
int64/string columns — float formatting differs across engines, so
float/timestamp min/max are left empty rather than risking a repr
mismatch. The distinct-count exchange stringifies values for its key,
which is injective for the supported dtypes.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def table_profile(
    ds: "ray.data.Dataset",
    columns: list[str],
    n_buckets: int = 16,
) -> pd.DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) — one
    row per profiled column; min/max as strings for int64/string
    dtypes, '' otherwise."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in columns:
            s = df[c]
            keep = s.dropna()
            mm_ok = len(keep) > 0 and (
                keep.dtype.kind in "iu" or keep.dtype == object
            )
            rows.append(
                {
                    "column": c,
                    "n_rows": int(len(s)),
                    "n_nulls": int(s.isna().sum()),
                    "mn": keep.min() if mm_ok else None,
                    "mx": keep.max() if mm_ok else None,
                }
            )
        return pd.DataFrame(rows)

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()

    def merge_col(g: pd.DataFrame) -> pd.Series:
        mns = [v for v in g["mn"] if v is not None]
        mxs = [v for v in g["mx"] if v is not None]
        return pd.Series(
            {
                "n_rows": int(g["n_rows"].sum()),
                "n_nulls": int(g["n_nulls"].sum()),
                "min_val": str(min(mns)) if mns else "",
                "max_val": str(max(mxs)) if mxs else "",
            }
        )

    stats = parts.groupby("column").apply(merge_col).reset_index()

    def dist_partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in columns:
            v = df[c].dropna().astype(str).drop_duplicates()
            frames.append(pd.DataFrame({"column": c, "value": v}))
        return pd.concat(frames, ignore_index=True)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df["column"] + "\x00" + df["value"], index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def count_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop(columns="__b").drop_duplicates()
        return u.groupby("column", as_index=False).agg(n_distinct=("value", "count"))

    dist = (
        ds.map_batches(dist_partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(count_in_bucket, batch_format="pandas")
        .to_pandas()
        .groupby("column", as_index=False)["n_distinct"]
        .sum()
    )
    out = stats.merge(dist, on="column", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0).astype("int64")
    out["n_rows"] = out["n_rows"].astype("int64")
    out["n_nulls"] = out["n_nulls"].astype("int64")
    return out.sort_values("column").reset_index(drop=True)[
        ["column", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val"]
    ]


def violation_count(ds: "ray.data.Dataset", mask_fn) -> tuple[int, int]:
    """Constraint-violation counter: ``mask_fn(df) -> bool array`` marks
    violating rows; per-batch partial sums reduce to driver scalars
    (violations, rows) — blocks × two ints, the Deequ "metric" shape,
    never row-sized."""
    parts = ds.map_batches(
        lambda df: pd.DataFrame(
            {"n": [np.int64(int(np.asarray(mask_fn(df)).sum()))],
             "t": [np.int64(len(df))]}
        ),
        batch_format="pandas",
    ).to_pandas()
    return int(parts["n"].sum()), int(parts["t"].sum())


def distinct_violations(
    ds: "ray.data.Dataset", col: str, n_buckets: int = 16
) -> tuple[int, int]:
    """Uniqueness check: (rows − distinct values, rows). Distinct via
    per-batch drop_duplicates combiner → one bucketed exchange."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[[col]].drop_duplicates()

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    distinct = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: g.drop(columns="__b").drop_duplicates(),
            batch_format="pandas",
        )
        .count()
    )
    total = ds.count()
    return total - distinct, total


def orphan_count(
    child: "ray.data.Dataset",
    parent: "ray.data.Dataset",
    on: str,
    right_on: str,
    n_buckets: int = 16,
) -> tuple[int, int]:
    """Referential-integrity check: child rows whose key has no parent
    (anti hash join — parent side ships DISTINCT keys only)."""
    from fastie_ray.ops.join import hash_join

    orphans = hash_join(
        child, parent, on=on, right_on=right_on, how="anti",
        left_cols=[on], n_buckets=n_buckets,
    ).count()
    return orphans, child.count()


def dq_report(entries: list) -> pd.DataFrame:
    """(check_name, n_violations, n_rows) rows — the fixed-size audit
    artifact (checks-bounded, assembled from driver scalars)."""
    out = pd.DataFrame(
        entries, columns=["check_name", "n_violations", "n_rows"]
    )
    return out.astype({"n_violations": "int64", "n_rows": "int64"}).sort_values(
        "check_name"
    ).reset_index(drop=True)

def id_gaps(
    ds: "ray.data.Dataset",
    id_col: str = "id",
    range_size: int = 100_000,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """All missing-id RANGES (gap_start, gap_end inclusive) in an
    integer id column — the offset-continuity audit (Kafka offsets,
    autoincrement keys, event sequence gaps).

    Scale shape: ids bucket by rid = id // range_size so consecutive
    ids co-locate; each (rid) group emits its INTERNAL gaps (sorted
    diff > 1, vectorized) plus one (rid, min, max) summary row; the
    driver sorts only the occupied-rid summary table (id-span /
    range_size rows — pick ``range_size`` so that stays small) and
    closes CROSS-range gaps between consecutive summaries, which also
    covers entirely-empty ranges. Duplicate ids collapse in-group;
    nothing id-sized reaches the driver."""

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"id": df[id_col].astype("int64")})
        if len(out) == 0:
            out["__rid"] = pd.Series([], dtype="int64")
            out["__b"] = pd.Series([], dtype="int64")
            return out
        out["__rid"] = out["id"].to_numpy() // range_size
        h = pd.util.hash_pandas_object(out["__rid"], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def in_range(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for rid, grp in g.groupby("__rid", sort=False):
            ids = np.unique(grp["id"].to_numpy(dtype=np.int64))
            d = np.diff(ids)
            gi = np.nonzero(d > 1)[0]
            for i in gi:
                rows.append(("gap", ids[i] + 1, ids[i + 1] - 1))
            rows.append(("sum", int(ids[0]), int(ids[-1])))
        out = pd.DataFrame(rows, columns=["kind", "lo", "hi"])
        out["lo"] = out["lo"].astype("int64")
        out["hi"] = out["hi"].astype("int64")
        return out

    parts = (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(in_range, batch_format="pandas")
        .to_pandas()
    )
    gaps = parts[parts["kind"] == "gap"][["lo", "hi"]]
    sums = parts[parts["kind"] == "sum"].sort_values("lo")
    lo = sums["lo"].to_numpy(dtype=np.int64)
    hi = sums["hi"].to_numpy(dtype=np.int64)
    cross = pd.DataFrame(
        {
            "lo": hi[:-1] + 1,
            "hi": lo[1:] - 1,
        }
    )
    cross = cross[cross["hi"] >= cross["lo"]]
    out = (
        pd.concat([gaps, cross], ignore_index=True)
        .rename(columns={"lo": "gap_start", "hi": "gap_end"})
        .sort_values("gap_start")
        .reset_index(drop=True)
    )
    out["gap_start"] = out["gap_start"].astype("int64")
    out["gap_end"] = out["gap_end"].astype("int64")
    return out


def source_scorecard(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Per-source ingest scorecard — the blocklist-derivation report a
    crawl pipeline runs before admitting a source: doc volume, CHARS,
    language spread and the source's share of corpus-wide EXACT
    duplicates (a source whose docs keep appearing elsewhere is a
    mirror or a spammer). Returns (source, n_docs, n_dup_docs,
    sum_chars, mean_chars, n_langs), int64, mean floored.

    Scale shape: base stats + language pairs come from per-batch
    combiners (source-domain-bounded); duplicate attribution hashes
    each doc ONCE (md5 of the text), ships only (md5, source, n)
    combiner rows through ONE md5-bucketed exchange where each md5
    group decides dup/unique locally and re-emits per-source dup
    counts; the three source-keyed partials merge on the driver
    (source domain is small by definition — swap for one exchange if
    it is not)."""
    import hashlib

    def base(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].astype(str)
        return pd.DataFrame(
            {"g": df[group_col], "n_chars": t.str.len().astype("int64")}
        ).groupby("g", as_index=False, dropna=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )

    def langs(df: pd.DataFrame) -> pd.DataFrame:
        return df[[group_col, lang_col]].drop_duplicates().rename(
            columns={group_col: "g", lang_col: "l"}
        )

    def hashes(df: pd.DataFrame) -> pd.DataFrame:
        h = df[text_col].astype(str).map(
            lambda s: hashlib.md5(s.encode()).hexdigest()
        )
        out = pd.DataFrame({"h": h, "g": df[group_col]})
        agg = out.groupby(["h", "g"], as_index=False, dropna=False).size().rename(
            columns={"size": "n"}
        )
        hb = pd.util.hash_pandas_object(agg["h"], index=False).to_numpy()
        agg["__b"] = (hb % np.uint64(n_buckets)).astype(np.int64)
        return agg

    def dup_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").groupby(["h", "g"], as_index=False, dropna=False)[
            "n"
        ].sum()
        tot = g.groupby("h")["n"].transform("sum")
        d = g[tot >= 2]
        out = d.groupby("g", as_index=False, dropna=False)["n"].sum().rename(
            columns={"n": "n_dup_docs"}
        )
        return out.astype({"n_dup_docs": "int64"})

    base_df = (
        ds.map_batches(base, batch_format="pandas")
        .to_pandas()
        .groupby("g", as_index=False, dropna=False)
        .agg(n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
    )
    lang_df = (
        ds.map_batches(langs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
        .groupby("g", as_index=False, dropna=False)
        .agg(n_langs=("l", "nunique"))
    )
    dup_df = (
        ds.map_batches(hashes, batch_format="pandas")
        .groupby("__b")
        .map_groups(dup_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(dup_df):
        dup_df = dup_df.groupby("g", as_index=False, dropna=False)["n_dup_docs"].sum()
    else:
        dup_df = pd.DataFrame({"g": [], "n_dup_docs": []})
    out = base_df.merge(lang_df, on="g", how="left").merge(
        dup_df, on="g", how="left"
    )
    out["n_dup_docs"] = out["n_dup_docs"].fillna(0).astype("int64")
    out["mean_chars"] = (out["sum_chars"] // out["n_docs"]).astype("int64")
    out = out.rename(columns={"g": group_col})
    return out[
        [group_col, "n_docs", "n_dup_docs", "sum_chars", "mean_chars",
         "n_langs"]
    ].astype(
        {"n_docs": "int64", "sum_chars": "int64", "n_langs": "int64"}
    ).sort_values(group_col).reset_index(drop=True)


def source_overlap(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    key: str = "text",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Pairwise source-overlap matrix: for every unordered source pair,
    how many DISTINCT texts appear in both — the mirror-detection
    companion of ``source_scorecard`` (two sources sharing most of
    their content are one crawl seen twice; drop one before it double
    counts in every mixture weight). Returns (src_a, src_b, n_shared)
    with src_a < src_b, int64.

    ``key`` picks the sharing signal: ``"text"`` = exact bytes,
    ``"tokenset"`` = the sorted-distinct-token fingerprint of
    ``neardup.token_sort_dups`` (reordered boilerplate still counts as
    shared — the signal mirrors actually show).

    Scale shape: per-batch distinct (md5, source) rows → ONE
    md5-bucketed exchange; each md5 group emits its C(k, 2) source
    pairs (k = sources sharing that text — bounded by the source
    domain), and pair partials merge on the source²-bounded driver
    table."""
    import hashlib
    import re as _re

    def fp(s: str) -> str:
        if key == "tokenset":
            toks = sorted(set(_re.findall(r"[a-z0-9]+", s.lower())))
            s = " ".join(toks)
        return hashlib.md5(s.encode()).hexdigest()

    def hashes(df: pd.DataFrame) -> pd.DataFrame:
        h = df[text_col].astype(str).map(fp)
        out = pd.DataFrame({"h": h, "g": df[group_col]}).drop_duplicates()
        hb = pd.util.hash_pandas_object(out["h"], index=False).to_numpy()
        out["__b"] = (hb % np.uint64(n_buckets)).astype(np.int64)
        return out

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates()
        m = g.merge(g, on="h")
        m = m[m["g_x"] < m["g_y"]]
        out = m.groupby(["g_x", "g_y"], as_index=False).size().rename(
            columns={"g_x": "src_a", "g_y": "src_b", "size": "n_shared"}
        )
        return out.astype({"n_shared": "int64"})

    parts = (
        ds.map_batches(hashes, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {"src_a": pd.Series([], dtype=object),
             "src_b": pd.Series([], dtype=object),
             "n_shared": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(["src_a", "src_b"], as_index=False, dropna=False)[
        "n_shared"
    ].sum()
    return out.astype({"n_shared": "int64"}).sort_values(
        ["src_a", "src_b"]
    ).reset_index(drop=True)
