"""URL canonicalization + canonical-URL dedup — the first pass of any
Common-Crawl-style ingest (the same page is fetched as ``http://`` /
``https://``, with and without ``www.``, trailing slash, and tracking
query params; crawls keep the EARLIEST capture per canonical URL).

Normalization is four anchored regex rewrites chosen to be
byte-identical between pandas ``str.replace(regex=True)`` and DuckDB
``regexp_replace`` so the whole operator is SQL-reproducible:
scheme strip → ``www.`` strip → query-string drop → trailing-``/``
strip.

Dedup is the engine's standard combiner shape: per-batch keep-earliest
(sort by (warc_ts, url), drop_duplicates on canon_url) shrinks the
exchange to near-distinct rows, then ONE hash-bucketed exchange
finishes keep-earliest per canonical URL. Scale-safe: the shuffle
carries one row per (batch × canonical url), never raw corpus rows.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

# (pattern, replacement) pairs applied in order; each is anchored or
# first-match-only so pandas (replace-all) and DuckDB (replace-first)
# agree byte-for-byte.
_NORM_RULES: list[tuple[str, str]] = [
    (r"^https?://", ""),
    (r"^www\.", ""),
    (r"\?.*$", ""),
    (r"/+$", ""),
]


def canonical_url(urls: pd.Series) -> pd.Series:
    out = urls
    for pat, rep in _NORM_RULES:
        out = out.str.replace(pat, rep, regex=True)
    return out


def canonical_url_sql(col: str = "url") -> str:
    """The same rewrite chain as DuckDB SQL (for oracles)."""
    expr = col
    for pat, rep in _NORM_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{rep}')"
    return expr


def url_dedup(
    ds: "ray.data.Dataset",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """One row per canonical URL: the EARLIEST capture (min
    ``(warc_ts, url)`` — the raw url tie-break makes equal-timestamp
    captures deterministic). Output: (canon_url, url, warc_ts,
    n_captures)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tmp = pd.DataFrame(
            {
                "canon_url": canonical_url(df[url_col]),
                "url": df[url_col],
                "warc_ts": df[ts_col].astype("int64"),
            }
        )
        tmp["n_captures"] = np.int64(1)
        counts = tmp.groupby("canon_url", as_index=False)["n_captures"].sum()
        first = tmp.sort_values(["warc_ts", "url"]).drop_duplicates("canon_url")
        return first.drop(columns="n_captures").merge(counts, on="canon_url")

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["canon_url"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        counts = g.groupby("canon_url", as_index=False)["n_captures"].sum()
        first = g.sort_values(["warc_ts", "url"]).drop_duplicates("canon_url")
        out = first.drop(columns=["n_captures", "__b"]).merge(counts, on="canon_url")
        out["n_captures"] = out["n_captures"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
