"""Exact duplicated-substring detection over the document corpus —
the "exact substring deduplication" pass of large-LM data cleaning
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better"): any token n-gram occurring >= ``min_count`` times corpus-wide
marks every token it covers as duplicated text. The reference engine
has no corpus-level dedup at all (SURVEY §2 D-family is record-level);
this is the engine-side addition for web-scale training data.

Published systems build a suffix array; at 100 TB the practical
equivalent is the two-pass hashed-n-gram formulation implemented here
(same duplicated-span semantics for a fixed n, no quadratic state):

pass 1 (count): every doc emits its token n-grams; a per-batch
  combiner collapses them to one row per DISTINCT gram per batch, and
  a coarse-bucketed final keeps grams with total count >= min_count
  (the "dup gram" table — corpus-bounded, so it is NEVER broadcast);
pass 2 (locate): the occurrence stream (doc_id, pos, gram) is
  semi-joined against the dup table with the task-based ``hash_join``
  (only distinct dup keys ship to the right side of the exchange),
  and ONE doc-bucketed exchange merges covered-token intervals per doc
  (vectorized repeat + drop_duplicates — never per-row Python).

Keying: ``key="gram"`` carries the literal (ASCII-lowercased) n-gram
string so the result is reproducible bit-for-bit in the DuckDB oracle;
``key="rolling"`` carries a vectorized 64-bit polynomial hash of the
per-token hashes — the at-scale payload (8 bytes/row through every
exchange instead of ~n×word bytes). Both modes are parity-tested.

Tokenization matches ``ops.text_index`` (ASCII ``[A-Za-z0-9]+`` runs,
ASCII-lowercased) so the token stream is reproducible in SQL.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.join import hash_join

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = r"[A-Za-z0-9]+"

# splitmix64 constants for the per-token hash (vectorized, stable)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)
_POLY = np.uint64(1099511628211)  # FNV prime as the rolling multiplier


def _token_rows(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """(doc_id, pos, token) occurrence rows, 0-based pos, vectorized."""
    toks = df[text_col].str.findall(_TOKEN_RE)
    out = pd.DataFrame({"doc_id": df["doc_id"], "token": toks}).explode(
        "token", ignore_index=True
    )
    out = out.dropna(subset=["token"]).reset_index(drop=True)
    out["token"] = out["token"].str.lower()
    out["pos"] = out.groupby("doc_id", sort=False).cumcount().astype("int64")
    return out


def _splitmix64_str(s: pd.Series) -> np.ndarray:
    """Stable uint64 hash of a string series (pandas hash → splitmix64
    finalizer; vectorized)."""
    z = pd.util.hash_pandas_object(s, index=False).to_numpy().astype(np.uint64)
    z = (z + _SM_GAMMA)
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def _gram_rows(
    df: pd.DataFrame, n: int, text_col: str, key: str
) -> pd.DataFrame:
    """(doc_id, pos, gram) rows — one per n-gram occurrence. ``gram``
    is the joined string (key="gram") or a uint64 rolling hash
    (key="rolling"); construction is n-1 vectorized shifts, no per-doc
    Python loop."""
    t = _token_rows(df, text_col)
    if len(t) == 0:
        gram = (
            pd.Series([], dtype="object")
            if key == "gram"
            else pd.Series([], dtype="uint64")
        )
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "pos": pd.Series([], dtype="int64"),
             "gram": gram}
        )
    doc = t["doc_id"]
    # a position starts a full n-gram iff the (n-1)-shifted row is the
    # same doc (token rows are doc-contiguous by construction)
    valid = (doc.shift(-(n - 1)) == doc).to_numpy()
    if key == "gram":
        gram = t["token"].copy()
        for i in range(1, n):
            gram = gram + " " + t["token"].shift(-i, fill_value="")
    else:
        h = _splitmix64_str(t["token"])
        acc = np.zeros(len(t), dtype=np.uint64)
        for i in range(n):
            shifted = np.roll(h, -i)  # tail garbage masked by `valid`
            acc = acc * _POLY + shifted
        gram = pd.Series(acc, dtype="uint64")
    out = pd.DataFrame({"doc_id": doc, "pos": t["pos"], "gram": gram})
    return out[valid].reset_index(drop=True)


def dup_ngrams(
    ds: "ray.data.Dataset",
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    key: str = "gram",
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """(gram,) — every token n-gram occurring >= min_count times
    corpus-wide. Per-batch combiner → coarse-bucketed exact count."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = _gram_rows(df, n, text_col, key)
        return g.groupby("gram", as_index=False).agg(cnt=("pos", "count"))

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["gram"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("gram", as_index=False)["cnt"].sum()
        return out[out["cnt"] >= min_count][["gram"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def dup_span_stats(
    ds: "ray.data.Dataset",
    n: int = 8,
    min_count: int = 2,
    text_col: str = "text",
    key: str = "gram",
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Per-doc duplicated-substring statistics:
    (doc_id, n_tokens, n_dup_tokens) where n_dup_tokens is the size of
    the union of [pos, pos+n) intervals over the doc's duplicated
    n-gram occurrences. Every doc appears (n_dup_tokens=0 when clean).

    Three exchanges total: the dup-gram count final, the occurrence ⋈
    dup-gram semi-join, and one doc-bucketed merge that unions
    intervals AND folds in per-doc token counts (tag-union — no fourth
    exchange for the count join).
    """
    dup = dup_ngrams(ds, n, min_count, text_col, key, n_buckets)
    occ = ds.map_batches(
        lambda df: _gram_rows(df, n, text_col, key), batch_format="pandas"
    )
    hits = hash_join(
        occ, dup, on="gram", how="semi",
        left_cols=["doc_id", "pos", "gram"], n_buckets=n_buckets,
    )

    def tag_hits(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "pos": df["pos"].astype("int64"),
             "n_tokens": np.int64(-1)}
        )

    def tag_counts(df: pd.DataFrame) -> pd.DataFrame:
        nt = df[text_col].str.count(_TOKEN_RE).astype("int64")
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "pos": np.int64(-1),
             "n_tokens": nt}
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["doc_id"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        counts = g[g["n_tokens"] >= 0][["doc_id", "n_tokens"]]
        hit = g[g["n_tokens"] < 0]
        if len(hit):
            pos = hit["pos"].to_numpy()
            doc = hit["doc_id"].to_numpy()
            ti = (np.repeat(pos, n) + np.tile(np.arange(n, dtype=np.int64), len(pos)))
            cov = pd.DataFrame({"doc_id": np.repeat(doc, n), "ti": ti})
            covered = (
                cov.drop_duplicates()
                .groupby("doc_id", as_index=False)
                .agg(n_dup_tokens=("ti", "count"))
            )
        else:
            covered = pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "n_dup_tokens": pd.Series([], dtype="int64")}
            )
        out = counts.merge(covered, on="doc_id", how="left")
        out["n_dup_tokens"] = out["n_dup_tokens"].fillna(0).astype("int64")
        return out

    both = hits.map_batches(tag_hits, batch_format="pandas").union(
        ds.map_batches(tag_counts, batch_format="pandas")
    )
    return both.map_batches(add_b, batch_format="pandas").groupby("__b").map_groups(
        merge, batch_format="pandas"
    )
