"""DSIR-style data selection via importance resampling (Xie et al.
2023 shape): score every raw document by how target-like its hashed
n-gram feature distribution is, then keep the top importance quantile.

Integer-exact variant so the SQL oracle matches bit-for-bit:

- features: bigrams hashed into ``n_features`` buckets via
  ``int(md5(bigram)[:8], 16) % n_features`` (DuckDB: ``CAST('0x' ||
  substr(md5(g), 1, 8) AS BIGINT) % n``);
- bucket score: ``score_e6(b) = floor(1e6 * (target[b]+1) /
  (raw[b]+1))`` — the Laplace-smoothed target/raw ratio, the
  integer-monotone analogue of DSIR's log-likelihood ratio (the
  per-feature log is monotone in this ratio; summing scaled ratios
  rather than logs keeps every intermediate an int64);
- doc importance: Σ over the doc's bigram occurrences of its bucket
  score (multiplicity counts, exactly one int per doc);
- selection: importance ≥ the global ``quantile_disc`` threshold
  (``ops.stats.filter_by_quantile`` — exact two-pass, no global sort).

Scale shape: ONE bucketed exchange builds both count tables at once
(the feature space is ``n_features``-bounded — tiny — so partial
(bucket, n_raw, n_target) rows combine per batch first); the LUT is a
fixed ``n_features``-long int array broadcast once via ``ray.put``;
scoring is a streaming exchange-free pass; the quantile threshold
re-reads only the (doc_id, importance) score table.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.lm_filter import _doc_bigrams

if TYPE_CHECKING:
    import ray.data


def _feature_buckets(bigrams: pd.Series, n_features: int) -> np.ndarray:
    """md5-bucket per bigram, hashed once per DISTINCT value."""
    uniq = pd.unique(bigrams)
    lut = {
        g: int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_features
        for g in uniq
    }
    return bigrams.map(lut).to_numpy(dtype=np.int64)


def feature_counts(
    ds: "ray.data.Dataset",
    target_mask_col: str,
    n_features: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8,
) -> pd.DataFrame:
    """(bucket, n_raw, n_target) over the corpus — raw counts over all
    docs, target counts over rows where ``target_mask_col`` is truthy.
    Per-batch combiner, one tiny bucketed exchange, driver merge of
    ≤ ``n_buckets × n_features`` rows."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        big = _doc_bigrams(df, text_col, id_col)
        if len(big) == 0:
            return pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype="int64"),
                    "n_raw": pd.Series([], dtype="int64"),
                    "n_target": pd.Series([], dtype="int64"),
                }
            )
        mask = dict(zip(df[id_col], df[target_mask_col].astype(bool)))
        b = pd.DataFrame(
            {
                "bucket": _feature_buckets(big["bigram"], n_features),
                "is_t": big["doc"].map(mask).astype("int64"),
            }
        )
        out = b.groupby("bucket", as_index=False).agg(
            n_raw=("is_t", "count"), n_target=("is_t", "sum")
        )
        return out.astype({"n_raw": "int64", "n_target": "int64"})

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = (df["bucket"].to_numpy() % n_buckets).astype("int64")
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("bucket", as_index=False)[
            ["n_raw", "n_target"]
        ].sum()
        return out.astype({"n_raw": "int64", "n_target": "int64"})

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {"bucket": pd.Series([], dtype="int64"),
             "n_raw": pd.Series([], dtype="int64"),
             "n_target": pd.Series([], dtype="int64")}
        )
    return parts.groupby("bucket", as_index=False)[["n_raw", "n_target"]].sum()


def importance_scores(
    ds: "ray.data.Dataset",
    score_lut_ref,
    n_features: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(doc_id, importance) — Σ bucket scores over the doc's bigram
    occurrences. ``score_lut_ref`` = ``ray.put(np.ndarray[int64] of
    length n_features)``. Streaming, exchange-free; docs with no
    bigrams are dropped (no feature evidence), matching the oracle's
    join semantics."""
    import ray

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lut: np.ndarray = ray.get(score_lut_ref)
        big = _doc_bigrams(df, text_col, id_col)
        if len(big) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=df[id_col].dtype),
                    "importance": pd.Series([], dtype="int64"),
                }
            )
        vals = lut[_feature_buckets(big["bigram"], n_features)]
        out = (
            pd.DataFrame({id_col: big["doc"].to_numpy(), "importance": vals})
            .groupby(id_col, as_index=False)["importance"]
            .sum()
        )
        return out.astype({"importance": "int64"})

    return ds.map_batches(score, batch_format="pandas")


def dsir_select(
    ds: "ray.data.Dataset",
    target_mask_col: str,
    keep_quantile: float = 0.8,
    n_features: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """End-to-end DSIR selection: hashed-feature count tables (one tiny
    exchange), broadcast score LUT, streaming importance scoring, then
    the exact global-quantile keep filter (importance ≥
    quantile_disc(importance, keep_quantile))."""
    import ray

    counts = feature_counts(
        ds, target_mask_col, n_features=n_features,
        text_col=text_col, id_col=id_col,
    )
    raw = np.zeros(n_features, dtype=np.int64)
    tgt = np.zeros(n_features, dtype=np.int64)
    if len(counts):
        raw[counts["bucket"].to_numpy()] = counts["n_raw"].to_numpy()
        tgt[counts["bucket"].to_numpy()] = counts["n_target"].to_numpy()
    lut = (1_000_000 * (tgt + 1)) // (raw + 1)
    lut_ref = ray.put(lut.astype(np.int64))

    from fastie_ray.ops.stats import filter_by_quantile

    scored = importance_scores(
        ds, lut_ref, n_features=n_features, text_col=text_col, id_col=id_col
    ).materialize()
    return filter_by_quantile(scored, "importance", keep_quantile, keep="ge")
