"""BM25 full-text retrieval over the document corpus — top-k docs per
query (Robertson/Okapi BM25, the Lucene ``ln(1 + (N - df + .5)/(df +
.5))`` idf variant). The retrieval counterpart to ``ops.text_index``'s
TF-IDF, and the text side of the engine's similarity-search family
(``ops.similarity`` covers the embedding side).

Scale shape (small-query-set retrieval, the corpus-scan formulation):
- corpus stats (N, total token count) and the df of the QUERY TERMS
  ONLY are computed first — the df table is built by the standard
  per-batch-combiner + bucketed-final exchange and then filtered to
  the query vocabulary, so the driver holds |query terms| rows, never
  the corpus vocabulary;
- scoring is ONE embarrassingly-parallel pass: each batch computes tf
  for query terms (vectorized explode + join), scores every (query,
  doc) pair, and keeps its LOCAL top-k; the driver merges
  ``n_batches × n_queries × k`` candidate rows. No shuffle touches
  doc-scale rows.

SQL exactness: per-term contributions are integer-scaled
(``round(contrib * 1e6)`` as int64) BEFORE summing, so the per-doc sum
is order-independent and reproducible bit-for-bit in the DuckDB
oracle (a float sum's addition order is unspecified in SQL).
Tokenization matches ``ops.text_index`` (ASCII ``[A-Za-z0-9]+``,
lowercased).
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.text_index import _tokens_per_doc, doc_frequency

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = r"[A-Za-z0-9]+"


def _query_terms(queries: dict[str, str]) -> pd.DataFrame:
    """(qid, token) rows — DISTINCT terms per query, ASCII-lowered."""
    rows = []
    for qid, q in queries.items():
        seen = []
        for t in re.findall(_TOKEN_RE, q):
            t = t.lower()
            if t not in seen:
                seen.append(t)
                rows.append((qid, t))
    return pd.DataFrame(rows, columns=["qid", "token"])


def bm25_topk(
    ds: "ray.data.Dataset",
    queries: dict[str, str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    n_buckets: int = 32,
) -> pd.DataFrame:
    """Top-k (qid, doc_id, score_scaled, rank) by BM25; ties broken by
    doc_id asc. Only docs containing at least one query term appear.
    ``score_scaled`` = Σ_terms round(contrib × 1e6) as int64."""
    import ray

    qterms = _query_terms(queries)
    term_set = set(qterms["token"])

    # corpus stats: N (all docs) and total token count → avgdl
    def stat(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n": [np.int64(len(df))],
                "tok": [np.int64(df[text_col].str.count(_TOKEN_RE).sum())],
            }
        )

    stats = ds.map_batches(stat, batch_format="pandas").to_pandas().sum()
    n_docs, total_tok = int(stats["n"]), int(stats["tok"])
    avgdl = total_tok / n_docs

    # df of the query terms only: bucketed-exchange df table, filtered
    # to the (tiny) query vocabulary before leaving the cluster
    dft = (
        doc_frequency(ds, text_col, n_buckets)
        .map_batches(
            lambda df: df[df["token"].isin(term_set)], batch_format="pandas"
        )
        .to_pandas()
    )
    df_map = dict(zip(dft["token"], dft["df"]))
    idf = {
        t: float(np.log(1.0 + (n_docs - df_map.get(t, 0) + 0.5) / (df_map.get(t, 0) + 0.5)))
        for t in term_set
    }
    plan_ref = ray.put((qterms, idf))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        qt, idf_m = ray.get(plan_ref)
        toks = _tokens_per_doc(df, text_col)
        dl = toks.groupby("doc_id", as_index=False).agg(dl=("token", "count"))
        tf = (
            toks[toks["token"].isin(set(qt["token"]))]
            .groupby(["doc_id", "token"], as_index=False)
            .agg(tf=("token", "count"))
        )
        if not len(tf):
            return pd.DataFrame(
                {
                    "qid": pd.Series([], dtype="object"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score_scaled": pd.Series([], dtype="int64"),
                }
            )
        m = tf.merge(qt, on="token").merge(dl, on="doc_id")
        m["idf"] = m["token"].map(idf_m)
        norm = m["tf"] * (k1 + 1.0) / (
            m["tf"] + k1 * (1.0 - b + b * m["dl"] / avgdl)
        )
        m["contrib"] = (
            np.round(m["idf"] * norm * 1e6).astype("int64")
        )
        out = m.groupby(["qid", "doc_id"], as_index=False).agg(
            score_scaled=("contrib", "sum")
        )
        out = out.sort_values(
            ["qid", "score_scaled", "doc_id"], ascending=[True, False, True]
        )
        return out.groupby("qid", sort=False).head(k).astype(
            {"doc_id": "int64", "score_scaled": "int64"}
        )

    cand = ds.map_batches(score, batch_format="pandas").to_pandas()
    cand = cand.sort_values(
        ["qid", "score_scaled", "doc_id"], ascending=[True, False, True]
    )
    out = cand.groupby("qid", sort=False).head(k).reset_index(drop=True)
    out["rank"] = (out.groupby("qid", sort=False).cumcount() + 1).astype("int64")
    return out
