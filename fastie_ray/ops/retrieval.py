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


def rrf_fuse(
    runs: "list",
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    k_const: int = 60,
    top_k: int = 5,
    n_buckets: int = 8,
) -> "ray.data.Dataset":
    """Reciprocal-rank fusion (Cormack et al. 2009) of N retrieval
    runs — the standard hybrid-search combiner (BM25 ⊕ dense kNN in
    every production RAG stack): a doc's fused score is
    Σ_runs ⌊10⁶ / (k + rank)⌋, floor-scaled per TERM so the sum is
    integer-exact and order-independent (float 1/(k+r) sums are
    neither). Docs missing from a run simply contribute nothing —
    RRF's native behavior.

    Scale shape: each run maps to (query, doc, s) rows — run tables
    are queries × k, tiny next to any corpus — then ONE query-bucketed
    exchange sums scores and takes the per-query top-``top_k`` by
    (score DESC, doc ASC). Returns (query, doc, score_e6, fused_rank)."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "q": df[query_col].astype("int64"),
                "d": df[doc_col].astype("int64"),
                "s": np.int64(1_000_000)
                // (np.int64(k_const) + df[rank_col].astype("int64")),
            }
        )

    tagged = runs[0].map_batches(score, batch_format="pandas")
    for r in runs[1:]:
        tagged = tagged.union(r.map_batches(score, batch_format="pandas"))

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = (
            df["q"].to_numpy().astype(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int64)
        return df

    def fuse(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").groupby(["q", "d"], as_index=False)["s"].sum()
        g = g.sort_values(["q", "s", "d"], ascending=[True, False, True])
        g["fused_rank"] = g.groupby("q", sort=False).cumcount() + 1
        g = g[g["fused_rank"] <= top_k]
        return pd.DataFrame(
            {
                query_col: g["q"].astype("int64"),
                doc_col: g["d"].astype("int64"),
                "score_e6": g["s"].astype("int64"),
                "fused_rank": g["fused_rank"].astype("int64"),
            }
        )

    return (
        tagged.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(fuse, batch_format="pandas")
    )

def match_rules(
    ds: "ray.data.Dataset",
    rules: dict[int, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Percolator / reverse search — match every document against a
    STORED set of conjunctive keyword rules (alerting, routing,
    saved-search fan-out): emit (doc_id, rule_id) for each rule whose
    terms ALL appear as whitespace tokens of the doc.

    Scale shape: the rule table is dimension-sized → ``ray.put`` once,
    streamed zero-exchange matching. Per batch, docs tokenize ONCE
    into a distinct (row, token) membership frame; each rule is then
    ONE vectorized isin + a per-row match-count equality (the inverted
    percolation layout) — no per-doc Python loop. Duplicate tokens
    collapse; term order ignored (conjunction semantics, same as the
    SQL list_contains chain)."""
    import ray

    rules_ref = ray.put(
        {int(k): [str(t) for t in v] for k, v in rules.items()}
    )

    def match(df: pd.DataFrame) -> pd.DataFrame:
        rl = ray.get(rules_ref)
        if len(df) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "rule_id": pd.Series([], dtype="int64"),
                }
            )
        ids = df[id_col].astype("int64").to_numpy()
        toks = df[text_col].astype(str).str.split()
        # membership frame: (row position, distinct token), built once
        mem = pd.DataFrame(
            {
                "pos": np.repeat(
                    np.arange(len(df)), toks.str.len().to_numpy()
                ),
                "tok": np.concatenate(toks.to_numpy()),
            }
        ).drop_duplicates()
        frames = []
        for rid, terms in rl.items():
            hits = mem[mem["tok"].isin(set(terms))]
            cnt = hits.groupby("pos").size()
            pos = cnt.index[cnt.to_numpy() == len(set(terms))]
            frames.append(
                pd.DataFrame(
                    {
                        id_col: ids[pos.to_numpy()],
                        "rule_id": np.int64(rid),
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            {id_col: [], "rule_id": []}
        )
        return out.astype({id_col: "int64", "rule_id": "int64"})

    return ds.map_batches(match, batch_format="pandas")
