"""CCNet-style language-model familiarity scoring (the LM-filter pass
of web-corpus curation, cf. Wenzek et al. 2020: score each page with a
corpus LM and keep the head/middle of the distribution).

Two distributed passes, integer-exact so the SQL oracle matches
bit-for-bit:

1. **Model build** — bigram counts over the corpus: per-batch combiner
   (vectorized explode→shift bigram construction, pandas groupby) →
   ONE hash-bucketed exchange for the final sum → prune to
   ``count >= min_count``. The pruned model is the LM; at 100 TB the
   prune bound keeps it vocab-sized (the CCNet model is likewise a
   fixed artifact much smaller than the corpus), so broadcasting it
   via ``ray.put`` once and reading it per actor is the right call —
   never re-shipped per batch.
2. **Scoring** — a streaming ``map_batches`` pass: per doc,
   ``n_bigrams``, ``covered`` (bigrams found in the model) and
   ``familiarity`` (sum of model counts over the doc's bigrams, with
   multiplicity) as int64, plus ``coverage_e6 = floor(1e6 * covered /
   n_bigrams)``. Docs with <2 tokens have no bigrams and are dropped
   (they carry no LM evidence), matching the SQL oracle's join
   semantics. No exchange: each doc's text row lives in one batch, so
   the doc aggregate is batch-local.

Real CCNet uses log-prob perplexity; counts are the integer-exact
analogue with the same ordering signal on a self-trained model
(familiarity is monotone in the sum of log-count up to the doc-length
normalization the caller applies via ``n_bigrams``). Floats would make
the DuckDB/numpy hash comparison flaky; integer scores keep the
oracle exact.

Tokenization matches the corpus-analysis ops: lowercase
``[A-Za-z0-9]+`` (DuckDB ``regexp_extract_all(lower(text),
'[a-z0-9]+')``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = r"[A-Za-z0-9]+"


def _doc_bigrams(df: pd.DataFrame, text_col: str, id_col: str) -> pd.DataFrame:
    """Vectorized (doc, bigram) rows: findall → explode (order-preserving
    within doc) → shift(-1) join masked at doc boundaries."""
    toks = (
        pd.DataFrame(
            {
                "doc": df[id_col].to_numpy(),
                "tok": df[text_col].str.lower().str.findall(_TOKEN_RE),
            }
        )
        .explode("tok")
        .dropna(subset=["tok"])
        .reset_index(drop=True)
    )
    if len(toks) < 2:
        return pd.DataFrame({"doc": toks["doc"][:0], "bigram": toks["tok"][:0]})
    doc = toks["doc"].to_numpy()
    keep = np.r_[doc[:-1] == doc[1:], False]
    bigram = toks["tok"].str.cat(toks["tok"].shift(-1), sep=" ")
    return pd.DataFrame({"doc": doc[keep], "bigram": bigram.to_numpy()[keep]})


def bigram_model(
    ds: "ray.data.Dataset",
    min_count: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Corpus bigram LM: (bigram, c) rows with ``c >= min_count``.
    Per-batch combiner then one bucketed exchange — bigram vocabulary
    is the only thing shuffled, never the corpus."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        big = _doc_bigrams(df, text_col, id_col)
        return big.groupby("bigram", as_index=False).agg(c=("doc", "count"))

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["bigram"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("bigram", as_index=False)["c"].sum()
        out = out[out["c"] >= min_count]
        out["c"] = out["c"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def lm_familiarity(
    ds: "ray.data.Dataset",
    model_ref,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Score docs against a broadcast pruned bigram model
    (``model_ref`` = ``ray.put(pd.Series(count, index=bigram))``).
    Streaming, exchange-free; emits only docs with ≥1 bigram."""
    import ray

    def score(df: pd.DataFrame) -> pd.DataFrame:
        model: pd.Series = ray.get(model_ref)
        big = _doc_bigrams(df, text_col, id_col)
        if len(big) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=df[id_col].dtype),
                    "n_bigrams": pd.Series([], dtype="int64"),
                    "covered": pd.Series([], dtype="int64"),
                    "familiarity": pd.Series([], dtype="int64"),
                    "coverage_e6": pd.Series([], dtype="int64"),
                }
            )
        c = big["bigram"].map(model)
        big = big.assign(hit=c.notna().astype("int64"), c=c.fillna(0).astype("int64"))
        out = big.groupby("doc", as_index=False).agg(
            n_bigrams=("bigram", "count"),
            covered=("hit", "sum"),
            familiarity=("c", "sum"),
        )
        out["coverage_e6"] = (
            out["covered"].to_numpy() * 1_000_000 // out["n_bigrams"].to_numpy()
        ).astype("int64")
        return out.rename(columns={"doc": id_col})

    return ds.map_batches(score, batch_format="pandas")


def lm_familiarity_pipeline(
    ds: "ray.data.Dataset",
    min_count: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """End-to-end self-trained LM scoring: build the pruned model (one
    exchange), broadcast it once, stream-score the corpus. ``ds`` is
    read twice — at scale both reads are column-pruned scans of the
    same parquet, strictly cheaper than caching the corpus."""
    import ray

    model_df = bigram_model(
        ds, min_count=min_count, text_col=text_col, id_col=id_col, n_buckets=n_buckets
    ).to_pandas()
    if len(model_df) == 0:
        model = pd.Series([], dtype="int64")
    else:
        model = pd.Series(
            model_df["c"].to_numpy(), index=model_df["bigram"].to_numpy()
        )
    model_ref = ray.put(model)
    return lm_familiarity(ds, model_ref, text_col=text_col, id_col=id_col)
