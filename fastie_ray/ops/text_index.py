"""Corpus indexing operators: document frequency, posting lists and
TF-IDF top terms — the retrieval/statistics side of a training-data
pipeline (engine-side addition; the reference has no corpus-level text
statistics).

Tokenization is ASCII-exact on purpose: tokens are ``[A-Za-z0-9]+``
runs extracted from the RAW text and then ASCII-lowercased, so the
exact same token stream is reproducible in DuckDB
(``lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+')))``) for the
correctness oracle — no locale/unicode case-folding divergence.

Scale shape:
- per-batch combiner emits one row per DISTINCT (token, batch) with
  partial df counts — the exchange never carries one row per token
  OCCURRENCE, only per distinct token per batch;
- the final df aggregate is the standard coarse-bucket groupby (hot
  tokens — stopwords — are pre-shrunk by the combiner, so the Zipf
  head does not skew the shuffle);
- TF-IDF broadcasts the df table (pruned to ``max_vocab`` by df rank —
  vocabulary-bounded BY CONSTRUCTION) via ``ray.put`` once, then runs
  one embarrassingly-parallel scoring pass.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = r"[A-Za-z0-9]+"


def _tokens_per_doc(df: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """(doc_id, token) rows, one per occurrence, vectorized."""
    toks = df[text_col].str.findall(_TOKEN_RE)
    out = pd.DataFrame({"doc_id": df["doc_id"], "token": toks}).explode(
        "token", ignore_index=True
    )
    out = out.dropna(subset=["token"])
    out["token"] = out["token"].str.lower()  # ASCII tokens → ASCII lower
    return out


def doc_frequency(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """(token, df) — number of distinct docs containing each token.
    The combiner dedups (doc, token) per batch, which is complete
    because each doc's text lives in ONE batch row (docs are rows)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = _tokens_per_doc(df, text_col)
        return (
            t.drop_duplicates(["doc_id", "token"])
            .groupby("token", as_index=False)
            .agg(df=("doc_id", "count"))
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["token"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("token", as_index=False)["df"].sum()
        out["df"] = out["df"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def top_vocab(
    df_table: "ray.data.Dataset", max_vocab: int
) -> pd.DataFrame:
    """The ``max_vocab`` highest-df tokens (ties → token asc):
    per-block local top-k then a driver merge of block candidates —
    never a global sort."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["df", "token"], ascending=[False, True]).head(
            max_vocab
        )

    cand = df_table.map_batches(local, batch_format="pandas").to_pandas()
    return (
        cand.sort_values(["df", "token"], ascending=[False, True])
        .head(max_vocab)
        .reset_index(drop=True)
    )


def tfidf_top_terms(
    ds: "ray.data.Dataset",
    n_docs: int,
    text_col: str = "text",
    k: int = 5,
    max_vocab: int = 50_000,
    min_df: int = 2,
) -> "ray.data.Dataset":
    """Per-doc top-k TF-IDF terms (score desc, token asc — fully
    deterministic). ``idf = ln((n_docs + 1) / (df + 1)) + 1``.

    Pass 1 builds the df table and prunes it to ``max_vocab`` tokens
    with ``df >= min_df``; the pruned vocab is broadcast once via
    ``ray.put``. Pass 2 scores each doc against the broadcast dict —
    no shuffle."""
    import ray

    vocab = top_vocab(doc_frequency(ds, text_col), max_vocab)
    vocab = vocab[vocab["df"] >= min_df]
    idf = dict(
        zip(vocab["token"], np.log((n_docs + 1) / (vocab["df"] + 1)) + 1.0)
    )
    idf_ref = ray.put(idf)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        idf_m = ray.get(idf_ref)
        t = _tokens_per_doc(df, text_col)
        tf = t.groupby(["doc_id", "token"], as_index=False).agg(
            tf=("token", "count")
        )
        tf["idf"] = tf["token"].map(idf_m)
        tf = tf.dropna(subset=["idf"])
        # rank on the ROUNDED score so the ordering (and hence the
        # top-k cut) is reproducible bit-for-bit in the SQL oracle
        tf["score"] = (tf["tf"] * tf["idf"]).round(6)
        tf = tf.sort_values(
            ["doc_id", "score", "token"], ascending=[True, False, True]
        )
        out = tf.groupby("doc_id", as_index=False, sort=False).head(k).copy()
        out["rank"] = out.groupby("doc_id", sort=False).cumcount() + 1
        out["rank"] = out["rank"].astype("int64")
        return out[["doc_id", "token", "tf", "score", "rank"]].astype(
            {"tf": "int64"}
        )

    return ds.map_batches(score, batch_format="pandas")


def trigram_search(
    ds: "ray.data.Dataset",
    patterns: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Exact SUBSTRING search via character-trigram posting lists —
    the pg_trgm / code-search (Zoekt, Google Code Search) shape, the
    substring complement of the BM25 token index above: candidate =
    document containing ALL of a pattern's trigrams (a superset of
    true matches), then a verify pass re-reads ONLY candidates.

    Scale shape: the posting build is pattern-pruned (only trigrams
    occurring in some query pattern are emitted — the predicate pushed
    into the index build; a standing index would emit all trigrams and
    the query side would prune instead). Postings go through ONE
    (pattern, doc) counting exchange; a doc is a candidate iff its
    matched-trigram count equals the pattern's trigram count.
    Candidates (tiny) hash-join back to the text for the exact
    ``contains`` verification, so the corpus text is scanned once at
    build and only candidate rows ship afterwards.

    Returns (pattern, ``id_col``) exact-match rows. Patterns must be
    ≥ 3 chars."""
    for p in patterns:
        if len(p) < 3:
            raise ValueError(f"pattern too short for trigrams: {p!r}")

    def tris(s: str) -> set:
        return {s[i:i + 3] for i in range(len(s) - 2)}

    pat_tris = {p: tris(p) for p in patterns}
    all_tris = sorted(set().union(*pat_tris.values()))
    n_need = {p: len(t) for p, t in pat_tris.items()}

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized contains-scan per query trigram (pattern-
        # bounded), never a Python loop over rows
        frames = []
        for g in all_tris:
            m = df[text_col].str.contains(g, regex=False)
            frames.append(
                pd.DataFrame(
                    {id_col: df.loc[m, id_col].astype("int64"), "tri": g}
                )
            )
        if not frames:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "tri": pd.Series([], dtype=object)}
            )
        return pd.concat(frames, ignore_index=True)

    def add_db(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[id_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def candidates(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        out = []
        for p, need in pat_tris.items():
            m = g[g["tri"].isin(need)]
            cnt = m.groupby(id_col)["tri"].nunique()
            ids = cnt[cnt == n_need[p]].index.to_numpy()
            out.append(
                pd.DataFrame(
                    {"pattern": p, id_col: ids.astype(np.int64)}
                )
            )
        return pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"pattern": pd.Series([], dtype=object),
             id_col: pd.Series([], dtype="int64")}
        )

    cand = (
        ds.map_batches(postings, batch_format="pandas")
        .map_batches(add_db, batch_format="pandas")
        .groupby("__b")
        .map_groups(candidates, batch_format="pandas")
    )

    from fastie_ray.ops.join import hash_join

    verified = hash_join(
        cand, ds, on=id_col, how="inner",
        left_cols=["pattern", id_col], right_cols=[id_col, text_col],
        n_buckets=n_buckets,
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"pattern": pd.Series([], dtype=object),
                 id_col: pd.Series([], dtype="int64")}
            )
        ok = [
            p in t for p, t in zip(df["pattern"].to_numpy(),
                                   df[text_col].to_numpy())
        ]
        out = df.loc[ok, ["pattern", id_col]].copy()
        out[id_col] = out[id_col].astype("int64")
        return out

    return verified.map_batches(verify, batch_format="pandas")


def conjunctive_search(
    ds: "ray.data.Dataset",
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Boolean AND retrieval: docs whose TOKEN set contains every query
    term (token membership, not substring — 'graph' does not match
    'graphics'). The query terms are broadcast constants, so the scale
    shape is a pure vectorized filter — zero shuffles, zero index;
    the indexed alternative for repeated queries is ``trigram_search``
    above. Returns (doc_id, n_terms_matched) for full matches only
    (n_terms_matched == len(terms), kept as an audit column)."""
    import re as _re

    pats = [
        _re.compile(r"(?:^|[^a-z0-9])" + _re.escape(t) + r"(?:[^a-z0-9]|$)")
        for t in terms
    ]

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        low = df[text_col].astype(str).str.lower()
        ok = np.ones(len(df), dtype=bool)
        for p in pats:
            ok &= low.str.contains(p).to_numpy()
        return pd.DataFrame(
            {
                id_col: df.loc[ok, id_col],
                "n_terms_matched": np.int64(len(terms)),
            }
        )

    return ds.map_batches(filt, batch_format="pandas")


def token_pmi(
    ds: "ray.data.Dataset",
    n_docs: int,
    k_vocab: int = 40,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8,
) -> pd.DataFrame:
    """PMI-scored collocations over the TOP-``k_vocab`` tokens by
    document frequency (ties → token asc): for every unordered pair of
    vocab tokens co-occurring in ≥ ``min_count`` docs,

        pmi_e6 = floor(1e6 · log2(N·n_ab / (n_a·n_b)))

    — the classic collocation score (Church & Hanks 1990), computed on
    doc-level presence. Complements ``cooc.cooc_pairs`` (raw counts,
    per-doc cap): here the vocabulary is df-ranked and BROADCAST, so
    the pair space is C(k_vocab, 2) — a constant — regardless of
    corpus size.

    Scale shape: pass 1 is the df table + block-local top-k merge
    (``top_vocab``); the pruned vocab is a broadcast constant. Pass 2
    explodes only vocab tokens per doc (≤ k_vocab rows/doc), pairs
    them batch-locally, and a per-batch combiner reduces to ≤
    C(k_vocab, 2) rows per batch; ONE bucketed exchange sums, and the
    driver finishes on a ≤ C(k_vocab, 2)-row table. Returns
    (tok_a, tok_b, n_ab, n_a, n_b, pmi_e6), int64."""
    vocab = top_vocab(doc_frequency(ds, text_col), k_vocab)
    dfm = dict(zip(vocab["token"], vocab["df"].astype("int64")))
    vset = set(dfm)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        t = _tokens_per_doc(df, text_col)
        t = t[t["token"].isin(vset)].drop_duplicates(["doc_id", "token"])
        m = t.merge(t, on="doc_id")
        m = m[m["token_x"] < m["token_y"]]
        out = (
            m.groupby(["token_x", "token_y"], as_index=False)
            .agg(n_ab=("doc_id", "count"))
            .rename(columns={"token_x": "tok_a", "token_y": "tok_b"})
        )
        h = pd.util.hash_pandas_object(
            out["tok_a"] + "|" + out["tok_b"], index=False
        ).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["tok_a", "tok_b"], as_index=False
        )["n_ab"].sum()
        out["n_ab"] = out["n_ab"].astype("int64")
        return out

    agg = (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("__b")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(agg) == 0:
        return pd.DataFrame(
            {c: pd.array([], dtype="int64" if c.startswith("n") or
                          c == "pmi_e6" else "object")
             for c in ["tok_a", "tok_b", "n_ab", "n_a", "n_b", "pmi_e6"]}
        )
    agg = agg[agg["n_ab"] >= min_count].reset_index(drop=True)
    agg["n_a"] = agg["tok_a"].map(dfm).astype("int64")
    agg["n_b"] = agg["tok_b"].map(dfm).astype("int64")
    # float op ORDER mirrors the SQL oracle exactly:
    # log2(N * double(n_ab) / (double(n_a) * n_b))
    ratio = (
        float(n_docs) * agg["n_ab"].to_numpy(dtype=np.float64)
    ) / (
        agg["n_a"].to_numpy(dtype=np.float64)
        * agg["n_b"].to_numpy(dtype=np.float64)
    )
    agg["pmi_e6"] = np.floor(1e6 * np.log2(ratio)).astype("int64")
    return agg[["tok_a", "tok_b", "n_ab", "n_a", "n_b", "pmi_e6"]]
