"""Corpus-level RAKE keyphrase extraction (Rose et al. 2010) — the
unsupervised keyphrase stage of a web-corpus curation pipeline
(index-time topic labels, dedup-cluster naming, query suggestion).

Semantics, all-integer so a SQL oracle reproduces it exactly:

- tokens: ``[a-z0-9]+`` runs of ``lower(text)`` (the engine-wide
  portable tokenizer);
- candidate phrases: MAXIMAL runs of consecutive non-stopword tokens
  within a doc (the stopword list is a fixed literal shared verbatim
  with the oracle's VALUES clause);
- word score: ``score_e6(w) = deg(w)·1e6 // freq(w)`` where freq(w)
  counts occurrences of ``w`` inside candidate phrases and deg(w)
  sums the lengths of the phrases each occurrence sits in (the RAKE
  degree: freq + co-occurrence) — integer division, no float;
- phrase score: Σ over the phrase's UNIQUE words of score_e6(w)
  (standard RAKE sums member-word scores once per word).

Returns the top-``k`` phrases by (score_e6 DESC, phrase ASC) with
their corpus frequency.

Scale shape: one vocab-bounded word-stat exchange + one phrase-bounded
phrase-count exchange; the finished word-score table is
vocabulary-sized and ships ONCE as a broadcast dict into the final
phrase-scoring pass. No stage ever holds more than vocabulary-sized
state.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# fixed literal list — mirrored verbatim in the oracle's VALUES clause
RAKE_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "is", "are", "was", "be", "as", "at", "by", "with", "from",
    "that", "this", "it", "its",
)


def _phrases_of(texts: pd.Series) -> pd.DataFrame:
    """(row_idx, phrase, n_words) candidate phrases for a text batch —
    vectorized split on the stopword boundary."""
    stop = set(RAKE_STOPWORDS)
    toks = texts.astype(str).str.lower().str.findall(_TOKEN_RE)
    rows, phrases = [], []
    for i, tl in enumerate(toks):
        run: list[str] = []
        for t in tl:
            if t in stop:
                if run:
                    rows.append(i)
                    phrases.append(" ".join(run))
                    run = []
            else:
                run.append(t)
        if run:
            rows.append(i)
            phrases.append(" ".join(run))
    out = pd.DataFrame({"i": rows, "phrase": phrases})
    if len(out):
        out["n_words"] = out["phrase"].str.count(" ").astype("int64") + 1
    else:
        out["n_words"] = pd.Series([], dtype="int64")
    return out


def rake_keyphrases(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    k: int = 50,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Top-``k`` corpus keyphrases (phrase, n, n_words, score_e6) —
    see module docstring for the exact integer semantics."""

    def word_partial(df: pd.DataFrame) -> pd.DataFrame:
        ph = _phrases_of(df[text_col])
        if not len(ph):
            return pd.DataFrame(
                {"word": pd.Series([], dtype="object"),
                 "freq": pd.Series([], dtype="int64"),
                 "deg": pd.Series([], dtype="int64"),
                 "__b": pd.Series([], dtype="int64")}
            )
        words = ph["phrase"].str.split(" ")
        lens = words.str.len().to_numpy(dtype=np.int64)
        flat = np.concatenate([np.asarray(w, dtype=object) for w in words])
        deg = np.repeat(ph["n_words"].to_numpy(dtype=np.int64), lens)
        out = (
            pd.DataFrame({"word": flat, "deg": deg})
            .groupby("word", as_index=False)
            .agg(freq=("deg", "size"), deg=("deg", "sum"))
        )
        h = pd.util.hash_pandas_object(out["word"], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out[["word", "freq", "deg", "__b"]]

    def word_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("word", as_index=False).agg(
            freq=("freq", "sum"), deg=("deg", "sum")
        )
        out["score_e6"] = (
            out["deg"].astype("int64") * 1_000_000 // out["freq"]
        ).astype("int64")
        return out[["word", "score_e6"]]

    word_scores = dict(
        ds.map_batches(word_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(word_final, batch_format="pandas")
        .to_pandas()
        .itertuples(index=False, name=None)
    )

    def phrase_partial(df: pd.DataFrame) -> pd.DataFrame:
        ph = _phrases_of(df[text_col])
        if not len(ph):
            return pd.DataFrame(
                {"phrase": pd.Series([], dtype="object"),
                 "n_words": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64"),
                 "__b": pd.Series([], dtype="int64")}
            )
        out = ph.groupby(["phrase", "n_words"], as_index=False).size()
        out = out.rename(columns={"size": "n"})
        h = pd.util.hash_pandas_object(out["phrase"], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def phrase_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["phrase", "n_words"], as_index=False
        )["n"].sum()
        # score = Σ unique-member-word scores (broadcast dict lookup)
        out["score_e6"] = [
            int(sum(word_scores[w] for w in set(p.split(" "))))
            for p in out["phrase"]
        ]
        out = out.astype({"n": "int64", "n_words": "int64",
                          "score_e6": "int64"})
        # per-bucket top-k combiner: driver merges n_buckets × k rows
        return out.sort_values(
            ["score_e6", "phrase"], ascending=[False, True]
        ).head(k)

    cand = (
        ds.map_batches(phrase_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(phrase_final, batch_format="pandas")
        .to_pandas()
    )
    out = cand.sort_values(
        ["score_e6", "phrase"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    return out[["phrase", "n", "n_words", "score_e6"]]


def rake_stopword_values_sql() -> str:
    """The stopword list as a SQL VALUES fragment — keeps the oracle
    textually derived from the same literal."""
    return ", ".join(f"('{w}')" for w in RAKE_STOPWORDS)
