"""Flagship corpus-cleaning pipeline — the standard pre-training data
pass (PII redaction → quality/repetition filters → benchmark
decontamination → exact dedup), composed the way it must run at 100 TB:

- ONE streaming ``map_batches`` fuses redaction, tokenization, all
  quality signals and the decontamination membership test — the corpus
  is tokenized exactly once, nothing but surviving rows leaves the
  stage, and the stage is stateless (scales with read bandwidth).
- ONE all-to-all exchange total: the exact-dedup hash-bucketed
  aggregate (partial combine per batch → ``n_buckets`` final tasks),
  the same skew-safe shape as ``ops/dedup.dedup_docs_exact``.
- The eval-set gram index is broadcast (``ray.put`` once, zero-copy
  read per task), never shuffled — eval suites are small by nature.

Every rule is integer-exact and RE2/DuckDB-reproducible, so the whole
composition has a value-exact SQL oracle (see ``__ray_entry__``'s
``corpus_clean``). No reference analogue (the reference is an IE
engine); thresholds follow the C4/Gopher text-quality literature.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.pii import pii_redact_batch
from fastie_ray.ops.text_analysis import repetition_batch

if TYPE_CHECKING:
    import ray.data

_BUCKET = "__b"


def clean_corpus(
    ds: "ray.data.Dataset",
    test_grams_ref=None,
    n: int = 8,
    min_tokens: int = 20,
    max_dup_frac_e6: int = 650_000,
    max_top_bigram_frac_e6: int = 100_000,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> "ray.data.Dataset":
    """docs → kept, deduplicated corpus rows.

    Output: ``(doc_id, n_tokens, n_copies)`` — one row per distinct
    surviving content, ``doc_id`` = min id of the copy group,
    ``n_copies`` = how many filtered-in duplicates it collapsed
    (+ ``text`` when ``keep_text``, the redacted content itself).

    A doc survives iff (on its REDACTED text): ``n_tokens >=
    min_tokens``, duplicate-token fraction < ``max_dup_frac_e6``/1e6,
    top-bigram fraction < ``max_top_bigram_frac_e6``/1e6, and no word
    ``n``-gram appears in the broadcast eval-set gram index (skipped
    when ``test_grams_ref`` is None).
    """

    def scrub_score_filter(df: pd.DataFrame) -> pd.DataFrame:
        import ray

        red = pii_redact_batch(df, text_col=text_col).reset_index(drop=True)
        rep = repetition_batch(red, text_col=text_col, id_col=id_col)
        keep = (
            (rep["n_tokens"].to_numpy() >= min_tokens)
            & (rep["dup_token_frac_e6"].to_numpy() < max_dup_frac_e6)
            & (rep["top_bigram_frac_e6"].to_numpy() < max_top_bigram_frac_e6)
        )
        kept = red[keep].copy()
        kept["n_tokens"] = rep["n_tokens"].to_numpy()[keep]
        if test_grams_ref is not None and len(kept):
            grams = (
                ray.get(test_grams_ref)
                if isinstance(test_grams_ref, ray.ObjectRef)
                else test_grams_ref
            )
            ok = np.ones(len(kept), dtype=bool)
            for k, t in enumerate(kept[text_col]):
                toks = t.strip().split()
                ok[k] = not any(
                    " ".join(toks[i : i + n]) in grams
                    for i in range(len(toks) - n + 1)
                )
            kept = kept[ok]
        cols = [id_col, text_col, "n_tokens"]
        return kept[cols]

    def make_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = pd.DataFrame(
                {
                    "fingerprint": pd.Series([], dtype=object),
                    id_col: pd.Series([], dtype=np.int64),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "n_copies": pd.Series([], dtype=np.int64),
                }
            )
        else:
            tmp = df.copy()
            tmp["fingerprint"] = [
                hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in tmp[text_col]
            ]
            agg = {id_col: (id_col, "min"), "n_tokens": ("n_tokens", "min"),
                   "n_copies": (id_col, "count")}
            if keep_text:
                agg[text_col] = (text_col, "first")
            out = tmp.groupby("fingerprint", as_index=False).agg(**agg)
        h = pd.util.hash_pandas_object(out["fingerprint"], index=False).to_numpy()
        out[_BUCKET] = (
            (h % np.uint64(n_buckets)).astype(np.int64)
            if len(out)
            else np.array([], dtype=np.int64)
        )
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        agg = {id_col: (id_col, "min"), "n_tokens": ("n_tokens", "min"),
               "n_copies": ("n_copies", "sum")}
        if keep_text:
            agg[text_col] = (text_col, "first")
        out = g.groupby("fingerprint", as_index=False).agg(**agg)
        return out.drop(columns=["fingerprint"])

    return (
        ds.map_batches(scrub_score_filter, batch_format="pandas")
        .map_batches(make_partial, batch_format="pandas")
        .groupby(_BUCKET)
        .map_groups(final, batch_format="pandas")
    )


def clean_funnel(
    ds: "ray.data.Dataset",
    min_chars: int = 150,
    max_dup_frac_e6: int = 650_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-document rejection LEDGER for the cleaning funnel — the
    observability half of ``clean_corpus``: instead of only emitting
    survivors, label every input doc with the FIRST stage that
    rejects it (fixed order: ``too_short`` → ``repetitive`` →
    ``duplicate`` → ``kept``), so a pipeline owner can see WHERE the
    corpus went when the kept-rate drops. Duplicate = exact md5(text)
    group keeps only its smallest ``id_col``.

    Scale shape: one feature pass (chars, dup-token fraction, md5) —
    text never leaves it — then ONE md5-bucketed exchange where each
    hash group resolves keep-first locally and emits the final
    (doc_id, reason) verdicts."""
    import hashlib

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].astype(str)
        toks = t.str.split()
        n_tokens = toks.map(len)
        n_distinct = toks.map(lambda ts: len(set(ts)))
        out = pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "n_chars": t.str.len().astype("int64"),
                "dupf": (
                    (n_tokens - n_distinct) * 1_000_000
                    // n_tokens.clip(lower=1)
                ).astype("int64"),
                "h": t.map(
                    lambda s: hashlib.md5(s.encode()).hexdigest()
                ),
            }
        )
        hb = pd.util.hash_pandas_object(out["h"], index=False).to_numpy()
        out["__b"] = (hb % np.uint64(n_buckets)).astype(np.int64)
        return out

    def verdicts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        first = g.groupby("h")[id_col].transform("min")
        isdup = g[id_col] > first
        reason = np.where(
            g["n_chars"] < min_chars, "too_short",
            np.where(
                g["dupf"] > max_dup_frac_e6, "repetitive",
                np.where(isdup, "duplicate", "kept"),
            ),
        )
        return pd.DataFrame({id_col: g[id_col], "reason": reason})

    return (
        ds.map_batches(feats, batch_format="pandas")
        .groupby("__b")
        .map_groups(verdicts, batch_format="pandas")
    )
