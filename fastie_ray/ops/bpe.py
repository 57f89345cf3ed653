"""BPE tokenizer-training statistics — the corpus-side half of
byte-pair-encoding training for a 100-TB text pipeline (no reference
counterpart; complements the token-count / doc-frequency ops).

Scale shape: classic BPE (Sennrich et al. 2016) is learned from the
WORD-COUNT table, not the raw corpus — so the only corpus-sized work
is one (token, count) aggregate, which the repo's token ops already
bound by the distinct vocabulary. Everything downstream (pair counts,
merge loop) is vocabulary-bounded:

- ``pair_counts``: exact adjacent character-pair frequencies over the
  token stream. Per-batch combiner counts tokens, extracts overlapping
  2-grams from DISTINCT tokens only (vectorized ``str.extractall`` with
  a lookahead), weights by token count; partials are bounded by the
  pair domain (≤ 36² for [a-z0-9]) and merge on the driver — the same
  bounded-small-side pattern as ``ops.sketch.hll_registers``. SQL
  oracle: ``substr(token, i, 2)`` over a LATERAL ``range(1, length)``.

- ``learn_bpe``: the iterative merge loop over a (token, count) vocab
  table (driver-side — the vocab is the small output of one corpus
  exchange, exactly how production BPE trainers work). Deterministic
  tie-break: highest count, then lexicographically smallest pair.
  Pinned by pytest against a brute-force re-count per step.

Tokenization matches the repo-wide oracle convention:
``lower(regexp_extract_all(text, '[A-Za-z0-9]+'))``.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def pair_counts(
    ds: "ray.data.Dataset",
    text_col: str = "text",
) -> pd.DataFrame:
    """Exact (pair, n_occ) counts of adjacent character pairs in the
    token stream of ``text_col`` — the statistic ranking the first BPE
    merge. Output is the FULL bounded pair table (deterministic; no
    top-k tie ambiguity), sorted by pair."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].dropna().str.lower().str.findall(_TOKEN_RE).explode()
        toks = toks.dropna()
        if len(toks) == 0:
            return pd.DataFrame(
                {"pair": pd.Series([], dtype=object),
                 "n_occ": pd.Series([], dtype="int64")}
            )
        counts = toks.value_counts()
        t = pd.Series(counts.index.astype(str))
        # overlapping 2-grams of each DISTINCT token, vectorized
        ex = t.str.extractall(r"(?=(..))")[0]
        if len(ex) == 0:
            return pd.DataFrame(
                {"pair": pd.Series([], dtype=object),
                 "n_occ": pd.Series([], dtype="int64")}
            )
        w = counts.to_numpy(dtype=np.int64)[ex.index.get_level_values(0)]
        out = (
            pd.DataFrame({"pair": ex.to_numpy(), "n_occ": w})
            .groupby("pair", as_index=False)["n_occ"].sum()
        )
        return out

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"pair": pd.Series([], dtype=object),
             "n_occ": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("pair", as_index=False)["n_occ"].sum()
    out["n_occ"] = out["n_occ"].astype("int64")
    return out.sort_values("pair").reset_index(drop=True)


def token_vocab(
    ds: "ray.data.Dataset",
    text_col: str = "text",
) -> pd.DataFrame:
    """Exact (token, n_occ) vocabulary table — the one corpus-sized
    aggregate BPE training needs. Per-batch value_counts combiner,
    driver merge (bounded by the distinct vocabulary; for unbounded
    vocabularies swap the driver merge for one bucketed exchange on
    the token key, as ``ops.stats.value_counts`` does)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].dropna().str.lower().str.findall(_TOKEN_RE).explode()
        toks = toks.dropna()
        c = toks.value_counts()
        return pd.DataFrame(
            {"token": c.index.astype(str), "n_occ": c.to_numpy(dtype=np.int64)}
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"token": pd.Series([], dtype=object),
             "n_occ": pd.Series([], dtype="int64")}
        )
    out = parts.groupby("token", as_index=False)["n_occ"].sum()
    out["n_occ"] = out["n_occ"].astype("int64")
    return out.sort_values("token").reset_index(drop=True)


def learn_bpe(vocab: pd.DataFrame, n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a (token, n_occ) vocab table.
    Each token starts as a tuple of single characters; each step merges
    the most frequent adjacent symbol pair (ties: lexicographically
    smallest (a, b)). Returns the ordered merge list."""
    words: list[tuple[list[str], int]] = [
        (list(tok), int(n)) for tok, n in zip(vocab["token"], vocab["n_occ"])
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        for idx, (syms, n) in enumerate(words):
            i, out = 0, []
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[idx] = (out, n)
    return merges


def apply_bpe(token: str, merges: list[tuple[str, str]]) -> list[str]:
    """Segment one token with a learned merge list (merge priority =
    list order) — the inference-side counterpart of ``learn_bpe``."""
    syms = list(token)
    rank = {m: r for r, m in enumerate(merges)}
    while len(syms) > 1:
        pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
        ranked = [(rank[p], i) for i, p in enumerate(pairs) if p in rank]
        if not ranked:
            break
        _, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2:]
    return syms


def bpe_encode_docs(
    ds: "ray.data.Dataset",
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Encode every document with a learned merge list — the
    inference half of BPE at corpus scale: the merge table broadcasts
    once via ``ray.put`` (read by reference in every task, never
    re-shipped per batch) and each batch segments only its DISTINCT
    tokens (Zipf: distinct ≪ occurrences), mapping counts back.
    Emits (id, n_tokens, n_subwords) per document — the
    sequence-length planning statistic for packing/batching."""
    import ray

    merges_ref = ray.put(list(merges))

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        ms = ray.get(merges_ref)
        # fillna keeps row alignment with id_col (null text → 0 tokens)
        toks = df[text_col].fillna("").str.lower().str.findall(_TOKEN_RE)
        uniq = {t for lst in toks for t in lst}
        n_sub = {t: len(apply_bpe(t, ms)) for t in uniq}
        return pd.DataFrame(
            {
                "id": df[id_col].to_numpy(),
                "n_tokens": toks.map(len).fillna(0).astype("int64"),
                "n_subwords": toks.map(
                    lambda lst: sum(n_sub[t] for t in lst)
                ).fillna(0).astype("int64"),
            }
        )

    return ds.map_batches(encode, batch_format="pandas")
