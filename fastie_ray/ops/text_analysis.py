"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.
All vectorized ``map_batches`` stages over the ``documents`` table.
"""

from __future__ import annotations

import hashlib
import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.functions.hashing import stable_hash64

if TYPE_CHECKING:
    import ray.data

_WS = re.compile(r"\s+")
_PUNCT_CLASS = ".!?,;:"

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por"},
}


def token_count_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace token count (vectorized)."""
    out = pd.DataFrame({"doc_id": df["doc_id"]})
    out["n_tokens"] = df[text_col].str.count(r"\S+").astype("int64")
    return out


def quality_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Cheap quality signals: length, token stats, punctuation ratio,
    mean token length — the reference's classification stage analogue
    (SURVEY §2.2 M14) as pure columnar features."""
    t = df[text_col]
    n_chars = t.str.len().astype("int64")
    n_tokens = t.str.count(r"\S+").astype("int64")
    n_punct = t.str.count(f"[{re.escape(_PUNCT_CLASS)}]").astype("int64")
    non_space = t.str.count(r"\S").astype("int64")
    # ratios are integer-scaled (floor(x * 1e6)) so the DuckDB oracle can
    # reproduce them EXACTLY — float round() is not portable between
    # Python (banker's) and SQL (half-away-from-zero)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "punct_ratio_e6": (n_punct * 1_000_000 // n_chars.clip(lower=1)).astype("int64"),
            "mean_token_len_e6": (non_space * 1_000_000 // n_tokens.clip(lower=1)).astype("int64"),
        }
    )


def fingerprint_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Content fingerprint (md5 hex — matches SQL ``md5(text)``) plus a
    64-bit rolling-window fingerprint (min-hash of 8-token windows,
    Rabin-Karp style) for near-dup prefiltering."""
    from fastie_ray.ops.neardup import _shingle_hashes

    cache = getattr(fingerprint_batch, "_tok_cache", None)
    if cache is None or len(cache) > 1_000_000:
        cache = {}
        fingerprint_batch._tok_cache = cache  # process-local token-hash memo
    fps, rolls = [], []
    for t in df[text_col]:
        fps.append(hashlib.md5(t.encode("utf-8")).hexdigest())
        # vectorized rolling fingerprint: min over 8-token window hashes
        # (positional token-hash mix — the same kernel the MinHash
        # shingler uses; replaces one blake2 call per window)
        sh = _shingle_hashes(t, 8, cache)
        rolls.append(int(sh[0]) if len(sh) else 0)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "fingerprint": fps,
            "rolling_min_hash": np.asarray(rolls, dtype=np.uint64).astype("int64"),
        }
    )


class LangId:
    """Stateful n-gram/stopword language heuristic (compiled once per
    actor): CJK-char ratio → zh, else argmax stopword hit-rate with 'en'
    tie-break. Deterministic."""

    def __init__(self):
        self.word = re.compile(r"[a-zA-Zàâçéèêëîïôûùüäöüßñáíóú]+")
        self.cjk = re.compile(r"[一-鿿]")

    def classify(self, text: str) -> str:
        if len(text) == 0:
            return "und"
        cjk = len(self.cjk.findall(text))
        if cjk / max(1, len(text)) > 0.2:
            return "zh"
        words = [w.lower() for w in self.word.findall(text)]
        if not words:
            return "und"
        best_lang, best = "en", -1.0
        for lang in ("en", "de", "fr", "es"):
            sw = _STOPWORDS[lang]
            rate = sum(w in sw for w in words) / len(words)
            if rate > best:
                best_lang, best = lang, rate
        return best_lang

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "lang_pred": [self.classify(t) for t in df["text"]],
            }
        )


def repetition_batch(
    df: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Gopher-style repetition signals per doc: duplicate-token fraction
    and top-bigram fraction (the C4/Gopher "repetitive document" quality
    filters). Fully vectorized: one explode + pandas groupbys across the
    whole batch — no per-row Python loop. Integer-scaled (floor ×1e6) so
    the DuckDB oracle reproduces values exactly."""
    t = df[text_col].reset_index(drop=True)
    toks = t.str.split()  # Python str.split semantics (ws runs, strips)
    n_tokens = toks.str.len().astype("int64")
    ex = toks.explode().dropna()
    exf = pd.DataFrame({"i": ex.index.to_numpy(), "tok": ex.to_numpy()})
    nd = exf.groupby("i")["tok"].nunique()
    # bigrams: pair each token with the next token of the SAME doc
    exf["nxt"] = exf["tok"].shift(-1)
    same = exf["i"] == pd.Series(exf["i"].to_numpy()).shift(-1)
    bi = exf[same.to_numpy()].copy()
    bi["g"] = bi["tok"] + " " + bi["nxt"]
    bc = bi.groupby(["i", "g"], sort=False).size()
    top = bc.groupby(level=0).max()
    nbi = bi.groupby("i").size()

    idx = pd.RangeIndex(len(df))
    n_distinct = nd.reindex(idx, fill_value=0).astype("int64")
    top_c = top.reindex(idx, fill_value=0).astype("int64")
    n_bigrams = nbi.reindex(idx, fill_value=0).astype("int64")
    return pd.DataFrame(
        {
            id_col: df[id_col].to_numpy(),
            "n_tokens": n_tokens,
            "n_distinct_tokens": n_distinct,
            "dup_token_frac_e6": (
                (n_tokens - n_distinct) * 1_000_000 // n_tokens.clip(lower=1)
            ).astype("int64"),
            "top_bigram_count": top_c,
            "top_bigram_frac_e6": (
                top_c * 1_000_000 // n_bigrams.clip(lower=1)
            ).astype("int64"),
        }
    )


def repetition_scores(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(repetition_batch, batch_format="pandas")


def token_counts(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(token_count_batch, batch_format="pandas")


def quality_scores(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(quality_batch, batch_format="pandas")


def fingerprints(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(fingerprint_batch, batch_format="pandas")


def lang_id(ds: "ray.data.Dataset", concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(
        LangId, batch_format="pandas", concurrency=concurrency, batch_size=2048
    )


def _winnow_doc(text: str, k: int, w: int):
    """Winnowing (Schleimer et al., MOSS): hash every k-gram, slide a
    w-window over the hash sequence, keep the RIGHTMOST minimal hash
    per window. Hashes are md5 hex strings — fixed-width hex orders
    lexicographically == numerically, so ``MIN()`` in SQL picks the
    same gram (ties only on identical k-grams, resolved rightmost both
    sides). Returns distinct (pos_1based, hash)."""
    n = len(text)
    starts = range(max(n - k + 1, 1))
    # object dtype: np.minimum has no <U32 loop but does have an object
    # loop (Python str comparison == lexicographic == numeric for hex)
    hs = np.array(
        [hashlib.md5(text[i : i + k].encode("utf-8")).hexdigest() for i in starts],
        dtype=object,
    )
    m = len(hs)
    wmin = hs.copy()
    for off in range(1, w):
        if m - off <= 0:
            break
        np.minimum(wmin[: m - off], hs[off:], out=wmin[: m - off])
    pos = np.arange(m)
    for off in range(w):  # ascending overwrite ⇒ rightmost tie wins
        if m - off <= 0:
            break
        mask = hs[off:] == wmin[: m - off]
        pos[: m - off][mask] = np.arange(off, m)[mask]
    sel = {}
    for s in range(m):
        sel[int(pos[s])] = wmin[s]
    return [(p + 1, h) for p, h in sorted(sel.items())]


def winnow_fingerprints(
    ds: "ray.data.Dataset", k: int = 8, w: int = 4, text_col: str = "text"
) -> "ray.data.Dataset":
    """Document fingerprinting by winnowing — the plagiarism/overlap
    detection selection scheme: guaranteed to share a fingerprint with
    any copied run ≥ w+k-1 chars, density 2/(w+1). Purely document-
    local (one map, NO shuffle); downstream overlap joins group on the
    fingerprint hash. The md5-per-gram kernel here is the SQL-exact
    mode; at 100 TB swap the gram hash for the integer rolling hash in
    ``fingerprint_batch`` (same selection logic, no md5 per window)."""

    def batch(df: pd.DataFrame) -> pd.DataFrame:
        ids, poss, fps = [], [], []
        for doc_id, text in zip(df["doc_id"], df[text_col]):
            for p, h in _winnow_doc(text, k, w):
                ids.append(doc_id)
                poss.append(p)
                fps.append(h)
        return pd.DataFrame(
            {"doc_id": np.array(ids, dtype=np.int64),
             "pos": np.array(poss, dtype=np.int64),
             "fp": np.array(fps, dtype=object)}
        )

    return ds.map_batches(batch, batch_format="pandas")
