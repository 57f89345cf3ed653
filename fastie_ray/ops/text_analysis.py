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


def winnow_overlap_pairs(
    ds: "ray.data.Dataset",
    k: int = 8,
    w: int = 4,
    max_fp_docs: int = 8,
    min_shared: int = 3,
    n_buckets: int = 32,
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Cross-document overlap detection by shared winnowing
    fingerprints (the MOSS pipeline, distributed): docs sharing ≥
    ``min_shared`` RARE fingerprints are reported as an overlap pair.

    Shape: fingerprinting is one shuffle-free map (with doc-local
    (doc_id, fp) dedup folded in); then TWO bucketed exchanges —
    (1) on fp: per fingerprint, docs with degree in [2, max_fp_docs]
    pair up (the degree cap drops boilerplate-hot fingerprints, which
    would otherwise go quadratic — the standard winnowing-index move;
    the cap is part of the op's CONTRACT and the SQL oracle applies
    the same HAVING), (2) on the (doc_a, doc_b) pair: sum shared
    counts and threshold. Pair volume is bounded by
    fps × max_fp_docs²/2, never corpus²."""

    fps = winnow_fingerprints(ds, k=k, w=w, text_col=text_col).map_batches(
        lambda df: df[["doc_id", "fp"]].drop_duplicates(),
        batch_format="pandas",
    )

    def add_bfp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["fp"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        deg = g.groupby("fp")["doc_id"].transform("size")
        g = g[(deg >= 2) & (deg <= max_fp_docs)]
        m = g.merge(g, on="fp", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = (
            m.groupby(["doc_id_a", "doc_id_b"], as_index=False)
            .size()
            .rename(columns={"doc_id_a": "doc_a", "doc_id_b": "doc_b",
                             "size": "shared"})
        )
        return pa.Table.from_pandas(
            out,
            schema=pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                              ("shared", pa.int64())]),
            preserve_index=False,
        ).to_pandas()

    per_fp = (
        fps.map_batches(add_bfp, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
    )

    def add_bpair(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df[["doc_a", "doc_b"]], index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def total(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["doc_a", "doc_b"], as_index=False)["shared"].sum()
        out = out[out["shared"] >= min_shared]
        out["shared"] = out["shared"].astype("int64")
        return out

    return (
        per_fp.map_batches(add_bpair, batch_format="pandas")
        .groupby("__b")
        .map_groups(total, batch_format="pandas")
    )


def keyword_topics(
    ds: "ray.data.Dataset",
    lexicon: dict[str, list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Weak-supervision topic labeling from a keyword lexicon (the
    taxonomy-tagging pass of corpus curation): per doc, each topic
    scores the summed non-overlapping substring counts of its phrases
    (case-insensitive); the label is the argmax, ties broken by
    lexicographically smallest topic, zero-hit docs labeled 'other'.

    Streaming and exchange-free; the lexicon is a fixed artifact
    shipped in the closure (vocab-bounded). Vectorized pandas
    ``str.count`` per phrase — cost is O(phrases × batch), never per
    row. Counts are SQL-reproducible via the replace-length identity
    ``(len(s) - len(replace(s, p, ''))) // len(p)``."""
    import re

    topics = sorted(lexicon)

    def label(df: pd.DataFrame) -> pd.DataFrame:
        low = df[text_col].str.lower()
        scores = {}
        for t in topics:
            s = None
            for p in lexicon[t]:
                c = low.str.count(re.escape(p.lower()))
                s = c if s is None else s + c
            scores[t] = s.astype("int64")
        sc = pd.DataFrame(scores)
        # idxmax ties resolve to the FIRST column; columns are sorted,
        # so ties go to the lexicographically smallest topic
        best = sc.idxmax(axis=1)
        bscore = sc.max(axis=1)
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "topic": best.where(bscore > 0, "other"),
                "score": bscore.astype("int64"),
            }
        )

    return ds.map_batches(label, batch_format="pandas")


def readability_batch(
    df: pd.DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> pd.DataFrame:
    """Flesch reading-ease signals — the readability quality filter:
    word / sentence / syllable counts (syllables ≈ vowel-group runs,
    the standard heuristic) and the Flesch score
    ``206.835 - 1.015·(w/s) - 84.6·(syll/w)``, rounded to 4 decimals.
    All counts are integer-exact regex counts, so the score is
    SQL-reproducible (regexp_extract_all + len); sentence and word
    counts floor at 1 to keep the ratios total. Vectorized pandas str
    ops, streaming, no exchange."""
    words = df[text_col].str.count(r"[A-Za-z0-9]+").clip(lower=1).astype("int64")
    sents = df[text_col].str.count(r"[.!?]+").clip(lower=1).astype("int64")
    sylls = df[text_col].str.count(r"[aeiouyAEIOUY]+").astype("int64")
    score = (206.835 - 1.015 * (words / sents) - 84.6 * (sylls / words)).round(4)
    return pd.DataFrame(
        {
            id_col: df[id_col],
            "n_words": words,
            "n_sents": sents,
            "n_sylls": sylls,
            "flesch": score,
        }
    )


def readability_scores(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(readability_batch, batch_format="pandas")


def term_drift(
    ds: "ray.data.Dataset",
    split_mask_col: str,
    k: int = 50,
    text_col: str = "text",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Corpus-drift KEYNESS: the terms most over-represented in slice B
    vs slice A (``split_mask_col`` ∈ {0=A, 1=B}) by the integer
    cross-product score n_B(t)·N_A − n_A(t)·N_B — the sign/order of
    the rate difference n_B/N_B − n_A/N_A without a float division
    (the log-odds family's monotone integer core). Top-``k`` each
    direction, ties → term ASC.

    One (term, slice) count combiner → one term-bucketed exchange with
    per-bucket local top-k both ways → driver merges buckets × 2k
    rows. Returns (token, n_a, n_b, score, direction)."""
    _TOKEN_RE = r"[A-Za-z0-9]+"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = pd.DataFrame(
            {
                "tok": df[text_col].str.lower().str.findall(_TOKEN_RE),
                "m": df[split_mask_col].astype("int64"),
            }
        ).explode("tok").dropna(subset=["tok"])
        g = toks.groupby(["tok", "m"], as_index=False).agg(n=("m", "count"))
        return g

    totals = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(
            lambda df: df.groupby("m", as_index=False)["n"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("m")["n"]
        .sum()
    )
    n_a = int(totals.get(0, 0))
    n_b = int(totals.get(1, 0))

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["tok"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").groupby(["tok", "m"], as_index=False)[
            "n"
        ].sum()
        w = g.pivot_table(index="tok", columns="m", values="n",
                          aggfunc="sum", fill_value=0)
        out = pd.DataFrame(
            {
                "token": w.index,
                "n_a": w[0].to_numpy(dtype=np.int64) if 0 in w else 0,
                "n_b": w[1].to_numpy(dtype=np.int64) if 1 in w else 0,
            }
        )
        out["score"] = (
            out["n_b"] * np.int64(n_a) - out["n_a"] * np.int64(n_b)
        )
        up = out.sort_values(["score", "token"],
                             ascending=[False, True]).head(k)
        dn = out.sort_values(["score", "token"],
                             ascending=[True, True]).head(k)
        return pd.concat([up, dn], ignore_index=True)

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(local_topk, batch_format="pandas")
        .to_pandas()
        .drop_duplicates("token")
    )
    up = cand.sort_values(["score", "token"],
                          ascending=[False, True]).head(k).copy()
    up["direction"] = "up"
    dn = cand.sort_values(["score", "token"],
                          ascending=[True, True]).head(k).copy()
    dn["direction"] = "down"
    out = pd.concat([up, dn], ignore_index=True)
    for c in ("n_a", "n_b", "score"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def script_mix(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Per-document script census: Latin / CJK / digit character
    counts plus a code-mixing flag (both Latin AND CJK present) — the
    web-crawl cleaning signal that routes mixed-script pages away from
    single-language models and catches encoding mojibake. Pure
    vectorized map (pandas ``str.count`` over compiled char classes),
    zero exchanges; at 100 TB this is a throughput-bound scan stage."""

    def census(df: pd.DataFrame) -> pd.DataFrame:
        s = df[text_col]
        n_latin = s.str.count(r"[A-Za-z]").astype("int64")
        n_cjk = s.str.count(r"[一-鿿]").astype("int64")
        n_digit = s.str.count(r"[0-9]").astype("int64")
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_latin": n_latin,
                "n_cjk": n_cjk,
                "n_digit": n_digit,
                "is_mixed": ((n_latin > 0) & (n_cjk > 0)).astype("int64"),
            }
        )

    return ds.map_batches(census, batch_format="pandas")


def char_entropy_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Per-doc codepoint Shannon entropy — the cheap gibberish /
    boilerplate / low-diversity detector (near-zero entropy = repeated
    filler; near-max = random bytes). Returns
    (doc_id, n_chars, n_distinct, entropy_e6) with

        entropy_e6 = Σ_chars floor(1e6 · (c/n) · log2(n/c))

    floored PER TERM so the sum is order-independent int64 — the SQL
    oracle reproduces it exactly whatever its group ordering (same
    discipline as quality_batch's e6 ratios). Empty docs are dropped
    (filter ``length(text) > 0`` in the oracle to match).

    Vectorized: the batch's texts are joined once and decoded through
    UTF-32 into a codepoint array (no per-char Python loop), doc ids
    repeat by ``str.len`` (Python len == codepoint count == SQL
    ``length``), and one pandas groupby builds every histogram.
    """
    t = df[text_col].astype(str)
    lens = t.str.len().to_numpy(dtype=np.int64)
    keep = lens > 0
    t = t[keep]
    ids = df.loc[keep, "doc_id"].to_numpy()
    lens = lens[keep]
    if len(t) == 0:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "n_chars": pd.Series([], dtype="int64"),
             "n_distinct": pd.Series([], dtype="int64"),
             "entropy_e6": pd.Series([], dtype="int64")}
        )
    codes = np.frombuffer("".join(t.tolist()).encode("utf-32-le"), dtype=np.uint32)
    idx = np.repeat(np.arange(len(t), dtype=np.int64), lens)
    hist = (
        pd.DataFrame({"i": idx, "cp": codes})
        .groupby(["i", "cp"], as_index=False)
        .size()
    )
    c = hist["size"].to_numpy(dtype=np.float64)
    n = lens[hist["i"].to_numpy()].astype(np.float64)
    term = np.floor(1e6 * (c / n) * np.log2(n / c)).astype(np.int64)
    per_doc = (
        pd.DataFrame({"i": hist["i"], "term": term})
        .groupby("i")
        .agg(n_distinct=("term", "size"), entropy_e6=("term", "sum"))
    )
    out = pd.DataFrame(
        {
            "doc_id": ids[per_doc.index.to_numpy()],
            "n_chars": lens[per_doc.index.to_numpy()],
            "n_distinct": per_doc["n_distinct"].to_numpy(dtype=np.int64),
            "entropy_e6": per_doc["entropy_e6"].to_numpy(dtype=np.int64),
        }
    )
    return out


def char_entropy(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Map ``char_entropy_batch`` over the corpus — embarrassingly
    parallel, zero shuffles."""
    return ds.map_batches(
        lambda df: char_entropy_batch(df, text_col), batch_format="pandas"
    )


def token_fertility(
    ds: "ray.data.Dataset",
    group_col: str = "lang",
    text_col: str = "text",
    n_buckets: int = 8,
) -> "ray.data.Dataset":
    """Per-group tokenizer-fertility census — the corpus-mix statistic
    a multilingual training run budgets with (chars per token varies
    ~3× across languages; token counts, not doc counts, are the cost
    unit). Returns (group, n_docs, n_tokens, n_chars,
    chars_per_token_e3 = n_chars·1000 // n_tokens) — all integer.

    One per-batch partial-sum combiner → one tiny group exchange."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].astype(str)
        out = pd.DataFrame(
            {
                "g": df[group_col],
                "n_tokens": t.str.count(r"[A-Za-z0-9]+").astype("int64"),
                "n_chars": t.str.len().astype("int64"),
            }
        )
        agg = out.groupby("g", as_index=False, dropna=False).agg(
            n_docs=("n_chars", "size"),
            n_tokens=("n_tokens", "sum"),
            n_chars=("n_chars", "sum"),
        )
        h = pd.util.hash_pandas_object(agg["g"], index=False).to_numpy()
        agg["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return agg

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("g", as_index=False, dropna=False).agg(
            n_docs=("n_docs", "sum"),
            n_tokens=("n_tokens", "sum"),
            n_chars=("n_chars", "sum"),
        )
        out["chars_per_token_e3"] = (
            out["n_chars"] * 1000 // out["n_tokens"].clip(lower=1)
        )
        return out.rename(columns={"g": "group"}).astype(
            {"n_docs": "int64", "n_tokens": "int64", "n_chars": "int64",
             "chars_per_token_e3": "int64"}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def nfc_audit(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Unicode-normalization audit: per doc, raw codepoint length vs
    NFC-normalized length and an ``is_nfc`` flag — the ingest gate that
    catches decomposed-form crawl shards before they poison exact-dedup
    fingerprints (NFC('é') ≠ 'e'+combining-acute byte-wise, identical
    to the reader). Python's unicodedata and DuckDB's
    ``nfc_normalize`` both implement UAX #15, so the oracle matches
    byte-for-byte. Embarrassingly parallel, zero shuffles."""
    import unicodedata

    def audit(df: pd.DataFrame) -> pd.DataFrame:
        t = df[text_col].astype(str)
        norm = t.map(lambda s: unicodedata.normalize("NFC", s))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": t.str.len().astype("int64"),
                "n_nfc": norm.str.len().astype("int64"),
                "is_nfc": (t == norm).astype("int64"),
            }
        )

    return ds.map_batches(audit, batch_format="pandas")


def vocab_growth(
    ds: "ray.data.Dataset",
    n_growth_buckets: int = 20,
    ngram: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Heaps'-law vocabulary-growth curve: partition the doc-id range
    into ``n_growth_buckets`` equal-width slices and count, per slice,
    the token TYPES whose first occurrence (min doc_id) lands there,
    plus the running cumulative vocabulary size. The corpus-freshness
    diagnostic of a crawl pipeline (a flattening curve = the crawl is
    re-reading itself).

    Scale shape: the per-batch combiner emits one row per DISTINCT
    (token, batch) carrying the batch-local min doc_id — occurrence
    volume never leaves the batch; ONE token-bucketed exchange reduces
    to global first occurrences and folds them straight into the
    growth-bucket histogram (≤ n_growth_buckets rows per reduce
    bucket), so the driver merges a buckets × n_growth_buckets table.
    ``ngram > 1`` tracks space-joined word n-gram types instead of
    unigrams (small fixed vocabularies saturate the unigram curve
    immediately; the n-gram space keeps growing — the statistic Heaps
    actually measured). Returns (bucket, doc_lo, new_types,
    cum_types), int64."""
    import ray.data  # noqa: F401

    max_id = int(ds.max(id_col))
    width = (max_id + n_growth_buckets) // n_growth_buckets

    def to_types(ts: list[str]) -> list[str]:
        if ngram == 1:
            return ts
        return [
            " ".join(ts[i:i + ngram]) for i in range(len(ts) - ngram + 1)
        ]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = pd.DataFrame(
            {
                "doc": df[id_col].to_numpy(),
                "token": df[text_col].str.lower()
                .str.findall(r"[a-z0-9]+").map(to_types),
            }
        ).explode("token")
        toks = toks.dropna(subset=["token"])
        agg = toks.groupby("token", as_index=False)["doc"].min()
        agg["__b"] = _bucket_hash(agg["token"], n_buckets)
        return agg

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("token")["doc"].min()
        b = (first // width).astype("int64")
        out = b.value_counts().rename_axis("bucket").reset_index(
            name="new_types"
        )
        return out.astype({"bucket": "int64", "new_types": "int64"})

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {"bucket": pd.array([], dtype="int64"),
             "doc_lo": pd.array([], dtype="int64"),
             "new_types": pd.array([], dtype="int64"),
             "cum_types": pd.array([], dtype="int64")}
        )
    out = (
        parts.groupby("bucket", as_index=False)["new_types"].sum()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    out["doc_lo"] = out["bucket"] * width
    out["cum_types"] = out["new_types"].cumsum()
    return out[["bucket", "doc_lo", "new_types", "cum_types"]].astype("int64")


def _bucket_hash(keys: pd.Series, n_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int64)


def doc_novelty(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-document novelty attribution: of a doc's DISTINCT word
    bigrams, how many occur for the FIRST time in this doc (first =
    smallest doc id containing the bigram) — the per-doc answer to
    "how much new content does this doc actually add", the
    admission-order novelty signal a dedup-heavy crawl pipeline ranks
    by (RefinedWeb-style marginal-content accounting at n-gram
    granularity). Returns (doc_id, n_distinct, n_novel, novelty_e6),
    int64, novelty_e6 = n_novel·1e6 // n_distinct.

    Scale shape: distinct (bigram, doc) pairs flow through ONE
    bigram-bucketed exchange; each bucket task owns every occurrence
    of its bigrams, so first-doc and per-doc novel counts reduce
    locally to (doc, n_distinct, n_novel) partials; a second doc-keyed
    exchange (doc-domain rows, no payload) finishes. Text never ships
    past the first combiner."""

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(r"[a-z0-9]+")
        t = pd.DataFrame(
            {
                "doc": df[id_col].to_numpy(),
                "b": toks.map(
                    lambda ts: list(
                        {" ".join(p) for p in zip(ts, ts[1:])}
                    )
                ),
            }
        ).explode("b")
        t = t.dropna(subset=["b"]).drop_duplicates()
        h = pd.util.hash_pandas_object(t["b"], index=False).to_numpy()
        t["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return t

    def per_bigram(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates()
        first = g.groupby("b")["doc"].transform("min")
        out = pd.DataFrame(
            {"doc": g["doc"], "novel": (g["doc"] == first).astype("int64")}
        ).groupby("doc", as_index=False).agg(
            n_distinct=("novel", "size"), n_novel=("novel", "sum")
        )
        h = pd.util.hash_pandas_object(out["doc"], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("doc", as_index=False).agg(
            n_distinct=("n_distinct", "sum"), n_novel=("n_novel", "sum")
        )
        out["novelty_e6"] = (
            out["n_novel"] * 1_000_000 // out["n_distinct"]
        )
        out = out.rename(columns={"doc": id_col})
        return out.astype("int64")

    return (
        ds.map_batches(pairs, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_bigram, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def boilerplate_windows(
    ds: "ray.data.Dataset",
    shingle: int = 8,
    min_docs: int = 3,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-source boilerplate detection — the CCNet/RefinedWeb cleaning
    step this inventory lacked: a non-overlapping ``shingle``-token
    window whose text recurs in ≥ ``min_docs`` DISTINCT documents of
    the same source is boilerplate (nav bars, footers, legal blurbs —
    content shared across a host's pages, not duplicated documents).
    Emits per doc: (doc_id, n_windows, n_bp, bp_e6 = ⌊1e6·n_bp /
    n_windows⌋); docs shorter than one window are dropped (undefined
    ratio).

    Scale shape: corpus → window rows (×1/shingle of token volume)
    with md5 window keys; ONE (source, window)-bucketed exchange
    computes the distinct-doc frequency AND flags every window row in
    place (no driver-side flag table, no broadcast — the boilerplate
    key domain at 100 TB is itself corpus-scale); one doc-bucketed
    exchange folds flags to the per-doc ratio. Nothing materializes on
    the driver."""
    import hashlib

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, sources, wkeys = [], [], []
        for doc_id, source, text in zip(
            df["doc_id"], df["source"], df["text"]
        ):
            toks = text.split()
            n_w = len(toks) // shingle
            for i in range(n_w):
                w = " ".join(toks[i * shingle:(i + 1) * shingle])
                doc_ids.append(doc_id)
                sources.append(source)
                wkeys.append(hashlib.md5(w.encode()).hexdigest()[:16])
        return pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "source": sources,
            "wkey": wkeys,
        })

    def add_wb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df["source"].astype(str) + "\x1f" + df["wkey"], index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        df_count = (
            g.drop_duplicates()
            .groupby(["source", "wkey"], as_index=False)["doc_id"]
            .size()
        )
        bp = df_count[df_count["size"] >= min_docs][["source", "wkey"]]
        bp = bp.assign(bp=np.int64(1))
        out = g.merge(bp, on=["source", "wkey"], how="left")
        return pd.DataFrame({
            "doc_id": out["doc_id"].astype("int64"),
            "bp": out["bp"].fillna(0).astype("int64"),
        })

    def add_db(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = (df["doc_id"].to_numpy() % n_buckets).astype(np.int64)
        return df

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        out = g.groupby("doc_id", as_index=False).agg(
            n_windows=("bp", "count"), n_bp=("bp", "sum")
        )
        out["bp_e6"] = (out["n_bp"] * 1_000_000) // out["n_windows"]
        return out.astype("int64")

    return (
        ds.map_batches(windows, batch_format="pandas")
        .map_batches(add_wb, batch_format="pandas")
        .groupby("__b")
        .map_groups(flag, batch_format="pandas")
        .map_batches(add_db, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_doc, batch_format="pandas")
    )
