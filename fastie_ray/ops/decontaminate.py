"""Benchmark decontamination — flag training documents whose word
n-grams overlap a held-out test/benchmark set (the standard pre-training
"remove eval contamination" pass; no reference analogue).

Scale shape: the benchmark set is inherently SMALL (eval suites are
thousands of docs, the corpus is billions), so its distinct n-gram set
is collected once on the driver, ``ray.put`` once, and read by every
task — a broadcast lookup, never a shuffle join. The corpus side is a
stateless ``map_batches`` membership count: streams at read bandwidth,
no all-to-all.

Gram representation is the literal space-joined token window (tokens =
``text.strip().split()``), so a DuckDB oracle reproduces it with
``regexp_split_to_array(trim(text), '\\s+')`` + ``list_transform`` —
counts are over DISTINCT grams per doc for order-independence.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _doc_ngrams(text: str, n: int) -> set:
    toks = text.strip().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def collect_test_ngrams(
    test_ds: "ray.data.Dataset", n: int = 8, text_col: str = "text"
):
    """Distinct n-grams of the (small) benchmark set → broadcast ref.
    Per-batch distinct-gram sets are unioned on the driver — bounded by
    the benchmark's vocabulary, not the corpus."""
    import ray

    grams: set = set()
    for batch in test_ds.iter_batches(batch_size=1024, batch_format="pandas"):
        for t in batch[text_col]:
            grams |= _doc_ngrams(t, n)
    return ray.put(frozenset(grams))


def decontaminate(
    ds: "ray.data.Dataset",
    test_grams_ref,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """corpus docs → (doc_id, n_grams, n_overlap, contaminated).

    ``n_grams`` / ``n_overlap`` count DISTINCT grams; ``contaminated``
    is 1 iff any gram appears in the benchmark set. The benchmark gram
    set is fetched from the object store once per task (zero-copy read
    of the broadcast object, never re-shipped per batch)."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import ray

        grams = (
            ray.get(test_grams_ref)
            if isinstance(test_grams_ref, ray.ObjectRef)
            else test_grams_ref
        )
        n_grams = np.empty(len(df), dtype=np.int64)
        n_overlap = np.empty(len(df), dtype=np.int64)
        for k, t in enumerate(df[text_col]):
            g = _doc_ngrams(t, n)
            n_grams[k] = len(g)
            n_overlap[k] = sum(1 for x in g if x in grams)
        return pd.DataFrame(
            {
                id_col: df[id_col],
                "n_grams": n_grams,
                "n_overlap": n_overlap,
                "contaminated": (n_overlap > 0).astype(np.int64),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def eval_ngram_coverage(
    ds: "ray.data.Dataset",
    eval_mod: int = 37,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Memorization-exposure census — the measurement complement of
    ``decontaminate`` (which flags and drops): for every EVAL document
    (``id % eval_mod == 0``), what fraction of its distinct word
    ``n``-grams also occurs in the TRAINING side of the corpus. High
    coverage means the eval slice cannot measure generalization even
    after doc-level decontamination (partial-overlap leakage).
    Returns (doc_id, n_grams, n_covered, coverage_e6) for eval docs
    with ≥ 1 gram.

    Scale shape: unlike ``decontaminate`` (small eval side broadcast),
    BOTH sides here are corpus-scale, so distinct (gram, doc, side)
    rows flow through ONE gram-bucketed exchange where each gram
    resolves covered/uncovered locally and emits per-eval-doc count
    partials; a doc-keyed second exchange finishes. Text never ships
    past the gram combiner."""

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].astype(str).str.strip().str.split()
        rows_doc, rows_gram = [], []
        for did, ts in zip(df[id_col].to_numpy(), toks):
            if not isinstance(ts, list) or len(ts) < n:
                continue
            seen = {
                " ".join(ts[i:i + n]) for i in range(len(ts) - n + 1)
            }
            rows_doc.extend([did] * len(seen))
            rows_gram.extend(seen)
        out = pd.DataFrame({"doc": rows_doc, "gram": rows_gram})
        out["is_eval"] = (out["doc"] % eval_mod == 0).astype("int64")
        h = pd.util.hash_pandas_object(out["gram"], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def per_gram(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates(["doc", "gram"])
        cov = g[g["is_eval"] == 0].groupby("gram").size()
        ev = g[g["is_eval"] == 1].copy()
        ev["covered"] = (
            ev["gram"].map(cov).fillna(0) > 0
        ).astype("int64")
        out = ev.groupby("doc", as_index=False).agg(
            n_grams=("covered", "size"), n_covered=("covered", "sum")
        )
        h = pd.util.hash_pandas_object(out["doc"], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("doc", as_index=False).agg(
            n_grams=("n_grams", "sum"), n_covered=("n_covered", "sum")
        )
        out["coverage_e6"] = (
            out["n_covered"] * 1_000_000 // out["n_grams"]
        )
        out = out.rename(columns={"doc": "doc_id"})
        return out.astype("int64")

    return (
        ds.map_batches(grams, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_gram, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
