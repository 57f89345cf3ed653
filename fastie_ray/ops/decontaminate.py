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
