"""Exact duplicated-substring dedup (`fastie_ray/ops/substring_dedup.py`):
brute-force Python reference on hand-built corpora (planted shared
8-grams, within-doc repeats, sub-n docs, empty text), plus parity of
the at-scale rolling-hash key against the oracle-exact string key on
the synth corpus."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.substring_dedup import (
    _gram_rows,
    dup_ngrams,
    dup_span_stats,
)

SF = "/root/testdata/sf0.001"


def _docs(texts):
    return pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )


def _ref_stats(texts, n=8, min_count=2):
    """Brute-force reference: token lists → gram counts → covered
    interval union per doc."""
    import re

    toks = [
        [t.lower() for t in re.findall(r"[A-Za-z0-9]+", s)] for s in texts
    ]
    counts: dict[tuple, int] = {}
    for ts in toks:
        for i in range(len(ts) - n + 1):
            g = tuple(ts[i : i + n])
            counts[g] = counts.get(g, 0) + 1
    dup = {g for g, c in counts.items() if c >= min_count}
    rows = []
    for doc_id, ts in enumerate(toks):
        covered = set()
        for i in range(len(ts) - n + 1):
            if tuple(ts[i : i + n]) in dup:
                covered.update(range(i, i + n))
        rows.append((doc_id, len(ts), len(covered)))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_tokens", "n_dup_tokens"]
    ).astype("int64")


SHARED = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
TEXTS = [
    f"intro one two {SHARED} tail xx",
    f"other doc starts {SHARED} and ends differently here",
    "completely unique words nothing repeated anywhere in sight today friends",
    # within-doc repeat: the same 8-gram twice in ONE doc counts
    "r1 r2 r3 r4 r5 r6 r7 r8 gap r1 r2 r3 r4 r5 r6 r7 r8",
    "short doc",  # < n tokens → zero grams, still reported
    "",  # empty
    f"case test {SHARED.upper()} mixed",  # case-folded match
]


def test_dup_span_stats_matches_bruteforce(ray_session):
    ds = ray.data.from_pandas(_docs(TEXTS))
    got = (
        dup_span_stats(ds, n=8, min_count=2, key="gram", n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _ref_stats(TEXTS)
    pd.testing.assert_frame_equal(got, ref)
    # the planted 8-gram covers exactly its 8 tokens in docs 0,1,6
    assert got.loc[0, "n_dup_tokens"] == 8
    assert got.loc[6, "n_dup_tokens"] == 8
    # within-doc repeat: both occurrences covered
    assert got.loc[3, "n_dup_tokens"] == 16
    # clean/short/empty docs present with zero dup tokens
    assert got.loc[2, "n_dup_tokens"] == 0
    assert (got.loc[[4, 5], "n_dup_tokens"] == 0).all()
    assert got.loc[5, "n_tokens"] == 0


def test_overlapping_spans_union_not_sum(ray_session):
    # 9 identical tokens → two overlapping dup 8-grams covering 9 toks
    texts = ["z " * 9, "z " * 9]
    ds = ray.data.from_pandas(_docs(texts))
    got = (
        dup_span_stats(ds, n=8, min_count=2, key="gram", n_buckets=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref_stats(texts))
    assert (got["n_dup_tokens"] == 9).all()


def test_rolling_key_parity_on_synth_corpus(ray_session):
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    a = (
        dup_span_stats(ds, n=8, min_count=2, key="gram")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dup_span_stats(ds, n=8, min_count=2, key="rolling")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a["n_dup_tokens"] > 0).any()  # synth corpus has template dups


def test_gram_rows_shapes():
    df = _docs(["a b c d", "x y", ""])
    g2 = _gram_rows(df, 2, "text", "gram")
    assert list(g2["gram"]) == ["a b", "b c", "c d", "x y"]
    assert list(g2["pos"]) == [0, 1, 2, 0]
    r2 = _gram_rows(df, 2, "text", "rolling")
    assert r2["gram"].dtype == np.uint64
    assert len(r2) == 4
    # rolling collisions would break parity: all distinct here
    assert r2["gram"].nunique() == 4


def test_dup_ngrams_min_count(ray_session):
    texts = ["p q r s t u v w end", "p q r s t u v w other"]
    ds = ray.data.from_pandas(_docs(texts))
    dup = dup_ngrams(ds, n=8, min_count=2, key="gram", n_buckets=2).to_pandas()
    assert list(dup["gram"]) == ["p q r s t u v w"]
    none = dup_ngrams(ds, n=8, min_count=3, key="gram", n_buckets=2).to_pandas()
    assert len(none) == 0
