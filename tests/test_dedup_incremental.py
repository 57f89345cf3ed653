"""Bloom-prefiltered incremental dedup (`ops/dedup.py:dedup_against`):
brute-force reference, and a deliberately TINY filter (m_bits=64) that
forces heavy false positives to prove the anti-join verification keeps
the result exact regardless of bloom sizing."""

import hashlib

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.dedup import build_bloom, dedup_against


def _docs(texts, ids=None):
    ids = ids if ids is not None else np.arange(len(texts))
    return pd.DataFrame(
        {"doc_id": np.asarray(ids, dtype=np.int64), "text": texts}
    )


REF = ["shared one", "shared two", "ref only alpha", "ref only beta"]
NEW = [
    "shared one",          # exact dup of ref → dropped
    "brand new doc x",
    "shared two",          # dup → dropped
    "brand new doc y",
    "brand new doc x",     # dup WITHIN new but not in ref → kept (both rows)
]


def _ref_result(new, ref):
    ref_fp = {hashlib.md5(t.encode()).hexdigest() for t in ref}
    rows = [
        (i, hashlib.md5(t.encode()).hexdigest())
        for i, t in enumerate(new)
        if hashlib.md5(t.encode()).hexdigest() not in ref_fp
    ]
    return (
        pd.DataFrame(rows, columns=["doc_id", "fingerprint"])
        .astype({"doc_id": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_dedup_against_bruteforce(ray_session):
    new = ray.data.from_pandas(_docs(NEW))
    ref = ray.data.from_pandas(_docs(REF, ids=np.arange(100, 100 + len(REF))))
    got = (
        dedup_against(new, ref, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref_result(NEW, REF))
    assert list(got["doc_id"]) == [1, 3, 4]  # within-new dups both kept


def test_tiny_bloom_stays_exact(ray_session):
    # m_bits=64 with k=7 saturates → ~everything is a candidate; the
    # anti-join must still produce the exact answer
    new = ray.data.from_pandas(_docs(NEW))
    ref = ray.data.from_pandas(_docs(REF, ids=np.arange(100, 100 + len(REF))))
    got = (
        dedup_against(new, ref, m_bits=64, k=7, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref_result(NEW, REF))


def test_bloom_no_false_negatives(ray_session):
    ref = ray.data.from_pandas(_docs(REF))
    words = build_bloom(ref, m_bits=1 << 12, k=5)
    from fastie_ray.ops.dedup import _md5_hash_pair

    h1, h2 = _md5_hash_pair(REF)
    for j in range(len(REF)):
        for i in range(5):
            idx = (h1[j] + np.uint64(i) * h2[j]) % np.uint64(1 << 12)
            assert (
                words[int(idx) >> 6] >> np.uint64(int(idx) & 63)
            ) & np.uint64(1)


def test_all_new_shard_skips_join(ray_session):
    # disjoint shard: every row is bloom-definite-new (with a roomy
    # filter, false positives are ~0 here) and the result is the shard
    new_texts = [f"totally unique doc {i} zzz" for i in range(20)]
    new = ray.data.from_pandas(_docs(new_texts))
    ref = ray.data.from_pandas(_docs(REF, ids=np.arange(100, 104)))
    got = dedup_against(new, ref).to_pandas()
    assert len(got) == 20


def test_dup_cluster_histogram_known_graph():
    import ray.data

    from fastie_ray.ops.dedup import dup_cluster_histogram

    # pairs: {1,2,3} via chain, {7,8}; 10 docs total → 5 singletons
    pairs = pd.DataFrame({"doc_a": [1, 2, 7], "doc_b": [2, 3, 8]})
    out = dup_cluster_histogram(ray.data.from_pandas(pairs).repartition(4), total_docs=10)
    got = dict(zip(out["cluster_size"], out["n_clusters"]))
    assert got == {1: 5, 2: 1, 3: 1}


def test_dup_cluster_histogram_no_pairs():
    import ray.data

    from fastie_ray.ops.dedup import dup_cluster_histogram

    pairs = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64")})
    out = dup_cluster_histogram(ray.data.from_pandas(pairs), total_docs=7)
    assert out["cluster_size"].tolist() == [1]
    assert out["n_clusters"].tolist() == [7]


def test_fuzzy_keep_best_transitive_chain(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.dedup import fuzzy_dedup_keep_best

    # chain 1-2, 2-3 (one cluster) + pair 10-11 + singleton 20;
    # quality favors doc 2 in the chain and doc 10 in the pair
    docs = ray.data.from_items(
        [
            {"doc_id": 1, "score": 5},
            {"doc_id": 2, "score": 9},
            {"doc_id": 3, "score": 7},
            {"doc_id": 10, "score": 4},
            {"doc_id": 11, "score": 3},
            {"doc_id": 20, "score": 1},
        ]
    )
    pairs = ray.data.from_items(
        [
            {"doc_a": 1, "doc_b": 2},
            {"doc_a": 2, "doc_b": 3},
            {"doc_a": 10, "doc_b": 11},
        ]
    )
    out = (
        fuzzy_dedup_keep_best(docs, pairs, score_col="score", n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"doc_id": [2, 10, 20], "cluster_size": [3, 2, 1]}
    ).astype("int64")
    pd.testing.assert_frame_equal(out, want)


def test_fuzzy_keep_best_rejects_float_scores(ray_session):
    """Float quality scores would silently truncate in the int64
    exchange (ADVICE r2) — the op must raise instead."""
    import pytest
    import ray.data

    from fastie_ray.ops.dedup import fuzzy_dedup_keep_best

    docs = ray.data.from_items(
        [{"doc_id": 1, "score": 0.9}, {"doc_id": 2, "score": 0.7}]
    )
    pairs = ray.data.from_items([{"doc_a": 1, "doc_b": 2}])
    with pytest.raises((TypeError, Exception)) as ei:
        fuzzy_dedup_keep_best(docs, pairs, score_col="score", n_buckets=2).to_pandas()
    assert "integer score_col" in str(ei.value)


def test_banded_index_mode_matches_direct(ray_session, tmp_path):
    """minhash_dups_against_index (persisted banded base) must emit
    exactly what minhash_dups_against (both sides banded per run)
    emits — same params, same pairs, same integer jaccard."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.neardup import (
        band_corpus_index,
        minhash_dups_against,
        minhash_dups_against_index,
    )

    base = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text"],
    )

    def inc_rows(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["doc_id"].astype("int64") % 7 == 0]
        return pd.DataFrame(
            {"doc_id": sub["doc_id"].astype("int64") + 5_000_000,
             "text": sub["text"]}
        )

    inc = base.map_batches(inc_rows, batch_format="pandas")

    idx = band_corpus_index(
        base, str(tmp_path / "band_idx"), concurrency=2, n_parts=16
    )
    got = (
        minhash_dups_against_index(idx, inc, threshold=0.7, concurrency=2)
        .to_pandas().sort_values(["inc_id", "base_id"]).reset_index(drop=True)
    )
    want = (
        minhash_dups_against(base, inc, threshold=0.7, concurrency=2)
        .to_pandas().sort_values(["inc_id", "base_id"]).reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want)
