"""Oracles for `fastie_ray/ops/dsir.py`: pandas reference parity,
target-enrichment semantics, and partition invariance."""

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data

from fastie_ray.ops.dsir import dsir_select, feature_counts, importance_scores
from fastie_ray.ops.lm_filter import _doc_bigrams

N_FEAT = 64


def _corpus(n=80, seed=13):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 4 == 0:  # target-like: "code" vocabulary
            words = rng.choice(["def", "return", "class", "import", "lambda"], 12)
        else:  # raw web vocabulary
            words = rng.choice(["the", "buy", "now", "click", "free", "offer"], 12)
        rows.append(
            {"doc_id": i, "text": " ".join(words), "is_t": int(i % 4 == 0)}
        )
    return pd.DataFrame(rows)


def _reference(df, keep_q):
    big = _doc_bigrams(df, "text", "doc_id")
    bucket = big["bigram"].map(
        lambda g: int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % N_FEAT
    )
    is_t = big["doc"].map(dict(zip(df["doc_id"], df["is_t"]))).astype(int)
    cnt = pd.DataFrame({"bucket": bucket, "is_t": is_t}).groupby("bucket").agg(
        n_raw=("is_t", "count"), n_target=("is_t", "sum")
    )
    score = (1_000_000 * (cnt["n_target"] + 1)) // (cnt["n_raw"] + 1)
    imp = (
        pd.DataFrame({"doc_id": big["doc"].to_numpy(), "s": score.reindex(bucket).to_numpy()})
        .groupby("doc_id", as_index=False)["s"]
        .sum()
        .rename(columns={"s": "importance"})
    )
    vals = np.sort(imp["importance"].to_numpy())
    k = int(np.ceil(keep_q * len(vals)))
    th = vals[min(k, len(vals) - 1)] if k < len(vals) else vals[-1]
    # quantile_disc: smallest value with cume_dist >= q
    cume = np.arange(1, len(vals) + 1) / len(vals)
    th = vals[np.argmax(cume >= keep_q)]
    return imp[imp["importance"] >= th].sort_values("doc_id").reset_index(drop=True)


def test_dsir_matches_reference_any_partitioning():
    df = _corpus()
    want = _reference(df, 0.75)
    for parts in (1, 5):
        got = (
            dsir_select(
                ray.data.from_pandas(df).repartition(parts),
                "is_t",
                keep_quantile=0.75,
                n_features=N_FEAT,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[["doc_id", "importance"]].astype("int64"), want.astype("int64")
        )


def test_dsir_enriches_target_fraction():
    df = _corpus()
    got = dsir_select(
        ray.data.from_pandas(df), "is_t", keep_quantile=0.75, n_features=N_FEAT
    ).to_pandas()
    base_frac = df["is_t"].mean()
    sel_frac = df.set_index("doc_id").loc[got["doc_id"], "is_t"].mean()
    assert sel_frac > base_frac  # selection must enrich target-like docs
    # disjoint vocabularies → near-perfect separation (threshold ties
    # can admit a raw doc at the quantile boundary)
    assert sel_frac >= 0.9


def test_feature_counts_sum_to_bigram_totals():
    df = _corpus(30)
    cnt = feature_counts(ray.data.from_pandas(df), "is_t", n_features=N_FEAT)
    big = _doc_bigrams(df, "text", "doc_id")
    assert cnt["n_raw"].sum() == len(big)
    assert (cnt["n_target"] <= cnt["n_raw"]).all()


def test_importance_drops_docs_without_bigrams():
    df = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["single", "two tokens"], "is_t": [0, 1]}
    )
    lut_ref = ray.put(np.full(N_FEAT, 7, dtype=np.int64))
    out = importance_scores(
        ray.data.from_pandas(df), lut_ref, n_features=N_FEAT
    ).to_pandas()
    assert out["doc_id"].tolist() == [1]
    assert out["importance"].tolist() == [7]
