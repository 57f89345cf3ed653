"""preference_pairs combiner: global extremes must survive block-local
reduction (2 candidates per group per block), ties break on min
doc_id, degenerate groups emit nothing."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _brute(df: pd.DataFrame, punct_weight: int = 2, bucket: int = 64):
    from fastie_ray.ops.text_analysis import quality_batch

    q = quality_batch(df)
    s = pd.DataFrame({
        "lang": df["lang"].to_numpy(),
        "len_bucket": (q["n_tokens"] // bucket).astype("int64"),
        "doc_id": df["doc_id"].to_numpy(),
        "score": (q["mean_token_len_e6"]
                  - punct_weight * q["punct_ratio_e6"]).astype("int64"),
    })
    rows = []
    for (lang, lb), g in s.groupby(["lang", "len_bucket"]):
        b = g.sort_values(["score", "doc_id"],
                          ascending=[False, True]).iloc[0]
        w = g.sort_values(["score", "doc_id"],
                          ascending=[True, True]).iloc[0]
        if b["doc_id"] != w["doc_id"] and b["score"] > w["score"]:
            rows.append((lang, lb, int(b["doc_id"]), int(w["doc_id"]),
                         int(b["score"] - w["score"])))
    return pd.DataFrame(rows, columns=["lang", "len_bucket", "chosen_id",
                                       "rejected_id", "gap_e6"])


def test_preference_pairs_matches_brute_force_across_blocks(ray_session):
    from fastie_ray.ops.selection import preference_pairs

    rng = np.random.default_rng(7)
    rows = []
    for i in range(200):
        lang = ["en", "de", "zh"][i % 3]
        n_words = int(rng.integers(3, 40))
        words = ["w" * int(rng.integers(1, 9)) for _ in range(n_words)]
        punct = "..." if i % 5 == 0 else ""
        rows.append({"doc_id": i, "lang": lang,
                     "text": " ".join(words) + punct})
    df = pd.DataFrame(rows)
    # 16 blocks: every group's docs are scattered across blocks
    ds = ray.data.from_pandas(df).repartition(16)
    got = (
        preference_pairs(ds)
        .to_pandas()
        .sort_values(["lang", "len_bucket"])
        .reset_index(drop=True)
    )
    want = _brute(df).sort_values(
        ["lang", "len_bucket"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) >= 3


def test_preference_pairs_degenerate_groups(ray_session):
    from fastie_ray.ops.selection import preference_pairs

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["en", "zh", "zh", "de"],
        # zh docs have IDENTICAL text -> equal scores -> no pair;
        # en and de are singletons -> no pair
        "text": ["alpha beta", "same text here", "same text here",
                 "gamma delta"],
    })
    got = preference_pairs(ray.data.from_pandas(df)).to_pandas()
    assert len(got) == 0
