"""Tests for ops.privacy.k_anonymity_audit and
ops.text_index.trigram_search against brute-force pandas oracles."""

import numpy as np
import pandas as pd
import pytest

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def test_k_anonymity_audit():
    from fastie_ray.ops.privacy import k_anonymity_audit

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "age_band": rng.choice(["20s", "30s", "40s"], 200),
            "zip3": rng.integers(100, 106, 200).astype(np.int64),
        }
    )
    got = (
        k_anonymity_audit(_ds(df, 4), ["age_band", "zip3"], k=10, n_buckets=4)
        .to_pandas()
        .sort_values(["age_band", "zip3"])
        .reset_index(drop=True)
    )
    want = df.groupby(["age_band", "zip3"], as_index=False).size()
    want = (
        want[want["size"] < 10]
        .rename(columns={"size": "n_rows"})
        .astype({"n_rows": "int64"})
        .sort_values(["age_band", "zip3"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_trigram_search_exact_and_short_pattern():
    from fastie_ray.ops.text_index import trigram_search

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(50, dtype=np.int64),
            "text": [
                f"alpha beta gamma {i}" if i % 3 == 0
                else f"delta epsilon {i}"
                for i in range(50)
            ],
        }
    )
    # "ta gam" spans the beta/gamma boundary; "epsilon 7" only doc 7
    got = (
        trigram_search(
            _ds(docs, 3), ["ta gam", "epsilon 7"], n_buckets=4
        )
        .to_pandas()
        .sort_values(["pattern", "doc_id"])
        .reset_index(drop=True)
    )
    rows = []
    for p in ["ta gam", "epsilon 7"]:
        for i, t in zip(docs["doc_id"], docs["text"]):
            if p in t:
                rows.append((p, i))
    want = (
        pd.DataFrame(rows, columns=["pattern", "doc_id"])
        .astype({"doc_id": "int64"})
        .sort_values(["pattern", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert (got["pattern"] == "ta gam").sum() == 17  # docs 0,3,...,48

    with pytest.raises(ValueError):
        trigram_search(_ds(docs, 2), ["ab"])


def test_l_diversity_audit_bruteforce():
    from fastie_ray.ops.privacy import l_diversity_audit

    rng = np.random.default_rng(83)
    df = pd.DataFrame(
        {
            "zone": rng.integers(0, 12, 300).astype(np.int64),
            "disease": rng.choice(["a", "b", "c", "d"], 300),
        }
    )
    # sparse zones guarantee risky (low-diversity) classes
    df = pd.concat(
        [df, pd.DataFrame({"zone": [100, 100, 101], "disease": ["a", "a", "b"]})],
        ignore_index=True,
    )
    got = (
        l_diversity_audit(_ds(df, 4), ["zone"], "disease", l=4, n_buckets=4)
        .to_pandas()
        .sort_values("zone")
        .reset_index(drop=True)
    )
    want = df.groupby("zone", as_index=False).agg(
        n_rows=("disease", "count"), n_sensitive=("disease", "nunique")
    )
    want = (
        want[want["n_sensitive"] < 4]
        .astype({"n_rows": "int64", "n_sensitive": "int64"})
        .sort_values("zone")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
