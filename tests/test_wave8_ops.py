"""Brute-force parity tests for the round-3 wave-8 operators:
token_fertility, nfc_audit, token_sort_dups, conjunctive_search.
Each is checked against an independent reference computation on
planted data (driver oracles cover the SQL side; these pin the
semantics at the unit level)."""

from __future__ import annotations

import hashlib
import re
import unicodedata

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


@pytest.fixture(scope="module")
def planted_docs():
    rng = np.random.RandomState(11)
    vocab = ["alpha", "beta", "gamma", "delta", "merge", "vector",
             "stream", "x9", "k2"]
    rows = []
    for i in range(80):
        n = rng.randint(3, 12)
        toks = [vocab[j] for j in rng.randint(0, len(vocab), n)]
        rows.append(
            {"doc_id": i, "lang": ["en", "zh", "es"][i % 3],
             "text": " ".join(toks)}
        )
    # planted reordered duplicates: same token SET, different order
    rows.append({"doc_id": 900, "lang": "en", "text": "beta alpha gamma"})
    rows.append({"doc_id": 901, "lang": "en", "text": "gamma beta alpha"})
    rows.append({"doc_id": 902, "lang": "en",
                 "text": "alpha gamma beta beta"})
    # planted non-NFC text: e + combining acute (U+0301)
    rows.append({"doc_id": 903, "lang": "es", "text": "café merge"})
    df = pd.DataFrame(rows)
    return df, ray.data.from_pandas(df)


def test_token_fertility_brute_force(planted_docs):
    from fastie_ray.ops.text_analysis import token_fertility

    df, ds = planted_docs
    got = (
        token_fertility(ds, group_col="lang")
        .to_pandas()
        .sort_values("group")
        .reset_index(drop=True)
    )
    rows = []
    for g, sub in df.groupby("lang"):
        n_tok = int(
            sub["text"].map(
                lambda s: len(re.findall(r"[A-Za-z0-9]+", s))
            ).sum()
        )
        n_ch = int(sub["text"].str.len().sum())
        rows.append((g, len(sub), n_tok, n_ch, n_ch * 1000 // max(n_tok, 1)))
    want = pd.DataFrame(
        sorted(rows),
        columns=["group", "n_docs", "n_tokens", "n_chars",
                 "chars_per_token_e3"],
    )
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False
    )


def test_nfc_audit_flags_decomposed(planted_docs):
    from fastie_ray.ops.text_analysis import nfc_audit

    df, ds = planted_docs
    got = nfc_audit(ds).to_pandas().set_index("doc_id")
    # the planted combining-acute doc is NOT NFC; its NFC form is 1 shorter
    assert got.loc[903, "is_nfc"] == 0
    assert got.loc[903, "n_nfc"] == got.loc[903, "n_chars"] - 1
    for i, row in df.iterrows():
        norm = unicodedata.normalize("NFC", row["text"])
        assert got.loc[row["doc_id"], "n_chars"] == len(row["text"])
        assert got.loc[row["doc_id"], "n_nfc"] == len(norm)
        assert got.loc[row["doc_id"], "is_nfc"] == int(
            row["text"] == norm
        )


def test_token_sort_dups_brute_force(planted_docs):
    from fastie_ray.ops.neardup import token_sort_dups

    df, ds = planted_docs
    got = (
        token_sort_dups(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def fp(s: str) -> str:
        toks = sorted(set(re.findall(r"[a-z0-9]+", s.lower())))
        return hashlib.md5(" ".join(toks).encode()).hexdigest()

    ref = df.assign(fingerprint=df["text"].map(fp))
    sizes = ref.groupby("fingerprint")["doc_id"].transform("size")
    want = (
        ref[sizes >= 2]
        .assign(n_group=sizes[sizes >= 2].astype("int64"))
        [["doc_id", "fingerprint", "n_group"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # the three planted reordered docs must share one group
    planted = got[got["doc_id"].isin([900, 901, 902])]
    assert len(planted) == 3
    assert planted["fingerprint"].nunique() == 1
    assert (planted["n_group"] == 3).all()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_conjunctive_search_brute_force(planted_docs):
    from fastie_ray.ops.text_index import conjunctive_search

    df, ds = planted_docs
    terms = ["merge", "vector"]
    got = sorted(
        conjunctive_search(ds, terms).to_pandas()["doc_id"].tolist()
    )
    want = sorted(
        int(r["doc_id"])
        for _, r in df.iterrows()
        if all(
            t in set(re.findall(r"[a-z0-9]+", r["text"].lower()))
            for t in terms
        )
    )
    assert got == want and len(want) > 0


def test_conjunctive_search_token_not_substring():
    from fastie_ray.ops.text_index import conjunctive_search

    ds = ray.data.from_pandas(
        pd.DataFrame(
            {"doc_id": [0, 1, 2],
             "text": ["the graph node", "graphics card", "graph, again"]}
        )
    )
    got = sorted(
        conjunctive_search(ds, ["graph"]).to_pandas()["doc_id"].tolist()
    )
    assert got == [0, 2]
