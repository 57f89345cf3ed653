"""Oracles for `fastie_ray/ops/text_index.py`: pandas single-process
references and block-layout invariance (the df combiner is complete
because docs are rows)."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.text_index import doc_frequency, tfidf_top_terms, top_vocab


def _docs():
    return pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "Alpha beta GAMMA alpha",
                "beta beta delta",
                "gamma! delta? alpha.",
                "Epsilon 42 alpha42 x9",
                "the the the beta",
                "",
            ],
        }
    )


def test_doc_frequency_matches_reference_and_layout_invariant():
    df = _docs()
    want = (
        df.assign(token=df["text"].str.findall(r"[A-Za-z0-9]+"))
        .explode("token")
        .dropna(subset=["token"])
        .assign(token=lambda d: d["token"].str.lower())
        .drop_duplicates(["doc_id", "token"])
        .groupby("token")
        .size()
        .to_dict()
    )
    for parts in (1, 4):
        ds = ray.data.from_pandas(df).repartition(parts)
        out = doc_frequency(ds).to_pandas()
        assert dict(zip(out["token"], out["df"])) == want
    # mixed-case and punctuation-split semantics
    assert want["alpha"] == 2  # docs 0 and 2; 'alpha42' is its own token
    assert want["alpha42"] == 1
    assert want["42"] == 1


def test_top_vocab_df_rank_tie_by_token():
    tbl = ray.data.from_pandas(
        pd.DataFrame({"token": ["b", "a", "c"], "df": [5, 5, 9]})
    ).repartition(3)
    out = top_vocab(tbl, max_vocab=2)
    assert list(out["token"]) == ["c", "a"]


def test_tfidf_top_terms_matches_reference():
    df = _docs()
    n = len(df)
    out = (
        tfidf_top_terms(
            ray.data.from_pandas(df).repartition(3), n_docs=n, k=2, min_df=2
        )
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    # reference: explode, tf per (doc, token), idf over df>=2 tokens
    tok = (
        df.assign(token=df["text"].str.findall(r"[A-Za-z0-9]+"))
        .explode("token")
        .dropna(subset=["token"])
        .assign(token=lambda d: d["token"].str.lower())
    )
    dfs = tok.drop_duplicates(["doc_id", "token"]).groupby("token").size()
    dfs = dfs[dfs >= 2]
    tf = tok.groupby(["doc_id", "token"], as_index=False).size()
    tf = tf[tf["token"].isin(dfs.index)].copy()
    tf["score"] = (
        tf["size"] * (np.log((n + 1) / (dfs[tf["token"]].to_numpy() + 1)) + 1.0)
    ).round(6)
    tf = tf.sort_values(["doc_id", "score", "token"], ascending=[True, False, True])
    want = tf.groupby("doc_id").head(2).reset_index(drop=True)
    assert len(out) == len(want)
    assert list(out["token"]) == list(want["token"])
    assert np.allclose(out["score"], want["score"])
    # every rank sequence is 1..k' per doc
    for _, g in out.groupby("doc_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))


def test_winnowing_guarantee_and_ties():
    """Two docs sharing a run ≥ w+k-1 chars must share a fingerprint
    hash (the winnowing guarantee); repeated-char text exercises the
    rightmost-tie rule; short/empty docs degrade to one gram."""
    import ray.data

    from fastie_ray.ops.text_analysis import _winnow_doc, winnow_fingerprints

    k, w = 8, 4
    shared = "The quick brown fox jumps over it"  # 33 > w+k-1 = 11
    df = pd.DataFrame(
        {"doc_id": np.array([1, 2, 3, 4], dtype="int64"),
         "text": ["AAA " + shared + " tail one",
                  "completely other prefix " + shared,
                  "aaaaaaaaaaaaaaaaaaaa",  # all grams identical → ties
                  "hi"]}  # shorter than k
    )
    out = winnow_fingerprints(
        ray.data.from_pandas(df), k=k, w=w
    ).to_pandas()
    f1 = set(out.loc[out.doc_id == 1, "fp"])
    f2 = set(out.loc[out.doc_id == 2, "fp"])
    assert f1 & f2, "winnowing guarantee violated"
    # all-identical grams: every window min is the same hash and the
    # rightmost rule advances the kept position — selection is sparse
    d3 = out[out.doc_id == 3]
    assert d3["fp"].nunique() == 1 and len(d3) < 20 - k + 1
    # doc shorter than k: exactly one gram fingerprint at pos 1
    d4 = out[out.doc_id == 4]
    assert list(d4["pos"]) == [1] and len(d4) == 1
    # density sanity on real-ish text: ~2/(w+1) of gram count
    sel = _winnow_doc(shared * 8, k, w)
    n_grams = len(shared * 8) - k + 1
    assert len(sel) <= n_grams


def test_winnow_overlap_pairs_planted():
    import ray.data

    from fastie_ray.ops.text_analysis import winnow_overlap_pairs

    shared = "a very distinctive shared passage that is long enough to winnow " * 3
    df = pd.DataFrame(
        {"doc_id": np.array([1, 2, 3], dtype="int64"),
         "text": ["intro. " + shared + " outro one",
                  "different opening text here. " + shared,
                  "entirely unrelated content with nothing in common whatsoever"]}
    )
    out = winnow_overlap_pairs(
        ray.data.from_pandas(df), min_shared=3, n_buckets=4
    ).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(1, 2)}
    assert int(out["shared"].iloc[0]) >= 3
