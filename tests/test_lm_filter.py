"""Oracles for `fastie_ray/ops/lm_filter.py`: a pandas reference over a
corpus with planted gibberish, model-prune semantics, and boundary
cases (sub-bigram docs, batch/partition invariance)."""

import numpy as np
import pandas as pd
import ray
import ray.data

from fastie_ray.ops.lm_filter import (
    _doc_bigrams,
    bigram_model,
    lm_familiarity,
    lm_familiarity_pipeline,
)


def _corpus(n=60, seed=7):
    """Template-heavy docs plus planted gibberish tails whose bigrams
    are unique (never reach min_count)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        body = " ".join(
            f"the quick brown fox {w}" for w in ["jumps", "runs", "sits"][: 1 + i % 3]
        )
        if i % 5 == 0:
            body += " " + " ".join(
                "zx" + "".join(rng.choice(list("abcdef"), 4)) for _ in range(6)
            )
        rows.append({"doc_id": i, "text": body})
    return pd.DataFrame(rows)


def _reference(df, min_count):
    big = _doc_bigrams(df, "text", "doc_id")
    counts = big["bigram"].value_counts()
    model = counts[counts >= min_count]
    c = big["bigram"].map(model)
    big = big.assign(hit=c.notna().astype("int64"), c=c.fillna(0).astype("int64"))
    out = big.groupby("doc", as_index=False).agg(
        n_bigrams=("bigram", "count"), covered=("hit", "sum"), familiarity=("c", "sum")
    )
    out["coverage_e6"] = (
        out["covered"].to_numpy() * 1_000_000 // out["n_bigrams"].to_numpy()
    ).astype("int64")
    return out.rename(columns={"doc": "doc_id"}).sort_values("doc_id").reset_index(drop=True)


def test_pipeline_matches_pandas_reference_any_partitioning():
    df = _corpus()
    want = _reference(df, min_count=4)
    for parts in (1, 5):
        got = (
            lm_familiarity_pipeline(
                ray.data.from_pandas(df).repartition(parts), min_count=4
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns].astype("int64"), want.astype("int64"))


def test_gibberish_docs_score_below_template_docs():
    df = _corpus()
    got = lm_familiarity_pipeline(
        ray.data.from_pandas(df), min_count=4
    ).to_pandas()
    planted = got[got["doc_id"] % 5 == 0]["coverage_e6"]
    clean = got[got["doc_id"] % 5 != 0]["coverage_e6"]
    assert planted.max() < 1_000_000  # gibberish bigrams are uncovered
    assert (clean == 1_000_000).all()  # template bigrams all reach min_count


def test_model_prunes_below_min_count():
    df = _corpus()
    model = bigram_model(ray.data.from_pandas(df), min_count=4).to_pandas()
    assert (model["c"] >= 4).all()
    # the planted zx-gibberish bigrams never repeat
    assert not model["bigram"].str.startswith("zx").any()


def test_sub_bigram_docs_are_dropped_and_empty_model_scores_zero():
    df = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["single", "", "two tokens here"]}
    )
    model_ref = ray.put(pd.Series([], dtype="int64"))
    got = (
        lm_familiarity(ray.data.from_pandas(df), model_ref)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert got["doc_id"].tolist() == [2]
    assert got["covered"].tolist() == [0]
    assert got["familiarity"].tolist() == [0]
    assert got["n_bigrams"].tolist() == [2]


def test_keyword_topics_argmax_ties_and_other():
    from fastie_ray.ops.text_analysis import keyword_topics

    lex = {"b_topic": ["cat"], "a_topic": ["dog"], "c_topic": ["fish"]}
    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "dog dog cat",        # a_topic wins 2-1
                "cat dog",            # tie 1-1 → lexicographic: a_topic
                "no animals here",    # zero hits → other
                "FISH Fish fish",     # case-insensitive, c_topic 3
            ],
        }
    )
    out = (
        keyword_topics(ray.data.from_pandas(df), lex)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["topic"].tolist() == ["a_topic", "a_topic", "other", "c_topic"]
    assert out["score"].tolist() == [2, 1, 0, 3]


def test_keyword_topics_substring_count_semantics():
    from fastie_ray.ops.text_analysis import keyword_topics

    # non-overlapping counts: "aa" in "aaaa" = 2 (matches the SQL
    # replace-length identity)
    lex = {"x": ["aa"]}
    df = pd.DataFrame({"doc_id": [0], "text": ["aaaa"]})
    out = keyword_topics(ray.data.from_pandas(df), lex).to_pandas()
    assert out["score"].tolist() == [2]
