"""Augmenter (M17) conformance: reference semantics from
``fastie/data/uie/augmenter.py`` with explicit seeded rng."""

import numpy as np

from fastie_ray.functions.augment import (
    add_positive_samples_by_swap_spo,
    add_uie_relation_negative_samples,
    augment,
    augment_docs,
)


def test_augment_delete_repeat_lengths_and_dedup():
    text = "abcdefghijklmnopqrst"  # 20 chars
    rng = np.random.default_rng(5)
    out = augment(text, ["delete", "repeat"], rng=rng)
    assert out[0] == text
    assert len(out) == 3
    assert len(out[1]) == 20 - int(20 * 0.2)  # delete drops exactly n_del chars
    assert len(out[2]) == 20 + int(20 * 0.32)  # repeat doubles exactly n_rep chars
    # repeat preserves character multiset + adds duplicates of existing chars
    assert set(out[2]) == set(text)
    # below the length threshold delete is skipped entirely
    assert augment("abc", ["delete"], rng=np.random.default_rng(1)) == ["abc"]
    # deterministic under the same rng seed
    again = augment(text, ["delete", "repeat"], rng=np.random.default_rng(5))
    assert again == out


def test_augment_replace_needs_table_and_two_candidates():
    text = "alpha beta gamma delta"
    # no synonym table → no-op variant is dropped as duplicate
    out = augment(text, ["replace"], rng=np.random.default_rng(3), replace_ratio=1.0)
    assert out == [text]
    table = {"alpha": ["alef", "aleph"], "beta": ["bet"]}  # beta: <2 cands → kept
    out = augment(
        text, ["replace"], rng=np.random.default_rng(3),
        replace_ratio=1.0, synonym_table=table,
    )
    assert len(out) == 2
    words = out[1].split()
    assert words[0] in ("alef", "aleph") and words[1] == "beta"
    assert words[2:] == ["gamma", "delta"]


def test_negative_samples_reference_example():
    # the docstring example of augmenter.py:150-183
    sample = {
        "content": "大明是小明的父亲",
        "result_list": [{"text": "大明", "start": 0, "end": 2}],
        "prompt": "小明的父亲",
    }
    res = add_uie_relation_negative_samples(sample, ["母亲", "叔叔", "二姨"])
    assert [r["prompt"] for r in res] == ["小明的母亲", "小明的叔叔", "小明的二姨"]
    assert all(r["result_list"] == [] and r["content"] == sample["content"] for r in res)


def test_swap_spo_positive_samples():
    s1 = {
        "content": "Acme的CEO是Ann。",
        "prompt": "Acme的CEO",
        "result_list": [{"text": "Ann", "start": 7, "end": 10}],
    }
    s2 = {
        "content": "Bolt的CEO是Bob。",
        "prompt": "Bolt的CEO",
        "result_list": [{"text": "Bob", "start": 7, "end": 10}],
    }
    pos, err, by_pred = add_positive_samples_by_swap_spo(
        [s1, s2], rng=np.random.default_rng(0)
    )
    assert err == 0 and set(by_pred) == {"CEO"}
    assert len(pos) == 2
    for p in pos:
        start, end = p["result_list"][0]["start"], p["result_list"][0]["end"]
        assert p["content"][start:end] == p["result_list"][0]["text"]
    # s1's subject/object moved into s2's sentence
    assert any(p["content"] == "Acme的CEO是Ann。" and p["prompt"] == "Acme的CEO" for p in pos)


def test_augment_docs_stage(ray_session):
    import pandas as pd
    import ray.data

    docs = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": ["x" * 40, "y" * 30]})
    )
    out = augment_docs(docs, methods=("delete", "repeat")).to_pandas()
    assert len(out) == 6  # 3 variants per doc
    v0 = out[out.variant_id == 0].set_index("doc_id")["text"]
    assert v0[1] == "x" * 40 and v0[2] == "y" * 30
    # partitioning-independent: same rows from a re-split dataset
    out2 = augment_docs(docs.repartition(2), methods=("delete", "repeat")).to_pandas()
    a = out.sort_values(["doc_id", "variant_id"]).reset_index(drop=True)
    b = out2.sort_values(["doc_id", "variant_id"]).reset_index(drop=True)
    assert a.equals(b)
