"""Oracles for the pre-training scrub stages: PII redaction
(`fastie_ray/ops/pii.py`), Gopher-style repetition signals
(`ops/text_analysis.py:repetition_batch`) and benchmark
decontamination (`ops/decontaminate.py`). Brute-force Python
references + edge cases (empty text, single token, all-repeat doc)
that the synth corpus never hits."""

import re

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.decontaminate import (
    _doc_ngrams,
    collect_test_ngrams,
    decontaminate,
)
from fastie_ray.ops.pii import (
    EMAIL_RE,
    IP_RE,
    PHONE_RE,
    pii_redact_batch,
    pii_scrub,
    pii_scrub_batch,
)
from fastie_ray.ops.text_analysis import repetition_batch, repetition_scores


def _docs(texts):
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})


PII_TEXTS = [
    "write to alice.smith+spam@mail.example.co.uk today",
    "servers 10.0.0.1 and 192.168.255.3, call 555-0142 or 555-9999",
    "",
    "no pii here at all",
    "a@b.io a@b.io 1.2.3.4",  # repeats count separately
    "not-an-ip 1234.5.6.7890 still no phone 12-3456",
]


def test_pii_counts_match_re_reference():
    df = _docs(PII_TEXTS)
    out = pii_scrub_batch(df)
    for k, t in enumerate(PII_TEXTS):
        n_e = len(re.findall(EMAIL_RE, t))
        t1 = re.sub(EMAIL_RE, "<EMAIL>", t)
        n_i = len(re.findall(IP_RE, t1))
        t2 = re.sub(IP_RE, "<IP>", t1)
        n_p = len(re.findall(PHONE_RE, t2))
        t3 = re.sub(PHONE_RE, "<PHONE>", t2)
        assert out["n_emails"][k] == n_e
        assert out["n_ips"][k] == n_i
        assert out["n_phones"][k] == n_p
        assert out["n_pii"][k] == n_e + n_i + n_p
        assert out["redacted_len"][k] == len(t3)


def test_pii_redact_text_and_dataset_roundtrip(ray_session):
    df = _docs(PII_TEXTS)
    red = pii_redact_batch(df)
    assert "<EMAIL>" in red["text"][0] and "@" not in red["text"][0]
    assert red["text"][1].count("<IP>") == 2 and red["text"][1].count("<PHONE>") == 2
    # wrong-shaped numbers are untouched
    assert red["text"][5] == PII_TEXTS[5]
    ds_out = pii_scrub(ray.data.from_pandas(df).repartition(3)).to_pandas()
    assert int(ds_out["n_pii"].sum()) == int(pii_scrub_batch(df)["n_pii"].sum())


REP_TEXTS = [
    "",  # no tokens
    "one",  # single token: no bigrams
    "a a a a",  # all-dup: dup_frac = 3/4, top bigram 'a a' = 3/3
    "the cat sat on the mat the cat",  # mixed
    "  leading   and\ttrailing  ",  # whitespace runs
]


def test_repetition_matches_bruteforce():
    out = repetition_batch(_docs(REP_TEXTS))
    for k, t in enumerate(REP_TEXTS):
        toks = t.split()
        n = len(toks)
        assert out["n_tokens"][k] == n
        assert out["n_distinct_tokens"][k] == len(set(toks))
        assert out["dup_token_frac_e6"][k] == (n - len(set(toks))) * 1_000_000 // max(n, 1)
        bigrams = [" ".join(toks[i : i + 2]) for i in range(n - 1)]
        top = max([bigrams.count(b) for b in set(bigrams)], default=0)
        assert out["top_bigram_count"][k] == top
        assert out["top_bigram_frac_e6"][k] == top * 1_000_000 // max(len(bigrams), 1)


def test_repetition_dataset_layout_invariant(ray_session):
    texts = [f"tok{i % 7} tok{i % 3} tok{i % 7} end" for i in range(50)]
    df = _docs(texts)
    want = repetition_batch(df).sort_values("doc_id").reset_index(drop=True)
    got = (
        repetition_scores(ray.data.from_pandas(df).repartition(5))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_doc_ngrams_short_and_exact():
    assert _doc_ngrams("a b c", 8) == set()
    assert _doc_ngrams("a b c", 2) == {"a b", "b c"}
    assert _doc_ngrams("  a  b  ", 2) == {"a b"}


def test_decontaminate_flags_only_overlapping_docs(ray_session):
    base = [f"w{i} " * 12 for i in range(6)]  # 12 identical tokens each
    corpus = _docs(
        [
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",  # contaminated (contains the 8-gram)
            "alpha beta gamma delta epsilon zeta eta NOPE iota kappa",  # breaks every 8-gram
            *base,
        ]
    )
    test_set = _docs(["PRE alpha beta gamma delta epsilon zeta eta theta POST"])
    ref = collect_test_ngrams(ray.data.from_pandas(test_set), n=8)
    out = (
        decontaminate(ray.data.from_pandas(corpus).repartition(3), ref, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [1, 0] + [0] * len(base)
    # n_grams counts DISTINCT grams: 12 equal tokens → 1 distinct 8-gram
    assert out["n_grams"].tolist()[2:] == [1] * len(base)
    assert out.loc[0, "n_overlap"] == 1 and out.loc[0, "n_grams"] == 3


def test_clean_corpus_composition(ray_session):
    from fastie_ray.pipelines.clean import clean_corpus

    texts = {
        0: "tok0 tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8 tok9 "
           "tokA tokB tokC tokD tokE tokF tokG tokH tokI tokJ",  # keeper
        1: "short doc",  # dropped: < 20 tokens
        2: "dup " * 25,  # dropped: all-duplicate tokens
        3: "tok0 tok1 tok2 tok3 tok4 tok5 tok6 tok7 tok8 tok9 "
           "tokA tokB tokC tokD tokE tokF tokG tokH tokI tokJ",  # exact copy of 0
        4: " ".join(f"w{i}" for i in range(40)),  # keeper, unique
    }
    df = pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values())}
    )
    out = (
        clean_corpus(ray.data.from_pandas(df).repartition(2), None)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 4]
    assert out["n_copies"].tolist() == [2, 1]
    assert out["n_tokens"].tolist() == [20, 40]

    # decontamination: an eval gram inside doc 4 kills it
    ref = collect_test_ngrams(
        ray.data.from_pandas(pd.DataFrame({"text": ["w10 w11 w12 w13 w14 w15 w16 w17"]})),
        n=8,
    )
    out2 = clean_corpus(ray.data.from_pandas(df), ref).to_pandas()
    assert out2["doc_id"].tolist() == [0]

    # keep_text returns the redacted surviving content
    df2 = df.copy()
    df2.loc[0, "text"] += " mail me a@b.io"
    df2.loc[3, "text"] += " mail me a@b.io"
    out3 = (
        clean_corpus(ray.data.from_pandas(df2), None, keep_text=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out3.loc[0, "text"].endswith("mail me <EMAIL>")
    assert out3["n_copies"].tolist() == [2, 1]


def test_readability_known_values():
    import pandas as pd

    from fastie_ray.ops.text_analysis import readability_batch

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["The cat sat. It ran!", ""]})
    out = readability_batch(df)
    r = out.iloc[0]
    # words: The,cat,sat,It,ran = 5; sentences: '.' '!' = 2
    # vowel-groups: e,a,a,I,a = 5
    assert (r["n_words"], r["n_sents"], r["n_sylls"]) == (5, 2, 5)
    assert r["flesch"] == round(206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5), 4)
    # empty text floors words/sentences at 1
    assert (out.iloc[1][["n_words", "n_sents", "n_sylls"]] == [1, 1, 0]).all()
