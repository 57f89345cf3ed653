"""Oracles for `fastie_ray/ops/bpe.py`: pair-count parity with a
brute-force reference under any partitioning, merge-loop determinism,
and encode/learn round-trip properties."""

import re

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.bpe import (
    apply_bpe,
    bpe_encode_docs,
    learn_bpe,
    pair_counts,
    token_vocab,
)


def _brute_pairs(texts):
    counts = {}
    for t in texts:
        for tok in re.findall(r"[A-Za-z0-9]+", t.lower()):
            for i in range(len(tok) - 1):
                p = tok[i : i + 2]
                counts[p] = counts.get(p, 0) + 1
    return (
        pd.DataFrame(
            {"pair": list(counts), "n_occ": np.array(list(counts.values()), dtype="int64")}
        )
        .sort_values("pair")
        .reset_index(drop=True)
    )


def test_pair_counts_match_brute_force_any_partitioning():
    rng = np.random.default_rng(73)
    words = ["lowest", "newest", "widest", "low", "new", "ab", "x"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(2, 9))) for _ in range(300)
    ]
    want = _brute_pairs(texts)
    df = pd.DataFrame({"text": texts})
    for parts in (1, 8):
        got = pair_counts(ray.data.from_pandas(df).repartition(parts), "text")
        pd.testing.assert_frame_equal(got, want)


def test_first_merge_is_argmax_of_pair_counts():
    texts = ["lowest newest widest lowest newest lowest"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts}))
    pc = pair_counts(ds, "text")
    vocab = token_vocab(ds, "text")
    merges = learn_bpe(vocab, 1)
    top = pc.sort_values(["n_occ", "pair"], ascending=[False, True]).iloc[0]
    assert merges[0] == (top["pair"][0], top["pair"][1])


def test_learn_bpe_classic_example():
    # Sennrich-style toy corpus: 'es' then 'est' merge first
    vocab = pd.DataFrame(
        {
            "token": ["lowest", "newest", "widest", "low", "newer"],
            "n_occ": [5, 6, 3, 7, 2],
        }
    )
    merges = learn_bpe(vocab, 3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")


def test_apply_bpe_respects_merge_priority():
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    assert apply_bpe("lowest", merges) == ["lo", "w", "est"]
    assert apply_bpe("a", merges) == ["a"]
    assert apply_bpe("zz", merges) == ["z", "z"]


def test_token_vocab_exact():
    texts = ["a b a", "b c"]
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(2)
    v = token_vocab(ds, "text")
    assert dict(zip(v["token"], v["n_occ"])) == {"a": 2, "b": 2, "c": 1}


def test_bpe_encode_docs_counts():
    texts = ["lowest newest", "low"]
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [1, 2], "text": texts})
    )
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    out = (
        bpe_encode_docs(ds, merges)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # lowest -> [lo,w,est] (3), newest -> [n,e,w,est] (4); low -> [lo,w] (2)
    assert out["n_tokens"].tolist() == [2, 1]
    assert out["n_subwords"].tolist() == [7, 2]
