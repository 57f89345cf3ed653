"""Decode-kernel unit tests: exclusion rules + sparse/dense equivalence."""

import numpy as np

from fastie_ray.featurizer import GazetteerFeaturizer
from fastie_ray.functions.textnorm import space_to_dash
from fastie_ray.kernels.gp_ner import decode_gp_dense, decode_gp_sparse
from fastie_ray.kernels.gplinker_re import decode_gplinker_dense, decode_gplinker_sparse
from fastie_ray.stages.scorers import CharOffsetMapping
from fastie_ray.synth import build_world
from fastie_ray.tokenizer import CharTokenizer

ID2LABEL = {0: "A", 1: "B"}


def _mapping(n):
    return [(0, 0)] + [(i, i + 1) for i in range(n)] + [(0, 0)]


def test_gp_dense_basic_and_exclusions():
    text = "abcdef"
    L = len(text) + 2
    logits = np.full((2, L, L), -1.0, dtype=np.float32)
    logits[0, 1, 3] = 1.0  # chars [0,3) = "abc"
    logits[1, 4, 6] = 1.0  # chars [3,6) = "def"
    logits[0, 0, 2] = 1.0  # CLS start → excluded
    logits[0, 2, 7] = 1.0  # end == L-1 (SEP) → excluded
    logits[1, 3, 2] = 0.5  # reversed span (t<s) IS emitted by reference decode
    out = decode_gp_dense(logits, L, text, _mapping(len(text)), ID2LABEL)
    assert ("A", 0, 3, "abc") in out
    assert ("B", 3, 6, "def") in out
    # reversed span slices to empty string but still appears (reference quirk)
    assert ("B", 2, 2, "") in out
    assert len(out) == 3


def test_gp_dense_threshold():
    text = "ab"
    L = 4
    logits = np.zeros((1, L, L), dtype=np.float32)
    logits[0, 1, 2] = 0.0  # exactly at threshold → NOT emitted (strict >)
    out = decode_gp_dense(logits, L, text, _mapping(2), {0: "A"})
    assert out == set()


def test_gp_sparse_equals_dense_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(1, 40))
        text = "".join(rng.choice(list("abc今天 好"), size=n))
        L = n + 2
        logits = np.full((3, L, L), -1.0, dtype=np.float32)
        hits = []
        for _ in range(int(rng.integers(0, 15))):
            lb = int(rng.integers(3))
            s = int(rng.integers(0, L))
            e = int(rng.integers(0, L))
            sc = float(rng.choice([-0.5, 0.5, 1.0]))
            logits[lb, s, e] = max(logits[lb, s, e], sc)
            hits.append((lb, s, e, sc))
        id2l = {0: "X", 1: "Y", 2: "Z"}
        m = _mapping(n)
        dense = decode_gp_dense(logits, L, text, m, id2l)
        sparse = decode_gp_sparse(hits, L, text, m, id2l)
        assert dense == sparse


def test_char_offset_mapping_matches_materialized():
    tok = CharTokenizer(512)
    for n in (0, 1, 5, 510):
        text = "x" * n
        mat = tok.offset_mapping(text)
        virt = CharOffsetMapping(tok.seq_len(text))
        for i in range(len(mat)):
            assert virt[i] == mat[i], (n, i)


def test_gplinker_dense_basic():
    # "A works for B" style on a toy scale: text "srxob", subject "sr" tokens
    # (1,2), object "ob" tokens (4,5)
    text = "srxob"
    L = len(text) + 2
    entity = np.full((2, L, L), -1.0, dtype=np.float32)
    head = np.full((1, L, L), -1.0, dtype=np.float32)
    tail = np.full((1, L, L), -1.0, dtype=np.float32)
    entity[0, 1, 2] = 1.0  # subject span
    entity[1, 4, 5] = 1.0  # object span
    head[0, 1, 4] = 1.0
    tail[0, 2, 5] = 1.0
    out = decode_gplinker_dense(entity, head, tail, L, text, _mapping(5), {0: "rel"})
    assert out == {("rel", "sr", "ob")}
    # missing tail link → no triple
    tail[0, 2, 5] = -1.0
    out = decode_gplinker_dense(entity, head, tail, L, text, _mapping(5), {0: "rel"})
    assert out == set()


def test_gplinker_cross_product_no_spurious():
    # two facts share no head/tail links → no cross-pair triples
    text = "abcdefgh"
    L = len(text) + 2
    entity = np.full((2, L, L), -1.0, dtype=np.float32)
    head = np.full((2, L, L), -1.0, dtype=np.float32)
    tail = np.full((2, L, L), -1.0, dtype=np.float32)
    # fact1: subj (1,2) obj (3,4) pred 0; fact2: subj (5,6) obj (7,8) pred 1
    for s, o, p in (((1, 2), (3, 4), 0), ((5, 6), (7, 8), 1)):
        entity[0, s[0], s[1]] = 1.0
        entity[1, o[0], o[1]] = 1.0
        head[p, s[0], o[0]] = 1.0
        tail[p, s[1], o[1]] = 1.0
    out = decode_gplinker_dense(
        entity, head, tail, L, text, _mapping(8), {0: "p0", 1: "p1"}
    )
    assert out == {("p0", "ab", "cd"), ("p1", "ef", "gh")}


def test_featurizer_sparse_equals_dense_on_synth_chunks():
    world = build_world()
    feat = GazetteerFeaturizer(world)
    tok = CharTokenizer(512)
    from fastie_ray.synth import gen_doc
    from fastie_ray.stages.chunk import split_text

    for doc_id in range(25):
        d = gen_doc(doc_id, world)
        for chunk in split_text(d["_gold_text"], 510):
            dashed = space_to_dash(chunk)
            seq_len = tok.seq_len(chunk)
            mapping = tok.offset_mapping(chunk)
            # NER
            dense = decode_gp_dense(
                feat.ner_logits_dense(dashed), seq_len, chunk, mapping, feat.id2label
            )
            sparse = decode_gp_sparse(
                ((h.label_id, h.cs + 1, h.ce, 1.0) for h in feat.mention_hits(dashed)),
                seq_len, chunk, mapping, feat.id2label,
            )
            assert dense == sparse
            # RE
            e, hd, tl = feat.rel_logits_dense(dashed)
            rd = decode_gplinker_dense(
                e, hd, tl, seq_len, chunk, mapping, feat.id2predicate
            )
            mhits = feat.mention_hits(dashed)
            spans = [(h.cs + 1, h.ce) for h in mhits]
            rhits = feat.relation_hits(dashed)
            rs = decode_gplinker_sparse(
                spans, spans,
                [(r.pred_id, r.s_cs + 1, r.o_cs + 1) for r in rhits],
                [(r.pred_id, r.s_ce, r.o_ce) for r in rhits],
                seq_len, chunk, mapping, feat.id2predicate,
            )
            assert rd == rs
