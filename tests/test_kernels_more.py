"""Unit tests for the wider decode-kernel family (SURVEY §7.2 item 1):
BIO/CRF chunking, span-pointer NER, W2NER grid decode, CasRel, OneRel,
GPLinker-EE clique search, UIE span pairing, sequence_padding — plus
cross-decoder parity: every RE backend must emit the identical triple
set and every NER backend the identical mention set on the synthetic
corpus (flat, non-nested spans)."""

import numpy as np
import pyarrow as pa

from fastie_ray.featurizer import GazetteerFeaturizer
from fastie_ray.functions.padding import sequence_padding
from fastie_ray.functions.textnorm import space_to_dash
from fastie_ray.kernels.bio_ner import decode_bio, get_entities
from fastie_ray.kernels.casrel_re import decode_casrel_dense, decode_casrel_sparse
from fastie_ray.kernels.event_ee import (
    clique_search,
    decode_event_dense,
    decode_event_sparse,
    events_to_json,
)
from fastie_ray.kernels.onerel_re import decode_onerel_dense, decode_onerel_sparse
from fastie_ray.kernels.span_ner import decode_span
from fastie_ray.kernels.uie_span import get_bool_ids_greater_than, get_span
from fastie_ray.kernels.w2ner import decode_w2ner
from fastie_ray.stages.chunk import auto_splitter
from fastie_ray.stages.scorers import NerScorer, RelScorer
from fastie_ray.synth import build_world, gen_doc


def _mapping(n):
    return [(0, 0)] + [(i, i + 1) for i in range(n)] + [(0, 0)]


# ------------------------------------------------------------------ BIO


def test_get_entities_reference_example():
    assert get_entities(["B-PER", "I-PER", "O", "B-LOC"]) == [
        ("PER", 0, 1),
        ("LOC", 3, 3),
    ]


def test_get_entities_bioes_and_type_change():
    # S- single, E- end, type change mid-entity starts a new chunk
    assert get_entities(["S-A", "B-B", "I-B", "E-B", "O"]) == [
        ("A", 0, 0),
        ("B", 1, 3),
    ]
    assert get_entities(["B-A", "I-B"]) == [("A", 0, 0), ("B", 1, 1)]


def test_decode_bio_char_spans():
    text = "abcdef"
    tags = ["O", "B-X", "I-X", "O", "B-Y", "O", "O", "O"]  # CLS + 6 chars + SEP
    out = decode_bio(tags, text, _mapping(len(text)))
    assert out == {("X", 0, 2, "ab"), ("Y", 3, 4, "d")}


# ------------------------------------------------------------------ span


def test_decode_span_nearest_end_and_exclusions():
    # tokens: CLS a b c d SEP ; starts at tok1 lab 2, ends at tok2 lab 2
    starts = [0, 2, 0, 1, 0, 0]
    ends = [0, 0, 2, 0, 1, 0]
    out = decode_span(starts, ends, 6, "abcd", _mapping(4), {1: "A", 2: "B"})
    assert out == {("B", 0, 2, "ab"), ("A", 2, 4, "cd")}
    # start with no matching end of the same label emits nothing
    out2 = decode_span([0, 1, 0], [0, 0, 0], 3, "a", _mapping(1), {1: "A"})
    assert out2 == set()


# ------------------------------------------------------------------ w2ner


def test_w2ner_contiguous_and_discontinuous():
    text = "abcde"
    L = len(text)
    grid = np.zeros((L, L), dtype=np.int64)
    # contiguous entity "ab": NNW 0→1, THW (head=0, tail=1) label 2
    grid[0, 1] = 1
    grid[1, 0] = 2
    # discontinuous entity "ce": NNW 2→4, THW (head=2, tail=4) label 3
    grid[2, 4] = 1
    grid[4, 2] = 3
    out = decode_w2ner(grid, L, text, {2: "X", 3: "Y"})
    assert out == {("X", 0, 2, "ab"), ("Y", 2, 5, "ce")}


# ------------------------------------------------------------------ casrel


def test_casrel_dense_nearest_end_break():
    text = "abcdef"
    L = len(text) + 2
    P = 2
    subj = np.zeros((L, 2), dtype=np.float32)
    subj[1, 0] = 0.9  # subject start tok1 (char 0)
    subj[2, 1] = 0.9  # subject end tok2 (chars 0..2 = "ab")

    def obj_fn(subjects):
        assert subjects == [(1, 2)]
        obj = np.zeros((1, L, P, 2), dtype=np.float32)
        obj[0, 4, 1, 0] = 0.9  # object start tok4, predicate 1
        obj[0, 5, 1, 1] = 0.9  # object end tok5 → chars 3..5 = "de"
        obj[0, 6, 1, 1] = 0.9  # farther end — must be skipped (nearest)
        return obj

    out = decode_casrel_dense(
        subj, obj_fn, L, text, _mapping(len(text)), {0: "p0", 1: "p1"}
    )
    assert out == {("p1", "ab", "de")}


def test_casrel_dense_excludes_cls_pad():
    text = "ab"
    L = 4
    subj = np.zeros((L, 2), dtype=np.float32)
    subj[0, 0] = 0.9  # CLS start → excluded
    subj[3, 0] = 0.9  # > l-2 → excluded
    out = decode_casrel_dense(
        subj, lambda s: np.zeros((len(s), L, 1, 2)), L, text, _mapping(2), {0: "p"}
    )
    assert out == set()


# ------------------------------------------------------------------ onerel


def test_onerel_dense_basic():
    text = "abcdef"
    L = len(text) + 2
    tags = np.zeros((1, L, L), dtype=np.int64)
    # subject "ab" toks (1,2), object "de" toks (4,5)
    tags[0, 1, 4] = 1  # HB-TB
    tags[0, 1, 5] = 2  # HB-TE
    tags[0, 2, 5] = 3  # HE-TE
    out = decode_onerel_dense(tags, L, text, _mapping(len(text)), {0: "p"})
    assert out == {("p", "ab", "de")}


def test_onerel_dense_requires_all_three_tags():
    text = "abcdef"
    L = len(text) + 2
    tags = np.zeros((1, L, L), dtype=np.int64)
    tags[0, 1, 4] = 1
    tags[0, 2, 5] = 3  # missing HB-TE → no emit
    out = decode_onerel_dense(tags, L, text, _mapping(len(text)), {0: "p"})
    assert out == set()


def test_onerel_sparse_equals_dense_random():
    rng = np.random.default_rng(1)
    for _ in range(20):
        n = int(rng.integers(2, 30))
        text = "".join(rng.choice(list("abcdefg"), size=n))
        L = n + 2
        P = 2
        tags = rng.choice([0, 0, 0, 1, 2, 3], size=(P, L, L))
        id2p = {0: "p0", 1: "p1"}
        m = _mapping(n)
        dense = decode_onerel_dense(tags, L, text, m, id2p)
        sparse = decode_onerel_sparse(
            [(int(p), int(h), int(t)) for p, h, t in zip(*np.where(tags == 1))],
            [(int(p), int(h), int(t)) for p, h, t in zip(*np.where(tags == 2))],
            [(int(p), int(h), int(t)) for p, h, t in zip(*np.where(tags == 3))],
            L, text, m, id2p,
        )
        assert dense == sparse


# ------------------------------------------------------------------ events


def test_clique_search_splits_non_adjacent():
    # arguments A,B,C of one event type; A-B and A-C linked, B-C not →
    # two events {A,B} and {A,C}
    A = ("T", "r1", 1, 2)
    B = ("T", "r2", 4, 5)
    C = ("T", "r3", 7, 8)
    links = {
        (1, 2, 4, 5), (4, 5, 1, 2),
        (1, 2, 7, 8), (7, 8, 1, 2),
    }
    events = clique_search([A, B, C], links)
    assert sorted(map(tuple, events)) == [tuple(sorted([A, B])), tuple(sorted([A, C]))]


def test_decode_event_dense_and_sparse():
    text = "xy startup round"
    n = len(text)
    L = n + 2
    labels = {0: "fund@触发词", 1: "fund@org"}
    argu = np.full((2, L, L), -1.0, dtype=np.float32)
    head = np.full((1, L, L), -1.0, dtype=np.float32)
    tail = np.full((1, L, L), -1.0, dtype=np.float32)
    # trigger "startup" chars 3..10 → toks 4..10; org "xy" chars 0..2 → toks 1..2
    argu[0, 4, 10] = 1.0
    argu[1, 1, 2] = 1.0
    head[0, 1, 4] = 1.0  # min/max ordering of heads
    tail[0, 2, 10] = 1.0
    m = _mapping(n)
    events = decode_event_dense(argu, head, tail, L, text, m, labels)
    assert len(events) == 1
    ev = sorted(events[0])
    assert ("fund", "org", "xy", 0, 2) in ev
    assert ("fund", "触发词", "startup", 3, 10) in ev

    sparse = decode_event_sparse(
        [("fund", "触发词", 4, 10), ("fund", "org", 1, 2)],
        [(4, 10, 1, 2), (1, 2, 4, 10)],
        L, text, m,
    )
    assert sparse == events

    # trigger-less clique is dropped when has_trigger
    no_trig = decode_event_sparse(
        [("fund", "org", 1, 2)], [], L, text, m, has_trigger=True
    )
    assert no_trig == []


def test_events_to_json_subset_dedup():
    e_small = [("fund", "org", "xy", 0, 2), ("fund", "触发词", "startup", 3, 10)]
    e_big = e_small + [("fund", "amt", "round", 11, 16)]
    out = events_to_json([e_small, e_big])
    assert len(out) == 1
    assert out[0]["trigger"] == "startup"
    assert {a["role"] for a in out[0]["arguments"]} == {"org", "amt"}


# ------------------------------------------------------------------ UIE


def test_get_span_pairing():
    # reference behavior: nearest pairing, each id used once
    assert get_span([1, 5], [3, 7]) == {(1, 3), (5, 7)}
    # end before any start is skipped
    assert get_span([4], [2, 6]) == {(4, 6)}
    # equal start/end pairs directly
    assert get_span([2], [2]) == {(2, 2)}


def test_get_bool_ids_greater_than():
    assert get_bool_ids_greater_than([0.1, 0.9, 0.6], 0.5) == [1, 2]
    nested = get_bool_ids_greater_than([[0.1, 0.9], [0.7, 0.2]], 0.5)
    assert nested == [[1], [0]]
    with_p = get_bool_ids_greater_than([0.1, 0.9], 0.5, return_prob=True)
    assert with_p == [(1, 0.9)]


# ------------------------------------------------------------------ padding


def test_sequence_padding_post_and_pre():
    a = np.array([1, 2, 3])
    b = np.array([4])
    out = sequence_padding([a, b])
    assert out.shape == (2, 3)
    assert out[1].tolist() == [4, 0, 0]
    pre = sequence_padding([a, b], mode="pre", value=9)
    assert pre[1].tolist() == [9, 9, 4]
    fixed = sequence_padding([a, b], length=2)
    assert fixed.tolist() == [[1, 2], [4, 0]]


# ------------------------------------------------ cross-backend parity


def _synth_chunk_batch(n_docs: int = 40):
    w = build_world()
    urls, cids, coffs, ctexts = [], [], [], []
    for i in range(n_docs):
        d = gen_doc(i, w)
        chunks, _ = auto_splitter([d["_gold_text"]], max_text_len=510)
        for j, c in enumerate(chunks):
            urls.append(d["url"])
            cids.append(j)
            coffs.append(sum(len(x) for x in chunks[:j]))
            ctexts.append(c)
    return w, pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "chunk_id": pa.array(np.asarray(cids, dtype=np.int32)),
            "chunk_offset": pa.array(np.asarray(coffs, dtype=np.int32)),
            "chunk_text": pa.array(ctexts, pa.string()),
        }
    )


def test_rel_backends_identical_triples():
    w, batch = _synth_chunk_batch()
    outs = {}
    for be in ("gplinker", "casrel", "onerel", "tplinker", "pfn", "grte", "hf"):
        t = RelScorer(world_ref=w, rel_backend=be)(batch)
        outs[be] = set(
            zip(
                t["url"].to_pylist(), t["chunk_id"].to_pylist(),
                t["predicate"].to_pylist(), t["subject"].to_pylist(),
                t["object"].to_pylist(),
            )
        )
    assert (
        outs["gplinker"] == outs["casrel"] == outs["onerel"]
        == outs["tplinker"] == outs["pfn"] == outs["grte"] == outs["hf"]
    )
    assert len(outs["gplinker"]) > 0


def test_ner_backends_identical_mentions():
    w, batch = _synth_chunk_batch()
    outs = {}
    for be in ("gp", "bio", "span", "tplinker", "w2ner", "cnn", "hf"):
        t = NerScorer(world_ref=w, ner_backend=be)(batch)
        outs[be] = set(
            zip(
                t["url"].to_pylist(), t["chunk_id"].to_pylist(),
                t["label"].to_pylist(), t["start"].to_pylist(),
                t["end"].to_pylist(), t["mention"].to_pylist(),
            )
        )
    assert (
        outs["gp"] == outs["bio"] == outs["span"]
        == outs["tplinker"] == outs["w2ner"] == outs["cnn"] == outs["hf"]
    )
    assert len(outs["gp"]) > 0


def test_casrel_sparse_matches_gplinker_on_featurizer():
    w, batch = _synth_chunk_batch(20)
    feat = GazetteerFeaturizer(w)
    for text in batch["chunk_text"].to_pylist():
        dashed = space_to_dash(text)
        seq_len = min(len(text), 510) + 2
        m = _mapping(len(text))[: seq_len]  # truncated mapping like tokenizer
        s_starts, s_ends, obj_hits = feat.casrel_inputs(dashed)
        got = decode_casrel_sparse(
            s_starts, s_ends, obj_hits, seq_len, text, m + [(0, 0)], feat.id2predicate
        )
        assert all(isinstance(t, tuple) and len(t) == 3 for t in got)


# --------------------------------------------- tplinker / cnn / grte / pfn


def test_tplinker_ner_spots_and_decode():
    from fastie_ray.kernels.tplinker import decode_tplinker_ner, spots_from_shaking

    text = "abcdef"
    L = len(text) + 2
    S = L * (L + 1) // 2
    scores = np.full((S, 2), -1.0, dtype=np.float32)
    # span toks (1,3) = chars 0..3, tag 0; flatten idx for (1,3):
    # rows: s=0 has L cells, s=1 has L-1 ... idx(s,e) = sum_{k<s}(L-k) + (e-s)
    idx = L + (3 - 1)  # s=1 block starts at L
    scores[idx, 0] = 1.0
    spots = spots_from_shaking(scores, L)
    assert spots == [(1, 3, 0)]
    out = decode_tplinker_ner(spots, L, text, _mapping(len(text)), {0: "X", 1: "Y"})
    assert out == {("X", 0, 3, "abc")}
    # CLS / reversed excluded
    assert decode_tplinker_ner([(0, 2, 0)], L, text, _mapping(len(text)), {0: "X"}) == set()


def test_tplinker_re_link_decode():
    from fastie_ray.kernels.tplinker import decode_tplinker_re

    text = "abcdef"
    L = len(text) + 2
    tags = {0: "T=EH2ET", 1: "r=SH2OH", 2: "r=OH2SH", 3: "r=ST2OT", 4: "r=OT2ST"}
    # subject "ab" toks (1,2); object "de" toks (4,5)
    spots = [(1, 2, 0), (4, 5, 0), (1, 4, 1), (2, 5, 3)]
    out = decode_tplinker_re(spots, L, text, _mapping(len(text)), tags)
    assert out == {("r", "ab", "de")}
    # reversed orientation via OH2SH/OT2ST: object head before subject head
    spots_rev = [(1, 2, 0), (4, 5, 0), (1, 4, 2), (2, 5, 4)]
    out_rev = decode_tplinker_re(spots_rev, L, text, _mapping(len(text)), tags)
    assert out_rev == {("r", "de", "ab")}
    # missing tail link → nothing
    assert decode_tplinker_re([(1, 2, 0), (4, 5, 0), (1, 4, 1)], L, text,
                              _mapping(len(text)), tags) == set()


def test_cnn_decode_nested_and_clash():
    from fastie_ray.kernels.cnn_ner import decode_cnn, filter_clashed_by_priority

    text = "abcde"
    L = len(text)
    C = 2
    scores = np.zeros((L, L, C), dtype=np.float32)
    # scores are symmetrized (sym = (S + S.T)/2) — set both triangles
    scores[0, 2, 0] = scores[2, 0, 0] = 0.9  # "abc" label 0
    scores[1, 1, 1] = 0.8  # nested "b" label 1 (diagonal)
    scores[1, 3, 0] = scores[3, 1, 0] = 0.7  # partial overlap with "abc" → clash
    out = decode_cnn(scores, L, text, {0: "A", 1: "B"}, allow_nested=True)
    assert out == {("A", 0, 3, "abc"), ("B", 1, 2, "b")}
    out2 = decode_cnn(scores, L, text, {0: "A", 1: "B"}, allow_nested=False)
    assert out2 == {("A", 0, 3, "abc")}
    assert filter_clashed_by_priority(
        [(True, 0, 2), (True, 1, 3)], allow_nested=True
    ) == [(True, 0, 2)]


def test_grte_decode_tags():
    from fastie_ray.kernels.grte_re import decode_grte

    text = "abcdef"
    L = len(text) + 2
    table = np.zeros((L, L, 1), dtype=np.int64)
    # SS: single-token subj tok1 ("a"), single-token obj tok4 ("d")
    table[1, 4, 0] = 1
    out = decode_grte(table, L, text, _mapping(len(text)), {0: "p"})
    assert out == {("p", "a", "d")}
    # MMH/MMT: multi-token subject toks 1..2 ("ab"), object toks 4..5 ("de")
    table2 = np.zeros((L, L, 1), dtype=np.int64)
    table2[1, 4, 0] = 6  # MMH (heads)
    table2[2, 5, 0] = 7  # MMT (tails)
    out2 = decode_grte(table2, L, text, _mapping(len(text)), {0: "p"})
    assert out2 == {("p", "ab", "de")}
    # SMH without SMT → nothing
    table3 = np.zeros((L, L, 1), dtype=np.int64)
    table3[1, 4, 0] = 4
    assert decode_grte(table3, L, text, _mapping(len(text)), {0: "p"}) == set()


def test_pfn_equals_gplinker_with_thresh():
    from fastie_ray.kernels.pfn_re import decode_pfn

    text = "abcdef"
    L = len(text) + 2
    ner = np.zeros((2, L, L), dtype=np.float32)
    head = np.zeros((1, L, L), dtype=np.float32)
    tail = np.zeros((1, L, L), dtype=np.float32)
    ner[0, 1, 2] = 0.9  # subject "ab"
    ner[1, 4, 5] = 0.9  # object "de"
    head[0, 1, 4] = 0.6
    tail[0, 2, 5] = 0.6
    out = decode_pfn(ner, head, tail, L, text, _mapping(len(text)), {0: "p"})
    assert out == {("p", "ab", "de")}
    # below the 0.5 sigmoid threshold → nothing (GPLinker at 0.0 would emit)
    head[0, 1, 4] = 0.4
    assert decode_pfn(ner, head, tail, L, text, _mapping(len(text)), {0: "p"}) == set()


def test_w2ner_sparse_equals_dense_random():
    from fastie_ray.kernels.w2ner import decode_w2ner, decode_w2ner_sparse

    rng = np.random.default_rng(5)
    for _ in range(20):
        n = int(rng.integers(2, 12))
        text = "".join(rng.choice(list("abcdef"), size=n))
        grid = rng.choice([0, 0, 0, 1, 2, 3], size=(n, n))
        id2l = {2: "X", 3: "Y"}
        dense = decode_w2ner(grid, n, text, id2l)
        nnw = [(int(i), int(j)) for i, j in zip(*np.where(grid == 1)) if i < j]
        # dense scans grid[j, i] > 1 for i <= j: head=i, tail=j
        thw = [
            (int(i), int(j), int(grid[j, i]))
            for j in range(n)
            for i in range(j + 1)
            if grid[j, i] > 1
        ]
        sparse = decode_w2ner_sparse(nnw, thw, n, text, id2l)
        assert dense == sparse, (dense, sparse)
