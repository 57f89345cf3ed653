"""HF-transformer backend conformance (SURVEY §2.2 M9 full semantics;
VERDICT r1 next-round #1 and #9).

The wordpiece-style tokenizer must honour the HF fast-tokenizer
contract the reference decode relies on
(``global_pointer/tokenization.py:89-131``, ``decode_utils.py:143-153``):
multi-char ``offset_mapping`` entries, ``(0, 0)`` specials,
``char_to_token`` projection (None past truncation), and the
dense-logit decode must reproduce the char-level path's spans whenever
span boundaries coincide with token boundaries.
"""

import numpy as np

from fastie_ray.featurizer import GazetteerFeaturizer
from fastie_ray.functions.textnorm import space_to_dash
from fastie_ray.hf_backend import (
    DeterministicDenseBackend,
    TorchDenseBackend,
    WordPieceTokenizer,
    resolve_dense_backend,
)
from fastie_ray.kernels.cnn_ner import decode_cnn, decode_cnn_sparse
from fastie_ray.kernels.gp_ner import decode_gp_dense
from fastie_ray.kernels.grte_re import decode_grte, decode_grte_sparse
from fastie_ray.synth import build_world


def test_wordpiece_offsets_multichar_and_specials():
    tok = WordPieceTokenizer(max_length=512, piece_len=4)
    enc = tok.encode("Avery-Quon0042位于X")
    # CLS and SEP are (0, 0) — HF's special-token convention
    assert enc.offsets[0] == (0, 0) and enc.offsets[-1] == (0, 0)
    # alnum runs split into 4-char pieces: Aver|y - Quon|0042
    assert (0, 4) in enc.offsets and (4, 5) in enc.offsets
    assert (6, 10) in enc.offsets and (10, 14) in enc.offsets
    # dash and each CJK char are single-char tokens
    assert (5, 6) in enc.offsets and (14, 15) in enc.offsets and (15, 16) in enc.offsets
    # every char maps to exactly the token whose span covers it
    for i in range(len("Avery-Quon0042位于X")):
        t = enc.char_to_token(i)
        s, e = enc.offsets[t]
        assert s <= i < e
    # offsets tile the text: sorted, contiguous, non-overlapping
    body = sorted(o for o in enc.offsets if o != (0, 0))
    assert body[0][0] == 0 and body[-1][1] == len("Avery-Quon0042位于X")
    for (s1, e1), (s2, e2) in zip(body, body[1:]):
        assert e1 == s2


def test_wordpiece_truncation_token_budget_not_chars():
    # 600 chars in 4-char runs → 300 tokens (150 runs + 150 dashes);
    # a char tokenizer would truncate at 510 chars, subword keeps all.
    text = "-".join(["abcd"] * 150)
    tok = WordPieceTokenizer(max_length=512, piece_len=4)
    enc = tok.encode(text)
    assert enc.seq_len == 299 * 1 + 2 + 0  # 150 runs + 149 dashes + CLS/SEP
    assert enc.char_to_token(len(text) - 1) is not None
    # hard truncation: budget of max_length-2 tokens, rest unmapped (None)
    tok8 = WordPieceTokenizer(max_length=8, piece_len=4)
    enc8 = tok8.encode(text)
    assert enc8.seq_len == 8
    assert enc8.char_to_token(0) == 1
    assert enc8.char_to_token(len(text) - 1) is None


def test_char_to_token_projection_matches_reference_arithmetic():
    # reference tokenization.py:118-121: start = char_to_token(cs),
    # end = char_to_token(ce - 1); decode then maps back via
    # offsets[start][0], offsets[end][1] — identity for aligned spans.
    tok = WordPieceTokenizer(max_length=512, piece_len=4)
    text = "Helix-Group0007-produces-Widget-X0012."
    enc = tok.encode(text)
    for cs, ce in [(0, 15), (25, 37), (0, 5), (6, 15)]:  # run-aligned spans
        h, t = enc.char_to_token(cs), enc.char_to_token(ce - 1)
        assert enc.offsets[h][0] == cs and enc.offsets[t][1] == ce


def test_dense_backend_gp_decode_roundtrips_featurizer_hits():
    w = build_world()
    feat = GazetteerFeaturizer(w)
    backend = DeterministicDenseBackend(feat, WordPieceTokenizer())
    text = f"{w.entities[0].name} and {w.entities[1].name}."
    dashed = space_to_dash(text)
    enc, logits = backend.ner_forward(dashed)
    got = decode_gp_dense(logits, enc.seq_len, text, enc.offsets, feat.id2label)
    want = {
        (feat.id2label[h.label_id], h.cs, h.ce, text[h.cs : h.ce])
        for h in feat.mention_hits(dashed)
    }
    assert got == want and len(got) == 2


def test_torch_backend_import_gate_and_fallback():
    import pytest

    with pytest.raises(ImportError):
        TorchDenseBackend("bert-base-chinese")
    # requesting a model without torch present falls back cleanly
    w = build_world()
    feat = GazetteerFeaturizer(w)
    backend = resolve_dense_backend(feat, model_name_or_path="bert-base-chinese")
    assert isinstance(backend, DeterministicDenseBackend)


# ---------------------------------------- sparse==dense for CNN / GRTE


def test_cnn_sparse_equals_dense_random():
    rng = np.random.default_rng(7)
    L, C = 14, 3
    text = "abcdefghijklmn"
    id2label = {i: f"L{i}" for i in range(C)}
    for trial in range(20):
        scores = rng.random((L, L, C)).astype(np.float32) * 0.6
        # plant some confident cells
        for _ in range(5):
            s, e = sorted(rng.integers(0, L, 2))
            scores[s, e, rng.integers(0, C)] = 0.95
        sym = (scores + scores.transpose(1, 0, 2)) / 2
        hits = []
        for s in range(L):
            for e in range(s, L):
                conf = float(sym[s, e].max())
                if conf >= 0.5:
                    hits.append((int(sym[s, e].argmax()), s, e, conf))
        for nested in (True, False):
            assert decode_cnn(scores, L, text, id2label, allow_nested=nested) == \
                decode_cnn_sparse(hits, L, text, id2label, allow_nested=nested)


def test_grte_sparse_equals_dense_random():
    rng = np.random.default_rng(11)
    L, R = 12, 3
    text = "abcdefghij"
    mapping = [(0, 0)] + [(i, i + 1) for i in range(L - 2)] + [(0, 0)]
    id2pred = {i: f"P{i}" for i in range(R)}
    for trial in range(30):
        table = np.zeros((L, L, R), dtype=np.int64)
        for _ in range(10):
            table[rng.integers(0, L), rng.integers(0, L), rng.integers(0, R)] = (
                rng.integers(0, 8)
            )
        cells = [
            (int(s), int(e), int(r), int(table[s, e, r]))
            for s, e, r in zip(*np.nonzero(table))
        ]
        assert decode_grte(table, L, text, mapping, id2pred) == \
            decode_grte_sparse(cells, L, text, mapping, id2pred)


def test_event_hf_dense_matches_sparse():
    import pyarrow as pa

    from fastie_ray.stages.scorers import EventScorer
    from fastie_ray.synth import gen_doc
    from fastie_ray.stages.chunk import auto_splitter

    w = build_world()
    urls, cids, coffs, ctexts = [], [], [], []
    for i in range(30):
        d = gen_doc(i, w)
        chunks, _ = auto_splitter([d["_gold_text"]], max_text_len=510)
        for j, c in enumerate(chunks):
            urls.append(d["url"]); cids.append(j)
            coffs.append(sum(len(x) for x in chunks[:j])); ctexts.append(c)
    batch = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "chunk_id": pa.array(np.asarray(cids, dtype=np.int32)),
            "chunk_offset": pa.array(np.asarray(coffs, dtype=np.int32)),
            "chunk_text": pa.array(ctexts, pa.string()),
        }
    )
    def rowset(t):
        return set(zip(t["url"].to_pylist(), t["chunk_id"].to_pylist(),
                       t["event_type"].to_pylist(), t["role"].to_pylist(),
                       t["argument"].to_pylist(), t["start"].to_pylist(),
                       t["end"].to_pylist()))
    a = rowset(EventScorer(world_ref=w)(batch))
    b = rowset(EventScorer(world_ref=w, backend="hf")(batch))
    assert a == b and len(a) > 0
