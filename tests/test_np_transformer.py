"""The compiled numpy-transformer dense backend (VERDICT r3 #1):
compile self-check, checkpoint roundtrip, the TorchDenseBackend tensor
contract, exact parity vs the featurizer on corpus-style chunks, and
the full kg pipeline end-to-end through the Ray actor pool with the
P/R ≥ 0.95 gate of BASELINE.json."""

import numpy as np
import pytest
import ray.data

from fastie_ray.featurizer import GazetteerFeaturizer
from fastie_ray.functions.textnorm import space_to_dash
from fastie_ray.hf_backend import resolve_dense_backend
from fastie_ray.kernels.gp_ner import decode_gp_dense, decode_gp_sparse
from fastie_ray.kernels.gplinker_re import (
    decode_gplinker_dense,
    decode_gplinker_sparse,
)
from fastie_ray.np_transformer import (
    MiniLMWeights,
    NumpyDenseBackend,
    compile_gazetteer_lm,
)
from fastie_ray.stages.scorers import CharOffsetMapping
from fastie_ray.synth import build_world

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def feat():
    return GazetteerFeaturizer(build_world(200, 400, 42))


@pytest.fixture(scope="module")
def weights(feat):
    # compile embeds a forward+decode self-check battery — reaching
    # here at all means every surface/phrase/assertion probe passed
    return compile_gazetteer_lm(feat, max_length=128)


def _featurizer_ner(feat, text):
    dashed = space_to_dash(text)
    seq_len = min(len(text), 510) + 2
    mapping = CharOffsetMapping(seq_len)
    hits = ((h.label_id, h.cs + 1, h.ce, 1.0) for h in feat.mention_hits(dashed))
    return decode_gp_sparse(hits, seq_len, text, mapping, feat.id2label)


def _featurizer_re(feat, text):
    dashed = space_to_dash(text)
    seq_len = min(len(text), 510) + 2
    mapping = CharOffsetMapping(seq_len)
    mh = feat.mention_hits(dashed)
    spans = [(h.cs + 1, h.ce) for h in mh]
    rh = feat.relation_hits(dashed)
    return decode_gplinker_sparse(
        spans, spans,
        [(r.pred_id, r.s_cs + 1, r.o_cs + 1) for r in rh],
        [(r.pred_id, r.s_ce, r.o_ce) for r in rh],
        seq_len, text, mapping, feat.id2predicate,
    )


def test_checkpoint_roundtrip_same_logits(tmp_path, feat, weights):
    path = str(tmp_path / "gaz.npz")
    weights.save(path)
    a = NumpyDenseBackend(weights)
    b = NumpyDenseBackend(path)
    subj = next(s for s in sorted(feat._surface_label))
    dashed = f"the-quick-{subj}-old-mill"
    ea, la = a.ner_forward(dashed)
    eb, lb = b.ner_forward(dashed)
    assert ea.offsets == eb.offsets
    np.testing.assert_array_equal(la, lb)


def test_resolve_dispatch(tmp_path, feat, weights):
    from fastie_ray.hf_backend import DeterministicDenseBackend

    path = str(tmp_path / "gaz.npz")
    weights.save(path)
    assert isinstance(resolve_dense_backend(feat, 128, path), NumpyDenseBackend)
    assert isinstance(
        resolve_dense_backend(feat, 128, "compile:gazetteer", 4),
        NumpyDenseBackend,
    )
    # a HF-style name without torch in the container → deterministic
    assert isinstance(
        resolve_dense_backend(feat, 128, "bert-base-chinese"),
        DeterministicDenseBackend,
    )
    assert isinstance(resolve_dense_backend(feat, 128), DeterministicDenseBackend)


def test_torch_tensor_contract(feat, weights):
    """The exact shapes/dtypes TorchDenseBackend must produce — the
    deployment seam: decode consumes (enc, [C, L, L] float arrays)."""
    be = NumpyDenseBackend(weights)
    det = resolve_dense_backend(feat, 128)
    subj = next(s for s in sorted(feat._surface_label))
    dashed = f"the-quick-{subj}-old-mill"
    for backend in (be, det):
        enc, logits = backend.ner_forward(dashed)
        L = enc.seq_len
        assert logits.shape == (len(feat.id2label), L, L)
        assert logits.dtype == np.float32
        enc, ent, hd, tl = backend.rel_forward(dashed)
        L = enc.seq_len
        assert ent.shape == (2, L, L)
        assert hd.shape == (len(feat.id2predicate), L, L)
        assert tl.shape == (len(feat.id2predicate), L, L)


def test_forward_is_a_real_transformer(feat, weights):
    """The logits flow through the encoder matmul graph, not a
    featurizer shortcut. Two probes: (a) uniformly scaling the value
    path is absorbed by LayerNorm (streams differ, decisions stable —
    transformer-like invariance); (b) severing the value path kills
    the gathered context and with it the detections."""
    import copy

    subj = next(s for s in sorted(feat._surface_label))
    dashed = f"the-quick-{subj}-old-mill"
    base = NumpyDenseBackend(weights)
    _, ref = base.ner_forward(dashed)
    assert (ref > 0).sum() == 1  # exactly the one planted mention

    w_scale = copy.deepcopy(weights)
    w_scale.layers[0]["Wv"] = w_scale.layers[0]["Wv"] * 0.5
    _, x_ref = base._stream(dashed)
    be_scale = NumpyDenseBackend(w_scale)
    _, x_scaled = be_scale._stream(dashed)
    assert not np.array_equal(x_ref, x_scaled)  # the stream moved …
    _, scaled = be_scale.ner_forward(dashed)
    assert np.array_equal(ref > 0, scaled > 0)  # … LN re-normalized it

    w_cut = copy.deepcopy(weights)
    w_cut.layers[0]["Wv"] = w_cut.layers[0]["Wv"] * 0.0
    _, cut = NumpyDenseBackend(w_cut).ner_forward(dashed)
    assert (cut > 0).sum() == 0  # no gathered context → no detection


def test_parity_on_corpus_chunks(feat, weights):
    """Exact NER + RE set equality vs the featurizer decode on
    page-style chunks (doc filler + fact sentences), incl. chunks that
    cut surfaces at the boundary."""
    import pyarrow.parquet as pq

    from fastie_ray.sources.pages import fact_sentence

    world = build_world(200, 400, 42)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))[:25]
    be = NumpyDenseBackend(weights)
    n_ner = n_re = 0
    for d, tx in rows:
        fact = world.facts[d % len(world.facts)]
        text = tx + " " + fact_sentence(fact)
        for i in range(0, len(text), 126):
            ch = text[i:i + 126]
            dashed = space_to_dash(ch)
            enc, logits = be.ner_forward(dashed)
            got = decode_gp_dense(
                logits, enc.seq_len, ch, enc.offsets, feat.id2label
            )
            want = _featurizer_ner(feat, ch)
            assert got == want, (ch, got, want)
            n_ner += len(want)
            enc, ent, hd, tl = be.rel_forward(dashed)
            got_t = decode_gplinker_dense(
                ent, hd, tl, enc.seq_len, ch, enc.offsets, feat.id2predicate
            )
            want_t = _featurizer_re(feat, ch)
            assert got_t == want_t, (ch, got_t, want_t)
            n_re += len(want_t)
    assert n_ner >= 30 and n_re >= 10  # the sample actually has signal


def test_np_dense_kg_pipeline_e2e(ray_session, tmp_path, feat):
    """The full kg doc_triples pipeline through the Ray actor pool with
    the numpy-transformer backend loaded from a CHECKPOINT FILE (the
    deployment path), vs the featurizer path: P/R ≥ 0.95 (BASELINE.json
    gate; measured equal on this corpus slice)."""
    from fastie_ray.pipelines.kg import doc_triples
    from fastie_ray.sources.pages import pages_from_documents

    world = build_world(200, 400, 42)
    w512 = compile_gazetteer_lm(feat, max_length=512)
    path = str(tmp_path / "gaz512.npz")
    w512.save(path)

    pages = pages_from_documents(SF, world).limit(60)
    ref = doc_triples(pages, concurrency=3).to_pandas()
    got = doc_triples(
        pages, concurrency=3, rel_backend="hf", hf_model=path
    ).to_pandas()
    key = ["url", "predicate", "subject", "object"]
    ref_set = set(map(tuple, ref[key].itertuples(index=False)))
    got_set = set(map(tuple, got[key].itertuples(index=False)))
    assert len(ref_set) >= 50
    tp = len(ref_set & got_set)
    precision = tp / max(len(got_set), 1)
    recall = tp / max(len(ref_set), 1)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)


def test_ee_heads_match_featurizer_on_corpus_chunks(feat):
    """GPLinker-EE heads from the 3-layer EE compile: event decode
    equals the featurizer path on page-style chunks, including
    truncated assertions (subject+phrase cut before the object) where
    the assertion-complete conditioning must emit NOTHING."""
    import pyarrow.parquet as pq

    from fastie_ray.kernels.event_ee import (
        decode_event_dense,
        decode_event_sparse,
    )
    from fastie_ray.sources.pages import fact_sentence
    from fastie_ray.stages.scorers import CharOffsetMapping

    world = build_world(200, 400, 42)
    w = compile_gazetteer_lm(feat, max_length=128, ee=True)
    be = NumpyDenseBackend(w)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = list(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))[:20]
    n_ev = 0
    canon = lambda evs: {frozenset(ev) for ev in evs}
    for d, tx in rows:
        fact = world.facts[d % len(world.facts)]
        text = tx + " " + fact_sentence(fact)
        for i in range(0, len(text), 126):
            ch = text[i:i + 126]
            dashed = space_to_dash(ch)
            enc, argu, hd, tl, id2l = be.ee_forward(dashed)
            got = decode_event_dense(
                argu, hd, tl, enc.seq_len, ch, enc.offsets, id2l
            )
            seq_len = min(len(ch), 510) + 2
            argus, links = feat.event_hits(dashed)
            want = decode_event_sparse(
                argus, links, seq_len, ch, CharOffsetMapping(seq_len)
            )
            assert canon(got) == canon(want), (ch, got, want)
            n_ev += len(want)
    assert n_ev >= 8


def test_ee_requires_ee_checkpoint(feat, weights):
    with pytest.raises(NotImplementedError, match="ee=True"):
        NumpyDenseBackend(weights).ee_forward("any-text")


def test_ee_event_scorer_through_ray(ray_session, feat):
    """EventScorer backend='hf' with the compile:gazetteer-ee sentinel
    vs the featurizer scorer — doc events equal on a corpus slice."""
    import ray as _ray

    from fastie_ray.sources.pages import pages_from_documents
    from fastie_ray.stages.chunk import chunk_pages
    from fastie_ray.stages.extract import extract_text
    from fastie_ray.stages.scorers import EventScorer

    world = build_world(200, 400, 42)
    chunks = chunk_pages(extract_text(
        pages_from_documents(SF, world).limit(30)
    )).materialize()

    def run(**kw):
        return (
            chunks.map_batches(
                EventScorer, fn_constructor_kwargs={"emit": "doc_events", **kw},
                batch_format="pyarrow", concurrency=2,
            )
            .to_pandas()
            .sort_values(["url", "event_type", "role", "start"])
            .reset_index(drop=True)
        )

    want = run()
    got = run(backend="hf", hf_model="compile:gazetteer-ee")
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)
    assert len(want) >= 30
