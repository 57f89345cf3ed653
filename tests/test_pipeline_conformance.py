"""End-to-end conformance: the Ray pipeline's mentions/triples equal the
reference-style single-process predict loop, and P/R vs planted gold
meets the ≥0.95 gate (metric of examples/relation_extraction/
evaluate.py:27-33)."""

import pyarrow as pa
import ray
import ray.data

from fastie_ray.stages.chunk import chunk_pages
from fastie_ray.stages.extract import extract_text
from fastie_ray.stages.rejoin import rejoin_mentions, rejoin_triples
from fastie_ray.stages.scorers import score_mentions, score_relations
from fastie_ray.synth import build_world, synth_pages_table
from tests.reference_port import ref_predict_ner, ref_predict_rel

N_DOCS = 120


def _run_pipeline(pages):
    world = build_world()
    world_ref = ray.put(world)
    chunks = chunk_pages(extract_text(ray.data.from_arrow(pages)))
    mentions = rejoin_mentions(
        score_mentions(chunks, world_ref=world_ref, concurrency=2)
    ).to_pandas()
    triples = rejoin_triples(
        score_relations(chunks, world_ref=world_ref, concurrency=2)
    ).to_pandas()
    return mentions, triples


def test_pipeline_matches_reference_loop_and_gold():
    pages, gold_text, gold_entities, gold_triples = synth_pages_table(N_DOCS)
    world = build_world()
    urls = gold_text["url"].to_pylist()
    texts = gold_text["text"].to_pylist()

    mentions, triples = _run_pipeline(pages)

    # --- reference oracle (single-process loop over the same texts)
    ref_ner = ref_predict_ner(texts, world)
    ref_ner_set = {
        (u, lb, s, e, m)
        for u, ents in zip(urls, ref_ner)
        for (lb, s, e, m) in ents
    }
    ref_rel = ref_predict_rel(texts, world)
    ref_rel_set = {
        (u, p, s, o) for u, spo in zip(urls, ref_rel) for (p, s, o) in spo
    }

    got_ner = set(
        zip(mentions.url, mentions.label, mentions.start, mentions.end, mentions.mention)
    )
    got_rel = set(zip(triples.url, triples.predicate, triples.subject, triples.object))

    assert got_ner == ref_ner_set
    assert got_rel == ref_rel_set

    # --- P/R vs planted gold (accumulation of evaluate.py:27-33)
    gold_ner = set(
        zip(
            gold_entities["url"].to_pylist(),
            gold_entities["label"].to_pylist(),
            gold_entities["start_offset"].to_pylist(),
            gold_entities["end_offset"].to_pylist(),
            gold_entities["entity"].to_pylist(),
        )
    )
    # reorder to match mention tuple layout (url, label, start, end, mention)
    gold_rel = set(
        zip(
            gold_triples["url"].to_pylist(),
            gold_triples["predicate"].to_pylist(),
            gold_triples["subject"].to_pylist(),
            gold_triples["object"].to_pylist(),
        )
    )

    for got, gold in ((got_ner, gold_ner), (got_rel, gold_rel)):
        X = len(got & gold)
        Y = len(got)
        Z = len(gold)
        precision, recall = X / (Y + 1e-10), X / (Z + 1e-10)
        assert precision >= 0.95, f"precision {precision:.4f}"
        assert recall >= 0.95, f"recall {recall:.4f}"
