"""Synth corpus invariants + byte-identical text extraction."""

import pyarrow as pa
import ray.data

from fastie_ray.stages.extract import extract_text, extract_text_batch, html_to_text
from fastie_ray.synth import (
    LABELS,
    PREDICATES,
    build_world,
    gen_doc,
    synth_pages_dataset,
    synth_pages_table,
    wrap_html,
)


def test_world_deterministic():
    w1, w2 = build_world(seed=42), build_world(seed=42)
    assert [e.name for e in w1.entities] == [e.name for e in w2.entities]
    assert [(f.predicate, f.subj.entity_id, f.obj.entity_id) for f in w1.facts] == [
        (f.predicate, f.subj.entity_id, f.obj.entity_id) for f in w2.facts
    ]


def test_entity_surfaces_non_substring():
    w = build_world()
    names = [e.name for e in w.entities]
    assert len(set(names)) == len(names)
    joined = "\x00".join(names)
    for n in names:
        # each name occurs exactly once across all names (no substring traps)
        assert joined.count(n) == 1, n


def test_labels_sorted():
    assert LABELS == sorted(LABELS)
    assert sorted(PREDICATES) == list(PREDICATES)


def test_gen_doc_gold_offsets_exact():
    w = build_world()
    for doc_id in range(50):
        d = gen_doc(doc_id, w)
        text = d["_gold_text"]
        for g in d["_gold_entities"]:
            assert text[g["start_offset"] : g["end_offset"]] == g["entity"]


def test_gen_doc_order_independent():
    w = build_world()
    a = gen_doc(17, w)
    _ = [gen_doc(i, w) for i in range(5)]
    b = gen_doc(17, w)
    assert a["_gold_text"] == b["_gold_text"] and a["url"] == b["url"]


def test_html_roundtrip_byte_identical():
    w = build_world()
    for doc_id in (3, 10, 17, 24):  # includes html-only rows (id%7==3)
        d = gen_doc(doc_id, w)
        text = d["_gold_text"]
        assert html_to_text(wrap_html(text, d["url"])) == text


def test_extract_text_byte_identity_batch():
    pages, gold_text, _, _ = synth_pages_table(60)
    out = extract_text_batch(pages)
    got = dict(zip(out["url"].to_pylist(), out["text"].to_pylist()))
    want = dict(zip(gold_text["url"].to_pylist(), gold_text["text"].to_pylist()))
    assert got == want
    assert "html" not in out.column_names  # wide column projected away


def test_extract_text_dataset_matches_streamed_synth():
    pages, gold_text, _, _ = synth_pages_table(80)
    ds = ray.data.from_arrow(pages)
    out = extract_text(ds).to_pandas()
    want = dict(zip(gold_text["url"].to_pylist(), gold_text["text"].to_pylist()))
    assert len(out) == 80
    for url, text in zip(out.url, out.text):
        assert text == want[url]
    # streamed generator produces the same pages as driver-side table
    ds2 = synth_pages_dataset(80)
    out2 = extract_text(ds2).to_pandas()
    for url, text in zip(out2.url, out2.text):
        assert text == want[url]
