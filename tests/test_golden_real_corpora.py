"""Golden conformance on the reference's REAL dev corpora (VERDICT r4
next-round #1): cmeee / duie / duee dev.json are the first files an
actual FastIE user feeds this engine, and real CJK text (curly quotes,
ellipses, full-width forms, lstrip offsets, untraceable spo surfaces)
exercises edge cases synthetic fixtures cannot. Every assertion here is
full-file set/byte equality against the line-for-line reference ports
in ``tests/reference_port.py``."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

import ray
import ray.data

from tests.reference_port import (
    ref_auto_splitter,
    ref_duee_v1_process,
    ref_ee_schema_labels,
    ref_ner_label_vocab,
    ref_ner_process_dev,
    ref_process_rel_train,
)

REF = "/root/reference/examples"
CMEEE = f"{REF}/named_entity_recognition/datasets/cmeee/dev.json"
DUIE = f"{REF}/relation_extraction/datasets/duie/dev.json"
DUEE = f"{REF}/event_extraction/datasets/duee/dev.json"
DUEE_SCHEMA = f"{REF}/event_extraction/datasets/duee/schema.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CMEEE), reason="reference corpora not mounted"
)


def _raw(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


# --------------------------------------------------------------- readers


def test_reader_byte_parity_all_three(ray_session):
    """S1 read_jsonl reproduces every raw line of all three real files
    (text byte-identity + row counts + nested label payloads intact)."""
    from fastie_ray.sources.corpus import read_jsonl

    for path, label_col in [
        (CMEEE, "entities"), (DUIE, "spo_list"), (DUEE, "event_list"),
    ]:
        raw = _raw(path)
        got = read_jsonl(path).to_pandas()
        assert len(got) == len(raw)
        # text column byte-identical as a multiset (read order may differ)
        assert sorted(got["text"]) == sorted(r["text"] for r in raw)
        by_text = {r["text"]: r for r in raw}
        # nested payload sizes survive the Arrow round trip
        for text, payload in zip(got["text"], got[label_col]):
            assert len(payload) == len(by_text[text][label_col])


# --------------------------------------------- M8: NER dev projection


def test_cmeee_ner_dev_targets_full_file(ray_session):
    """ner_dev_targets over the full 5000-line CMeEE dev set equals the
    reference process_dev target sets, document by document."""
    from fastie_ray.sources.corpus import ner_dev_targets, read_jsonl

    raw = _raw(CMEEE)
    got = ner_dev_targets(read_jsonl(CMEEE)).to_pandas()
    got_by_text: dict[str, set] = {}
    for r in got.itertuples(index=False):
        got_by_text.setdefault(r.text, set()).add(
            (r.label, str(r.start), str(r.end), r.entity)
        )
    n_docs_with_ents = 0
    for ex in raw:
        want = ref_ner_process_dev(ex)
        if not want:
            assert ex["text"] not in got_by_text or not got_by_text[ex["text"]]
            continue
        n_docs_with_ents += 1
        assert got_by_text.get(ex["text"], set()) == want, ex["text"][:50]
    assert n_docs_with_ents > 4500  # the file is densely annotated


def test_cmeee_label_vocab(ray_session):
    """G1 over the real file == reference sorted distinct; also a
    superset check against the checked-in label.txt."""
    from fastie_ray.sources.corpus import ner_label_vocab, read_jsonl

    raw = _raw(CMEEE)
    want = ref_ner_label_vocab(raw)
    got = ner_label_vocab(read_jsonl(CMEEE))
    assert got == want
    with open(f"{os.path.dirname(CMEEE)}/label.txt") as f:
        file_labels = sorted(x.strip() for x in f if x.strip())
    assert got == file_labels


# ------------------------------------------- M6: RE judge + convert


def test_duie_process_rel_train_full_file(ray_session):
    """M6 judge+convert over the full 5000-line DuIE dev set: same kept
    documents (the judge drops docs whose spo surfaces are not findable
    — real DuIE has such rows) and identical END-INCLUSIVE span arrays."""
    from fastie_ray.sources.corpus import (
        process_rel_train, read_jsonl, rel_predicate_vocab,
    )

    raw = _raw(DUIE)
    preds = sorted({s["predicate"] for r in raw for s in r["spo_list"]})
    got_vocab = rel_predicate_vocab(read_jsonl(DUIE))
    assert got_vocab == preds
    p2id = {p: i for i, p in enumerate(preds)}

    want = ref_process_rel_train(raw, p2id)
    assert len(want) < len(raw)  # the judge really drops rows here
    got = process_rel_train(read_jsonl(DUIE), p2id).to_pandas()
    assert len(got) == len(want)
    want_by_text = {w["text"]: w["spo_list"] for w in want}
    for text, spos in zip(got["text"], got["spo_list"]):
        w = want_by_text[text]
        assert sorted(map(list, spos)) == sorted(w), text[:50]


# ------------------------------------------- M7: DuEE targets + schema


def test_duee_schema_and_targets_full_file(ray_session):
    """S4 schema labels byte-equal the reference loader's; M7
    duee_v1_targets over the full 1492-line dev set reproduces every
    reference target tuple (lstrip-corrected offsets, stripped
    surfaces) keyed by (doc, event index)."""
    from fastie_ray.sources.corpus import (
        duee_v1_targets, read_event_schema, read_jsonl,
    )

    assert read_event_schema(DUEE_SCHEMA) == ref_ee_schema_labels(DUEE_SCHEMA)

    raw = _raw(DUEE)
    got = duee_v1_targets(read_jsonl(DUEE)).to_pandas()
    got_by_key: dict[tuple, set] = {}
    for r in got.itertuples(index=False):
        got_by_key.setdefault((r.doc_id, r.event_idx), set()).add(
            (r.event_type, r.role, r.argument, str(r.start), str(r.end))
        )
    n_events = 0
    for ex in raw:
        for k, ev in enumerate(ref_duee_v1_process(ex)):
            n_events += 1
            want = {
                (t, role, surface.strip(), s, e)
                for t, role, surface, s, e in ev
            }
            assert got_by_key[(ex["id"], k)] == want, (ex["id"], k)
    assert n_events >= len(raw)  # multi-event docs exist


# ------------------------------------------------- chunker + tokenizer


def test_chunker_parity_on_real_cjk(ray_session):
    """auto_splitter over every real text from all three corpora ==
    the reference port, both split modes, a short and the production
    max_text_len — real curly quotes / ellipses / full-width marks
    drive cut_chinese_sent branches synthetic text never hits."""
    from fastie_ray.stages.chunk import auto_splitter

    texts = [r["text"] for p in (CMEEE, DUIE, DUEE) for r in _raw(p)]
    assert len(texts) > 11_000
    for max_len in (48, 510):
        for split in (False, True):
            got_short, got_map = auto_splitter(texts, max_len, split)
            want_short, want_map = ref_auto_splitter(texts, max_len, split)
            assert got_short == want_short
            assert got_map == want_map


def test_chunk_stage_rebase_covers_real_text(ray_session):
    """ChunkPages over the real corpora: chunk_offset rebase
    reconstitutes each document as the concatenation of its chunks —
    the exact contract the rejoin stages rely on."""
    import pyarrow as pa

    from fastie_ray.stages.chunk import ChunkPages, split_text

    texts = [r["text"] for r in _raw(CMEEE)]
    batch = pa.table({
        "url": [f"d{i}" for i in range(len(texts))],
        "text": texts,
    })
    out = ChunkPages(max_length=50, split_sentence=True)(batch).to_pandas()
    rejoined = (
        out.sort_values(["url", "chunk_id"])
        .groupby("url")["chunk_text"].apply("".join)
    )
    for i, text in enumerate(texts):
        want = "".join(split_text(text, 48, True))
        assert rejoined[f"d{i}"] == want
        # offsets are the cumulative prior-chunk lengths
        doc = out[out["url"] == f"d{i}"].sort_values("chunk_id")
        off = 0
        for r in doc.itertuples(index=False):
            assert r.chunk_offset == off
            off += len(r.chunk_text)


def test_tokenizers_on_real_cjk(ray_session):
    """CharTokenizer offset identity + WordPieceTokenizer coverage
    invariants over real CJK text (full-width forms, emoji-free but
    mixed-script lines): every char maps into a token whose offsets
    contain it; offsets are monotone and non-overlapping."""
    from fastie_ray.functions.textnorm import space_to_dash
    from fastie_ray.hf_backend import WordPieceTokenizer
    from fastie_ray.tokenizer import CharTokenizer

    texts = [r["text"] for r in _raw(DUIE)[:800]]
    ct = CharTokenizer(512)
    wp = WordPieceTokenizer(max_length=512)
    for t in texts:
        dashed = space_to_dash(t)
        sl = ct.seq_len(t)
        assert sl == min(len(t), 510) + 2
        m = ct.offset_mapping(t)
        for i in range(1, sl - 1):
            assert m[i] == (i - 1, i)
        enc = wp.encode(dashed)
        prev_end = 0
        for (s, e) in enc.offsets:
            if (s, e) == (0, 0):
                continue
            assert s >= prev_end and e > s
            prev_end = e
        covered = enc.char2tok[: min(len(dashed), prev_end)]
        assert (covered >= 0).all()
        for ci, ti in enumerate(covered):
            s, e = enc.offsets[ti]
            assert s <= ci < e


def test_committed_parquet_matches_fresh_conversion(ray_session):
    """The committed data/golden/*.parquet equal a fresh deterministic
    conversion of the reference files — no silent drift between the
    checked-in bytes and the converter."""
    import tempfile

    import pyarrow.parquet as pq

    from scripts.convert_real_corpora import (
        DST, DUEE_DST, convert, convert_duee,
    )

    with tempfile.TemporaryDirectory() as d:
        fresh = os.path.join(d, "cmeee.parquet")
        convert(dst=fresh)
        assert pq.read_table(fresh).equals(pq.read_table(DST))
        fresh2 = os.path.join(d, "duee.parquet")
        convert_duee(dst=fresh2)
        assert pq.read_table(fresh2).equals(pq.read_table(DUEE_DST))
