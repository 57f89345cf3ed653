"""Tests for the reference-format corpus readers and train-prep ops,
on synthesized fixtures in the reference's document shapes."""

import json
import os

import pytest

import ray

from fastie_ray.sources.corpus import (
    TRIGGER_ROLE,
    duee_v1_targets,
    ner_dev_targets,
    ner_label_vocab,
    process_rel_train,
    read_event_schema,
    read_jsonl,
    rel_predicate_vocab,
    seeded_shuffle,
    split_train_val,
    write_jsonl,
)


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    ner = [
        {"text": "Anna met Bob in Paris.",
         "entities": [
             {"id": 0, "entity": "Anna", "start_offset": 0, "end_offset": 4, "label": "PER"},
             {"id": 1, "entity": "Paris", "start_offset": 16, "end_offset": 21, "label": "LOC"},
         ]},
        {"text": "Acme hired Bob.",
         "entities": [
             {"id": 0, "entity": "Acme", "start_offset": 0, "end_offset": 4, "label": "ORG"},
         ]},
    ]
    rel = [
        {"text": "Anna works for Acme.",
         "spo_list": [{"predicate": "works_for", "subject": "Anna", "object": "Acme"}]},
        {"text": "nothing findable here.",
         "spo_list": [{"predicate": "works_for", "subject": "Zeta", "object": "Yon"}]},
        {"text": "Acme bought Umbrella.",
         "spo_list": [
             {"predicate": "acquired", "subject": "Acme", "object": "Umbrella"},
             {"predicate": "acquired", "subject": "Ghost", "object": "Missing"},
         ]},
    ]
    ee = [
        {"text": "Acme hired Bob on Monday.", "id": "d1",
         "event_list": [
             {"event_type": "hire", "trigger": " hired", "trigger_start_index": 4,
              "class": "hr",
              "arguments": [
                  {"argument_start_index": 11, "role": "employee", "argument": "Bob "},
              ]},
         ]},
    ]
    schema = [
        {"event_type": "hire", "role_list": [{"role": "employee"}, {"role": "employer"}]},
        {"event_type": "ipo", "role_list": [{"role": "company"}]},
    ]
    for name, rows in (("ner", ner), ("rel", rel), ("ee", ee), ("schema", schema)):
        with open(d / f"{name}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r, ensure_ascii=False) + "\n")
    return str(d)


def test_read_and_vocab(ray_session, fixtures):
    ner = read_jsonl(os.path.join(fixtures, "ner.jsonl"))
    assert ner.count() == 2
    assert ner_label_vocab(ner) == ["LOC", "ORG", "PER"]
    rel = read_jsonl(os.path.join(fixtures, "rel.jsonl"))
    assert rel_predicate_vocab(rel) == ["acquired", "works_for"]


def test_event_schema_reader(fixtures):
    labels = read_event_schema(os.path.join(fixtures, "schema.jsonl"))
    assert labels == sorted(
        ["hire@触发词", "hire@employee", "hire@employer", "ipo@触发词", "ipo@company"]
    )
    assert labels == sorted(labels)


def test_process_rel_train_judge_and_convert(ray_session, fixtures):
    rel = read_jsonl(os.path.join(fixtures, "rel.jsonl"))
    p2id = {p: i for i, p in enumerate(rel_predicate_vocab(rel))}
    out = process_rel_train(rel, p2id).to_pandas().sort_values("text").reset_index(drop=True)
    # doc 2 (nothing findable) dropped by judge
    assert len(out) == 2
    spo = out[out.text == "Anna works for Acme."].spo_list.iloc[0]
    # [sub, sub_end_incl, pred_id, obj, obj_end_incl]
    assert list(spo[0]) == [0, 3, p2id["works_for"], 15, 18]
    spo2 = out[out.text == "Acme bought Umbrella."].spo_list.iloc[0]
    assert len(spo2) == 1  # unfindable spo skipped, findable kept


def test_ner_dev_targets(ray_session, fixtures):
    ner = read_jsonl(os.path.join(fixtures, "ner.jsonl"))
    t = ner_dev_targets(ner).to_pandas()
    assert len(t) == 3
    row = t[t.entity == "Paris"].iloc[0]
    assert (row.label, row.start, row.end) == ("LOC", 16, 21)


def test_duee_targets_lstrip_correction(ray_session, fixtures):
    ee = read_jsonl(os.path.join(fixtures, "ee.jsonl"))
    t = duee_v1_targets(ee).to_pandas()
    trig = t[t.role == TRIGGER_ROLE].iloc[0]
    # " hired" at 4 → lstrip offset 1 → span [5, 10) = "hired"
    assert (trig.argument, trig.start, trig.end) == ("hired", 5, 10)
    emp = t[t.role == "employee"].iloc[0]
    # "Bob " at 11 → strip → [11, 14)
    assert (emp.argument, emp.start, emp.end) == ("Bob", 11, 14)


def test_split_and_shuffle_deterministic(ray_session):
    ds = ray.data.range(100)
    tr1, va1 = split_train_val(ds, 0.2, seed=7)
    tr2, va2 = split_train_val(ray.data.range(100), 0.2, seed=7)
    assert va1.count() == 20 and tr1.count() == 80
    assert sorted(r["id"] for r in va1.take_all()) == sorted(r["id"] for r in va2.take_all())
    s1 = [r["id"] for r in seeded_shuffle(ray.data.range(50), seed=3).take_all()]
    s2 = [r["id"] for r in seeded_shuffle(ray.data.range(50), seed=3).take_all()]
    assert s1 == s2 and s1 != list(range(50))


def test_write_jsonl_roundtrip(ray_session, tmp_path):
    ds = ray.data.from_items([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    out = str(tmp_path / "out")
    write_jsonl(ds, out)
    back = read_jsonl(out).to_pandas().sort_values("a").reset_index(drop=True)
    assert back.a.tolist() == [1, 2] and back.b.tolist() == ["x", "y"]


# ------------------------------------------------------------- doccano


def test_doccano_to_uie(ray_session):
    from fastie_ray.sources.doccano import doccano_to_uie, doccano_vocab

    rows = [
        {"text": "Anna works at Acme.",
         "entities": [
             {"id": 0, "start_offset": 0, "end_offset": 4, "label": "PER"},
             {"id": 1, "start_offset": 14, "end_offset": 18, "label": "ORG"},
         ],
         "relations": [{"id": 0, "from_id": 0, "to_id": 1, "type": "works_for"}]},
        {"text": "Paris is lovely.",
         "entities": [{"id": 0, "start_offset": 0, "end_offset": 5, "label": "LOC"}],
         "relations": []},
    ]
    ds = ray.data.from_items(rows)
    ent, pred = doccano_vocab(ds)
    assert ent == ["LOC", "ORG", "PER"] and pred == ["works_for"]

    out = doccano_to_uie(ds, negative_ratio=-1).to_pandas()
    pos_e = out[out.kind == "entity_pos"]
    assert set(pos_e.prompt) == {"PER", "ORG", "LOC"}
    anna = pos_e[pos_e.prompt == "PER"].result_list.iloc[0]
    assert anna[0]["text"] == "Anna" and anna[0]["start"] == 0

    pos_r = out[out.kind == "relation_pos"]
    assert pos_r.prompt.tolist() == ["Anna的works_for"]
    assert pos_r.result_list.iloc[0][0]["text"] == "Acme"

    # negative_ratio=-1 → all redundant entity prompts kept per doc
    neg_e = out[(out.kind == "entity_neg") & (out.content == "Paris is lovely.")]
    assert set(neg_e.prompt) == {"ORG", "PER"}

    # inverse-relation negative present and empty
    neg_r = out[out.kind == "relation_neg"]
    assert neg_r.prompt.tolist() == ["Acme的works_for"]
    assert list(neg_r.result_list.iloc[0]) == []

    # english prompt construction
    out_en = doccano_to_uie(ds, negative_ratio=0, schema_lang="en").to_pandas()
    assert "works_for of Anna" in set(out_en[out_en.kind == "relation_pos"].prompt)


def test_doccano_cls_and_aspect_level(ray_session):
    """M16 completion: doc-level cls conversion (utils.py:210-228),
    aspect-level ##-labels (utils.py:322-345), and the <1.7 dict
    format — in-prompt negative spans must slice the prompt."""
    import ray.data

    from fastie_ray.sources.doccano import (
        convert_cls_examples,
        doccano_to_uie,
        generate_cls_example,
    )

    # generate_cls_example: negative offsets recover the label from the prompt
    ex = generate_cls_example("some text", ["正向"], "情感倾向", ["正向", "负向"])
    r = ex["result_list"][0]
    s, e = r["start"] + len(ex["prompt"]) + 1, r["end"] + len(ex["prompt"]) + 1
    assert ex["prompt"][s:e] == "正向" == r["text"]

    # doc-level cls conversion
    ds = ray.data.from_items(
        [{"text": "这家店很好", "label": ["正向"]}, {"data": "太差了", "label": ["负向"]}]
    )
    out = convert_cls_examples(ds).to_pandas()
    assert len(out) == 2 and (out.kind == "cls").all()
    assert all(p.startswith("情感倾向[") for p in out.prompt)

    # aspect-level ## labels + <1.7 dict format
    row = {
        "text": "Acme is great",
        "label": {
            "entities": [
                {"id": 0, "start_offset": 0, "end_offset": 4, "label": "ORG##正向"}
            ],
            "relations": [],
        },
    }
    out = doccano_to_uie(ray.data.from_items([row]), negative_ratio=0).to_pandas()
    kinds = set(out.kind)
    assert "entity_cls" in kinds and "entity_pos" in kinds
    pos = out[out.kind == "entity_pos"].iloc[0]
    assert pos.prompt == "ORG"  # base label, cls suffix stripped
    cls_row = out[out.kind == "entity_cls"].iloc[0]
    assert cls_row.prompt.startswith("Acme的情感倾向[")
    assert cls_row.result_list[0]["text"] == "正向"
