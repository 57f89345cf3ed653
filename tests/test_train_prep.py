"""Training-data preparation (the data half of the reference tuner):
feature conversion must follow ``global_pointer/tokenization.py``'s
label arithmetic; the collator must match the reference sparse/dense
label construction."""

import numpy as np
import pandas as pd

from fastie_ray.pipelines.train_prep import (
    collate_gp_ner,
    load_ner_train_dev_dataset,
    ner_convert_to_features,
)


def _rows():
    # entities sit on alnum-run boundaries (like real annotations)
    return [
        {
            "text": "Helix Group0007 hired Avery Quon0042 .",
            "entities": [
                {"start_offset": 0, "end_offset": 15, "label": "ORG",
                 "entity": "Helix Group0007"},
                {"start_offset": 22, "end_offset": 36, "label": "PER",
                 "entity": "Avery Quon0042"},
            ],
        },
        {
            "text": "nothing here",
            "entities": [],
        },
    ]


def test_ner_features_char_to_token_projection(ray_session):
    import ray.data

    ds = ray.data.from_items(_rows())
    feats = ner_convert_to_features(
        ds, {"ORG": 0, "PER": 1}, max_length=256, is_chinese=True
    ).take_all()
    f0 = next(f for f in feats if len(f["labels"]) == 2)
    from fastie_ray.hf_backend import WordPieceTokenizer

    enc = WordPieceTokenizer(256).encode("Helix-Group0007-hired-Avery-Quon0042-.")
    for start, end, tag in f0["labels"]:
        s_char = enc.offsets[start][0]
        e_char = enc.offsets[end][1]
        assert (s_char, e_char, tag) in {(0, 15, 0), (22, 36, 1)}
    # ids: CLS/SEP framing, one id per token
    assert f0["input_ids"][0] == 101 and f0["input_ids"][-1] == 102
    assert len(f0["input_ids"]) == f0["seq_len"]


def test_ner_features_drop_truncated_entities(ray_session):
    import ray.data

    row = {
        "text": "x " * 300 + "Helix Group0007",  # entity beyond 64-token budget
        "entities": [{"start_offset": 600, "end_offset": 615, "label": "ORG"}],
    }
    ds = ray.data.from_items([row])
    feats = ner_convert_to_features(ds, {"ORG": 0}, max_length=64).take_all()
    assert feats[0]["labels"] == []  # reference: continue on None


def test_collate_sparse_dense_equivalence():
    feats = [
        {"input_ids": [101, 5, 6, 7, 102], "labels": [[1, 2, 0], [3, 3, 1]]},
        {"input_ids": [101, 9, 102], "labels": []},
    ]
    dense = collate_gp_ner(feats, num_labels=2, is_sparse=False)
    sparse = collate_gp_ner(feats, num_labels=2, is_sparse=True)
    assert dense["input_ids"].shape == (2, 5)
    assert (dense["input_ids"][1][3:] == 0).all()  # padded
    assert dense["labels"][0, 0, 1, 2] == 1 and dense["labels"][0, 1, 3, 3] == 1
    assert dense["labels"].sum() == 2
    # sparse → dense scatter reproduces the dense tensor (ignoring the
    # (0,0) pads the reference inserts for empty tag sets)
    rebuilt = np.zeros_like(dense["labels"])
    bs, num_labels = sparse["labels"].shape[:2]
    for i in range(bs):
        for tag in range(num_labels):
            for start, end in sparse["labels"][i, tag]:
                if (start, end) != (0, 0):
                    rebuilt[i, tag, start, end] = 1
    assert (rebuilt == dense["labels"]).all()


def test_load_ner_train_dev_dataset_end_to_end(ray_session):
    import ray.data

    rows = _rows() * 10
    ds = ray.data.from_items(rows)
    train, dev, labels = load_ner_train_dev_dataset(
        ds, train_val_split=0.25, shuffle_train_dataset=True
    )
    assert labels == ["ORG", "PER"]
    tf = train.take_all()
    assert len(tf) == 15 and {"input_ids", "seq_len", "labels"} <= set(tf[0])
    dv = dev.take_all()
    # exploded gold rows; 5 docs in the val split, some with 2 entities
    assert all({"text", "label", "start", "end", "entity"} <= set(r) for r in dv)
    assert len(dv) in range(0, 11)


def test_rel_features_and_collator(ray_session):
    import ray.data

    from fastie_ray.hf_backend import WordPieceTokenizer
    from fastie_ray.pipelines.train_prep import (
        collate_gplinker_rel,
        rel_convert_to_features,
    )

    text = "Helix Group0007 was founded by Avery Quon0042 ."
    # char spans: subject [0,15) tail-inclusive 14; object [31,45) tail 44
    df = pd.DataFrame({"text": [text], "spo_list": [[[0, 14, "founded_by", 31, 44]]]})
    feats = rel_convert_to_features(
        ray.data.from_pandas(df), {"founded_by": 0}
    ).take_all()
    (sh, st, p, oh, ot), = feats[0]["labels"]
    enc = WordPieceTokenizer(256).encode(text.replace(" ", "-"))
    assert enc.offsets[sh][0] == 0 and enc.offsets[st][1] == 15
    assert enc.offsets[oh][0] == 31 and enc.offsets[ot][1] == 45
    assert p == 0
    batch = collate_gplinker_rel(feats, num_labels=1)
    assert batch["entity_labels"].shape == (1, 2, 1, 2)
    assert tuple(batch["entity_labels"][0, 0, 0]) == (sh, st)
    assert tuple(batch["head_labels"][0, 0, 0]) == (sh, oh)
    assert tuple(batch["tail_labels"][0, 0, 0]) == (st, ot)


def test_ee_features_pairwise_links(ray_session):
    import ray.data

    from fastie_ray.pipelines.train_prep import ee_convert_to_features

    text = "Ann hired Bob today ."
    # one event, two arguments (char spans, tail exclusive)
    ev = [["hire", "subject", "Ann", 0, 3], ["hire", "object", "Bob", 10, 13]]
    df = pd.DataFrame({"text": [text], "events": [[ev]]})
    l2i = {"hire@subject": 0, "hire@object": 1}
    feats = ee_convert_to_features(ray.data.from_pandas(df), l2i).take_all()
    f = feats[0]
    # argu lists start with the tag id then flattened (h, t) pairs
    tags = {a[0] for a in f["argu_labels"]}
    assert tags == {0, 1}
    assert len(f["head_labels"]) == 1 and len(f["tail_labels"]) == 1
    (h_lo, h_hi), = f["head_labels"]
    assert h_lo <= h_hi  # min/max ordering of the pairwise link
    # empty docs get the reference sentinels
    empt = ee_convert_to_features(
        ray.data.from_pandas(pd.DataFrame({"text": ["x"], "events": [[]]})), l2i
    ).take_all()[0]
    assert empt["argu_labels"] == [[0, 0, 0]]
    assert empt["head_labels"] == [[0, 0]] and empt["tail_labels"] == [[0, 0]]


def test_cls_features_single_and_pair(ray_session):
    import ray.data

    from fastie_ray.pipelines.train_prep import cls_convert_to_features

    rows = [{"text": "good stuff", "text_b": "bad stuff", "label": 1}]
    single = cls_convert_to_features(ray.data.from_items(rows)).take_all()[0]
    assert single["labels"] == 1
    assert single["input_ids"][0] == 101 and single["input_ids"][-1] == 102
    assert set(single["token_type_ids"]) == {0}
    pair = cls_convert_to_features(
        ray.data.from_items(rows), input_feature_fields=["text", "text_b"]
    ).take_all()[0]
    assert 1 in set(pair["token_type_ids"])  # second segment marked
    assert len(pair["input_ids"]) == len(pair["token_type_ids"])


def test_evaluate_ner_eval_loop(ray_session):
    import ray.data

    from fastie_ray.pipelines.train_prep import evaluate_ner
    from fastie_ray.synth import build_world

    w = build_world()
    e0, e1 = w.entities[0], w.entities[1]
    good = {
        "text": f"intro {e0.name} outro.",
        "entities": [
            {"start_offset": 6, "end_offset": 6 + len(e0.name),
             "label": e0.label, "entity": e0.name}
        ],
    }
    missed = {  # gold entity the gazetteer scorer can't see
        "text": "nothing to find here",
        "entities": [
            {"start_offset": 0, "end_offset": 7, "label": "ORG", "entity": "nothing"}
        ],
    }
    ds = ray.data.from_items([good, missed])
    m = evaluate_ner(ds, world=w, concurrency=2)
    assert m["eval_tp"] == 1 and m["eval_true_sum"] == 2
    assert m["eval_pred_sum"] == 1  # no false positives on the miss doc
    assert m["eval_precision"] == 1.0 and m["eval_recall"] == 0.5


def test_kg_negative_samples_successor_rule():
    import pandas as pd
    import numpy as np
    import ray.data

    from fastie_ray.pipelines.train_prep import kg_negative_samples

    triples = pd.DataFrame(
        {
            "url": ["u1", "u2", "u3", "u4", "u5"],
            "predicate": ["p", "p", "p", "q", "q"],
            "subject": ["s1", "s2", "s3", "s4", "s4"],
            # p has objects {a, b, c}; q has a single object {z} twice
            "object": ["a", "b", "c", "z", "z"],
        }
    )
    ds = ray.data.from_pandas([p for p in np.array_split(triples, 2)])
    got = (
        kg_negative_samples(ds, n_buckets=4)
        .to_pandas()
        .sort_values(["predicate", "object"])
        .reset_index(drop=True)
    )
    # successor in sorted object vocab, cyclic wrap c -> a
    assert list(zip(got["object"], got["neg_object"])) == [
        ("a", "b"), ("b", "c"), ("c", "a")
    ]
    # single-object predicate q emits no negative
    assert (got["predicate"] == "q").sum() == 0
