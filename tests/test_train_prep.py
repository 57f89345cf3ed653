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
