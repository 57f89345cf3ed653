"""Training-data preparation — the data half of the reference training
path (SURVEY §2 S2/S3/M9/M10; VERDICT r1 missing #2).

Reference: ``fastie/data/named_entity_recognition.py:25-110``
(``load_ner_train_dev_dataset``: load JSONL → optional train/val split
→ optional seeded shuffle → sorted label vocab → per-example
``convert_to_features`` → dev target projection) and
``global_pointer/tokenization.py:89-131`` (``convert_to_features``:
fast-tokenize with offsets, labels = ``[start_tok, end_tok, tag]``
via ``char_to_token(start_offset)`` / ``char_to_token(end_offset-1)``,
dropping entities whose chars were truncated away) plus the collator
``DataCollatorForGlobalPointerNer`` (tokenization.py:39-87: sparse
labels = per-tag (start, end) sets padded with (0, 0), dense labels =
scatter into ``[bs, num_labels, L, L]``).

What is NOT here: the torch forward/backward, FGM, optimizers —
weights are out of scope (§7.0). Everything a trainer consumes before
the forward pass (features, collated label tensors, dev targets) is
produced, distributed, from the same Ray stages the inference
pipelines use.

Scale notes: feature conversion is embarrassingly parallel
``map_batches``; the only wide ops are the split (hash of text — no
shuffle), the seeded shuffle (explicit, caller-requested), and the
label-vocab distinct (tiny result, broadcast by closure).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

import numpy as np
import pandas as pd

from fastie_ray.functions.hashing import stable_hash64
from fastie_ray.functions.padding import sequence_padding
from fastie_ray.hf_backend import WordPieceTokenizer

if TYPE_CHECKING:
    import ray.data

VOCAB_SIZE = 1 << 21  # hash-bucket token-id space (stand-in vocab)


def _token_ids(offsets: list[tuple[int, int]], text: str) -> list[int]:
    """Deterministic token ids: CLS=101, SEP=102 (BERT's conventional
    ids), body tokens hashed into a fixed bucket space. A real
    checkpoint's tokenizer supplies real ids through the identical
    column; nothing downstream of the collator inspects id values."""
    ids = [101]
    for s, e in offsets[1:-1]:
        ids.append(103 + stable_hash64(text[s:e]) % VOCAB_SIZE)
    ids.append(102)
    return ids


def ner_convert_to_features(
    ds: "ray.data.Dataset",
    label2id: dict[str, int],
    max_length: int = 256,
    text_col: str = "text",
    label_col: str = "entities",
    is_chinese: bool = True,
) -> "ray.data.Dataset":
    """rows {text, entities: [{start_offset, end_offset, label}]} →
    rows {input_ids, seq_len, labels} with the reference label
    arithmetic (``tokenization.py:113-127``): dashed text for Chinese,
    ``start = char_to_token(start_offset)``, ``end =
    char_to_token(end_offset - 1)``, entity dropped when either char
    fell past truncation."""

    def convert(df: pd.DataFrame) -> pd.DataFrame:
        tok = WordPieceTokenizer(max_length=max_length)
        out_ids, out_len, out_labels = [], [], []
        for _, row in df.iterrows():
            text = row[text_col]
            sent = text.replace(" ", "-") if is_chinese else text
            enc = tok.encode(sent)
            labels = []
            ents = row[label_col]
            if ents is None:
                ents = []
            for ent in ents:
                start = enc.char_to_token(int(ent["start_offset"]))
                end = enc.char_to_token(int(ent["end_offset"]) - 1)
                if start is None or end is None:
                    continue
                labels.append([start, end, label2id[ent["label"]]])
            out_ids.append(_token_ids(enc.offsets, sent))
            out_len.append(enc.seq_len)
            out_labels.append(labels)
        return pd.DataFrame(
            {
                "input_ids": out_ids,
                "seq_len": pd.Series(out_len, dtype="int64"),
                "labels": out_labels,
            }
        )

    return ds.map_batches(convert, batch_format="pandas")


def collate_gp_ner(
    features: list[dict[str, Any]],
    num_labels: int,
    is_sparse: bool = True,
) -> dict[str, np.ndarray]:
    """The GlobalPointer NER collator (``tokenization.py:39-87``) in
    numpy: pad input_ids; sparse labels = per-tag sets of (start, end)
    padded with (0, 0) then sequence-padded over tags and examples;
    dense labels = ``[bs, num_labels, L, L]`` scatter."""
    input_ids = sequence_padding([f["input_ids"] for f in features])
    bs, seqlen = input_ids.shape
    attention_mask = sequence_padding(
        [[1] * len(f["input_ids"]) for f in features]
    )
    if is_sparse:
        batch_labels = []
        for f in features:
            label: list[set] = [set() for _ in range(num_labels)]
            for start, end, tag in f["labels"]:
                label[tag].add((start, end))
            for l in label:
                if not l:  # at least one entry per tag — pad with (0, 0)
                    l.add((0, 0))
            batch_labels.append(sequence_padding([list(l) for l in label]))
        labels = sequence_padding(batch_labels, seq_dims=2)
    else:
        labels = np.zeros((bs, num_labels, seqlen, seqlen), dtype=np.int64)
        for i, f in enumerate(features):
            for start, end, tag in f["labels"]:
                labels[i, tag, start, end] = 1
    return {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "labels": np.asarray(labels),
    }


def load_ner_train_dev_dataset(
    train: "ray.data.Dataset",
    validation: "ray.data.Dataset | None" = None,
    train_val_split: float | None = None,
    shuffle_train_dataset: bool = False,
    shuffle_seed: int = 42,
    train_max_length: int = 256,
    text_col: str = "text",
    label_col: str = "entities",
    is_chinese: bool = True,
) -> tuple["ray.data.Dataset", "ray.data.Dataset", list[str]]:
    """The ``load_ner_train_dev_dataset`` pipeline (``fastie/data/
    named_entity_recognition.py:25-110``) on Ray Datasets: returns
    (train features, dev targets, sorted label vocab)."""
    from fastie_ray.sources.corpus import (
        ner_dev_targets,
        ner_label_vocab,
        seeded_shuffle,
        split_train_val,
    )

    if validation is None:
        if train_val_split is None:
            raise ValueError("need a validation dataset or train_val_split")
        train, validation = split_train_val(train, val_pct=train_val_split)

    if shuffle_train_dataset:
        train = seeded_shuffle(train, seed=shuffle_seed)

    labels = ner_label_vocab(train)
    label2id = {lb: i for i, lb in enumerate(labels)}

    train_features = ner_convert_to_features(
        train, label2id, max_length=train_max_length,
        text_col=text_col, label_col=label_col, is_chinese=is_chinese,
    )
    dev_targets = ner_dev_targets(validation)
    return train_features, dev_targets, labels
