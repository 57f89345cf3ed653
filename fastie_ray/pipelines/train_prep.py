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


def rel_convert_to_features(
    ds: "ray.data.Dataset",
    predicate2id: dict[str, int],
    max_length: int = 256,
    text_col: str = "text",
    label_col: str = "spo_list",
    is_chinese: bool = True,
) -> "ray.data.Dataset":
    """rows {text, spo_list: [[sh, st, p, oh, ot], ...]} (char offsets,
    tails INCLUSIVE) → rows {input_ids, seq_len, labels} with GPLinker's
    training arithmetic (``relation_extraction/gplinker/tokenization.py:
    79-125``): every coordinate through ``char_to_token`` directly (the
    reference maps the tail char itself, unlike NER's ``end - 1``),
    dropping SPOs with any truncated coordinate."""

    def convert(df: pd.DataFrame) -> pd.DataFrame:
        tok = WordPieceTokenizer(max_length=max_length)
        out_ids, out_len, out_labels = [], [], []
        for _, row in df.iterrows():
            text = row[text_col]
            sent = text.replace(" ", "-") if is_chinese else text
            enc = tok.encode(sent)
            spo = []
            for _sh, _st, p, _oh, _ot in (row[label_col] if row[label_col] is not None else []):
                sh, st = enc.char_to_token(int(_sh)), enc.char_to_token(int(_st))
                oh, ot = enc.char_to_token(int(_oh)), enc.char_to_token(int(_ot))
                if sh is None or st is None or oh is None or ot is None:
                    continue
                pid = predicate2id[p] if isinstance(p, str) else int(p)
                spo.append([sh, st, pid, oh, ot])
            out_ids.append(_token_ids(enc.offsets, sent))
            out_len.append(enc.seq_len)
            out_labels.append(spo)
        return pd.DataFrame(
            {
                "input_ids": out_ids,
                "seq_len": pd.Series(out_len, dtype="int64"),
                "labels": out_labels,
            }
        )

    return ds.map_batches(convert, batch_format="pandas")


def collate_gplinker_rel(
    features: list[dict[str, Any]], num_labels: int
) -> dict[str, np.ndarray]:
    """``DataCollatorForGPLinker`` (``gplinker/tokenization.py:35-77``)
    in numpy: entity [bs, 2, max_spo, 2], head/tail [bs, P, max_spo, 2]
    — (0, 0)-padded sparse span lists."""
    input_ids = sequence_padding([f["input_ids"] for f in features])
    attention_mask = sequence_padding([[1] * len(f["input_ids"]) for f in features])
    bs = len(features)
    max_spo = max((len(f["labels"]) for f in features), default=1) or 1
    entity = np.zeros((bs, 2, max_spo, 2), dtype=np.int64)
    head = np.zeros((bs, num_labels, max_spo, 2), dtype=np.int64)
    tail = np.zeros((bs, num_labels, max_spo, 2), dtype=np.int64)
    for i, f in enumerate(features):
        for spidx, (sh, st, p, oh, ot) in enumerate(f["labels"]):
            entity[i, 0, spidx] = (sh, st)
            entity[i, 1, spidx] = (oh, ot)
            head[i, p, spidx] = (sh, oh)
            tail[i, p, spidx] = (st, ot)
    return {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "entity_labels": entity,
        "head_labels": head,
        "tail_labels": tail,
    }


def ee_convert_to_features(
    ds: "ray.data.Dataset",
    label2id: dict[str, int],
    max_length: int = 256,
    text_col: str = "text",
    label_col: str = "events",
    is_chinese: bool = True,
) -> "ray.data.Dataset":
    """rows {text, events: [[(event_type, role, word, head, tail)…]…]}
    (char offsets, tail EXCLUSIVE) → rows {input_ids, seq_len,
    argu_labels, head_labels, tail_labels} with GPLinker-EE's training
    arithmetic (``event_extraction/gplinker/tokenization.py:88-170``):
    per-(type@role) flattened argument span lists, plus pairwise
    min/max head/tail link sets within each event; empties padded with
    the reference's sentinel rows."""

    def convert(df: pd.DataFrame) -> pd.DataFrame:
        tok = WordPieceTokenizer(max_length=max_length)
        rows = {"input_ids": [], "seq_len": [], "argu_labels": [],
                "head_labels": [], "tail_labels": []}
        for _, row in df.iterrows():
            text = row[text_col]
            sent = text.replace(" ", "-") if is_chinese else text
            enc = tok.encode(sent)
            argu: dict[int, list[int]] = {}
            heads: set[tuple[int, int]] = set()
            tails: set[tuple[int, int]] = set()
            for event in (row[label_col] if row[label_col] is not None else []):
                for i1, (et1, role1, _w1, head1, tail1) in enumerate(event):
                    tp1 = label2id["@".join([et1, role1])]
                    h1 = enc.char_to_token(int(head1))
                    t1 = enc.char_to_token(int(tail1) - 1)
                    if h1 is None or t1 is None:
                        continue
                    argu.setdefault(tp1, [tp1]).extend([h1, t1])
                    for i2, (et2, role2, _w2, head2, tail2) in enumerate(event):
                        if i2 > i1:
                            h2 = enc.char_to_token(int(head2))
                            t2 = enc.char_to_token(int(tail2) - 1)
                            if h2 is None or t2 is None:
                                continue
                            heads.add((min(h1, h2), max(h1, h2)))
                            tails.add((min(t1, t2), max(t1, t2)))
            rows["input_ids"].append(_token_ids(enc.offsets, sent))
            rows["seq_len"].append(enc.seq_len)
            rows["argu_labels"].append(list(argu.values()) or [[0, 0, 0]])
            rows["head_labels"].append([list(x) for x in sorted(heads)] or [[0, 0]])
            rows["tail_labels"].append([list(x) for x in sorted(tails)] or [[0, 0]])
        return pd.DataFrame(rows)

    return ds.map_batches(convert, batch_format="pandas")


def cls_convert_to_features(
    ds: "ray.data.Dataset",
    input_feature_fields: list[str] = ("text",),
    label_col: str = "label",
    max_length: int = 256,
) -> "ray.data.Dataset":
    """Text-classification features (``fastie/data/text_classification
    .py:63-90``): tokenize a sentence (or a sentence PAIR, SEP-joined
    with segment ids), rename label → labels."""

    def convert(df: pd.DataFrame) -> pd.DataFrame:
        tok = WordPieceTokenizer(max_length=max_length)
        out_ids, out_tt, out_labels = [], [], []
        for _, row in df.iterrows():
            enc_a = tok.encode(row[input_feature_fields[0]])
            ids = _token_ids(enc_a.offsets, row[input_feature_fields[0]])
            token_type = [0] * len(ids)
            if len(input_feature_fields) > 1:
                enc_b = tok.encode(row[input_feature_fields[1]])
                ids_b = _token_ids(enc_b.offsets, row[input_feature_fields[1]])[1:]
                ids = (ids + ids_b)[: max_length]
                token_type = (token_type + [1] * len(ids_b))[: max_length]
            out_ids.append(ids)
            out_tt.append(token_type)
            out_labels.append(row[label_col])
        return pd.DataFrame(
            {"input_ids": out_ids, "token_type_ids": out_tt, "labels": out_labels}
        )

    return ds.map_batches(convert, batch_format="pandas")


def evaluate_ner(
    validation: "ray.data.Dataset",
    world=None,
    metric_key_prefix: str = "eval",
    concurrency: int = 2,
    max_length: int = 512,
    **scorer_kw: Any,
) -> dict[str, Any]:
    """The trainer evaluation loop as Ray stages (``fastie/train/
    trainer.py:237-322``): run the NER scorer over the dev documents
    (actor pool — the reference's batched prediction step), compare the
    predicted (label, start, end, entity) sets against the gold targets
    with the distributed micro-P/R/F1 aggregate (``ExtractionScore``
    semantics, trainer.py:387-389), and return metrics prefixed with
    ``metric_key_prefix`` exactly as the reference does."""
    import ray

    from fastie_ray.ops.metrics import extraction_score
    from fastie_ray.sources.corpus import ner_dev_targets

    world_ref = ray.put(world) if world is not None else None
    gold = ner_dev_targets(validation)

    class _Pred:
        def __init__(self, world_ref=None, **kw):
            from fastie_ray.serve import _IEWorkerImpl

            self.worker = _IEWorkerImpl(
                "ner", world=world_ref, max_length=max_length, **kw
            )

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            rows = []
            for text, labels in zip(df["text"], self.worker.predict(list(df["text"]))):
                for lb, ents in labels.items():
                    for e in ents:
                        rows.append((text, lb, e["start"], e["end"], e["text"]))
            return pd.DataFrame(
                rows, columns=["text", "label", "start", "end", "entity"]
            )

    pred = validation.map_batches(
        _Pred,
        fn_constructor_kwargs={"world_ref": world_ref, **scorer_kw},
        batch_format="pandas",
        concurrency=concurrency,
    )
    metrics = extraction_score(
        gold, pred, keys=["text", "label", "start", "end", "entity"]
    )
    return {f"{metric_key_prefix}_{k}": v for k, v in metrics.items()}


# ------------------------------------------------- KG-embedding negatives


def kg_negative_samples(
    triples: "ray.data.Dataset", n_buckets: int = 32
) -> "ray.data.Dataset":
    """Deterministic negative sampling for KG-embedding training
    (TransE-style corrupted triples): for each DISTINCT (subject,
    predicate, object), the negative object is the SUCCESSOR of the
    true object in the predicate's sorted distinct-object vocabulary
    (cyclic — the lexicographic minimum follows the maximum). Triples
    whose predicate has a single object produce no negative.

    Distributed shape: per-batch distinct combiner → ONE hash-bucketed
    exchange for the global distinct; the per-predicate object vocab is
    VOCAB-BOUNDED, so it is reduced to the driver and broadcast once
    (``ray.put``) — never a second corpus-sized exchange. The successor
    rule is bit-for-bit `lead(object) OVER (PARTITION BY predicate
    ORDER BY object)` with a `min(object)` wrap, so the whole operator
    is SQL-reproducible."""
    import ray

    from fastie_ray.ops.dedup import dedup_exact

    keys = ["predicate", "subject", "object"]
    distinct = dedup_exact(
        triples.select_columns(keys), keys, n_buckets=n_buckets
    ).materialize()

    def po(df: pd.DataFrame) -> pd.DataFrame:
        return df[["predicate", "object"]].drop_duplicates()

    vocab = (
        distinct.map_batches(po, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
        .sort_values(["predicate", "object"])
    )
    succ: dict[tuple[str, str], str] = {}
    for pred, g in vocab.groupby("predicate", sort=False):
        objs = g["object"].tolist()
        if len(objs) < 2:
            continue
        for a, b in zip(objs, objs[1:] + objs[:1]):
            succ[(pred, a)] = b
    succ_ref = ray.put(succ)

    def corrupt(df: pd.DataFrame) -> pd.DataFrame:
        s = ray.get(succ_ref)
        neg = [
            s.get((p, o)) for p, o in zip(df["predicate"], df["object"])
        ]
        out = df.assign(neg_object=neg)
        return out[out["neg_object"].notna()][
            ["subject", "predicate", "object", "neg_object"]
        ]

    return distinct.map_batches(corrupt, batch_format="pandas")
