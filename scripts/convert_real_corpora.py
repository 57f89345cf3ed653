"""Convert the reference's REAL CMeEE dev corpus to relational parquet
(VERDICT r4 #1): ``data/golden/cmeee_dev.parquet`` with one row per gold
mention (text, label, start, end, entity) — the M8 ``ner_dev_targets``
projection of ``examples/named_entity_recognition/datasets/cmeee/dev.json``,
committed so the ``cmeee_stats`` driver query and its DuckDB oracle read
the identical bytes without touching /root/reference at query time.

Deterministic: rows keep file order (doc_idx, mention order within doc).
Run from the repo root: ``python scripts/convert_real_corpora.py``.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

SRC = (
    "/root/reference/examples/named_entity_recognition/datasets/"
    "cmeee/dev.json"
)
DST = os.path.join(os.path.dirname(__file__), "..", "data", "golden",
                   "cmeee_dev.parquet")
DUEE_SRC = (
    "/root/reference/examples/event_extraction/datasets/duee/dev.json"
)
DUEE_DST = os.path.join(os.path.dirname(__file__), "..", "data", "golden",
                        "duee_dev.parquet")


def convert(src: str = SRC, dst: str = DST) -> int:
    rows = {"doc_idx": [], "text": [], "label": [], "start": [],
            "end": [], "entity": []}
    with open(src) as f:
        for i, line in enumerate(f):
            if not line.strip():
                continue
            ex = json.loads(line)
            for e in ex["entities"]:
                rows["doc_idx"].append(i)
                rows["text"].append(ex["text"])
                rows["label"].append(e["label"])
                rows["start"].append(int(e["start_offset"]))
                rows["end"].append(int(e["end_offset"]))
                rows["entity"].append(e["entity"])
    t = pa.table({
        "doc_idx": pa.array(rows["doc_idx"], pa.int64()),
        "text": pa.array(rows["text"], pa.string()),
        "label": pa.array(rows["label"], pa.string()),
        "start": pa.array(rows["start"], pa.int64()),
        "end": pa.array(rows["end"], pa.int64()),
        "entity": pa.array(rows["entity"], pa.string()),
    })
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    pq.write_table(t, dst, compression="zstd")
    return t.num_rows


def convert_duee(src: str = DUEE_SRC, dst: str = DUEE_DST) -> int:
    """DuEE dev → one row per (event, argument) with the M7
    lstrip-corrected offsets (duee_v1_targets shape) — the real
    event-extraction dev set as relational parquet."""
    rows = {"doc_id": [], "event_idx": [], "event_type": [], "role": [],
            "argument": [], "start": [], "end": []}

    def add(doc_id, k, etype, role, surface, start):
        off = len(surface) - len(surface.lstrip())
        rows["doc_id"].append(doc_id)
        rows["event_idx"].append(k)
        rows["event_type"].append(etype)
        rows["role"].append(role)
        rows["argument"].append(surface.strip())
        rows["start"].append(start + off)
        rows["end"].append(start + off + len(surface.strip()))

    with open(src) as f:
        for line in f:
            if not line.strip():
                continue
            ex = json.loads(line)
            for k, e in enumerate(ex["event_list"]):
                add(ex["id"], k, e["event_type"], "触发词",
                    e["trigger"], int(e["trigger_start_index"]))
                for a in e["arguments"]:
                    add(ex["id"], k, e["event_type"], a["role"],
                        a["argument"], int(a["argument_start_index"]))
    t = pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.string()),
        "event_idx": pa.array(rows["event_idx"], pa.int64()),
        "event_type": pa.array(rows["event_type"], pa.string()),
        "role": pa.array(rows["role"], pa.string()),
        "argument": pa.array(rows["argument"], pa.string()),
        "start": pa.array(rows["start"], pa.int64()),
        "end": pa.array(rows["end"], pa.int64()),
    })
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    pq.write_table(t, dst, compression="zstd")
    return t.num_rows


if __name__ == "__main__":
    print(f"wrote {convert()} mention rows -> {os.path.abspath(DST)}")
    print(f"wrote {convert_duee()} argument rows -> "
          f"{os.path.abspath(DUEE_DST)}")
