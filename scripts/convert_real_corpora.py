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


if __name__ == "__main__":
    print(f"wrote {convert()} mention rows -> {os.path.abspath(DST)}")
