"""GlobalPointer NER decode (reference semantics, torch-free).

Reference: ``fastie/models/named_entity_recognition/global_pointer/
modeling_gp.py:145-170`` — for every ``(label_id, start_tok, end_tok)``
with ``logit > decode_thresh`` (default 0.0, ``modeling_gp.py:156``),
excluding CLS/SEP/PAD positions
(``start >= l-1 or end >= l-1 or 0 in [start, end]``), map the token
span to a char span via ``offset_mapping`` and emit
``(label, char_start, char_end, text[char_start:char_end])``.

Two implementations with identical output (property-tested):

- ``decode_gp_dense``: the line-for-line port taking the full
  ``[num_labels, L, L]`` score tensor — the test oracle and the shape a
  real transformer scorer would produce;
- ``decode_gp_sparse``: the production path taking a sparse hit list
  ``(label_id, start_tok, end_tok, score)`` — what the deterministic
  featurizer emits — avoiding the O(labels·L²) dense materialization
  per chunk that would dominate memory at 100 TB scale.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np


def decode_gp_dense(
    logits: np.ndarray,  # [num_labels, L, L]
    seq_len: int,
    text: str,
    offset_mapping: Sequence[tuple[int, int]],
    id2label: dict[int, str],
    decode_thresh: float = 0.0,
) -> set[tuple[str, int, int, str]]:
    entity_list = set()
    for label_id, start_idx, end_idx in zip(*np.where(logits > decode_thresh)):
        label_id, start_idx, end_idx = int(label_id), int(start_idx), int(end_idx)
        if start_idx >= (seq_len - 1) or end_idx >= (seq_len - 1) or 0 in [start_idx, end_idx]:
            continue
        label = id2label[label_id]
        _start, _end = offset_mapping[start_idx][0], offset_mapping[end_idx][1]
        entity_list.add((label, _start, _end, text[_start:_end]))
    return set(entity_list)


def decode_gp_sparse(
    hits: Iterable[tuple[int, int, int, float]],  # (label_id, start_tok, end_tok, score)
    seq_len: int,
    text: str,
    offset_mapping: Sequence[tuple[int, int]],
    id2label: dict[int, str],
    decode_thresh: float = 0.0,
) -> set[tuple[str, int, int, str]]:
    entity_list = set()
    for label_id, start_idx, end_idx, score in hits:
        if score <= decode_thresh:
            continue
        if start_idx >= (seq_len - 1) or end_idx >= (seq_len - 1) or 0 in [start_idx, end_idx]:
            continue
        label = id2label[label_id]
        _start, _end = offset_mapping[start_idx][0], offset_mapping[end_idx][1]
        entity_list.add((label, _start, _end, text[_start:_end]))
    return entity_list
