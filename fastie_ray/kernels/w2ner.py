"""W2NER word-pair grid decode (reference semantics, torch-free).

Reference: ``fastie/models/named_entity_recognition/w2ner/
modeling_w2ner.py:197-254`` — the model argmaxes a ``[L, L]`` grid of
tag ids per sequence where, for word indices ``i < j``:

- ``grid[i, j] == 1`` (NNW, next-neighboring-word): word ``j`` follows
  word ``i`` inside some entity;
- ``grid[j, i] > 1`` (THW, tail-head-word, upper value = label id):
  an entity whose head word is ``i`` and tail word is ``j``.

Decode walks every NNW path from each head to a registered tail
(supports **discontinuous** entities) and emits
``(id2label[tag], head, tail+1, ''.join(text[i] for i in path))`` —
note the surface is re-assembled from per-word characters, not a
contiguous slice, exactly as the reference does.
"""

from __future__ import annotations

import numpy as np


def decode_w2ner(
    grid: np.ndarray,  # [L, L] int tag ids (already argmaxed)
    length: int,
    text: str,
    id2label: dict[int, str],
) -> set[tuple[str, int, int, str]]:
    forward_dict: dict[int, list[int]] = {}
    head_dict: dict[int, set[int]] = {}
    ht_type_dict: dict[tuple[int, int], int] = {}

    for i in range(length):
        for j in range(i + 1, length):
            if int(grid[i, j]) == 1:  # NNW
                forward_dict.setdefault(i, []).append(j)

    for i in range(length):
        for j in range(i, length):
            if int(grid[j, i]) > 1:  # THW
                ht_type_dict[(i, j)] = int(grid[j, i])
                head_dict.setdefault(i, set()).add(j)

    predicts: list[list[int]] = []

    def find_entity(key: int, entity: list[int], tails: set[int]) -> None:
        entity.append(key)
        if key in tails:
            predicts.append(entity.copy())
        if key not in forward_dict:
            entity.pop()
            return
        for k in forward_dict[key]:
            find_entity(k, entity, tails)
        entity.pop()

    for head in head_dict:
        find_entity(head, [], head_dict[head])

    entities = set()
    for _entity in predicts:
        entities.add(
            (
                id2label[ht_type_dict[(_entity[0], _entity[-1])]],
                _entity[0],
                _entity[-1] + 1,
                "".join(text[i] for i in _entity),
            )
        )
    return entities


def decode_w2ner_sparse(
    nnw_pairs,  # iterable[(i, j)] next-neighboring-word edges (i < j)
    thw_triples,  # iterable[(head, tail, label_id)] with label_id > 1
    length: int,
    text: str,
    id2label: dict[int, str],
) -> set[tuple[str, int, int, str]]:
    """Production path over sparse grid hits — identical walk to
    ``decode_w2ner`` (the dense port) without materializing the
    O(L²) grid; property-tested equal on random grids."""
    forward_dict: dict[int, list[int]] = {}
    head_dict: dict[int, set[int]] = {}
    ht_type_dict: dict[tuple[int, int], int] = {}

    for i, j in sorted(set(nnw_pairs)):
        if 0 <= i < j < length:
            forward_dict.setdefault(i, []).append(j)
    for head, tail, lab in sorted(set(thw_triples)):
        if 0 <= head <= tail < length and lab > 1:
            ht_type_dict[(head, tail)] = int(lab)
            head_dict.setdefault(head, set()).add(tail)

    predicts: list[list[int]] = []

    def find_entity(key: int, entity: list[int], tails: set[int]) -> None:
        entity.append(key)
        if key in tails:
            predicts.append(entity.copy())
        if key not in forward_dict:
            entity.pop()
            return
        for k in forward_dict[key]:
            find_entity(k, entity, tails)
        entity.pop()

    for head in head_dict:
        find_entity(head, [], head_dict[head])

    entities = set()
    for _entity in predicts:
        entities.add(
            (
                id2label[ht_type_dict[(_entity[0], _entity[-1])]],
                _entity[0],
                _entity[-1] + 1,
                "".join(text[i] for i in _entity),
            )
        )
    return entities
