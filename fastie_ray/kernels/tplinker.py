"""TPLinker handshaking decode — NER and RE variants (reference
semantics, torch-free).

Reference:
- shaking-sequence → spot extraction (``get_spots_fr_shaking_tag``):
  ``fastie/models/named_entity_recognition/tplinker/modeling_tplinker.py:174-191``
  — the flattened upper-triangular index maps back to ``(pos1, pos2)``
  with ``pos1 <= pos2``;
- NER decode: ``modeling_tplinker.py:137-172`` — every spot above
  threshold is an entity of its tag, excluding reversed spans, CLS/SEP
  positions (``e[0] > e[1] or 0 in [e[0], e[1]] or e[0] >= l-1 or
  e[1] >= l-1``);
- RE decode: ``fastie/models/relation_extraction/tplinker/
  modeling_tplinker.py:149-244`` — tags are ``"{ent}=EH2ET"`` (entity
  head→tail), ``"{rel}=SH2OH"/"{rel}=OH2SH"`` (subject-head↔object-head)
  and ``"{rel}=ST2OT"/"{rel}=OT2ST"`` (tails); a triple is emitted when
  a head link connects two EH2ET entities whose tails are connected by
  a matching tail link.
"""

from __future__ import annotations

import itertools
from typing import Iterable, Sequence

import numpy as np


def shaking_idx2matrix_idx(seq_len: int) -> list[tuple[int, int]]:
    return [(s, e) for s in range(seq_len) for e in range(seq_len)[s:]]


def spots_from_shaking(
    shaking_scores: np.ndarray,  # [shaking_seq_len, num_tags]
    seq_len: int,
    decode_thresh: float = 0.0,
) -> list[tuple[int, int, int]]:
    """shaking scores → [(pos1, pos2, tag_idx)] above threshold."""
    idx_map = shaking_idx2matrix_idx(seq_len)
    spots = []
    for shaking_idx, tag_idx in zip(*np.where(shaking_scores > decode_thresh)):
        pos1, pos2 = idx_map[int(shaking_idx)]
        spots.append((pos1, pos2, int(tag_idx)))
    return spots


def decode_tplinker_ner(
    spots: Iterable[tuple[int, int, int]],
    seq_len: int,
    text: str,
    offset_mapping,
    id2label: dict[int, str],
) -> set[tuple[str, int, int, str]]:
    entities = set()
    for e in spots:
        tag = id2label[e[2]]
        if e[0] > e[1] or 0 in [e[0], e[1]] or e[0] >= seq_len - 1 or e[1] >= seq_len - 1:
            continue
        _start, _end = offset_mapping[e[0]][0], offset_mapping[e[1]][1]
        entities.add((tag, _start, _end, text[_start:_end]))
    return entities


def decode_tplinker_re(
    spots: Sequence[tuple[int, int, int]],
    seq_len: int,
    text: str,
    offset_mapping,
    id2label: dict[int, str],
) -> set[tuple[str, str, str]]:
    head_ind2entities: dict[int, list[dict]] = {}
    spoes: set[tuple[str, str, str]] = set()

    for sp in spots:
        tag = id2label[sp[2]]
        ent_type, link_type = tag.split("=")
        if (
            link_type != "EH2ET"
            or sp[0] > sp[1]
            or 0 in [sp[0], sp[1]]
            or sp[0] >= seq_len - 1
            or sp[1] >= seq_len - 1
        ):
            continue
        entity = {"type": ent_type, "tok_span": [sp[0], sp[1]]}
        head_ind2entities.setdefault(sp[0], []).append(entity)

    tail_link_memory_set = set()
    for sp in spots:
        tag = id2label[sp[2]]
        rel, link_type = tag.split("=")
        if link_type == "ST2OT":
            tail_link_memory_set.add((rel, sp[0], sp[1]))
        elif link_type == "OT2ST":
            tail_link_memory_set.add((rel, sp[1], sp[0]))

    for sp in spots:
        tag = id2label[sp[2]]
        rel, link_type = tag.split("=")
        if link_type == "SH2OH":
            subj_head_key, obj_head_key = sp[0], sp[1]
        elif link_type == "OH2SH":
            subj_head_key, obj_head_key = sp[1], sp[0]
        else:
            continue
        if subj_head_key not in head_ind2entities or obj_head_key not in head_ind2entities:
            continue
        subj_list = head_ind2entities[subj_head_key]
        obj_list = head_ind2entities[obj_head_key]
        for subj, obj in itertools.product(subj_list, obj_list):
            if (rel, subj["tok_span"][1], obj["tok_span"][1]) not in tail_link_memory_set:
                continue
            spoes.add(
                (
                    rel,
                    text[offset_mapping[subj["tok_span"][0]][0] : offset_mapping[subj["tok_span"][1]][1]],
                    text[offset_mapping[obj["tok_span"][0]][0] : offset_mapping[obj["tok_span"][1]][1]],
                )
            )
    return set(spoes)
