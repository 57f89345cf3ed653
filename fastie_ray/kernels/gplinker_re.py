"""GPLinker joint relation-extraction decode (reference semantics).

Reference: ``fastie/models/relation_extraction/gplinker/
modeling_gplinker.py:164-213`` — three score heads:

1. entity head ``[2, L, L]``: channel 0 → subject spans, channel 1 →
   object spans, threshold ``decode_thresh`` (0.0), excluding
   ``h >= l-1 or t >= l-1 or 0 in [h, t]``;
2. head-pair ``[P, L, L]``: predicate scores between subject-head and
   object-head tokens;
3. tail-pair ``[P, L, L]``: between subject-tail and object-tail.

Decode: for every (subject span, object span) in the cartesian product,
predicates = {p : head[p, sh, oh] > t} ∩ {p : tail[p, st, ot] > t};
emit ``(id2predicate[p], text[sub_span], text[obj_span])``.

``decode_gplinker_dense`` is the line-for-line port (test oracle);
``decode_gplinker_sparse`` is the production path over sparse hits with
identical product-∩ semantics.
"""

from __future__ import annotations

import itertools
from typing import Iterable, Sequence

import numpy as np


def decode_gplinker_dense(
    entity_logits: np.ndarray,  # [2, L, L]
    head_logits: np.ndarray,  # [P, L, L]
    tail_logits: np.ndarray,  # [P, L, L]
    seq_len: int,
    text: str,
    offset_mapping: Sequence[tuple[int, int]],
    id2predicate: dict[int, str],
    decode_thresh: float = 0.0,
) -> set[tuple[str, str, str]]:
    subjects, objects = set(), set()
    for r, h, t in zip(*np.where(entity_logits > decode_thresh)):
        r, h, t = int(r), int(h), int(t)
        if h >= (seq_len - 1) or t >= (seq_len - 1) or 0 in [h, t]:
            continue
        if r == 0:
            subjects.add((h, t))
        else:
            objects.add((h, t))

    spoes = set()
    for (sh, st), (oh, ot) in itertools.product(subjects, objects):
        p1s = np.where(head_logits[:, sh, oh] > decode_thresh)[0]
        p2s = np.where(tail_logits[:, st, ot] > decode_thresh)[0]
        ps = set(p1s) & set(p2s)
        for p in ps:
            spoes.add(
                (
                    id2predicate[int(p)],
                    text[offset_mapping[sh][0] : offset_mapping[st][1]],
                    text[offset_mapping[oh][0] : offset_mapping[ot][1]],
                )
            )
    return spoes


def decode_gplinker_sparse(
    subject_hits: Iterable[tuple[int, int]],  # (head_tok, tail_tok) above thresh
    object_hits: Iterable[tuple[int, int]],
    head_hits: Iterable[tuple[int, int, int]],  # (pred_id, subj_head, obj_head)
    tail_hits: Iterable[tuple[int, int, int]],  # (pred_id, subj_tail, obj_tail)
    seq_len: int,
    text: str,
    offset_mapping: Sequence[tuple[int, int]],
    id2predicate: dict[int, str],
) -> set[tuple[str, str, str]]:
    def _ok(h: int, t: int) -> bool:
        return not (h >= (seq_len - 1) or t >= (seq_len - 1) or 0 in [h, t])

    subjects = {(h, t) for h, t in subject_hits if _ok(h, t)}
    objects = {(h, t) for h, t in object_hits if _ok(h, t)}
    heads: dict[tuple[int, int], set[int]] = {}
    for p, sh, oh in head_hits:
        heads.setdefault((sh, oh), set()).add(p)
    tails: dict[tuple[int, int], set[int]] = {}
    for p, st, ot in tail_hits:
        tails.setdefault((st, ot), set()).add(p)

    # head-hit-driven iteration: the dense port's cartesian product
    # over subjects × objects (itertools.product) only ever emits when
    # a head hit exists for (sh, oh), so iterating the (sparse) head
    # hits and expanding to the matching span tails is the identical
    # set at O(head_hits · tails-per-span) instead of O(|S|·|O|) —
    # measured ~50% of scorer CPU on dense-mention chunks.
    subj_by_head: dict[int, list[int]] = {}
    for h, t in subjects:
        subj_by_head.setdefault(h, []).append(t)
    obj_by_head: dict[int, list[int]] = {}
    for h, t in objects:
        obj_by_head.setdefault(h, []).append(t)

    spoes = set()
    empty: set[int] = set()
    for (sh, oh), ps_h in heads.items():
        for st in subj_by_head.get(sh, ()):
            for ot in obj_by_head.get(oh, ()):
                ps = ps_h & tails.get((st, ot), empty)
                for p in ps:
                    spoes.add(
                        (
                            id2predicate[int(p)],
                            text[offset_mapping[sh][0] : offset_mapping[st][1]],
                            text[offset_mapping[oh][0] : offset_mapping[ot][1]],
                        )
                    )
    return spoes
