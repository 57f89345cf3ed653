"""OneRel single-pass tag-cube relation decode (reference semantics,
torch-free).

Reference: ``fastie/models/relation_extraction/onerel/
modeling_onerel.py:145-187`` — the model argmaxes a ``[P, L, L]`` tag
cube with tags ``0='-'``, ``1=HB-TB`` (subject-head, object-head),
``2=HB-TE`` (subject-head, object-tail), ``3=HE-TE`` (subject-tail,
object-tail). Decode collects the three tag dictionaries (excluding
``h >= l-1 or t >= l-1 or 0 in [h, t]``), then for every predicate
present in all three: for each ``(sh, oh)`` and ``(st, ot)`` with
``sh <= st and oh <= ot`` and ``(sh, ot)`` present in the HB-TE list,
emit ``(id2predicate[p], text[sh:st], text[oh:ot])`` char-sliced via
``offset_mapping``.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np


def _decode_from_dicts(
    hs: dict[int, list[tuple[int, int]]],
    hts: dict[int, list[tuple[int, int]]],
    ts: dict[int, list[tuple[int, int]]],
    text: str,
    offset_mapping,
    id2predicate: dict[int, str],
) -> set[tuple[str, str, str]]:
    spoes: set[tuple[str, str, str]] = set()
    for p in hs.keys() & ts.keys() & hts.keys():
        ht_list = hts[p]
        for sh, oh in hs[p]:
            for st, ot in ts[p]:
                if sh <= st and oh <= ot:
                    if (sh, ot) in ht_list:
                        spoes.add(
                            (
                                id2predicate[p],
                                text[offset_mapping[sh][0] : offset_mapping[st][1]],
                                text[offset_mapping[oh][0] : offset_mapping[ot][1]],
                            )
                        )
    return spoes


def decode_onerel_dense(
    tags: np.ndarray,  # [P, L, L] int tags (already argmaxed)
    seq_len: int,
    text: str,
    offset_mapping,
    id2predicate: dict[int, str],
) -> set[tuple[str, str, str]]:
    hs: dict[int, list[tuple[int, int]]] = {}
    hts: dict[int, list[tuple[int, int]]] = {}
    ts: dict[int, list[tuple[int, int]]] = {}
    for obj, tag in [(hs, 1), (hts, 2), (ts, 3)]:
        for p, h, t in zip(*np.where(tags == tag)):
            p, h, t = int(p), int(h), int(t)
            if h >= (seq_len - 1) or t >= (seq_len - 1) or 0 in [h, t]:
                continue
            obj.setdefault(p, []).append((h, t))
    return _decode_from_dicts(hs, hts, ts, text, offset_mapping, id2predicate)


def decode_onerel_sparse(
    hb_tb: Iterable[tuple[int, int, int]],  # (pred_id, subj_head, obj_head)
    hb_te: Iterable[tuple[int, int, int]],  # (pred_id, subj_head, obj_tail)
    he_te: Iterable[tuple[int, int, int]],  # (pred_id, subj_tail, obj_tail)
    seq_len: int,
    text: str,
    offset_mapping,
    id2predicate: dict[int, str],
) -> set[tuple[str, str, str]]:
    def build(hits) -> dict[int, list[tuple[int, int]]]:
        d: dict[int, list[tuple[int, int]]] = {}
        for p, h, t in hits:
            if h >= (seq_len - 1) or t >= (seq_len - 1) or 0 in [h, t]:
                continue
            d.setdefault(p, []).append((h, t))
        return d

    return _decode_from_dicts(
        build(hb_tb), build(hb_te), build(he_te), text, offset_mapping, id2predicate
    )
