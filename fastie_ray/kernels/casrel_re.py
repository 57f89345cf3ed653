"""CasRel cascade relation decode (reference semantics, torch-free).

Reference: ``fastie/models/relation_extraction/casrel/
modeling_casrel.py:157-245``:

1. ``extract_subjects`` (158-179): per-token sigmoid subject
   start/end probabilities ``[L, 2]``; start positions above
   ``start_thresh`` (0.5), excluding ``s == 0 or s > l-2``; pair each
   start with the NEAREST end ``e >= s`` above ``end_thresh``
   (就近原则), dropping it if ``e > l-2``.
2. ``extract_spoes`` (221-245): per extracted subject, a conditional
   object/predicate pointer grid ``[L, P, 2]``; every object start
   ``(pos, predicate)`` above threshold (excluding ``pos == 0`` or
   ``pos > l-2``) pairs with the first end ``(pos2 >= pos, same
   predicate)`` with ``pos2 <= l-2`` (break = nearest-end), emitting
   ``(id2predicate[p], text[sub_span], text[obj_span])``.

``decode_casrel_dense`` is the line-for-line port (test oracle; the
object grid for each subject comes from a caller-supplied function,
mirroring the conditional second forward pass).
``decode_casrel_sparse`` is the production path over sparse hits with
identical nearest-end semantics.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

import numpy as np


def extract_subjects(
    subject_preds: np.ndarray,  # [L, 2] sigmoid probs
    seq_len: int,
    start_thresh: float = 0.5,
    end_thresh: float = 0.5,
) -> list[tuple[int, int]]:
    start = np.where(subject_preds[:, 0] > start_thresh)[0]
    end = np.where(subject_preds[:, 1] > end_thresh)[0]
    subjects = []
    for s in start:
        if s == 0 or s > seq_len - 2:  # exclude [CLS]/[SEP]/[PAD]
            continue
        e = end[end >= s]
        if len(e) > 0:
            e = e[0]  # nearest-end
            if e > seq_len - 2:
                continue
            subjects.append((int(s), int(e)))
    return subjects


def decode_casrel_dense(
    subject_preds: np.ndarray,  # [L, 2]
    object_preds_fn: Callable[[list[tuple[int, int]]], np.ndarray],  # → [n_subj, L, P, 2]
    seq_len: int,
    text: str,
    offset_mapping,
    id2predicate: dict[int, str],
    start_thresh: float = 0.5,
    end_thresh: float = 0.5,
) -> set[tuple[str, str, str]]:
    subjects = extract_subjects(subject_preds, seq_len, start_thresh, end_thresh)
    spoes: set[tuple[str, str, str]] = set()
    if not subjects:
        return spoes
    object_preds = object_preds_fn(subjects)
    for subject, object_pred in zip(subjects, object_preds):
        start = np.where(object_pred[:, :, 0] > start_thresh)
        end = np.where(object_pred[:, :, 1] > end_thresh)
        for _start, predicate1 in zip(*start):
            _start, predicate1 = int(_start), int(predicate1)
            if _start == 0 or _start > seq_len - 2:
                continue
            for _end, predicate2 in zip(*end):
                _end, predicate2 = int(_end), int(predicate2)
                if _start <= _end <= seq_len - 2 and predicate1 == predicate2:
                    label = id2predicate[predicate1]
                    s_h = offset_mapping[subject[0]][0]
                    s_t = offset_mapping[subject[1]][1]
                    o_h = offset_mapping[_start][0]
                    o_t = offset_mapping[_end][1]
                    spoes.add((label, text[s_h:s_t], text[o_h:o_t]))
                    break  # nearest-end
    return spoes


def decode_casrel_sparse(
    subject_starts: Iterable[int],
    subject_ends: Iterable[int],
    object_hits: dict[tuple[int, int], list[tuple[int, int, int]]],
    # subject span → [(pred_id, obj_start_tok, obj_end_tok)]
    seq_len: int,
    text: str,
    offset_mapping,
    id2predicate: dict[int, str],
) -> set[tuple[str, str, str]]:
    """Sparse production path. ``subject_starts``/``subject_ends`` are
    token positions above threshold; object hits are keyed by the
    resolved subject span. Nearest-end pairing identical to the dense
    port (sorted scans + first match)."""
    starts = sorted(set(subject_starts))
    ends = np.asarray(sorted(set(subject_ends)), dtype=np.int64)
    subjects = []
    for s in starts:
        if s == 0 or s > seq_len - 2:
            continue
        cand = ends[ends >= s]
        if len(cand) > 0:
            e = int(cand[0])
            if e > seq_len - 2:
                continue
            subjects.append((s, e))

    spoes: set[tuple[str, str, str]] = set()
    for subj in subjects:
        hits = object_hits.get(subj, [])
        # group per predicate: starts and ends, then nearest-end per start
        ostarts: dict[int, list[int]] = {}
        oends: dict[int, list[int]] = {}
        for p, os_, oe_ in hits:
            ostarts.setdefault(p, []).append(os_)
            oends.setdefault(p, []).append(oe_)
        for p, slist in ostarts.items():
            elist = sorted(oends.get(p, []))
            for os_ in sorted(slist):
                if os_ == 0 or os_ > seq_len - 2:
                    continue
                for oe_ in elist:
                    if os_ <= oe_ <= seq_len - 2:
                        s_h = offset_mapping[subj[0]][0]
                        s_t = offset_mapping[subj[1]][1]
                        o_h = offset_mapping[os_][0]
                        o_t = offset_mapping[oe_][1]
                        spoes.add((id2predicate[p], text[s_h:s_t], text[o_h:o_t]))
                        break
    return spoes
