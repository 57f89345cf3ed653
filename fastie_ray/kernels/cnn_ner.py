"""CNN (biaffine+conv) nested NER decode (reference semantics,
torch-free).

Reference: ``fastie/models/named_entity_recognition/cnn/
modeling_cnn.py:223-273`` plus the clash filter in
``cnn/decode_utils.py:131-154``:

1. sigmoid scores ``[L, L, C]`` are SYMMETRIZED
   (``(scores + scores.T) / 2``);
2. span candidates = upper-triangular cells whose max-label score ≥
   ``decode_thresh`` (0.5), sorted by confidence descending;
3. greedy clash filtering: a candidate is kept iff it doesn't overlap
   (partially, when ``allow_nested``; at all otherwise) any
   already-kept span;
4. each kept span's label = argmax over channels, re-checked against
   the threshold; spans are WORD-indexed — the reference slices the
   text directly (``text[s : e + 1]``).
"""

from __future__ import annotations

import numpy as np


def is_overlapped(chunk1: tuple, chunk2: tuple) -> bool:
    (_, s1, e1), (_, s2, e2) = chunk1, chunk2
    return s1 < e2 and s2 < e1


def is_nested(chunk1: tuple, chunk2: tuple) -> bool:
    (_, s1, e1), (_, s2, e2) = chunk1, chunk2
    return (s1 <= s2 and e2 <= e1) or (s2 <= s1 and e1 <= e2)


def is_clashed(chunk1: tuple, chunk2: tuple, allow_nested: bool = True) -> bool:
    if allow_nested:
        return is_overlapped(chunk1, chunk2) and not is_nested(chunk1, chunk2)
    return is_overlapped(chunk1, chunk2)


def filter_clashed_by_priority(chunks: list, allow_nested: bool = True) -> list:
    filtered_chunks: list = []
    for ck in chunks:
        if all(
            not is_clashed(ck, ex_ck, allow_nested=allow_nested)
            for ex_ck in filtered_chunks
        ):
            filtered_chunks.append(ck)
    return filtered_chunks


def decode_cnn(
    scores: np.ndarray,  # [L, L, C] sigmoid probabilities
    length: int,
    text: str,
    id2label: dict[int, str],
    decode_thresh: float = 0.5,
    allow_nested: bool = True,
) -> set[tuple[str, int, int, str]]:
    sym = (scores + scores.transpose(1, 0, 2)) / 2
    span_pred = sym.max(axis=-1)

    chunks, confidences = [], []
    for s in range(length):
        for e in range(s, length):
            conf = float(span_pred[s, e])
            if conf >= decode_thresh:
                chunks.append((True, s, e))
                confidences.append(conf)

    chunks = [ck for _, ck in sorted(zip(confidences, chunks), reverse=True)]
    chunks = filter_clashed_by_priority(chunks, allow_nested=allow_nested)

    entity_set = set()
    for _, s, e in chunks:
        score = sym[s, e]
        _type = int(score.argmax())
        if score[_type] >= decode_thresh:
            entity_set.add((id2label[_type], s, e + 1, text[s : e + 1]))
    return entity_set


def decode_cnn_sparse(
    hits,  # iterable of (label_id, s, e_incl, conf) WORD-indexed, post-symmetrization conf
    length: int,
    text: str,
    id2label: dict[int, str],
    decode_thresh: float = 0.5,
    allow_nested: bool = True,
) -> set[tuple[str, int, int, str]]:
    """Production path over sparse span hits — identical semantics to
    ``decode_cnn`` without the O(L²·C) dense tensor: background sigmoid
    cells sit far below ``decode_thresh`` so only the hit cells can be
    candidates; per cell the best-conf hit supplies the argmax label;
    candidates are sorted by ``(conf, (True, s, e))`` descending — the
    exact tie order of the dense port's ``sorted(zip(confidences,
    chunks), reverse=True)`` — then greedily clash-filtered."""
    best: dict[tuple[int, int], tuple[float, int]] = {}
    for label_id, s, e, conf in hits:
        if conf < decode_thresh or s > e or e >= length:
            continue
        cur = best.get((s, e))
        if cur is None or conf > cur[0]:
            best[(s, e)] = (float(conf), int(label_id))

    ranked = sorted(
        ((conf, (True, s, e), label) for (s, e), (conf, label) in best.items()),
        reverse=True,
    )
    chunks = filter_clashed_by_priority(
        [ck for _, ck, _ in ranked], allow_nested=allow_nested
    )
    kept = {ck for ck in chunks}
    return {
        (id2label[label], s, e + 1, text[s : e + 1])
        for conf, (flag, s, e), label in ranked
        if (flag, s, e) in kept
    }
