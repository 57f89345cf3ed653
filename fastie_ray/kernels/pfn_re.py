"""PFN (partition-filter network) relation decode (reference
semantics, torch-free).

Reference: ``fastie/models/relation_extraction/pfn/
modeling_pfn.py:154-202`` — the decode is structurally IDENTICAL to
GPLinker's (entity channels 0/1 → subjects/objects, per-pair
head/tail predicate intersection) but over sigmoid probabilities with
``decode_thresh`` defaulting to **0.5** instead of 0.0 raw logits.
Implemented by delegation to the GPLinker kernel with the PFN
threshold.
"""

from __future__ import annotations

import numpy as np

from fastie_ray.kernels.gplinker_re import decode_gplinker_dense

PFN_DECODE_THRESH = 0.5


def decode_pfn(
    ner_score: np.ndarray,  # [2, L, L] sigmoid probs
    re_head_score: np.ndarray,  # [P, L, L]
    re_tail_score: np.ndarray,  # [P, L, L]
    seq_len: int,
    text: str,
    offset_mapping,
    id2predicate: dict[int, str],
    decode_thresh: float = PFN_DECODE_THRESH,
) -> set[tuple[str, str, str]]:
    return decode_gplinker_dense(
        ner_score,
        re_head_score,
        re_tail_score,
        seq_len,
        text,
        offset_mapping,
        id2predicate,
        decode_thresh=decode_thresh,
    )
