"""UIE pointer-pair span utilities (reference semantics, torch-free).

Reference: ``fastie/models/uie/decode_utils.py:38-115`` —

- ``get_bool_ids_greater_than``: threshold scan over per-token
  probabilities (optionally carrying the probability);
- ``get_span``: two-pointer nearest pairing of start/end indices into
  non-overlapping ``(start, end)`` couples.

These are the primitive decode of the UIE start/end sigmoid pointer
model (``modeling_uie.py:41-162``); the schema-tree traversal built on
top is the iterative pipeline of SURVEY §2.4 J3.
"""

from __future__ import annotations

import numpy as np


def get_bool_ids_greater_than(probs, limit: float = 0.5, return_prob: bool = False):
    probs = np.array(probs)
    dim_len = len(probs.shape)
    if dim_len > 1:
        return [get_bool_ids_greater_than(p, limit, return_prob) for p in probs]
    # vectorized threshold scan — output identical to the reference's
    # per-element loop (indices in ascending order)
    idx = np.nonzero(probs > limit)[0]
    if return_prob:
        return [(int(i), probs[int(i)]) for i in idx]
    return [int(i) for i in idx]


def get_span(start_ids, end_ids, with_prob: bool = False):
    """Pair start/end indices nearest-first into a span set; every id is
    used at most once (no overlap assumed)."""
    if with_prob:
        start_ids = sorted(start_ids, key=lambda x: x[0])
        end_ids = sorted(end_ids, key=lambda x: x[0])
    else:
        start_ids = sorted(start_ids)
        end_ids = sorted(end_ids)

    start_pointer = 0
    end_pointer = 0
    len_start = len(start_ids)
    len_end = len(end_ids)
    couple_dict = {}

    while start_pointer < len_start and end_pointer < len_end:
        if with_prob:
            start_id = start_ids[start_pointer][0]
            end_id = end_ids[end_pointer][0]
        else:
            start_id = start_ids[start_pointer]
            end_id = end_ids[end_pointer]

        if start_id == end_id:
            couple_dict[end_ids[end_pointer]] = start_ids[start_pointer]
            start_pointer += 1
            end_pointer += 1
            continue
        if start_id < end_id:
            couple_dict[end_ids[end_pointer]] = start_ids[start_pointer]
            start_pointer += 1
            continue
        if start_id > end_id:
            end_pointer += 1
            continue

    return {(couple_dict[end], end) for end in couple_dict}
