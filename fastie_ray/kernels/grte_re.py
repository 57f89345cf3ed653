"""GRTE table-filling relation decode (reference semantics, torch-free).

Reference: ``fastie/models/relation_extraction/grte/
modeling_grte.py:94-97,167-232`` — the model argmaxes a
``[L, L, R]`` table over 8 tags
``["N/A", "SS", "MSH", "MST", "SMH", "SMT", "MMH", "MMT"]``
(single/multi-token subject × single/multi-token object,
head/tail markers). Cells with ``s/e`` hitting CLS/SEP/PAD are
excluded; then per predicate:

- ``SS`` (1): single-token subject at s, single-token object at e;
- ``MSH`` (2) pairs with ``MST`` (3) where ``s_ > s and e_ == e``
  (multi-token subject completion);
- ``SMH`` (4) pairs with ``SMT`` (5) where ``s_ == s and e_ > e``
  (multi-token object completion);
- ``MMH`` (6) pairs with ``MMT`` (7) where ``s_ > s and e_ > e``;

each completion takes the FIRST matching tail cell (``break``).
"""

from __future__ import annotations

import numpy as np

GRTE_TAGS = ["N/A", "SS", "MSH", "MST", "SMH", "SMT", "MMH", "MMT"]


def decode_grte(
    table: np.ndarray,  # [L, L, R] int tags (already argmaxed)
    seq_len: int,
    text: str,
    offset_mapping,
    id2predicate: dict[int, str],
) -> set[tuple[str, str, str]]:
    tmp = []
    for s, e, r in zip(*np.where(table != 0)):
        s, e, r = int(s), int(e), int(r)
        if seq_len - 1 <= s or seq_len - 1 <= e or 0 in [s, e]:
            continue
        tmp.append((s, e, r))

    spoes = set()
    for s, e, r in tmp:
        tag = int(table[s, e, r])
        if tag == 1:  # SS
            spoes.add(
                (
                    id2predicate[r],
                    text[offset_mapping[s][0] : offset_mapping[s][1]],
                    text[offset_mapping[e][0] : offset_mapping[e][1]],
                )
            )
        elif tag == 4:  # SMH → find SMT with same subject, later object end
            for s_, e_, r_ in tmp:
                if r == r_ and int(table[s_, e_, r_]) == 5 and s_ == s and e_ > e:
                    spoes.add(
                        (
                            id2predicate[r],
                            text[offset_mapping[s][0] : offset_mapping[s][1]],
                            text[offset_mapping[e][0] : offset_mapping[e_][1]],
                        )
                    )
                    break
        elif tag == 6:  # MMH → MMT with later subject AND object ends
            for s_, e_, r_ in tmp:
                if r == r_ and int(table[s_, e_, r_]) == 7 and s_ > s and e_ > e:
                    spoes.add(
                        (
                            id2predicate[r],
                            text[offset_mapping[s][0] : offset_mapping[s_][1]],
                            text[offset_mapping[e][0] : offset_mapping[e_][1]],
                        )
                    )
                    break
        elif tag == 2:  # MSH → MST with later subject end, same object
            for s_, e_, r_ in tmp:
                if r == r_ and int(table[s_, e_, r_]) == 3 and s_ > s and e_ == e:
                    spoes.add(
                        (
                            id2predicate[r],
                            text[offset_mapping[s][0] : offset_mapping[s_][1]],
                            text[offset_mapping[e][0] : offset_mapping[e][1]],
                        )
                    )
                    break
    return spoes


def decode_grte_sparse(
    cells,  # iterable of (s, e, pred_id, tag) — the nonzero table cells
    seq_len: int,
    text: str,
    offset_mapping,
    id2predicate: dict[int, str],
) -> set[tuple[str, str, str]]:
    """Production path over sparse table cells — identical semantics to
    ``decode_grte`` without the O(L²·R) argmaxed table: the cell list
    is sorted to row-major ``(s, e, r)`` order so the FIRST-matching-
    tail ``break`` resolves exactly as ``np.where``'s scan order in the
    dense port."""
    tag_at: dict[tuple[int, int, int], int] = {}
    for s, e, r, tag in cells:
        s, e, r, tag = int(s), int(e), int(r), int(tag)
        if tag == 0 or seq_len - 1 <= s or seq_len - 1 <= e or 0 in [s, e]:
            continue
        tag_at[(s, e, r)] = tag
    tmp = sorted(tag_at)

    spoes = set()
    for s, e, r in tmp:
        tag = tag_at[(s, e, r)]
        if tag == 1:  # SS
            spoes.add(
                (
                    id2predicate[r],
                    text[offset_mapping[s][0] : offset_mapping[s][1]],
                    text[offset_mapping[e][0] : offset_mapping[e][1]],
                )
            )
        elif tag == 4:  # SMH → first SMT, same subject, later object end
            for s_, e_, r_ in tmp:
                if r == r_ and tag_at[(s_, e_, r_)] == 5 and s_ == s and e_ > e:
                    spoes.add(
                        (
                            id2predicate[r],
                            text[offset_mapping[s][0] : offset_mapping[s][1]],
                            text[offset_mapping[e][0] : offset_mapping[e_][1]],
                        )
                    )
                    break
        elif tag == 6:  # MMH → first MMT, later subject AND object ends
            for s_, e_, r_ in tmp:
                if r == r_ and tag_at[(s_, e_, r_)] == 7 and s_ > s and e_ > e:
                    spoes.add(
                        (
                            id2predicate[r],
                            text[offset_mapping[s][0] : offset_mapping[s_][1]],
                            text[offset_mapping[e][0] : offset_mapping[e_][1]],
                        )
                    )
                    break
        elif tag == 2:  # MSH → first MST, later subject end, same object
            for s_, e_, r_ in tmp:
                if r == r_ and tag_at[(s_, e_, r_)] == 3 and s_ > s and e_ == e:
                    spoes.add(
                        (
                            id2predicate[r],
                            text[offset_mapping[s][0] : offset_mapping[s_][1]],
                            text[offset_mapping[e][0] : offset_mapping[e][1]],
                        )
                    )
                    break
    return spoes
