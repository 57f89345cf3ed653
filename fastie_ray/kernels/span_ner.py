"""Span-pointer NER decode (reference semantics, torch-free).

Reference: ``fastie/models/named_entity_recognition/span/
modeling_span.py:133-168`` — start/end label sequences are argmaxed
per token; for every start position ``i`` with nonzero label ``s``
(excluding CLS ``i==0`` and positions ``>= l-1``), scan forward for the
NEAREST end position with the SAME label (``s == e``, 就近原则) and
emit ``(id2label[s], char_start, char_end, text[cs:ce])``.
"""

from __future__ import annotations

from typing import Sequence


def decode_span(
    start_labels: Sequence[int],
    end_labels: Sequence[int],
    seq_len: int,
    text: str,
    offset_mapping,
    id2label: dict[int, str],
) -> set[tuple[str, int, int, str]]:
    decode_label = set()
    for i, s in enumerate(start_labels):
        s = int(s)
        if s == 0 or i >= seq_len - 1 or i == 0:
            continue
        for j, e in enumerate(end_labels[i:]):
            e = int(e)
            if i + j >= seq_len - 1:
                continue
            if s == e:
                _start, _end = offset_mapping[i][0], offset_mapping[i + j][1]
                decode_label.add((id2label[s], _start, _end, text[_start:_end]))
                break
    return decode_label
