"""BIO/BIOES sequence-label chunking — CRF / Cascade-CRF NER decode
(reference semantics, torch-free).

Reference: ``fastie/models/named_entity_recognition/crf/decode_utils.py:24-97``
(``get_entities`` / ``start_of_chunk`` / ``end_of_chunk``). The CRF
models Viterbi-decode a tag sequence and then chunk it with exactly
these rules (``modeling_crf.py:146-172``); the chunker itself is pure
and ported line-for-line here. Spans are **token-index inclusive**
``(type, start, end)`` exactly as the reference returns them.
"""

from __future__ import annotations

from typing import List, Tuple


def end_of_chunk(prev_tag: str, tag: str, prev_type: str, type_: str) -> bool:
    chunk_end = False
    if (
        prev_tag in {"B", "I"}
        and tag in {"B", "S", "O"}
        or prev_tag not in ["B", "I"]
        and prev_tag in {"E", "S"}
    ):
        chunk_end = True
    if prev_tag != "O" and prev_tag != "." and prev_type != type_:
        chunk_end = True
    return chunk_end


def start_of_chunk(prev_tag: str, tag: str, prev_type: str, type_: str) -> bool:
    chunk_start = False
    if tag in {"B", "S"}:
        chunk_start = True
    if prev_tag in {"E", "S", "O"} and tag in {"E", "I"}:
        chunk_start = True
    if tag != "O" and tag != "." and prev_type != type_:
        chunk_start = True
    return chunk_start


def get_entities(
    seq: List[str], *, suffix: bool = False
) -> List[Tuple[str, int, int]]:
    """Chunk a BIO/BIOES tag sequence into (type, start, end) spans.

    >>> get_entities(['B-PER', 'I-PER', 'O', 'B-LOC'])
    [('PER', 0, 1), ('LOC', 3, 3)]
    """
    prev_tag = "O"
    prev_type = ""
    begin_offset = 0
    chunks: List[Tuple[str, int, int]] = []
    for i, chunk in enumerate(seq + ["O"]):
        if suffix:
            tag = chunk[-1]
            type_ = chunk.split("-")[0]
        else:
            tag = chunk[0]
            type_ = chunk.split("-")[-1]

        if end_of_chunk(prev_tag, tag, prev_type, type_):
            chunks.append((prev_type, begin_offset, i - 1))
        if start_of_chunk(prev_tag, tag, prev_type, type_):
            begin_offset = i
        prev_tag = tag
        prev_type = type_

    return chunks


def decode_bio(
    tags: List[str],
    text: str,
    offset_mapping,
) -> set[tuple[str, int, int, str]]:
    """Tag sequence (already Viterbi/argmax-decoded, aligned to tokens
    incl. CLS at index 0) → char-span entity set, the CRF models' decode
    contract (``modeling_crf.py:146-172``): chunk with ``get_entities``
    then map token spans to char spans via ``offset_mapping`` and slice
    the ORIGINAL text."""
    out = set()
    for label, ts, te in get_entities(tags):
        if not label:
            continue
        cs, ce = offset_mapping[ts][0], offset_mapping[te][1]
        if cs == ce:
            continue
        out.add((label, cs, ce, text[cs:ce]))
    return out
