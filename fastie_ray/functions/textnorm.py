"""Pure scalar text functions shared by every stage.

Semantics match the reference (file:line cites are into /root/reference):

- ``cut_chinese_sent``: sentence splitter, reference
  ``fastie/models/named_entity_recognition/global_pointer/decode_utils.py:57-67``.
- ``dbc2sbc``: full-width → half-width normalizer, reference
  ``fastie/models/uie/decode_utils.py:118-130``.
- ``search``: first-occurrence substring locator, reference
  ``fastie/data/relation_extraction.py:25-29``.
- ``space_to_dash``: the model-input normalizer ``t.replace(" ", "-")``
  applied before tokenization so spaces don't shift span positions,
  reference ``global_pointer/decode_utils.py:138`` — the ORIGINAL text
  must always be kept for slicing entity surfaces.
- ``unify_prompt_name``: sorts classification options inside ``[...]``,
  reference ``fastie/data/uie/utils.py:13-23``.
"""

from __future__ import annotations

import re
from typing import List

_SENT_RE1 = re.compile(r"([。！？\?])([^”’])")
_SENT_RE2 = re.compile(r"(\.{6})([^”’])")
_SENT_RE3 = re.compile(r"(\…{2})([^”’])")
_SENT_RE4 = re.compile(r"([。！？\?][”’])([^，。！？\?])")


def cut_chinese_sent(para: str) -> List[str]:
    """Split Chinese text into sentences on 。！？? (quote-aware)."""
    para = _SENT_RE1.sub(r"\1\n\2", para)
    para = _SENT_RE2.sub(r"\1\n\2", para)
    para = _SENT_RE3.sub(r"\1\n\2", para)
    para = _SENT_RE4.sub(r"\1\n\2", para)
    para = para.rstrip()
    return para.split("\n")


def dbc2sbc(s: str) -> str:
    """Full-width (DBC) characters → half-width (SBC)."""
    rs = []
    for char in s:
        code = ord(char)
        if code == 0x3000:
            code = 0x0020
        else:
            code -= 0xFEE0
        if not (0x0021 <= code <= 0x7E):
            rs.append(char)
        else:
            rs.append(chr(code))
    return "".join(rs)


def search(pattern: str, sequence: str) -> int:
    """Index of the first occurrence of ``pattern`` in ``sequence``, else -1."""
    n = len(pattern)
    for i in range(len(sequence)):
        if sequence[i : i + n] == pattern:
            return i
    return -1


def space_to_dash(text: str) -> str:
    """Model-input normalizer; never applied to stored/output text."""
    return text.replace(" ", "-")


_PROMPT_RE = re.compile(r"\[.*?\]$")


def unify_prompt_name(prompt: str) -> str:
    """Sort the comma-separated options inside a trailing ``[...]``."""
    if _PROMPT_RE.search(prompt):
        prompt_prefix = prompt[: prompt.find("[", 1)]
        cls_options = _PROMPT_RE.search(prompt).group()[1:-1].split(",")
        cls_options = ",".join(sorted(set(cls_options)))
        return f"{prompt_prefix}[{cls_options}]"
    return prompt
