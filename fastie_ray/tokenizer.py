"""Deterministic character-level tokenizer.

Replaces the HF fast tokenizer for the sandbox scorer path with the
same *interface contract* the reference decode relies on
(``global_pointer/decode_utils.py:143-153``):

- sequence = [CLS] + one token per character + [SEP];
- ``offset_mapping[i] = (i-1, i)`` for character tokens, ``(0, 0)`` for
  CLS/SEP (exactly HF's convention for special tokens);
- ``seq_len = attention_mask.sum() = min(len(text), max_length-2) + 2``.

With this mapping a char span ``[cs, ce)`` corresponds to token head
``cs + 1`` and token tail ``ce`` — the arithmetic every decode kernel
and the featurizer share. A real transformer scorer would swap in an HF
fast tokenizer behind the same three outputs.
"""

from __future__ import annotations


class CharTokenizer:
    def __init__(self, max_length: int = 512):
        self.max_length = max_length

    def seq_len(self, text: str) -> int:
        return min(len(text), self.max_length - 2) + 2

    def offset_mapping(self, text: str) -> list[tuple[int, int]]:
        n = min(len(text), self.max_length - 2)
        return [(0, 0)] + [(i, i + 1) for i in range(n)] + [(0, 0)]

    @staticmethod
    def char_span_to_tokens(cs: int, ce: int) -> tuple[int, int]:
        """char span [cs, ce) → (head_token, tail_token), both inclusive."""
        return cs + 1, ce
