"""Overlapping passage windowing — the RAG / dense-retrieval chunking
pass: slide a fixed-size character window with stride < size so every
span of text is covered by at least one passage (unlike the KG path's
exact non-overlapping chunker in ``stages.chunk``, whose offsets must
match the reference bit-for-bit).

Pure streaming expansion (``map_batches``; no exchange, no state):
per doc, window starts are ``0, stride, 2·stride, …`` while
``start < max(len, 1)``, each passage ``text[start : start + size]``.
Short docs yield exactly one window at start 0. Deterministic and
SQL-reproducible via ``unnest(range(0, n_windows))`` + ``substr``.

Passage text can be heavy downstream; ``emit="hash"`` ships only the
md5 of each passage (lineage-checkable, 16 bytes) while ``emit="text"``
carries the slice for an actual embedding stage.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def passage_windows(
    ds: "ray.data.Dataset",
    size: int = 256,
    stride: int = 128,
    emit: str = "hash",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(doc_id, win_id, start, n_chars, passage_md5 | passage)."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if emit not in ("hash", "text"):
        raise ValueError(f"emit must be hash|text, got {emit!r}")

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        ids, wins, starts, texts = [], [], [], []
        for i, t in zip(df[id_col], df[text_col]):
            n = len(t)
            # windows start strictly below len (or the single 0 window)
            k = 0
            while k == 0 or k * stride < n:
                s = k * stride
                ids.append(i)
                wins.append(k)
                starts.append(s)
                texts.append(t[s : s + size])
                k += 1
        out = pd.DataFrame(
            {
                id_col: pd.Series(ids, dtype="int64"),
                "win_id": pd.Series(wins, dtype="int64"),
                "start": pd.Series(starts, dtype="int64"),
            }
        )
        out["n_chars"] = pd.Series([len(x) for x in texts], dtype="int64")
        if emit == "hash":
            out["passage_md5"] = [
                hashlib.md5(x.encode()).hexdigest() for x in texts
            ]
        else:
            out["passage"] = texts
        return out

    return ds.map_batches(expand, batch_format="pandas")
