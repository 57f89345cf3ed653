"""Document chunker — the reference ``auto_splitter`` as a Ray Data stage.

Reference semantics (``fastie/models/named_entity_recognition/
global_pointer/decode_utils.py:70-106``, invoked with
``max_predict_len = max_length - 2`` at ``:132-137``):

- if ``split_sentence``, first split with ``cut_chinese_sent``;
- each piece ≤ ``max_text_len`` is kept whole; longer pieces are cut
  into fixed-width slices ``sen[i : i + max_text_len]``;
- the reference's in-memory ``input_mapping`` dict becomes explicit
  columns ``(url, chunk_id, chunk_offset, chunk_text)`` where
  ``chunk_offset`` is the cumulative length of this document's prior
  chunks — exactly the ``offset`` the reference ``_auto_joiner``
  accumulates (``decode_utils.py:208-229``), so span rebase is
  ``start + chunk_offset``.

Note the reference quirk we reproduce deliberately: with sentence
splitting, ``cut_chinese_sent`` rstrips the paragraph and drops the
inserted newlines, so ``chunk_offset`` is the offset into the
*concatenation of chunks*, not necessarily into the raw document.

This stage is a stateless, vectorized ``map_batches`` (one input row →
N output rows); at 100 TB it re-balances skew for free because every
output chunk is ≤ ``max_text_len`` chars (SURVEY §4 "Skew").
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from fastie_ray.functions.textnorm import cut_chinese_sent

if TYPE_CHECKING:
    import ray.data

DEFAULT_MAX_LENGTH = 512  # reference predict default, decode_utils.py:125


def split_text(text: str, max_text_len: int, split_sentence: bool = False) -> list[str]:
    """Chunks for ONE document; boundary-identical to the reference
    ``auto_splitter`` (its flat ``short_input_texts`` restricted to one
    input)."""
    sens = cut_chinese_sent(text) if split_sentence else [text]
    out: list[str] = []
    for sen in sens:
        lens = len(sen)
        if lens <= max_text_len:
            out.append(sen)
        else:
            out.extend(sen[i : i + max_text_len] for i in range(0, lens, max_text_len))
    return out


def auto_splitter(
    input_texts: list[str], max_text_len: int, split_sentence: bool = False
) -> tuple[list[str], dict[int, list[int]]]:
    """Reference-shaped API (returns the flat chunk list + input_mapping);
    used by the in-process test oracle. Production uses ``chunk_pages``."""
    input_mapping: dict[int, list[int]] = {}
    short_input_texts: list[str] = []
    for cnt_org, text in enumerate(input_texts):
        chunks = split_text(text, max_text_len, split_sentence)
        start = len(short_input_texts)
        short_input_texts.extend(chunks)
        input_mapping.setdefault(cnt_org, []).extend(range(start, len(short_input_texts)))
    return short_input_texts, input_mapping


class ChunkPages:
    """``map_batches`` UDF: pages(text) → chunks table (1→N rows)."""

    def __init__(self, max_length: int = DEFAULT_MAX_LENGTH, split_sentence: bool = False):
        # reference: max_predict_len = max_length - 2 (CLS/SEP budget)
        self.max_text_len = max_length - 2
        self.split_sentence = split_sentence

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = (
            batch["lang"].to_pylist() if "lang" in batch.column_names else [""] * len(urls)
        )
        out_url: list[str] = []
        out_cid: list[int] = []
        out_off: list[int] = []
        out_txt: list[str] = []
        out_lang: list[str] = []
        for url, text, lang in zip(urls, texts, langs):
            chunks = split_text(text or "", self.max_text_len, self.split_sentence)
            offset = 0
            for cid, ch in enumerate(chunks):
                out_url.append(url)
                out_cid.append(cid)
                out_off.append(offset)
                out_txt.append(ch)
                out_lang.append(lang)
                offset += len(ch)
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "chunk_id": pa.array(np.asarray(out_cid, dtype=np.int32)),
                "chunk_offset": pa.array(np.asarray(out_off, dtype=np.int32)),
                "chunk_text": pa.array(out_txt, pa.string()),
                "lang": pa.array(out_lang, pa.string()),
            }
        )


def chunk_pages(
    ds: "ray.data.Dataset",
    max_length: int = DEFAULT_MAX_LENGTH,
    split_sentence: bool = False,
    batch_size: int | None = None,
) -> "ray.data.Dataset":
    """pages (url, text, lang) → chunks (url, chunk_id, chunk_offset,
    chunk_text, lang)."""
    return ds.map_batches(
        ChunkPages(max_length=max_length, split_sentence=split_sentence),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
