"""Robustness tests: oversized documents and astral-plane Unicode
through the hot pipeline stages — the inputs a real crawl shard WILL
contain (one 5 MB page, emoji, combining marks) and that must neither
crash an actor nor skew a batch beyond worker memory."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def test_multi_megabyte_doc_through_extract_chunk():
    from fastie_ray.stages.chunk import chunk_pages
    from fastie_ray.stages.extract import extract_text

    big = ("lorem ipsum dolor sit amet " * 40 + "\n") * 4000  # ~4.3 MB
    pages = ray.data.from_pandas(
        pd.DataFrame(
            {
                "url": ["http://big.example/1", "http://small.example/2"],
                "warc_ts": pd.to_datetime(["2024-01-01", "2024-01-01"]),
                "html": [b"", b""],
                "text": [big, "tiny page"],
                "lang": ["en", "en"],
            }
        )
    )
    chunks = chunk_pages(extract_text(pages)).to_pandas()
    big_chunks = chunks[chunks["url"] == "http://big.example/1"]
    assert len(big_chunks) > 100  # the giant doc was actually split
    # no chunk is itself unboundedly large (worker-heap discipline)
    assert big_chunks["chunk_text"].str.len().max() < 100_000
    # and the small doc is untouched alongside it
    assert (chunks["url"] == "http://small.example/2").sum() >= 1


def test_astral_unicode_through_text_ops():
    from fastie_ray.ops.chunking import chunk_doc
    from fastie_ray.ops.text_analysis import char_entropy_batch, nfc_audit

    s = "emoji \U0001F600\U0001F680 mixed café text ok " * 20
    # chunk_doc decodes via UTF-32 — astral chars are single codepoints
    chunks = chunk_doc(s, 16)
    assert "".join(chunks) == s
    df = pd.DataFrame({"doc_id": [0], "text": [s]})
    ent = char_entropy_batch(df, "text")
    assert len(ent) == 1
    audit = nfc_audit(ray.data.from_pandas(df)).to_pandas()
    # the combining acute makes the doc non-NFC; lengths count
    # codepoints (surrogate-free), so n_nfc == n_chars - occurrences
    assert audit.loc[0, "is_nfc"] == 0
    assert (
        audit.loc[0, "n_chars"] - audit.loc[0, "n_nfc"]
    ) == s.count("́")


def test_null_and_empty_text_rows():
    from fastie_ray.ops.text_analysis import quality_batch

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["", "one two"]})
    out = quality_batch(df)
    assert out.loc[0, "n_tokens"] == 0
    assert out.loc[0, "punct_ratio_e6"] == 0  # no division crash
    assert out.loc[1, "n_tokens"] == 2
