"""Chunker boundary identity vs the reference auto_splitter port."""

import numpy as np
import pyarrow as pa
import ray.data

from fastie_ray.stages.chunk import ChunkPages, auto_splitter, chunk_pages, split_text
from tests.reference_port import ref_auto_splitter


def _random_texts(n=60, seed=7):
    rng = np.random.default_rng(seed)
    alphabet = list("abc defg。！？hij klm ”’，nop qrs…....tuv")
    out = []
    for _ in range(n):
        ln = int(rng.integers(0, 1400))
        out.append("".join(rng.choice(alphabet, size=ln)))
    return out


def test_auto_splitter_matches_reference_port():
    texts = _random_texts()
    for split_sentence in (False, True):
        ours = auto_splitter(texts, 510, split_sentence)
        ref = ref_auto_splitter(texts, 510, split_sentence)
        assert ours == ref


def test_split_text_small_maxlen():
    texts = _random_texts(30, seed=11)
    for m in (1, 5, 63):
        ours = auto_splitter(texts, m)
        ref = ref_auto_splitter(texts, m)
        assert ours == ref


def test_chunk_offsets_cumulative():
    t = "x" * 1300
    chunks = split_text(t, 510)
    assert [len(c) for c in chunks] == [510, 510, 280]
    tbl = ChunkPages()(pa.table({"url": ["u"], "text": [t], "lang": ["en"]}))
    assert tbl["chunk_offset"].to_pylist() == [0, 510, 1020]
    assert tbl["chunk_id"].to_pylist() == [0, 1, 2]
    assert "".join(tbl["chunk_text"].to_pylist()) == t


def test_empty_text_yields_one_empty_chunk():
    # reference: lens=0 <= max_text_len → one chunk, the empty string
    assert split_text("", 510) == [""]


def test_chunk_pages_dataset_roundtrip():
    texts = _random_texts(40, seed=3)
    urls = [f"u{i:03d}" for i in range(len(texts))]
    ds = ray.data.from_arrow(
        pa.table({"url": urls, "text": texts, "lang": ["en"] * len(texts)})
    )
    out = chunk_pages(ds).to_pandas().sort_values(["url", "chunk_id"])
    ref_chunks, ref_map = ref_auto_splitter(texts, 510)
    # per-url chunk texts match the reference flat list through input_mapping
    for i, url in enumerate(urls):
        got = out[out.url == url]["chunk_text"].tolist()
        want = [ref_chunks[v] for v in ref_map[i]]
        assert got == want
