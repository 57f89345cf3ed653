"""Content-defined chunking (CDC) — the storage-dedup primitive
(LBFS/Rabin, FastCDC family): chunk boundaries are set by the CONTENT
(a rolling hash over a 4-codepoint window hitting 0 mod ``mod``), not
by fixed offsets, so an insertion early in a document shifts only the
chunk it lands in and every identical downstream span re-produces the
same chunk hashes. ``content_chunks`` runs the corpus-level chunk
census: which chunks recur, how often, in how many docs — the
byte-level dedup complement of ``ops.substring_dedup`` (token n-grams)
and ``ops.neardup`` (whole-doc signatures).

Determinism/oracle contract: the window hash is the 4-term base-31
polynomial over raw codepoints (``ord``), reproducible in DuckDB as
``ascii(substr(...))`` arithmetic, so the driver oracle re-derives the
exact chunk set per doc with ``generate_series`` + window functions —
no float, no library hash.

Scale shape: chunking is per-byte work and embarrassingly parallel
(the per-doc Python loop only walks CHUNKS; the rolling hash over
positions is one vectorized numpy expression per doc). A per-batch
combiner reduces chunk occurrences to distinct (hash, len) rows per
batch, and ONE hash-bucketed exchange finishes the census — chunk
payloads (the text) never leave the map task, only 32-byte hashes.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_P3, _P2, _P1 = 31 ** 3, 31 ** 2, 31


def chunk_doc(s: str, mod: int = 16) -> list[str]:
    """Split one document at content-defined boundaries: a boundary
    closes the chunk at (0-based) position i+3 whenever the base-31
    polynomial over codepoints s[i..i+3] is 0 mod ``mod``. Average
    chunk length ≈ ``mod`` codepoints; a doc shorter than the window
    is a single chunk."""
    c = np.frombuffer(s.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    n = len(c)
    chunks: list[str] = []
    start = 0
    if n >= 4:
        h = c[:-3] * _P3 + c[1:-2] * _P2 + c[2:-1] * _P1 + c[3:]
        for e in (np.nonzero(h % mod == 0)[0] + 3).tolist():
            chunks.append(s[start:e + 1])
            start = e + 1
    if start < n:
        chunks.append(s[start:])
    return chunks


def content_chunks(
    ds: "ray.data.Dataset",
    mod: int = 16,
    min_occ: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Corpus chunk census over content-defined chunks: returns
    (chunk_hash, chunk_len, n_occ, n_docs) for every chunk occurring
    at least ``min_occ`` times — the dedup-ratio estimate a
    chunk-store would achieve on this corpus. int64 counts, md5 hex
    hashes."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        hs: list[str] = []
        ls: list[int] = []
        for did, s in zip(
            df[id_col].to_numpy(), df[text_col].astype(str).to_numpy()
        ):
            for ch in chunk_doc(s, mod):
                ids.append(did)
                hs.append(hashlib.md5(ch.encode()).hexdigest())
                ls.append(len(ch))
        t = pd.DataFrame({"doc": ids, "chunk_hash": hs, "chunk_len": ls})
        # combiner: each doc lives in ONE batch row, so per-batch
        # nunique(doc) partials sum to exact global doc counts
        agg = t.groupby(["chunk_hash", "chunk_len"], as_index=False).agg(
            n_occ=("doc", "count"), n_docs=("doc", "nunique")
        )
        h = pd.util.hash_pandas_object(
            agg["chunk_hash"], index=False
        ).to_numpy()
        agg["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return agg

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["chunk_hash", "chunk_len"], as_index=False
        ).agg(n_occ=("n_occ", "sum"), n_docs=("n_docs", "sum"))
        out = out[out["n_occ"] >= min_occ]
        return out.astype(
            {"chunk_len": "int64", "n_occ": "int64", "n_docs": "int64"}
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
