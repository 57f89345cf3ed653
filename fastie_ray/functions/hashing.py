"""Deterministic hashing utilities (process- and partition-independent).

Python's builtin ``hash`` is salted per process and MUST NOT be used for
anything that crosses a task boundary; everything here is derived from
blake2b so results are stable across workers, runs and machines —
required for key-derived RNG (SURVEY.md §7, "Determinism") and for the
resume/lineage manifests.
"""

from __future__ import annotations

import hashlib

import numpy as np


def stable_hash64(s: str | bytes) -> int:
    """Stable unsigned 64-bit hash of a string/bytes."""
    if isinstance(s, str):
        s = s.encode("utf-8")
    return int.from_bytes(hashlib.blake2b(s, digest_size=8).digest(), "big")


def stable_bucket(s: str | bytes, n_buckets: int) -> int:
    return stable_hash64(s) % n_buckets


def key_rng(key: str | bytes, seed: int = 42) -> np.random.Generator:
    """RNG derived from (key, seed) — row content independent of order."""
    return np.random.default_rng((stable_hash64(key) ^ seed) & 0xFFFFFFFFFFFFFFFF)


def hash_embed(text: str, dim: int = 32, seed: int = 42) -> np.ndarray:
    """Seeded hash-projection embedding: character-trigram counts hashed
    into ``dim`` signed buckets, L2-normalized. Deterministic, cheap, and
    good enough for alias-rerank fidelity tests (FIXTURES.md F5)."""
    vec = np.zeros(dim, dtype=np.float32)
    t = f"^{text.lower()}$"
    for i in range(len(t) - 2):
        h = stable_hash64(f"{seed}:{t[i : i + 3]}")
        vec[h % dim] += 1.0 if (h >> 32) & 1 else -1.0
    n = float(np.linalg.norm(vec))
    if n > 0:
        vec /= n
    return vec


def hash_embed_batch(texts, dim: int = 32, seed: int = 42) -> np.ndarray:
    """Vectorized-enough batch variant (still per-string trigram loop, but
    allocation-free per row); returns (n, dim) float32."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        out[i] = hash_embed(t, dim=dim, seed=seed)
    return out
