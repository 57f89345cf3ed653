"""Consistent-hash placement ops: which shard owns each record under
a hash ring, and what a ring resize actually moves — the
resharding-cost census that justifies consistent hashing over modulo
placement (mod N→N+1 moves ~everything; a ring moves ~1/(N+1)).

Determinism/oracle contract: ring points and record keys are both the
60-bit md5 prefix (``'0x' || substr(md5(...), 1, 15)`` in SQL), the
owner is the first ring point clockwise from the key (smallest point
≥ hash, wrapping to the ring's global minimum), ties broken by shard
id — all integer, reproducible in DuckDB with a cross join + window.

Scale shape: rings are (shards × replicas) constants broadcast in the
closure; placement is one vectorized ``np.searchsorted`` per batch —
zero exchanges; the movement census finishes on a shards² driver
table."""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def build_ring(n_shards: int, n_replicas: int = 8):
    """Sorted (point, shard) ring arrays; points are md5-60bit of
    ``ring:<shard>:<replica>``."""
    pts = []
    for s in range(n_shards):
        for r in range(n_replicas):
            pts.append((_h60(f"ring:{s}:{r}"), s))
    pts.sort()
    return (
        np.array([p for p, _ in pts], dtype=np.int64),
        np.array([s for _, s in pts], dtype=np.int64),
    )


def ring_assign(hashes: np.ndarray, points: np.ndarray,
                shards: np.ndarray) -> np.ndarray:
    """Owner shard per key hash: first ring point ≥ hash, wrapping."""
    idx = np.searchsorted(points, hashes, side="left")
    idx[idx == len(points)] = 0
    return shards[idx]


def consistent_shards(
    ds: "ray.data.Dataset",
    n_shards_a: int = 8,
    n_shards_b: int = 9,
    n_replicas: int = 8,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Resharding movement census: place every record on an
    ``n_shards_a``-shard ring AND an ``n_shards_b``-shard ring, return
    (shard_a, shard_b, n_docs) — the off-diagonal mass is exactly what
    a resize would copy. Rings share per-shard points by construction
    (shard s keeps its replica points), which is WHY little moves."""
    ring_a = build_ring(n_shards_a, n_replicas)
    ring_b = build_ring(n_shards_b, n_replicas)

    def place(df: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (_h60(f"doc:{i}") for i in df[id_col]),
            dtype=np.int64,
            count=len(df),
        )
        out = pd.DataFrame(
            {
                "shard_a": ring_assign(h, *ring_a),
                "shard_b": ring_assign(h, *ring_b),
            }
        )
        return out.groupby(["shard_a", "shard_b"], as_index=False).size(
        ).rename(columns={"size": "n_docs"})

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["shard_a", "shard_b"], as_index=False)[
            "n_docs"
        ].sum()
        return out.astype("int64")

    # shards² partials per batch — tiny; single-group final merge
    parts = ds.map_batches(place, batch_format="pandas")
    return (
        parts.repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )
