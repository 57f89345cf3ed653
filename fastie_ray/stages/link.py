"""Entity linking — alias-dictionary candidates + embedding rerank
(SURVEY §2.4 J5; north-star stage 3; no reference implementation).

Actor-pool stage, same shape as the scorers: the alias dictionary and
the candidate embedding matrix are the "index loaded once per worker"
(built in ``__init__`` from a broadcast ObjectRef — ``ray.put`` once on
the driver, read by every actor; never re-shipped per batch).

Candidate generation: exact lookup of the mention surface, its
lowercase, and its de-spaced variant in the alias dict. Rerank: cosine
between the mention's hash-projection embedding and each candidate's
canonical-name embedding (one numpy matmul per unique surface).
Mentions with no candidate get a deterministic NIL id derived from the
normalized surface, so canonicalization can still group them.

Vectorization: surfaces repeat heavily (Zipf), so we embed/link each
*unique* surface once per batch and broadcast the result back.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from fastie_ray.functions.hashing import hash_embed_batch, stable_hash64

if TYPE_CHECKING:
    import ray.data

EMB_DIM = 32


def nil_id(surface: str) -> str:
    return f"NIL{stable_hash64(surface.lower()):016x}"


class EntityLinker:
    def __init__(self, alias_ref=None, alias_table: pa.Table | None = None, dim: int = EMB_DIM):
        if alias_table is None:
            import ray

            alias_table = (
                ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
            )
        self.dim = dim
        aliases = alias_table["alias"].to_pylist()
        eids = alias_table["entity_id"].to_pylist()
        cnames = alias_table["canonical_name"].to_pylist()
        embs = np.asarray(alias_table["embedding"].to_pylist(), dtype=np.float32)
        # alias → list of candidate row indices
        self.candidates: dict[str, list[int]] = {}
        for i, a in enumerate(aliases):
            self.candidates.setdefault(a, []).append(i)
        self.entity_ids = eids
        self.canonical = cnames
        self.emb = embs

    def link_surface(self, surface: str) -> tuple[str, float]:
        for probe in (surface, surface.lower(), surface.replace(" ", "")):
            idxs = self.candidates.get(probe)
            if idxs:
                q = hash_embed_batch([surface], dim=self.dim)[0]
                scores = self.emb[idxs] @ q
                best = int(np.argmax(scores))
                return self.entity_ids[idxs[best]], float(scores[best])
        return nil_id(surface), 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        mentions = batch["mention"].to_pylist()
        uniq = {}
        for m in mentions:
            if m not in uniq:
                uniq[m] = self.link_surface(m)
        eids = pa.array([uniq[m][0] for m in mentions], pa.string())
        scores = pa.array(
            np.asarray([uniq[m][1] for m in mentions], dtype=np.float32)
        )
        return batch.append_column("entity_id", eids).append_column("link_score", scores)


def link_mentions(
    ds_mentions: "ray.data.Dataset",
    alias_ref,
    concurrency: int = 4,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """doc mentions → linked mentions (adds entity_id, link_score)."""
    return ds_mentions.map_batches(
        EntityLinker,
        fn_constructor_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class TripleLinker(EntityLinker):
    """Links a triples table's subject/object surfaces to entity ids
    (adds subject_id/object_id); same broadcast index as EntityLinker."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        subs = batch["subject"].to_pylist()
        objs = batch["object"].to_pylist()
        uniq: dict[str, str] = {}
        for s in subs + objs:
            if s not in uniq:
                uniq[s] = self.link_surface(s)[0]
        return batch.append_column(
            "subject_id", pa.array([uniq[s] for s in subs], pa.string())
        ).append_column("object_id", pa.array([uniq[o] for o in objs], pa.string()))


def link_triples(
    ds_triples: "ray.data.Dataset",
    alias_ref,
    concurrency: int = 4,
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    return ds_triples.map_batches(
        TripleLinker,
        fn_constructor_kwargs={"alias_ref": alias_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
