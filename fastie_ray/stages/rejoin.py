"""Chunk→document rejoin (SURVEY §2.2 M13 / §2.4 J2).

Reference ``_auto_joiner``:

- NER (``global_pointer/decode_utils.py:208-229``): rebase each chunk
  entity by the cumulative length of the document's prior chunks and
  union the per-chunk sets;
- RE (``relation_extraction/gplinker/decode_utils.py:190-201``): plain
  set union of the per-chunk triple sets (surface strings carry no
  offsets).

Because the chunker already materialized the cumulative offset as the
``chunk_offset`` column, the offset rebase is a *stateless vectorized
add* — no shuffle. The only wide operation left is the set-union
semantics, i.e. exact dedup on the document key — one hash-partitioned
shuffle (``ops.dedup.dedup_exact``). This deliberately avoids a
``groupby(url).map_groups`` over millions of tiny per-url groups.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa
import pyarrow.compute as pc

from fastie_ray.ops.dedup import dedup_exact

if TYPE_CHECKING:
    import ray.data


def _rebase(batch: pa.Table) -> pa.Table:
    off = pc.cast(batch["chunk_offset"], pa.int32())
    return pa.table(
        {
            "url": batch["url"],
            "label": batch["label"],
            "start": pc.add(batch["start"], off),
            "end": pc.add(batch["end"], off),
            "mention": batch["mention"],
        }
    )


def rejoin_mentions(
    ds_mentions: "ray.data.Dataset", n_buckets: int = 64, post=None
) -> "ray.data.Dataset":
    """chunk mentions → document mentions (url, label, start, end, mention).
    ``post`` folds a per-partition transform (e.g. entity linking of the
    deduped surfaces) into the dedup exchange."""
    rebased = ds_mentions.map_batches(_rebase, batch_format="pyarrow")
    return dedup_exact(
        rebased, ["url", "label", "start", "end", "mention"], n_buckets, post=post
    )


def rejoin_triples(
    ds_triples: "ray.data.Dataset", n_buckets: int = 64, post=None
) -> "ray.data.Dataset":
    """chunk triples → document triples (url, predicate, subject, object)."""
    proj = ds_triples.select_columns(["url", "predicate", "subject", "object"])
    return dedup_exact(
        proj, ["url", "predicate", "subject", "object"], n_buckets, post=post
    )


def rejoin_events(ds_events: "ray.data.Dataset", n_buckets: int = 64) -> "ray.data.Dataset":
    """chunk event-argument rows → document rows
    (url, event_type, role, argument, start, end): offset rebase is the
    same stateless add as mentions; set-union semantics = exact dedup."""

    def rebase(batch: pa.Table) -> pa.Table:
        off = pc.cast(batch["chunk_offset"], pa.int32())
        return pa.table(
            {
                "url": batch["url"],
                "event_type": batch["event_type"],
                "role": batch["role"],
                "argument": batch["argument"],
                "start": pc.add(batch["start"], off),
                "end": pc.add(batch["end"], off),
            }
        )

    rebased = ds_events.map_batches(rebase, batch_format="pyarrow")
    return dedup_exact(
        rebased, ["url", "event_type", "role", "argument", "start", "end"], n_buckets
    )
