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

The ``*_local`` variants drop even that one shuffle. The reference
``_auto_joiner`` union is DOCUMENT-LOCAL — it only ever merges chunks
of one document — and the chunker emits all of a page's chunks inside
the same fused batch (a page is ONE input row; expansion happens
in-task; downstream fused stages consume the upstream batch unchanged
when their ``batch_size`` is None). So a per-batch
``drop_duplicates`` IS the full reference semantics, zero exchange,
provided two contracts hold: (1) input pages are url-distinct (the
crawl sources guarantee it; run ``ops.urlnorm.url_dedup`` first if
not) and (2) the scored stream was not re-partitioned between the
chunker and the dedup (true for the fused read→extract→chunk→score
pass; pass an explicit ``batch_size`` to the scorer and the contract
breaks — use the exchange variants then). At 100 TB this removes the
only all-to-all in the headline path; the sort barrier was measured at
~6× the pipeline's total compute wall time at sf0.1.
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


def _local_dedup(keys: list[str], post=None):
    import pandas as pd

    def fn(df: "pd.DataFrame") -> "pd.DataFrame":
        out = df.drop_duplicates(subset=keys)
        return post(out) if post is not None else out

    return fn


def rejoin_mentions_local(
    ds_mentions: "ray.data.Dataset", post=None
) -> "ray.data.Dataset":
    """``rejoin_mentions`` without the exchange (see module docstring
    for the co-location contract). ``post`` runs per batch instead of
    per partition — same function, same per-worker cached state."""
    rebased = ds_mentions.map_batches(_rebase, batch_format="pyarrow")
    return rebased.map_batches(
        _local_dedup(["url", "label", "start", "end", "mention"], post),
        batch_format="pandas",
    )


def rejoin_triples_local(
    ds_triples: "ray.data.Dataset", post=None
) -> "ray.data.Dataset":
    """``rejoin_triples`` without the exchange (document-local union)."""
    proj = ds_triples.select_columns(["url", "predicate", "subject", "object"])
    return proj.map_batches(
        _local_dedup(["url", "predicate", "subject", "object"], post),
        batch_format="pandas",
    )


def _rebase_events(batch: pa.Table) -> pa.Table:
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


def rejoin_events(ds_events: "ray.data.Dataset", n_buckets: int = 64) -> "ray.data.Dataset":
    """chunk event-argument rows → document rows
    (url, event_type, role, argument, start, end): offset rebase is the
    same stateless add as mentions; set-union semantics = exact dedup."""
    rebased = ds_events.map_batches(_rebase_events, batch_format="pyarrow")
    return dedup_exact(
        rebased, ["url", "event_type", "role", "argument", "start", "end"], n_buckets
    )


def rejoin_events_local(ds_events: "ray.data.Dataset") -> "ray.data.Dataset":
    """``rejoin_events`` without the exchange (document-local union)."""
    rebased = ds_events.map_batches(_rebase_events, batch_format="pyarrow")
    return rebased.map_batches(
        _local_dedup(["url", "event_type", "role", "argument", "start", "end"]),
        batch_format="pandas",
    )
