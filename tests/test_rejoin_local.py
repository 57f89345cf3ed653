"""The exchange-free document-local rejoins must agree bit-for-bit
with the hash-bucketed dedup-exchange rejoins — including on pages
engineered so the SAME triple/mention appears in multiple chunks of
one document (the case the set-union semantics exists for)."""

import pandas as pd
import pyarrow as pa

import ray.data

from fastie_ray.sources.pages import fact_sentence
from fastie_ray.stages.chunk import chunk_pages
from fastie_ray.stages.extract import extract_text
from fastie_ray.stages.rejoin import (
    rejoin_mentions,
    rejoin_mentions_local,
    rejoin_triples,
    rejoin_triples_local,
)
from fastie_ray.stages.scorers import score_joint, split_scored
from fastie_ray.synth import build_world


def _dup_pages(world, n_pages: int = 40) -> "ray.data.Dataset":
    """Each page repeats one fact sentence in TWO different chunks
    (chunker max_length is 510): chunk 1 ends with it, chunk 2 starts
    with it — the scorer emits the same (url, p, s, o) twice."""
    urls, texts = [], []
    for i in range(n_pages):
        s = fact_sentence(world.facts[i % len(world.facts)])
        pad = "x" * (510 - len(s))
        urls.append(f"https://dup.test/{i:04d}")
        texts.append(s + pad[: 510 - len(s)] + s)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * n_pages, pa.timestamp("us")),
            "html": pa.array([None] * n_pages, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_pages, pa.string()),
        }
    )
    return ray.data.from_arrow(t)


def _sorted(ds, cols):
    df = ds.to_pandas()
    return df.sort_values(cols).reset_index(drop=True)[cols]


def test_local_rejoin_matches_exchange_and_dedups():
    world = build_world()
    pages = _dup_pages(world)
    chunks = chunk_pages(extract_text(pages))
    scored = score_joint(chunks, world_ref=world, concurrency=2).materialize()
    m_raw, t_raw = split_scored(scored)

    tcols = ["url", "predicate", "subject", "object"]
    t_local = _sorted(rejoin_triples_local(t_raw), tcols)
    t_exch = _sorted(rejoin_triples(t_raw, n_buckets=8), tcols)
    pd.testing.assert_frame_equal(t_local, t_exch)

    # the planted duplicate actually exercised the union: raw scored
    # triple rows must exceed the deduped count
    n_raw = t_raw.count()
    assert n_raw > len(t_local) > 0

    mcols = ["url", "label", "start", "end", "mention"]
    m_local = _sorted(rejoin_mentions_local(m_raw), mcols)
    m_exch = _sorted(rejoin_mentions(m_raw, n_buckets=8), mcols)
    pd.testing.assert_frame_equal(m_local, m_exch)


def test_doc_triples_default_path_is_local_and_correct():
    from fastie_ray.pipelines.kg import doc_triples

    world = build_world()
    pages = _dup_pages(world, n_pages=25)
    out = doc_triples(pages, world_ref=world, concurrency=2)
    df = out.to_pandas()
    # one fact per page, repeated in two chunks → exactly one row per url
    assert df["url"].is_unique
    assert len(df) == 25


def test_doc_events_local_equals_exchange_path():
    from fastie_ray.pipelines.kg import doc_events

    world = build_world()
    cols = ["url", "event_type", "role", "argument", "start", "end"]
    local = _sorted(
        doc_events(_dup_pages(world), world_ref=world, concurrency=2), cols
    )
    exch = _sorted(
        doc_events(
            _dup_pages(world), world_ref=world, concurrency=2,
            batch_size=4096, n_buckets=8,
        ),
        cols,
    )
    pd.testing.assert_frame_equal(local, exch)
    assert len(local) > 0


def test_doc_triples_local_equals_exchange_path():
    from fastie_ray.pipelines.kg import doc_triples

    world = build_world()
    cols = ["url", "predicate", "subject", "object"]
    local = _sorted(
        doc_triples(_dup_pages(world), world_ref=world, concurrency=2), cols
    )
    exch = _sorted(
        doc_triples(
            _dup_pages(world), world_ref=world, concurrency=2,
            batch_size=4096, n_buckets=8,
        ),
        cols,
    )
    pd.testing.assert_frame_equal(local, exch)
