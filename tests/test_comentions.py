"""Oracle for `fastie_ray.pipelines.kg.comention_counts`: brute-force
pair parity on pages carrying MULTIPLE fact sentences per document
(the synth pages table plants exactly one fact per page, so the driver
oracle never exercises >2 entities per doc — this does)."""

import itertools

import pyarrow as pa
import ray
import ray.data

from fastie_ray.pipelines.kg import comention_counts
from fastie_ray.sources.pages import fact_sentence
from fastie_ray.synth import build_world


def _pages(world, n_pages=30, facts_per_page=3):
    urls, texts = [], []
    for i in range(n_pages):
        fs = [
            world.facts[(i * facts_per_page + j) % len(world.facts)]
            for j in range(facts_per_page)
        ]
        urls.append(f"https://co.test/{i:04d}")
        texts.append(" ".join(fact_sentence(f) for f in fs))
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * n_pages, pa.timestamp("us")),
            "html": pa.array([None] * n_pages, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n_pages, pa.string()),
        }
    )
    return ray.data.from_arrow(t), urls, [
        [
            world.facts[(i * facts_per_page + j) % len(world.facts)]
            for j in range(facts_per_page)
        ]
        for i in range(n_pages)
    ]


def test_comention_counts_multi_entity_docs(ray_session):
    world = build_world()
    pages, urls, page_facts = _pages(world)
    got = comention_counts(pages, world_ref=ray.put(world), concurrency=2)

    want: dict = {}
    for fs in page_facts:
        eids = sorted({e for f in fs for e in (f.subj.entity_id, f.obj.entity_id)})
        for a, b in itertools.combinations(eids, 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    got_d = {
        (r.eid_a, r.eid_b): int(r.n_docs) for r in got.itertuples(index=False)
    }
    assert got_d == want
    assert all(a < b for a, b in got_d)


def test_open_vocab_exchange_finals_match_driver(ray_session):
    import pandas as pd
    import ray

    from fastie_ray.pipelines.kg import comention_counts, entity_type_consensus
    from fastie_ray.synth import build_world, synth_pages_dataset

    world_ref = ray.put(build_world())
    pages = synth_pages_dataset(200)
    a = comention_counts(pages, world_ref=world_ref, concurrency=2)
    b = comention_counts(
        pages, world_ref=world_ref, concurrency=2, final="exchange"
    )
    pd.testing.assert_frame_equal(a, b)
    c = entity_type_consensus(pages, world_ref=world_ref, concurrency=2)
    d = entity_type_consensus(
        pages, world_ref=world_ref, concurrency=2, final="exchange"
    )
    pd.testing.assert_frame_equal(c, d)
