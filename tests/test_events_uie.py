"""Event-extraction and UIE-iterative pipeline tests: the GPLinker-EE
and UIE decode kernels running in real Ray Data passes over the
synthetic pages corpus, checked against the injection plan."""

import pyarrow as pa

import ray

from fastie_ray.pipelines.kg import doc_events
from fastie_ray.pipelines.uie import DEFAULT_SCHEMA, uie_extract
from fastie_ray.sources.pages import pages_from_documents
from fastie_ray.synth import build_world

SF = "/root/testdata/sf0.001"


def test_event_scorer_single_chunk():
    from fastie_ray.stages.scorers import EventScorer

    w = build_world()
    f = w.facts[0]
    text = "lead in. " + f.sentence("en") + " trailing."
    batch = pa.table(
        {
            "url": ["u1"],
            "chunk_id": pa.array([0], pa.int32()),
            "chunk_offset": pa.array([0], pa.int32()),
            "chunk_text": [text],
        }
    )
    out = EventScorer(world_ref=w)(batch).to_pylist()
    roles = {r["role"]: r for r in out}
    assert set(roles) == {"触发词", "subject", "object"}
    assert roles["subject"]["argument"] == f.subj.name
    assert roles["object"]["argument"] == f.obj.name
    assert all(text[r["start"]:r["end"]] == r["argument"] for r in out)
    assert all(r["event_type"] == f.predicate for r in out)


def test_doc_events_matches_injection_plan(ray_session):
    w = build_world()
    pages = pages_from_documents(SF, w)
    rows = doc_events(pages, world_ref=ray.put(w), concurrency=2).to_pandas()
    # one event (3 argument rows) per page
    n_pages = pages.count()
    assert len(rows) == 3 * n_pages
    per_url = rows.groupby("url").size()
    assert (per_url == 3).all()
    # trigger always present per event
    trig = rows[rows.role == "触发词"]
    assert len(trig) == n_pages


def test_uie_two_level_semijoin(ray_session):
    w = build_world()
    pages = pages_from_documents(SF, w)
    out = uie_extract(pages, world_ref=ray.put(w), concurrency=2).to_pandas()
    n_pages = pages.count()
    lvl2 = out[out.level == 2]
    # exactly one level-2 (object) result per page: subject的predicate
    assert len(lvl2) == n_pages
    assert lvl2.prompt.str.contains("的").all()
    lvl1 = out[out.level == 1]
    # level-1 prompts are root labels only
    assert set(lvl1.prompt) <= set(DEFAULT_SCHEMA)
    # every page has at least the subject mention at level 1
    assert lvl1.groupby("url").size().min() >= 1
