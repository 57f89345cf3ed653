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


def _pages_tbl(rows):
    return pa.table(
        {
            "url": pa.array([u for u, _ in rows], pa.string()),
            "text": pa.array([t for _, t in rows], pa.string()),
        }
    )


def test_uie_depth3_schema(ray_session):
    """Arbitrary-depth traversal (reference _build_tree + the level loop,
    decode_utils.py:220-323): level-3 prompts chain two extractions."""
    import ray.data

    from fastie_ray.pipelines.uie import uie_extract

    w = build_world()
    org_a = w.by_label["ORG"][0]
    org_c = w.by_label["ORG"][1]
    per_b = w.by_label["PER"][0]
    text = (
        f"intro. {org_a.name} was founded by {per_b.name}. "
        f"{per_b.name} works for {org_c.name}. outro."
    )
    pages = ray.data.from_arrow(_pages_tbl([("u1", text)]))
    schema = {"ORG": {"founded_by": ["works_for"]}}
    out = uie_extract(pages, schema=schema, world_ref=ray.put(w), concurrency=2).to_pandas()

    lvl3 = out[out.level == 3]
    assert len(lvl3) == 1
    assert lvl3.iloc[0].prompt == f"{per_b.name}的works_for"
    assert lvl3.iloc[0].argument == org_c.name
    assert text[lvl3.iloc[0].start : lvl3.iloc[0].end] == org_c.name
    # level-2: the founder extracted under the ORG prefix
    lvl2 = out[out.level == 2]
    assert f"{org_a.name}的founded_by" in set(lvl2.prompt)
    assert per_b.name in set(lvl2.argument)


def test_uie_cls_majority_vote(ray_session):
    """G5 wired into the traversal: bracketed-option prompts are
    classified per chunk and majority-voted across the document
    (decode_utils.py:486-507); cls rows carry start = end = -1."""
    import ray.data

    from fastie_ray.pipelines.uie import uie_extract

    w = build_world()
    # 3 chunks (>510 chars each boundary): two vote "pos", one votes "neg"
    c1 = ("pos pos neg " + "x" * 500)[:510]
    c2 = ("pos neg neg neg " + "y" * 500)[:510]
    c3 = ("pos pos " + "z" * 504)[:510]
    pages = ray.data.from_arrow(_pages_tbl([("u1", c1 + c2 + c3)]))
    out = uie_extract(
        pages, schema=["sentiment[pos,neg]"], world_ref=ray.put(w), concurrency=2
    ).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].argument == "pos"
    assert out.iloc[0].start == -1 and out.iloc[0].end == -1
    assert out.iloc[0].prompt == "sentiment[pos,neg]"


def test_uie_hf_backend_parity(ray_session):
    """UIE under the subword hf backend: identical rows to the char
    path on the synth corpus (token boundaries align with span
    boundaries; offset mapping roundtrips)."""
    import ray.data

    from fastie_ray.pipelines.uie import uie_extract

    w = build_world()
    pages = pages_from_documents(SF, w)
    a = (
        uie_extract(pages, world_ref=ray.put(w), concurrency=2)
        .to_pandas().sort_values(["url", "level", "prompt", "start"]).reset_index(drop=True)
    )
    b = (
        uie_extract(pages, world_ref=ray.put(w), concurrency=2, backend="hf")
        .to_pandas().sort_values(["url", "level", "prompt", "start"]).reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
