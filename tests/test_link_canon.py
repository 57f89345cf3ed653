"""Entity linker + canonicalization tests."""

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from fastie_ray.stages.canonicalize import (
    _driver_cc,
    _distributed_cc,
    connected_components,
    mention_edges,
)
from fastie_ray.ops.dedup import dedup_exact
from fastie_ray.stages.link import EntityLinker, link_mentions, link_triples, nil_id
from fastie_ray.synth import alias_table, build_world


def test_linker_exact_lower_despace_nil():
    world = build_world()
    linker = EntityLinker(alias_table=alias_table(world))
    e = world.entities[7]
    eid, score = linker.link_surface(e.name)
    assert eid == e.entity_id and score > 0.99
    eid2, _ = linker.link_surface(e.name.lower())
    assert eid2 == e.entity_id
    eid3, _ = linker.link_surface(e.name.replace(" ", ""))
    assert eid3 == e.entity_id
    nid, s0 = linker.link_surface("totally unknown thing")
    assert nid == nil_id("totally unknown thing") and s0 == 0.0


def test_link_mentions_dataset():
    world = build_world()
    alias_ref = ray.put(alias_table(world))
    names = [world.entities[i].name for i in (0, 1, 2)]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": ["u1", "u1", "u2"],
                "label": ["PER", "ORG", "LOC"],
                "start": pa.array([0, 5, 0], pa.int32()),
                "end": pa.array([3, 9, 4], pa.int32()),
                "mention": names,
            }
        )
    )
    out = link_mentions(ds, alias_ref, concurrency=1).to_pandas()
    assert list(out.entity_id) == [world.entities[i].entity_id for i in (0, 1, 2)]
    assert (out.link_score > 0.99).all()


def test_driver_cc_basic():
    e = ray.data.from_items(
        [
            {"u": "a", "v": "b"},
            {"u": "b", "v": "c"},
            {"u": "x", "v": "y"},
        ]
    )
    labels = _driver_cc(e)
    m = dict(zip(labels.node, labels.component_id))
    assert m["a"] == m["b"] == m["c"]
    assert m["x"] == m["y"]
    assert m["a"] != m["x"]
    # deterministic: min id is the root
    assert m["a"] == "a" and m["x"] == "x"


def test_distributed_cc_equals_driver_on_skewed_graph():
    import numpy as np

    rng = np.random.default_rng(5)
    rows = []
    # Zipf-skewed star graph: hot hub h0 + chains
    for i in range(800):
        hub = f"h{int(800 * rng.random() ** 3) % 17}"
        rows.append({"u": hub, "v": f"n{i}"})
    for i in range(0, 16, 2):
        rows.append({"u": f"h{i}", "v": f"h{i + 1}"})
    e = ray.data.from_items(rows)
    want = _driver_cc(dedup_exact(e, ["u", "v"], 8).materialize())
    got = _distributed_cc(dedup_exact(e, ["u", "v"], 8).materialize(), n_buckets=8, max_rounds=8)
    wm = dict(zip(want.node, want.component_id))
    gm = dict(zip(got.node, got.component_id))
    assert set(wm) == set(gm)
    # same partition of nodes into components (labels are min-ids in both)
    assert wm == gm


def test_entity_label_projection_prefers_min_entity():
    # the bounded below-threshold projection (labels already driver-
    # resident): surface nodes dropped, component id re-keyed to the
    # smallest member entity id. The former dict-building component_map
    # API was removed (VERDICT r3 #5) — no O(surfaces) driver API.
    from fastie_ray.stages.canonicalize import _project_entity_labels_driver

    labels = pd.DataFrame(
        {
            "node": ["e:E2", "e:E1", "s:foo"],
            "component_id": ["e:E1", "e:E1", "e:E1"],
        }
    )
    out = _project_entity_labels_driver(labels)
    assert dict(zip(out.entity_id, out.component_id)) == {"E2": "E1", "E1": "E1"}


def test_mention_edges_and_cc_end_to_end():
    world = build_world()
    alias_ref = ray.put(alias_table(world))
    e0 = world.entities[0]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": ["u1", "u2"],
                "label": [e0.label] * 2,
                "start": pa.array([0, 0], pa.int32()),
                "end": pa.array([1, 1], pa.int32()),
                "mention": [e0.name, e0.name.lower()],
            }
        )
    )
    linked = link_mentions(ds, alias_ref, concurrency=1)
    labels = connected_components(mention_edges(linked), n_buckets=4)
    m = dict(zip(labels.node, labels.component_id))
    # both surfaces and the entity share one component
    assert m["s:" + e0.name.lower()] == m["e:" + e0.entity_id]


def test_entity_components_from_surfaces_matches_pooled_path():
    """The distinct-surface CC lineage (one exchange, in-task linking)
    must reproduce entity_components_from_edges over the pooled-link
    edge set exactly — same linker, same CC, different plumbing."""
    from fastie_ray.stages.canonicalize import (
        entity_components_from_edges,
        entity_components_from_surfaces,
    )
    from fastie_ray.synth import synth_pages_dataset
    from fastie_ray.stages.extract import extract_text
    from fastie_ray.stages.chunk import chunk_pages
    from fastie_ray.stages.scorers import score_joint, split_scored
    from fastie_ray.stages.rejoin import rejoin_mentions

    world = build_world()
    world_ref = ray.put(world)
    alias_ref = ray.put(alias_table(world))
    chunks = chunk_pages(extract_text(synth_pages_dataset(200)))
    scored = score_joint(chunks, world_ref=world_ref, concurrency=2).materialize()
    m_raw, _ = split_scored(scored)

    linked = link_mentions(rejoin_mentions(m_raw, 8), alias_ref, concurrency=2)
    want = (
        entity_components_from_edges(mention_edges(linked), n_buckets=8)
        .to_pandas()
        .sort_values(["entity_id", "component_id"])
        .reset_index(drop=True)
    )
    got = (
        entity_components_from_surfaces(m_raw, alias_ref, n_buckets=8)
        .to_pandas()
        .sort_values(["entity_id", "component_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_fused_link_post_matches_pooled_linkers():
    """graph_tables fuses linking into the rejoin-dedup exchange via
    dedup_exact(post=...); the fused frames must match the pooled
    EntityLinker / TripleLinker stages row-for-row (incl. link_score
    dtype) — same link_surface, different plumbing."""
    import numpy as np

    from fastie_ray.pipelines.kg import _link_mentions_post, _link_triples_post
    from fastie_ray.stages.link import link_triples
    from fastie_ray.stages.rejoin import rejoin_mentions, rejoin_triples
    from fastie_ray.stages.chunk import chunk_pages
    from fastie_ray.stages.extract import extract_text
    from fastie_ray.stages.scorers import score_joint, split_scored
    from fastie_ray.synth import synth_pages_dataset

    world = build_world()
    world_ref = ray.put(world)
    alias_ref = ray.put(alias_table(world))
    chunks = chunk_pages(extract_text(synth_pages_dataset(150)))
    scored = score_joint(chunks, world_ref=world_ref, concurrency=2).materialize()
    m_raw, t_raw = split_scored(scored)

    m_keys = ["url", "label", "start", "end", "mention"]
    want_m = (
        link_mentions(rejoin_mentions(m_raw, 8), alias_ref, concurrency=2)
        .to_pandas().sort_values(m_keys).reset_index(drop=True)
    )
    got_m = (
        rejoin_mentions(m_raw, 8, post=_link_mentions_post(alias_ref))
        .to_pandas().sort_values(m_keys).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_m, want_m)
    assert got_m["link_score"].dtype == np.float32

    t_keys = ["url", "predicate", "subject", "object"]
    want_t = (
        link_triples(rejoin_triples(t_raw, 8), alias_ref, concurrency=2)
        .to_pandas().sort_values(t_keys).reset_index(drop=True)
    )
    got_t = (
        rejoin_triples(t_raw, 8, post=_link_triples_post(alias_ref))
        .to_pandas().sort_values(t_keys).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_t, want_t)


def test_relabel_columns_replicated_complete_merge():
    """The one-exchange double relabel + a post-relabel-keyed merge must
    merge edges whose endpoints only collide AFTER relabeling — the case
    the chained relabel_column(post=...) path can miss when two distinct
    pre-object ids collapse to one component (they hash to different
    buckets, so the in-partition merge never sees both rows)."""
    from fastie_ray.pipelines.kg import _bucketed_groupby
    from fastie_ray.stages.canonicalize import relabel_columns_replicated

    # e:a1/e:a2 collapse to c:A, e:b1/e:b2 collapse to c:B
    labels = ray.data.from_pandas(
        pd.DataFrame(
            {
                "entity_id": ["e:a1", "e:a2", "e:b1", "e:b2"],
                "component_id": ["c:A", "c:A", "c:B", "c:B"],
            }
        )
    )
    edges = ray.data.from_pandas(
        pd.DataFrame(
            {
                "subject_id": ["e:a1", "e:a2", "e:a1", "e:x"],
                "predicate": ["p", "p", "q", "p"],
                "object_id": ["e:b1", "e:b2", "e:b1", "e:b2"],
                "n_support": [1, 2, 4, 8],
                "urls": [["u1"], ["u2"], ["u3"], ["u4"]],
            }
        )
    )

    def edge_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["subject_id", "predicate", "object_id"], as_index=False
        ).agg(
            n_support=("n_support", "sum"),
            urls=("urls", lambda s: sorted({u for lst in s for u in lst})[:8]),
        )
        out["n_support"] = out["n_support"].astype("int64")
        return out

    cols = ["subject_id", "predicate", "object_id", "n_support", "urls"]
    rel = relabel_columns_replicated(
        edges, ["subject_id", "object_id"], labels, n_buckets=16,
        left_cols=cols, bucket_col="subject_id", pre=edge_final,
    )
    got = (
        _bucketed_groupby(rel, "subject_id", edge_final, 16)
        .to_pandas()
        .sort_values(["subject_id", "predicate", "object_id"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "subject_id": ["c:A", "c:A", "e:x"],
            "predicate": ["p", "q", "p"],
            "object_id": ["c:B", "c:B", "c:B"],
            "n_support": [3, 4, 8],
            "urls": [["u1", "u2"], ["u3"], ["u4"]],
        }
    )
    want["n_support"] = want["n_support"].astype("int64")
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_relabel_columns_replicated_matches_pandas_reference():
    """Randomized parity: replicated double-relabel + merge equals a
    driver-side pandas map-then-group on the same data."""
    import numpy as np
    from fastie_ray.pipelines.kg import _bucketed_groupby
    from fastie_ray.stages.canonicalize import relabel_columns_replicated

    rng = np.random.default_rng(7)
    ents = [f"e:{i}" for i in range(40)]
    comp = {e: f"c:{rng.integers(0, 12)}" for e in ents if rng.random() < 0.7}
    n = 300
    df = pd.DataFrame(
        {
            "subject_id": rng.choice(ents, n),
            "predicate": rng.choice(["p", "q", "r"], n),
            "object_id": rng.choice(ents, n),
            "n_support": rng.integers(1, 5, n),
            "urls": [[f"u{rng.integers(0, 9)}"] for _ in range(n)],
        }
    )
    df["n_support"] = df["n_support"].astype("int64")
    labels = ray.data.from_pandas(
        pd.DataFrame(
            {"entity_id": list(comp), "component_id": [comp[e] for e in comp]}
        )
    )

    def edge_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["subject_id", "predicate", "object_id"], as_index=False
        ).agg(
            n_support=("n_support", "sum"),
            urls=("urls", lambda s: sorted({u for lst in s for u in lst})[:8]),
        )
        out["n_support"] = out["n_support"].astype("int64")
        return out

    cols = ["subject_id", "predicate", "object_id", "n_support", "urls"]
    rel = relabel_columns_replicated(
        ray.data.from_pandas(df).repartition(6),
        ["subject_id", "object_id"], labels, n_buckets=8,
        left_cols=cols, bucket_col="subject_id", pre=edge_final,
    )
    got = (
        _bucketed_groupby(rel, "subject_id", edge_final, 8)
        .to_pandas()
        .sort_values(["subject_id", "predicate", "object_id"])
        .reset_index(drop=True)
    )

    ref = df.copy()
    ref["subject_id"] = ref["subject_id"].map(lambda v: comp.get(v, v))
    ref["object_id"] = ref["object_id"].map(lambda v: comp.get(v, v))
    want = (
        edge_final(ref)
        .sort_values(["subject_id", "predicate", "object_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_entity_type_consensus_majority_and_ties(ray_session):
    import ray

    from fastie_ray.pipelines.kg import entity_type_consensus
    from fastie_ray.sources.pages import pages_from_documents  # noqa: F401
    from fastie_ray.synth import build_world, synth_pages_dataset

    w = build_world()
    world_ref = ray.put(w)
    pages = synth_pages_dataset(300)
    out = entity_type_consensus(pages, world_ref=world_ref, concurrency=2)
    assert len(out) > 0
    # every winner label is the entity's gazetteer label (the synth
    # world types consistently, so consensus is unanimous)
    ent_label = {}
    for f in w.facts:
        ent_label[f.subj.entity_id] = f.subj.label
        ent_label[f.obj.entity_id] = f.obj.label
    for _, r in out.iterrows():
        if r["entity_id"] in ent_label:
            assert r["label"] == ent_label[r["entity_id"]]
    assert (out["n_mentions"] >= 1).all()
    assert out["entity_id"].is_unique
