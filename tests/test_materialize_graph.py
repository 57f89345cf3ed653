"""Partitioned graph materialization, manifests, and resume."""

import json
import os
import shutil

import pandas as pd
import ray.data

from fastie_ray.pipelines.kg import build_graph
from fastie_ray.stages.materialize import read_graph_table, write_partitioned
from fastie_ray.synth import build_world, synth_pages_table


def _toy_edges(n=500):
    return ray.data.from_items(
        [
            {
                "subject_id": f"E{i % 37:04d}",
                "predicate": ["p1", "p2", "p3"][i % 3],
                "object_id": f"E{(i * 7) % 53:04d}",
                "n_support": 1,
                "urls": [f"u{i}"],
            }
            for i in range(n)
        ]
    )


def test_write_partitioned_sorted_and_manifested(tmp_path):
    out = str(tmp_path / "g")
    man = write_partitioned(
        _toy_edges(), out, "edges", part_key="subject_id",
        sort_keys=["subject_id", "predicate"], n_partitions=4,
    )
    assert man["status"].eq("committed").all()
    assert man["row_count"].sum() == 500
    tbl = read_graph_table(out, "edges")
    assert tbl.num_rows == 500
    # each partition file is sorted
    for d in os.listdir(os.path.join(out, "edges")):
        import pyarrow.parquet as pq

        t = pq.read_table(os.path.join(out, "edges", d, "data.parquet")).to_pandas()
        assert (
            t.sort_values(["subject_id", "predicate"], kind="mergesort")[
                ["subject_id", "predicate"]
            ].reset_index(drop=True)
            .equals(t[["subject_id", "predicate"]].reset_index(drop=True))
        )
    # manifests on disk
    mfiles = os.listdir(os.path.join(out, "manifests"))
    assert len([f for f in mfiles if f.startswith("edges-")]) == man.shape[0]


def test_resume_skips_committed_and_matches_clean_run(tmp_path):
    clean = str(tmp_path / "clean")
    write_partitioned(
        _toy_edges(), clean, "edges", part_key="subject_id",
        sort_keys=["subject_id", "predicate"], n_partitions=4,
    )
    want = read_graph_table(clean, "edges").to_pandas().sort_values(
        ["subject_id", "predicate", "object_id"]).reset_index(drop=True)

    # simulate a run killed after some partitions committed: copy 2 of 4
    partial = str(tmp_path / "partial")
    os.makedirs(os.path.join(partial, "manifests"))
    kept = 0
    for f in sorted(os.listdir(os.path.join(clean, "manifests"))):
        part = int(f.split("-")[-1].split(".")[0])
        if part in (0, 2):
            shutil.copytree(
                os.path.join(clean, "edges", f"part={part}"),
                os.path.join(partial, "edges", f"part={part}"),
            )
            shutil.copy(
                os.path.join(clean, "manifests", f),
                os.path.join(partial, "manifests", f),
            )
            kept += 1
    assert kept == 2

    man = write_partitioned(
        _toy_edges(), partial, "edges", part_key="subject_id",
        sort_keys=["subject_id", "predicate"], n_partitions=4, resume=True,
    )
    got = read_graph_table(partial, "edges").to_pandas().sort_values(
        ["subject_id", "predicate", "object_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert man["row_count"].sum() == 500


def test_build_graph_end_to_end(tmp_path):
    pages, _, _, gold_triples = synth_pages_table(60)
    world = build_world()
    out = str(tmp_path / "graph")
    res = build_graph(ray.data.from_arrow(pages), out, world=world, concurrency=2, n_partitions=4)
    assert res["n_edges"] > 0 and res["n_nodes"] > 0

    edges = read_graph_table(out, "edges").to_pandas()
    nodes = read_graph_table(out, "nodes").to_pandas()
    # every gold triple that survived extraction appears as an edge between
    # the component ids of its endpoint entities
    name2eid = {e.name: e.entity_id for e in world.entities}
    comp_of = dict(zip(nodes.entity_id, nodes.component_id))
    edge_keys = set(zip(edges.subject_id, edges.predicate, edges.object_id))
    gold = list(
        zip(
            gold_triples["subject"].to_pylist(),
            gold_triples["predicate"].to_pylist(),
            gold_triples["object"].to_pylist(),
        )
    )
    hit = sum(
        (
            comp_of.get(name2eid[s], name2eid[s]),
            p,
            comp_of.get(name2eid[o], name2eid[o]),
        )
        in edge_keys
        for s, p, o in gold
    )
    assert hit / len(gold) >= 0.95
    # n_support counts url-distinct supporting extractions; compare against
    # the distinct gold (url, s, p, o) keys (the same fact can be planted
    # twice in one document and dedups to one support)
    distinct_gold = set(
        zip(
            gold_triples["url"].to_pylist(),
            gold_triples["subject"].to_pylist(),
            gold_triples["predicate"].to_pylist(),
            gold_triples["object"].to_pylist(),
        )
    )
    assert edges.n_support.sum() >= 0.95 * len(distinct_gold)
    # urls lists are capped and non-empty
    assert edges.urls.map(len).between(1, 8).all()


def test_build_graph_resume_equals_clean(tmp_path):
    pages, _, _, _ = synth_pages_table(40)
    world = build_world()
    clean_dir = str(tmp_path / "clean")
    build_graph(ray.data.from_arrow(pages), clean_dir, world=world, concurrency=2, n_partitions=4)
    want_e = read_graph_table(clean_dir, "edges").to_pandas().sort_values(
        ["subject_id", "predicate", "object_id"]).reset_index(drop=True)

    partial = str(tmp_path / "partial")
    os.makedirs(os.path.join(partial, "manifests"))
    # pre-commit partitions 1 and 3 from the clean run (simulated prior run)
    for f in sorted(os.listdir(os.path.join(clean_dir, "manifests"))):
        if not f.startswith("edges-"):
            continue
        part = int(f.split("-")[-1].split(".")[0])
        if part in (1, 3):
            shutil.copytree(
                os.path.join(clean_dir, "edges", f"part={part}"),
                os.path.join(partial, "edges", f"part={part}"),
            )
            shutil.copy(
                os.path.join(clean_dir, "manifests", f),
                os.path.join(partial, "manifests", f),
            )
    build_graph(
        ray.data.from_arrow(pages), partial, world=world,
        concurrency=2, n_partitions=4, resume=True,
    )
    got_e = read_graph_table(partial, "edges").to_pandas().sort_values(
        ["subject_id", "predicate", "object_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_e, want_e)


def test_zone_map_pruning_range_layout(tmp_path):
    import numpy as np

    from fastie_ray.stages.materialize import (
        prune_partitions,
        read_pruned,
        write_partitioned,
    )

    df = pd.DataFrame(
        {"k": np.arange(800, dtype=np.int64), "v": np.arange(800, dtype=np.int64) * 7}
    )
    out = str(tmp_path / "lake")

    def by_range(d, width=100, n=8):
        return np.minimum(d["k"].to_numpy() // width, n - 1)

    m = write_partitioned(
        ray.data.from_pandas(df).repartition(4), out, "t",
        part_key="k", sort_keys=["k"], n_partitions=8, partitioner=by_range,
    )
    assert len(m) == 8 and "zone" in m.columns
    # a narrow range must open only the overlapping partitions
    files = prune_partitions(out, "t", "k", 150, 260)
    assert len(files) == 2  # parts covering [100,200) and [200,300)
    got = read_pruned(out, "t", "k", 150, 260).to_pandas().sort_values("k")
    want = df[(df["k"] >= 150) & (df["k"] <= 260)]
    assert got["k"].tolist() == want["k"].tolist()
    assert got["v"].tolist() == want["v"].tolist()
    # disjoint range → typed empty dataset
    empty = read_pruned(out, "t", "k", 10_000, 20_000).to_pandas()
    assert len(empty) == 0


def test_zone_maps_under_hash_layout_do_not_break_reads(tmp_path):
    import numpy as np

    from fastie_ray.stages.materialize import read_pruned, write_partitioned

    df = pd.DataFrame({"k": np.arange(200, dtype=np.int64), "v": np.zeros(200, dtype=np.int64)})
    out = str(tmp_path / "lake")
    write_partitioned(
        ray.data.from_pandas(df), out, "t", part_key="k", sort_keys=["k"],
        n_partitions=4,
    )
    got = read_pruned(out, "t", "k", 50, 60).to_pandas()
    assert sorted(got["k"].tolist()) == list(range(50, 61))
