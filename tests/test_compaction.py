"""Small-file compaction (OPTIMIZE) + tombstone snapshot semantics on
the partitioned-materialize layout."""

import json
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import ray.data

from fastie_ray.stages.materialize import (
    _live_parts,
    compact_partitions,
    prune_partitions,
    read_graph_table,
    vacuum,
    write_partitioned,
)


def _rows(n=640):
    return [
        {"k": i, "v": f"r{i:04d}"}
        for i in range(n)
    ]


def _range_partitioner(n_parts, span):
    def by_range(df):
        return (df["k"] * n_parts // span).clip(0, n_parts - 1)

    return by_range


def _write_small(out, n=640, n_parts=16):
    ds = ray.data.from_items(_rows(n))
    return write_partitioned(
        ds, out, "t", part_key="k", sort_keys=["k"],
        n_partitions=n_parts, partitioner=_range_partitioner(n_parts, n),
    )


def test_compact_preserves_data_and_reduces_partitions(ray_session, tmp_path):
    out = str(tmp_path / "g")
    _write_small(out)
    before = read_graph_table(out, "t").to_pandas().sort_values("k")
    assert len(_live_parts(out, "t")) == 16

    man = compact_partitions(out, "t", sort_keys=["k"], target_rows=200)
    # 640 rows / 40-row partitions -> groups of 5 -> ~4 merged partitions
    assert len(man) > 0
    live = _live_parts(out, "t")
    assert len(live) < 16
    after = read_graph_table(out, "t").to_pandas().sort_values("k")
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )
    # merged files themselves are sorted on the sort key
    for p in live:
        t = pq.read_table(os.path.join(out, "t", f"part={p}", "data.parquet"))
        ks = t.column("k").to_pylist()
        assert ks == sorted(ks)
    # range layout preserved: zone maps still prune narrow scans
    files = prune_partitions(out, "t", "k", 0, 10)
    assert 0 < len(files) < len(live) + 1
    assert len(files) <= 2


def test_compact_is_idempotent(ray_session, tmp_path):
    out = str(tmp_path / "g")
    _write_small(out)
    compact_partitions(out, "t", sort_keys=["k"], target_rows=200)
    live1 = _live_parts(out, "t")
    man2 = compact_partitions(out, "t", sort_keys=["k"], target_rows=200)
    # every live partition already >= target/row group shape: only
    # merges when 2+ fit under target; second pass groups the ~160-row
    # merged parts again only if they fit together — with target 200
    # nothing fits pairwise, so no-op
    assert len(man2) == 0
    assert _live_parts(out, "t") == live1


def test_crash_between_commit_and_cleanup_yields_no_duplicates(
    ray_session, tmp_path
):
    out = str(tmp_path / "g")
    _write_small(out)
    before = read_graph_table(out, "t").to_pandas().sort_values("k")

    # snapshot member files, compact, then RESTORE the member files and
    # manifests to simulate a crash after the merged manifest committed
    # but before cleanup ran.
    mdir = os.path.join(out, "manifests")
    saved_manifests = {
        f: open(os.path.join(mdir, f)).read()
        for f in os.listdir(mdir)
        if f.startswith("t-")
    }
    saved_parts = {}
    for d in os.listdir(os.path.join(out, "t")):
        saved_parts[d] = open(
            os.path.join(out, "t", d, "data.parquet"), "rb"
        ).read()

    compact_partitions(out, "t", sort_keys=["k"], target_rows=200)

    # resurrect the pre-compaction member state (as if vacuum never ran)
    for f, body in saved_manifests.items():
        path = os.path.join(mdir, f)
        if not os.path.exists(path):
            with open(path, "w") as fh:
                fh.write(body)
    for d, body in saved_parts.items():
        pdir = os.path.join(out, "t", d)
        os.makedirs(pdir, exist_ok=True)
        fpath = os.path.join(pdir, "data.parquet")
        if not os.path.exists(fpath):
            with open(fpath, "wb") as fh:
                fh.write(body)

    # readers must see exactly one copy of every row (tombstones hide
    # the resurrected members) ...
    after = read_graph_table(out, "t").to_pandas().sort_values("k")
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after.reset_index(drop=True)
    )
    # ... and vacuum finishes the cleanup idempotently
    n = vacuum(out, "t")
    assert n > 0
    assert vacuum(out, "t") == 0
    after2 = read_graph_table(out, "t").to_pandas().sort_values("k")
    pd.testing.assert_frame_equal(
        before.reset_index(drop=True), after2.reset_index(drop=True)
    )
