"""Graph materialization — sorted, partitioned Parquet node/edge tables
with per-partition lineage manifests and mid-run resume (SURVEY §2.6 O5,
§4 "Checkpoint / resume"; north_rule requirement).

Layout:

    out_dir/
      edges/part=<k>/data.parquet      sorted by (subject_id, predicate)
      nodes/part=<k>/data.parquet      sorted by entity_id
      manifests/edges-<k>.json         {partition_id, row_count, latency_ms,
      manifests/nodes-<k>.json          n_bytes, status}

Partition key = stable hash of the leading sort key, so partition
membership is independent of execution order (resumable). Each
partition is written by one task: temp file + atomic ``os.replace``
into place, manifest written LAST — a partition is committed iff its
manifest exists, so a killed run never double-counts. ``resume=True``
reads committed manifests and skips those partitions before any work
is scheduled (anti-join via broadcast of the small done-set).

Within-partition sort is a vectorized pandas sort; across partitions
the hash layout makes per-partition files independently mergeable.
"""

from __future__ import annotations

import json
import os
import time
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

if TYPE_CHECKING:
    import ray.data


def _json_scalar(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v if isinstance(v, (int, float, str, bool)) else str(v)


def _committed(out_dir: str, table: str) -> set[int]:
    mdir = os.path.join(out_dir, "manifests")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for f in os.listdir(mdir):
        if f.startswith(f"{table}-") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            if m.get("status") == "committed":
                done.add(int(m["partition_id"].split("=")[-1]))
    return done


def _write_partition_fn(out_dir: str, table: str, sort_keys: list[str]):
    def write_partition(g: pd.DataFrame) -> pd.DataFrame:
        t0 = time.monotonic()
        part = int(g["__part"].iloc[0])
        g = g.drop(columns="__part").sort_values(sort_keys, kind="mergesort")
        pdir = os.path.join(out_dir, table, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, ".data.parquet.tmp")
        tbl = pa.Table.from_pandas(g, preserve_index=False)
        pq.write_table(tbl, tmp)
        final = os.path.join(pdir, "data.parquet")
        os.replace(tmp, final)  # atomic commit of the data file
        n_bytes = os.path.getsize(final)
        # zone maps: per-sort-key min/max for scan pruning — a reader
        # with a range predicate on a sort key opens only overlapping
        # partitions (prune_partitions); JSON-safe scalars only
        zone = {
            k: {"min": _json_scalar(g[k].min()), "max": _json_scalar(g[k].max())}
            for k in sort_keys
            if len(g)
        }
        manifest = {
            "partition_id": f"{table}/part={part}",
            "row_count": int(len(g)),
            "latency_ms": (time.monotonic() - t0) * 1000.0,
            "n_bytes": int(n_bytes),
            "zone": zone,
            "status": "committed",
        }
        mdir = os.path.join(out_dir, "manifests")
        os.makedirs(mdir, exist_ok=True)
        mtmp = os.path.join(mdir, f".{table}-{part}.json.tmp")
        with open(mtmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(mtmp, os.path.join(mdir, f"{table}-{part}.json"))  # commit marker
        return pd.DataFrame([manifest])

    return write_partition


def write_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    table: str,
    part_key: str,
    sort_keys: list[str],
    n_partitions: int = 16,
    resume: bool = False,
    partitioner=None,
) -> pd.DataFrame:
    """Partition ``ds`` by ``part_key``, sort within partitions, write
    atomically with manifests; returns the manifest frame.

    Default layout is HASH of ``part_key`` (balanced, resumable).
    ``partitioner`` (df → int64 array in [0, n_partitions)) overrides
    it — pass a RANGE partitioner when readers will range-scan on the
    sort key: zone maps (per-partition min/max in the manifest) then
    prune non-overlapping partitions at read time (``read_pruned``);
    under a hash layout every partition spans the whole key range and
    zone maps cannot prune."""
    done = _committed(out_dir, table) if resume else set()

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__part"] = np.array([], dtype=np.int64)
            return df
        if partitioner is not None:
            df["__part"] = np.asarray(partitioner(df), dtype=np.int64)
        else:
            h = pd.util.hash_pandas_object(df[part_key], index=False).to_numpy()
            df["__part"] = (h % np.uint64(n_partitions)).astype(np.int64)
        if done:
            df = df[~df["__part"].isin(list(done))]
        return df

    manifests = (
        ds.map_batches(add_part, batch_format="pandas")
        .groupby("__part")
        .map_groups(_write_partition_fn(out_dir, table, sort_keys), batch_format="pandas")
        .to_pandas()
    )
    if resume and done:
        prior = _read_manifests(out_dir, table, only=done)
        manifests = pd.concat([manifests, prior], ignore_index=True)
    return manifests


def _read_manifests(out_dir: str, table: str, only: set[int] | None = None) -> pd.DataFrame:
    mdir = os.path.join(out_dir, "manifests")
    rows = []
    for f in sorted(os.listdir(mdir)):
        if f.startswith(f"{table}-") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            part = int(m["partition_id"].split("=")[-1])
            if only is None or part in only:
                rows.append(m)
    return pd.DataFrame(rows)


def _tombstones(out_dir: str, table: str) -> set[int]:
    """Partition ids superseded by a compaction: any id listed in some
    committed manifest's ``compacted_from``. Readers must skip them —
    their rows live in the merged partition (lakehouse snapshot
    semantics: the new manifest is the commit, the old files are
    garbage awaiting ``vacuum``)."""
    mdir = os.path.join(out_dir, "manifests")
    if not os.path.isdir(mdir):
        return set()
    dead: set[int] = set()
    for f in os.listdir(mdir):
        if f.startswith(f"{table}-") and f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            if m.get("status") == "committed":
                dead.update(int(p) for p in m.get("compacted_from", []))
    return dead


def _live_parts(out_dir: str, table: str) -> list[int]:
    return sorted(_committed(out_dir, table) - _tombstones(out_dir, table))


def read_graph_table(out_dir: str, table: str) -> pa.Table:
    """Read back a partitioned table (for tests / inspection).
    Manifest-driven: only committed, non-tombstoned partitions — a
    crash between a compaction's commit and its cleanup never yields
    duplicate rows."""
    parts = []
    for p in _live_parts(out_dir, table):
        f = os.path.join(out_dir, table, f"part={p}", "data.parquet")
        if os.path.exists(f):
            parts.append(pq.read_table(f))
    return pa.concat_tables(parts) if parts else None


def prune_partitions(
    out_dir: str, table: str, key: str, lo, hi
) -> list[str]:
    """Zone-map scan pruning: data files whose committed manifest's
    [min, max] range for ``key`` overlaps [lo, hi] (inclusive). The
    manifest scan is partition-count-bounded driver work — the 100-TB
    point is that the READ fans out only to overlapping partitions."""
    mdir = os.path.join(out_dir, "manifests")
    dead = _tombstones(out_dir, table)
    files = []
    for f in sorted(os.listdir(mdir)):
        if not (f.startswith(f"{table}-") and f.endswith(".json")):
            continue
        with open(os.path.join(mdir, f)) as fh:
            m = json.load(fh)
        if m.get("status") != "committed":
            continue
        if int(m["partition_id"].split("=")[-1]) in dead:
            continue
        z = m.get("zone", {}).get(key)
        if z is None or (z["min"] <= hi and z["max"] >= lo):
            part = int(m["partition_id"].split("=")[-1])
            path = os.path.join(out_dir, table, f"part={part}", "data.parquet")
            if os.path.exists(path):
                files.append(path)
    return files


def read_pruned(
    out_dir: str, table: str, key: str, lo, hi, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Range read over a partitioned table using zone-map pruning, with
    the residual per-row predicate applied after the partition-level
    prune (pruning is necessary-not-sufficient). Returns an empty TYPED
    dataset when nothing overlaps."""
    import ray.data

    files = prune_partitions(out_dir, table, key, lo, hi)
    if not files:
        schema = pq.read_schema(
            _any_data_file(out_dir, table)
        )
        return ray.data.from_arrow(schema.empty_table())

    ds = ray.data.read_parquet(
        files, columns=columns, override_num_blocks=max(1, min(len(files), 16))
    )

    def residual(df: pd.DataFrame) -> pd.DataFrame:
        return df[(df[key] >= lo) & (df[key] <= hi)]

    return ds.map_batches(residual, batch_format="pandas")


def compact_partitions(
    out_dir: str,
    table: str,
    sort_keys: list[str],
    target_rows: int = 1_000_000,
) -> pd.DataFrame:
    """OPTIMIZE: merge small adjacent partitions into ~``target_rows``
    partitions (the small-files compaction every partitioned layout
    needs — a 100-TB job's straggler tail leaves a long tail of tiny
    files that then dominates read fan-out and manifest size).

    Plan: greedy in partition-id order (for a RANGE layout ids follow
    key order, so merged zone maps stay tight); a group is one new
    partition with a FRESH id (> every existing id). Each group merges
    in its own Ray task: read members, re-sort on ``sort_keys``, write
    atomically, commit a manifest carrying ``compacted_from`` — the
    tombstone list that makes readers skip the members. Crash-safe at
    every step for a single writer: before the new manifest lands,
    nothing changed; after it lands, members are invisible to every
    reader (``_tombstones``) even if their files still exist; cleanup
    (member manifests, then data) is garbage collection, finishable any
    time via ``vacuum``. Singleton groups are left untouched.

    Run only on a COMPLETED table: vacuum drops member manifests, so a
    later ``write_partitioned(resume=True)`` would no longer see those
    hash slots as done (standard lakehouse rule — OPTIMIZE after the
    write commits, never concurrently with ingest).

    Returns the manifest frame of the partitions written."""
    import ray.data

    mani = _read_manifests(out_dir, table)
    if len(mani) == 0:
        return pd.DataFrame()
    dead = _tombstones(out_dir, table)
    mani = mani[mani["status"] == "committed"].copy()
    mani["part"] = mani["partition_id"].str.split("=").str[-1].astype(int)
    mani = mani[~mani["part"].isin(dead)].sort_values("part")

    groups: list[list[int]] = []
    cur: list[int] = []
    cur_rows = 0
    for part, rows in zip(mani["part"], mani["row_count"]):
        if cur and cur_rows + rows > target_rows:
            groups.append(cur)
            cur, cur_rows = [], 0
        cur.append(int(part))
        cur_rows += int(rows)
    if cur:
        groups.append(cur)
    merge_groups = [g for g in groups if len(g) > 1]
    if not merge_groups:
        return pd.DataFrame()

    next_id = int(mani["part"].max()) + 1
    plan = [
        {"new_part": next_id + i, "members": json.dumps(g)}
        for i, g in enumerate(merge_groups)
    ]

    def merge_one(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in df.iterrows():
            t0 = time.monotonic()
            members = json.loads(row["members"])
            new_part = int(row["new_part"])
            tbl = pa.concat_tables(
                pq.read_table(
                    os.path.join(out_dir, table, f"part={p}", "data.parquet")
                )
                for p in members
            )
            g = tbl.to_pandas().sort_values(sort_keys, kind="mergesort")
            pdir = os.path.join(out_dir, table, f"part={new_part}")
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, ".data.parquet.tmp")
            pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
            final = os.path.join(pdir, "data.parquet")
            os.replace(tmp, final)
            zone = {
                k: {"min": _json_scalar(g[k].min()), "max": _json_scalar(g[k].max())}
                for k in sort_keys
                if len(g)
            }
            manifest = {
                "partition_id": f"{table}/part={new_part}",
                "row_count": int(len(g)),
                "latency_ms": (time.monotonic() - t0) * 1000.0,
                "n_bytes": int(os.path.getsize(final)),
                "zone": zone,
                "status": "committed",
                "compacted_from": [int(p) for p in members],
            }
            mdir = os.path.join(out_dir, "manifests")
            mtmp = os.path.join(mdir, f".{table}-{new_part}.json.tmp")
            with open(mtmp, "w") as fh:
                json.dump(manifest, fh)
            # THE commit: from here readers see the merged partition
            # and tombstone the members.
            os.replace(mtmp, os.path.join(mdir, f"{table}-{new_part}.json"))
            out.append({k: v for k, v in manifest.items() if k != "zone"})
        return pd.DataFrame(out)

    manifests = (
        ray.data.from_items(plan, override_num_blocks=len(plan))
        .map_batches(merge_one, batch_format="pandas", batch_size=1)
        .to_pandas()
    )
    vacuum(out_dir, table)
    return manifests


def vacuum(out_dir: str, table: str) -> int:
    """Garbage-collect tombstoned partitions (manifest first, then
    data — the reverse of commit order, so a crash mid-vacuum leaves
    only unreferenced files, never a visible-but-deleted partition).
    Idempotent; returns the number of partitions removed."""
    import shutil

    dead = _tombstones(out_dir, table)
    n = 0
    for p in sorted(dead):
        mpath = os.path.join(out_dir, "manifests", f"{table}-{p}.json")
        pdir = os.path.join(out_dir, table, f"part={p}")
        had = os.path.exists(mpath) or os.path.isdir(pdir)
        if os.path.exists(mpath):
            os.remove(mpath)
        if os.path.isdir(pdir):
            shutil.rmtree(pdir)
        n += int(had)
    return n


def _any_data_file(out_dir: str, table: str) -> str:
    root = os.path.join(out_dir, table)
    for dirpath, _d, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(dirpath, f)
    raise FileNotFoundError(f"no parquet files under {root}")
