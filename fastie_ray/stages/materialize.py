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


def read_graph_table(out_dir: str, table: str) -> pa.Table:
    """Read back a partitioned table (for tests / inspection)."""
    base = os.path.join(out_dir, table)
    parts = []
    for d in sorted(os.listdir(base)):
        f = os.path.join(base, d, "data.parquet")
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
    files = []
    for f in sorted(os.listdir(mdir)):
        if not (f.startswith(f"{table}-") and f.endswith(".json")):
            continue
        with open(os.path.join(mdir, f)) as fh:
            m = json.load(fh)
        if m.get("status") != "committed":
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


def _any_data_file(out_dir: str, table: str) -> str:
    root = os.path.join(out_dir, table)
    for dirpath, _d, files in sorted(os.walk(root)):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(dirpath, f)
    raise FileNotFoundError(f"no parquet files under {root}")
