"""KG-construction job entry point — the ``ray job submit`` shape of
the north rule.

On a real cluster:

    ray job submit --working-dir . -- \
        python scripts/run_kg_job.py --sf-dir s3://bucket/pages \
        --out-dir s3://bucket/kg --partitions 256 --resume

In this sandbox it runs against the local testdata. The script owns
the Ray session (``address="auto"`` picks up a cluster when submitted
via the job API; falls back to local mode), runs the full resumable
pipeline (``build_graph``: extract → score → rejoin → link →
canonicalize → sorted partitioned Parquet with per-partition lineage
manifests), and prints a one-line JSON job report. Re-running with
``--resume`` skips committed partitions (manifest anti-join).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# repo root importable when launched as `python scripts/run_kg_job.py`
# (ray job submit --working-dir ships the same layout)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--concurrency", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU cap (ignored on a cluster)")
    ap.add_argument("--resume", action="store_true",
                    help="skip partitions with committed manifests")
    ap.add_argument("--compact-target-rows", type=int, default=0,
                    help="post-job OPTIMIZE: merge small partitions to "
                         "~this many rows (0 = off); runs only after the "
                         "write commits (single-writer rule)")
    from fastie_ray.config import job_argv

    args = ap.parse_args(job_argv())

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", ignore_reinit_error=True,
                     logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, ignore_reinit_error=True,
                     logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fastie_ray.pipelines.kg import build_graph
    from fastie_ray.sources.pages import pages_from_documents
    from fastie_ray.synth import build_world

    world = build_world()
    t0 = time.monotonic()
    report = build_graph(
        pages_from_documents(args.sf_dir, world),
        out_dir=args.out_dir,
        world=world,
        concurrency=args.concurrency,
        n_partitions=args.partitions,
        resume=args.resume,
    )
    compacted = {}
    if args.compact_target_rows > 0:
        from fastie_ray.stages.materialize import (
            _live_parts,
            compact_partitions,
        )

        sort_keys = {"edges": ["subject_id", "predicate"], "nodes": ["entity_id"]}
        for table, keys in sort_keys.items():
            before = len(_live_parts(args.out_dir, table))
            compact_partitions(
                args.out_dir, table, sort_keys=keys,
                target_rows=args.compact_target_rows,
            )
            compacted[table] = {
                "parts_before": before,
                "parts_after": len(_live_parts(args.out_dir, table)),
            }

    out = {
        "job": "kg_construct",
        "sf_dir": args.sf_dir,
        "out_dir": args.out_dir,
        "n_edges": report["n_edges"],
        "n_nodes": report["n_nodes"],
        "resumed": bool(args.resume),
        "compacted": compacted,
        "wall_sec": round(time.monotonic() - t0, 2),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
