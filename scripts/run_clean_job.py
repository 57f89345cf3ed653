"""Corpus-curation job entry point — the ``ray job submit`` shape of
the training-data side of the engine (the KG side is
``run_kg_job.py``).

    ray job submit --working-dir . -- \
        python scripts/run_clean_job.py --sf-dir s3://bucket/docs \
        --out-dir s3://bucket/clean --partitions 256 --resume

Runs the full cleaning composition (PII redaction → Gopher
repetition/length filters → benchmark decontamination → exact dedup,
``pipelines.clean.clean_corpus``) and materializes the surviving
corpus as sorted, partitioned Parquet with per-partition lineage
manifests — re-running with ``--resume`` skips committed partitions.
Prints a one-line JSON job report.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--partitions", type=int, default=16)
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--keep-text", action="store_true",
                    help="materialize redacted text, not just lineage columns")
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

    import ray.data

    from fastie_ray.pipelines.clean import clean_corpus
    from fastie_ray.stages.materialize import write_partitioned

    t0 = time.monotonic()
    docs = ray.data.read_parquet(
        os.path.join(args.sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        override_num_blocks=16,
    )
    kept = clean_corpus(docs, keep_text=args.keep_text)
    manifest = write_partitioned(
        kept, args.out_dir, "clean_docs", part_key="doc_id",
        sort_keys=["doc_id"], n_partitions=args.partitions,
        resume=args.resume,
    )
    out = {
        "job": "corpus_clean",
        "sf_dir": args.sf_dir,
        "out_dir": args.out_dir,
        "n_docs_kept": int(manifest["row_count"].sum()),
        "n_partitions": int(len(manifest)),
        "resumed": bool(args.resume),
        "wall_sec": round(time.monotonic() - t0, 1),
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
