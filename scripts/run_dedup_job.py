"""Incremental-DEDUP job entry point — the fifth ``ray job submit``
shape next to kg / clean / analytics / audit: maintain the standing
corpus's banded MinHash index and report the crawl increment's
near-duplicates against it.

    ray job submit --working-dir . -- \
        python scripts/run_dedup_job.py --sf-dir /data/sf \
        --index-dir /idx --out-dir /tmp/dedup --rebuild-index

Steps:
- ``--rebuild-index`` (or a missing index) bands the base corpus ONCE
  into ``--index-dir`` (``ops.neardup.band_corpus_index``: parquet
  partitioned by the pair-search coarse key, banding-params manifest
  committed last);
- the increment (``--increment-path`` parquet with (doc_id, text), or
  the built-in synthetic increment when omitted: every 5th base doc,
  verbatim, id + 1e6) is banded per run and searched against the
  index (``minhash_dups_against_index``);
- near-dup pairs land in ``pairs.parquet`` + ``_MANIFEST.json``
  (row count, threshold, index params; committed LAST).

Also accepts a single YAML config argv (``fastie_ray.config``):
``python scripts/run_dedup_job.py examples/dedup_job.yaml``.
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
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--increment-path", default=None,
                    help="parquet of (doc_id, text); synthetic when omitted")
    ap.add_argument("--rebuild-index", action="store_true")
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--num-cpus", type=int, default=None)
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

    import pandas as pd
    import ray.data

    from fastie_ray.ops.neardup import (
        band_corpus_index,
        minhash_dups_against_index,
    )

    t0 = time.monotonic()
    base = ray.data.read_parquet(
        os.path.join(args.sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
    )

    manifest_path = os.path.join(args.index_dir, "_BANDING.json")
    built = False
    if args.rebuild_index or not os.path.exists(manifest_path):
        band_corpus_index(
            base, args.index_dir, concurrency=args.concurrency
        )
        built = True

    if args.increment_path:
        inc = ray.data.read_parquet(
            args.increment_path, columns=["doc_id", "text"]
        )
    else:
        def synth_inc(df: pd.DataFrame) -> pd.DataFrame:
            sub = df[df["doc_id"].astype("int64") % 5 == 0]
            return pd.DataFrame(
                {"doc_id": sub["doc_id"].astype("int64") + 1_000_000,
                 "text": sub["text"]}
            )

        inc = base.map_batches(synth_inc, batch_format="pandas")

    pairs = minhash_dups_against_index(
        args.index_dir, inc, threshold=args.threshold,
        concurrency=args.concurrency,
    ).to_pandas()

    os.makedirs(args.out_dir, exist_ok=True)
    pairs.sort_values(["inc_id", "base_id"]).reset_index(drop=True).to_parquet(
        os.path.join(args.out_dir, "pairs.parquet")
    )
    with open(os.path.join(args.index_dir, "_BANDING.json")) as f:
        idx_params = json.load(f)
    # manifest LAST: its presence marks a complete run
    report = {
        "job": "incremental_dedup",
        "sf_dir": args.sf_dir,
        "index_dir": args.index_dir,
        "index_rebuilt": built,
        "n_pairs": int(len(pairs)),
        "threshold": args.threshold,
        "index_params": idx_params,
        "wall_sec": round(time.monotonic() - t0, 1),
    }
    with open(os.path.join(args.out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(report, f)
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
