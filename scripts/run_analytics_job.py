"""Product-ANALYTICS batch job entry point — the fourth ``ray job
submit`` shape next to ``run_kg_job.py`` (extraction),
``run_clean_job.py`` (curation) and ``run_audit_job.py``
(governance): one pass over the event warehouse producing the daily
growth/engagement pack a product team ships to its dashboard.

    ray job submit --working-dir . -- \
        python scripts/run_analytics_job.py --sf-dir /data/sf --out-dir /tmp/pa

Sections (each a documented, oracle-checked op):
- ``trending``      — top users per event type by time-decayed activity
                      (composite-key decayed_counts + grouped_topk)
- ``growth``        — new-vs-returning daily active split
- ``paths``         — top length-3 user journeys (two-phase n-gram)
- ``attribution``   — first-touch click per purchase (band_join argmin)
- ``uptime``        — per-user covered active time (interval union)
- ``rfm``           — recency/frequency/monetary quartile segments
- ``cuped``         — variance-reduced A/B readout (arm = user_id % 2)

Writes one parquet per section plus ``_MANIFEST.json`` (row counts +
wall time per section, committed LAST so a crashed run is detectable).
Prints a one-line JSON job report."""

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
    ap.add_argument("--num-cpus", type=int, default=None)
    from fastie_ray.config import job_argv

    args = ap.parse_args(job_argv())

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd

    import __ray_entry__ as entry

    os.makedirs(args.out_dir, exist_ok=True)
    report: dict = {"sections": {}}

    def emit(name: str, res, t0: float) -> None:
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        if not isinstance(df, pd.DataFrame):
            df = pd.DataFrame(df)
        path = os.path.join(args.out_dir, f"{name}.parquet")
        df.to_parquet(path)
        report["sections"][name] = {
            "rows": int(len(df)),
            "sec": round(time.monotonic() - t0, 3),
        }

    qs = entry.queries()
    for section, qname in (
        ("trending", "trending"),
        ("growth", "new_vs_returning"),
        ("paths", "top_paths"),
        ("attribution", "first_touch"),
        ("uptime", "uptime_totals"),
        ("rfm", "rfm_segments"),
        ("cuped", "cuped"),
    ):
        t0 = time.monotonic()
        emit(section, qs[qname](args.sf_dir), t0)

    # manifest LAST: its presence marks a complete run
    with open(os.path.join(args.out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(report, f)
    print(json.dumps({"ok": True, "out_dir": args.out_dir, **report}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
