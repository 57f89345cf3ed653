"""Data-governance AUDIT job entry point — the third ``ray job
submit`` shape next to ``run_kg_job.py`` (extraction) and
``run_clean_job.py`` (curation): one pass over a warehouse directory
producing the release-gate report a data-platform team runs before
shipping a dataset.

    ray job submit --working-dir . -- \
        python scripts/run_audit_job.py --sf-dir /data/sf --out-dir /tmp/audit

Sections (each a documented op, each a bounded artifact):
- ``profile``    — per-column nulls/distinct/min-max (ops.profile)
- ``dq``         — constraint violations (range, uniqueness,
                   referential integrity, accepted values)
- ``skew``       — per-key Gini/top-k shares of the join keys
- ``fd``         — functional-dependency violations
- ``kanon``      — k-anonymity risky classes
- ``ldiv``       — l-diversity risky classes

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
    import ray.data

    from fastie_ray.ops.privacy import k_anonymity_audit, l_diversity_audit
    from fastie_ray.ops.profile import (
        dq_report,
        distinct_violations,
        orphan_count,
        table_profile,
        violation_count,
    )
    from fastie_ray.ops.stats import fd_violations, skew_report

    os.makedirs(args.out_dir, exist_ok=True)
    sf = args.sf_dir
    report: dict = {"sections": {}}

    def read(table, columns=None):
        return ray.data.read_parquet(
            f"{sf}/{table}.parquet", columns=columns, override_num_blocks=16
        )

    def emit(name: str, df: pd.DataFrame, t0: float) -> None:
        path = os.path.join(args.out_dir, f"{name}.parquet")
        df.to_parquet(path)
        report["sections"][name] = {
            "rows": int(len(df)),
            "sec": round(time.monotonic() - t0, 3),
        }

    t0 = time.monotonic()
    prof = table_profile(
        read("orders", ["o_orderkey", "o_custkey", "o_totalprice"]),
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )
    emit("profile", prof, t0)

    t0 = time.monotonic()
    li = read("lineitem", ["l_orderkey", "l_quantity"])
    orders = read("orders", ["o_orderkey", "o_totalprice"])
    qty_v, qty_n = violation_count(
        li, lambda df: (df["l_quantity"] < 1) | (df["l_quantity"] > 50)
    )
    uniq_v, uniq_n = distinct_violations(orders, "o_orderkey")
    orph_v, orph_n = orphan_count(
        li, orders, on="l_orderkey", right_on="o_orderkey"
    )
    neg_v, neg_n = violation_count(orders, lambda df: df["o_totalprice"] < 0)
    emit(
        "dq",
        dq_report(
            [
                ("qty_range", qty_v, qty_n),
                ("orderkey_unique", uniq_v, uniq_n),
                ("li_orphans", orph_v, orph_n),
                ("price_nonneg", neg_v, neg_n),
            ]
        ),
        t0,
    )

    t0 = time.monotonic()
    emit("skew", skew_report(read("lineitem", ["l_suppkey"]), "l_suppkey"), t0)

    t0 = time.monotonic()
    emit(
        "fd",
        fd_violations(
            read("documents", ["source", "lang"]), "source", "lang"
        ).to_pandas(),
        t0,
    )

    t0 = time.monotonic()
    emit(
        "kanon",
        k_anonymity_audit(
            read("customer", ["c_nationkey", "c_mktsegment"]),
            ["c_nationkey", "c_mktsegment"], k=8,
        ).to_pandas(),
        t0,
    )

    t0 = time.monotonic()
    cust = read("customer", ["c_nationkey", "c_custkey", "c_mktsegment"])
    prepped = cust.map_batches(
        lambda df: pd.DataFrame(
            {
                "c_nationkey": df["c_nationkey"],
                "kb": df["c_custkey"].astype("int64") % 10,
                "c_mktsegment": df["c_mktsegment"],
            }
        ),
        batch_format="pandas",
    )
    emit(
        "ldiv",
        l_diversity_audit(
            prepped, ["c_nationkey", "kb"], "c_mktsegment", l=4
        ).to_pandas(),
        t0,
    )

    # manifest LAST: its presence marks a complete audit
    with open(os.path.join(args.out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(report, f)
    print(json.dumps({"ok": True, "out_dir": args.out_dir, **report}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
