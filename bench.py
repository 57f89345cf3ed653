"""Benchmark harness (driver contract).

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "triples_per_sec": ...}

--scaling: run the headline KG pipeline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and report both
throughputs + scaling efficiency (the sandbox proxy for the N vs 4N
node criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _headline(sf_dir: str) -> dict:
    """KG-construction throughput: pages → triples (count consumed)."""
    import ray

    from fastie_ray.pipelines.kg import extract_triples
    from fastie_ray.sources.pages import pages_from_documents
    from fastie_ray.synth import build_world

    world = build_world()
    world_ref = ray.put(world)
    # warm the page cache so we measure compute+shuffle, not first disk read
    pages_from_documents(sf_dir, world).count()

    t0 = time.monotonic()
    mentions, triples = extract_triples(pages_from_documents(sf_dir, world), world_ref=world_ref, concurrency=int(os.environ.get("RAY_GRAFT_CPUS", 32)) // 2)
    n_triples = triples.count()
    headline = time.monotonic() - t0
    return {"sec": headline, "n_triples": n_triples}


def _query_timings(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as e

    out: dict[str, float] = {}
    qs = e.queries()
    for name in ("extract_text", "chunk_stats", "kg_triples", "dedup_docs",
                 "knn", "events_by_type", "q1_lineitem"):
        t0 = time.monotonic()
        res = qs[name](sf_dir)
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.monotonic() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", 32))

    import ray

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    head = _headline(sf_dir)
    queries = _query_timings(sf_dir)
    result = {
        "metric": "kg_construction_e2e",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "n_triples": head["n_triples"],
        "triples_per_sec": round(head["n_triples"] / head["sec"], 1),
    }
    ray.shutdown()
    print(json.dumps(result))


def scaling() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    tput_lo = lo["n_triples"] / lo["value"]
    tput_hi = hi["n_triples"] / hi["value"]
    eff = (tput_hi / tput_lo) / (32 / 8)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "sec_8": lo["value"],
                "sec_32": hi["value"],
                "triples_per_sec_8": round(tput_lo, 1),
                "triples_per_sec_32": round(tput_hi, 1),
                "scaling_efficiency": round(eff, 3),
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
