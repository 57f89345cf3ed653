"""Spill-pressure evidence (VERDICT r4 #4): run the headline
doc_triples stream against a deliberately TINY object store
(default 2 GiB — ~5% of the normal allotment) so Ray must spill to
disk if streaming backpressure ever lets blocks accumulate, and record
throughput + spill volume. The claim this script substantiates: the
fused single-operator pipeline streams with bounded in-flight state,
so a 100-TB input survives an object store that is a tiny fraction of
the data volume with bounded degradation.

Usage (fresh process; owns its own Ray session):
    python scripts/bench_spill.py                 # 2 GiB store, repeat=1024
    GRAFT_SPILL_STORE_GB=1 GRAFT_REPEAT=2048 python scripts/bench_spill.py

Prints one JSON line:
    {"metric": "spill_pressure", "sec": ..., "n_pages": ...,
     "pages_per_sec": ..., "object_store_gb": ..., "spilled_mb": ...,
     "restored_mb": ..., "num_cpus": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", 32))
    store_gb = float(os.environ.get("GRAFT_SPILL_STORE_GB", 2))
    repeat = int(os.environ.get("GRAFT_REPEAT", 1024))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    ray.init(
        address="local", num_cpus=ncpu, include_dashboard=False,
        object_store_memory=int(store_gb * (1 << 30)),
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fastie_ray.pipelines.kg import doc_triples
    from fastie_ray.sources.pages import pages_from_documents
    from fastie_ray.synth import build_world

    world = build_world()
    world_ref = ray.put(world)

    # warmup: spin up the actor pool once
    doc_triples(
        pages_from_documents(sf_dir, world, repeat=8),
        world_ref=world_ref, concurrency=max(2, ncpu - 2),
    ).count()

    pages = pages_from_documents(sf_dir, world, repeat=repeat)
    n_pages = pages.count()

    # --exchange: run the batch_size path instead — its hash-bucketed
    # dedup EXCHANGE must hold the full triple table across the
    # all-to-all barrier, which is what actually overflows a tiny
    # store and exercises the spill path (the default fused pipeline
    # never accumulates: backpressure keeps in-flight state bounded)
    exchange = "--exchange" in sys.argv
    kw = {"batch_size": 512} if exchange else {}

    t0 = time.monotonic()
    n_triples = doc_triples(
        pages_from_documents(sf_dir, world, repeat=repeat),
        world_ref=world_ref, concurrency=max(2, ncpu - 2), **kw,
    ).count()
    sec = time.monotonic() - t0

    # spill volume measured on disk: plasma writes spilled objects
    # under <session_dir>/ray_spilled_objects* (the grpc-backed
    # memory_summary API isn't available in this container)
    session_dir = ray._private.worker._global_node.get_session_dir_path()
    spilled_bytes = 0
    for root, _dirs, files in os.walk(session_dir):
        for fn in files:
            if "spilled" in fn or "spilled" in os.path.basename(root):
                try:
                    spilled_bytes += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    # on-disk files vanish when objects free — the raylet log keeps the
    # CUMULATIVE "Spilled N MiB" counter, so take the max of both
    log_mb = 0.0
    raylet_log = os.path.join(session_dir, "logs", "raylet.out")
    try:
        with open(raylet_log, errors="ignore") as f:
            for m in re.finditer(r"Spilled (\d+) MiB", f.read()):
                log_mb = max(log_mb, float(m.group(1)))
    except OSError:
        pass
    spilled = max(round(spilled_bytes / (1 << 20), 1), log_mb)

    print(json.dumps({
        "metric": "spill_pressure_exchange" if exchange
        else "spill_pressure",
        "sec": round(sec, 3),
        "n_pages": int(n_pages),
        "n_triples": int(n_triples),
        "pages_per_sec": round(n_pages / sec, 1),
        "object_store_gb": store_gb,
        "spilled_mb": spilled,
        "num_cpus": ncpu,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
