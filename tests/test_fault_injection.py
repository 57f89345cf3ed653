"""Fault injection (VERDICT r4 #3): SIGKILL a scorer-pool worker
process MID-STREAM during the headline doc_triples run and assert
Ray's actor restart + task retry deliver a result identical to the
clean run — at-least-once execution with idempotent output.

What Ray retries here (NOTES fact): a map_batches ACTOR pool runs with
max_restarts/max_task_retries wired by Ray Data; a killed worker's
in-flight batch is retried on a restarted actor, and lost intermediate
blocks are rebuilt from lineage. What Ray does NOT retry: the driver
process, and (by default) tasks whose failure is an application
EXCEPTION rather than a process death — those surface to the caller."""

from __future__ import annotations

import os
import signal
import threading
import time

import pytest

import ray


def _clean_run(n_docs: int):
    from fastie_ray.pipelines.kg import doc_triples
    from fastie_ray.synth import synth_pages_dataset

    return (
        doc_triples(synth_pages_dataset(n_docs), concurrency=3)
        .to_pandas()
        .sort_values(["url", "predicate", "subject", "object"])
        .reset_index(drop=True)
    )


def _scorer_worker_pids() -> list[int]:
    # Ray retitles actor worker processes "ray::<class>"; scan /proc
    # rather than ray.util.state (the state API needs the dashboard,
    # which test sessions run without)
    pids = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ")
        except OSError:
            continue
        if b"ray::MapWorker" in cmd and b"RelScorer" in cmd:
            pids.append(int(entry))
    return pids


@pytest.mark.timeout(600)
def test_doc_triples_survives_worker_kill(ray_session):
    n_docs = 20_000
    want = _clean_run(n_docs)
    assert len(want) > 1000

    killed = {"pid": None}

    def killer():
        # wait for the actor pool to spin up and start scoring, then
        # SIGKILL one worker process (NOT a graceful exit)
        deadline = time.time() + 60
        while time.time() < deadline:
            pids = _scorer_worker_pids()
            if pids:
                # give the pool a moment so the kill lands mid-stream
                time.sleep(0.5)
                pid = pids[0]
                try:
                    os.kill(pid, signal.SIGKILL)
                    killed["pid"] = pid
                except ProcessLookupError:
                    continue
                return
            time.sleep(0.05)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    got = _clean_run(n_docs)
    t.join(timeout=90)

    assert killed["pid"] is not None, "killer never found a live worker"
    # the killed pid is really gone
    with pytest.raises(ProcessLookupError):
        os.kill(killed["pid"], 0)

    # identical result despite the mid-stream process death
    assert len(got) == len(want)
    assert got.equals(want)


def _synth_edges(n_nodes: int, n_edges: int, seed: int = 0):
    import numpy as np
    import pandas as pd

    import ray.data

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "src": rng.integers(0, n_nodes, n_edges).astype("int64"),
        "dst": rng.integers(0, n_nodes, n_edges).astype("int64"),
    }).drop_duplicates()
    return ray.data.from_pandas(df).repartition(16)


def _task_worker_pids() -> list[int]:
    # raw-task workers are retitled "ray::<fn>"; exclude actor pools
    pids = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\x00", b" ")
        except OSError:
            continue
        if (b"ray::" in cmd and b"IDLE" not in cmd
                and b"MapWorker" not in cmd):
            pids.append(int(entry))
    return pids


@pytest.mark.timeout(600)
def test_pagerank_exchange_survives_worker_kill(ray_session):
    """The OTHER execution substrate: the raw-task BlockSet exchange
    (state/exchange.py) that pagerank's fixed-point iterations run on.
    SIGKILL a task worker mid-iteration; Ray's task retry (lineage
    re-execution) must deliver the integer-exact identical rank table."""
    from fastie_ray.ops.graph import pagerank

    edges = _synth_edges(40_000, 400_000).materialize()
    want = (
        pagerank(edges, n_iter=6)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )

    killed = {"pid": None}

    def killer():
        deadline = time.time() + 60
        while time.time() < deadline:
            pids = _task_worker_pids()
            if pids:
                try:
                    os.kill(pids[0], signal.SIGKILL)
                    killed["pid"] = pids[0]
                except ProcessLookupError:
                    continue
                return
            time.sleep(0.02)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    got = (
        pagerank(edges, n_iter=6)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    t.join(timeout=60)
    assert killed["pid"] is not None, "killer never found a task worker"
    # integer fixed-point ranks: bit-identical despite the kill
    assert got.equals(want)
