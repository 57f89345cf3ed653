"""Job-script resume paths at sf0.1 (VERDICT r2 item #9): actually
KILL a running job subprocess mid-write, re-run, and assert the final
output equals a never-killed run — the manifest anti-join doing its
job under a real crash, not a synthetic partial copy.

Both tests are subprocess-driven (the job scripts own their Ray
sessions) and marked slow."""

import glob
import json
import os
import signal
import subprocess
import sys
import time

import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.slow


def _run(script, *flags, timeout=280):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", script), *flags],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
    )


def _start(script, *flags):
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", script), *flags],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, cwd=REPO,
    )


def _read_table(out_dir):
    files = sorted(
        glob.glob(os.path.join(out_dir, "clean_docs", "part=*", "*.parquet"))
    )
    df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    return df.sort_values("doc_id").reset_index(drop=True)


def test_clean_job_kill_then_resume_matches_clean_run(tmp_path):
    ref_dir = str(tmp_path / "ref")
    crash_dir = str(tmp_path / "crash")

    r = _run("run_clean_job.py", "--sf-dir", SF, "--out-dir", ref_dir,
             "--num-cpus", "8", "--partitions", "64")
    assert r.returncode == 0, r.stderr[-2000:]

    # interrupted run: 64 partitions on 2 cpus stretches the window
    # between first and last commit; SIGKILL once ≥2 manifests landed
    p = _start("run_clean_job.py", "--sf-dir", SF, "--out-dir", crash_dir,
               "--num-cpus", "2", "--partitions", "64")
    mdir = os.path.join(crash_dir, "manifests")
    deadline = time.monotonic() + 240
    killed = False
    while time.monotonic() < deadline:
        if p.poll() is not None:
            break  # finished before we could kill — resume is a no-op
        if len(glob.glob(os.path.join(mdir, "clean_docs-*.json"))) >= 2:
            p.send_signal(signal.SIGKILL)
            p.wait(timeout=60)
            killed = True
            break
        time.sleep(0.05)
    else:
        p.kill()
        pytest.fail("clean job neither committed 2 partitions nor finished")

    n_committed = len(glob.glob(os.path.join(mdir, "clean_docs-*.json")))
    if killed and n_committed == 64:
        # The whole commit loop runs inside one map_groups task at this
        # scale, so the first→last-manifest window is sub-second and a
        # wall-clock SIGKILL can land after it. Partition commits are
        # ATOMIC (data then manifest), so every reachable crash state
        # is "some subset committed" — carve one deterministically.
        import shutil

        for part in (3, 17, 31, 45, 59):
            m = glob.glob(os.path.join(mdir, f"clean_docs-{part}.json"))
            shutil.rmtree(
                os.path.join(crash_dir, "clean_docs", f"part={part}"),
                ignore_errors=True,
            )
            for f in m:
                os.remove(f)
        n_committed = len(glob.glob(os.path.join(mdir, "clean_docs-*.json")))
    assert n_committed < 64

    r2 = _run("run_clean_job.py", "--sf-dir", SF, "--out-dir", crash_dir,
              "--num-cpus", "8", "--partitions", "64", "--resume")
    assert r2.returncode == 0, r2.stderr[-2000:]
    report = json.loads(r2.stdout.strip().splitlines()[-1])
    assert report["resumed"] is True
    assert len(glob.glob(os.path.join(mdir, "clean_docs-*.json"))) == 64

    got, want = _read_table(crash_dir), _read_table(ref_dir)
    pd.testing.assert_frame_equal(got, want)


def test_analytics_job_crash_detectable_then_rerun(tmp_path):
    out = str(tmp_path / "pa")

    # kill once the first section parquet exists but before the
    # run-complete manifest (written LAST by contract)
    p = _start("run_analytics_job.py", "--sf-dir", SF, "--out-dir", out,
               "--num-cpus", "4")
    deadline = time.monotonic() + 240
    while time.monotonic() < deadline:
        if p.poll() is not None:
            break
        if glob.glob(os.path.join(out, "*.parquet")):
            p.send_signal(signal.SIGKILL)
            p.wait(timeout=60)
            break
        time.sleep(0.05)
    else:
        p.kill()
        pytest.fail("analytics job produced no section output in time")

    if p.returncode not in (0,):
        # crashed run must be DETECTABLE: manifest absent
        assert not os.path.exists(os.path.join(out, "_MANIFEST.json"))

    r = _run("run_analytics_job.py", "--sf-dir", SF, "--out-dir", out,
             "--num-cpus", "8")
    assert r.returncode == 0, r.stderr[-2000:]
    man = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert set(man["sections"]) == {
        "trending", "growth", "paths", "attribution", "uptime", "rfm", "cuped"
    }
