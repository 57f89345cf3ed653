"""YAML job-config surface (fastie_ray.config): the yaml mapping and
the CLI flags share one argparse schema — reference parity with
FastIE's single-yaml-argv dispatch (fastie/hparams/parser.py:26-43)."""

import argparse
import os
import subprocess
import sys

import pytest

from fastie_ray.config import job_argv, yaml_to_argv

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_yaml_to_argv_types(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(
        "sf_dir: /x\npartitions: 4\nresume: true\nkeep_text: false\n"
        "num_cpus: null\ncols:\n - a\n - b\n"
    )
    argv = yaml_to_argv(str(p))
    assert argv == [
        "--sf-dir", "/x", "--partitions", "4", "--resume",
        "--cols", "a", "b",
    ]
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir")
    ap.add_argument("--partitions", type=int)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--keep-text", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--cols", nargs="*")
    args = ap.parse_args(argv)
    assert args.partitions == 4 and args.resume and not args.keep_text
    assert args.num_cpus is None and args.cols == ["a", "b"]


def test_job_argv_dispatch(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text("out_dir: /tmp/x\n")
    assert job_argv([str(p)]) == ["--out-dir", "/tmp/x"]
    # anything other than a single yaml path defers to real argv
    assert job_argv(["--out-dir", "/tmp/x"]) is None
    assert job_argv([str(p), "--resume"]) is None
    assert job_argv([]) is None


def test_yaml_rejects_non_mapping(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("- a\n- b\n")
    with pytest.raises(ValueError):
        yaml_to_argv(str(p))


@pytest.mark.slow
def test_clean_job_runs_from_yaml(tmp_path):
    cfg = tmp_path / "job.yaml"
    out = tmp_path / "out"
    cfg.write_text(
        f"sf_dir: /root/testdata/sf0.001\nout_dir: {out}\n"
        "partitions: 4\nnum_cpus: 4\n"
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/run_clean_job.py"),
         str(cfg)],
        capture_output=True, text=True, timeout=280, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert '"job": "corpus_clean"' in r.stdout
