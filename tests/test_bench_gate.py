"""bench.py --check regression gate: threshold semantics and
malformed-filename tolerance (no Ray needed)."""

from __future__ import annotations

import importlib.util
import json
import os


def _load_bench(tmp_path):
    import shutil

    src = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    dst = tmp_path / "bench.py"
    shutil.copy(src, dst)
    spec = importlib.util.spec_from_file_location("bench_t", dst)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gate_thresholds_and_driver_shape(tmp_path):
    (tmp_path / "BENCH_r03.json").write_text(json.dumps(
        {"queries": {"a": 1.0, "b": 0.1, "c": 2.0}}
    ))
    # driver-recorded shape wraps bench stdout under "parsed"; also the
    # LATEST round must win
    (tmp_path / "BENCH_r04.json").write_text(json.dumps(
        {"parsed": {"queries": {"a": 2.0, "b": 0.1, "c": 2.0}}}
    ))
    b = _load_bench(tmp_path)
    g = b._regression_gate({
        "a": 2.9,    # 1.45x of r4's 2.0 — below ratio threshold
        "b": 0.9,    # 9x but only +0.8s — below absolute threshold
        "c": 3.5,    # 1.75x AND +1.5s — regression
        "new": 9.9,  # not in baseline — ignored
    })
    assert g["baseline_file"] == "BENCH_r04.json"
    assert g["n_compared"] == 3
    assert list(g["regressions"]) == ["c"]
    assert g["regressions"]["c"]["ratio"] == 1.75


def test_gate_tolerates_malformed_names_and_absence(tmp_path):
    b = _load_bench(tmp_path)
    assert b._regression_gate({"a": 1.0})["baseline_file"] is None
    # stray files matching the glob but not the _rN pattern must not
    # crash the gate (code-review r5)
    (tmp_path / "BENCH_rerun.json").write_text("{}")
    (tmp_path / "BENCH_r05.json").write_text(json.dumps(
        {"queries": {"a": 1.0}}
    ))
    g = b._regression_gate({"a": 1.05})
    assert g["baseline_file"] == "BENCH_r05.json"
    assert g["regressions"] == {}
