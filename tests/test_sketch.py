"""Oracles for `fastie_ray/ops/sketch.py`: register-state parity with a
driver reference, merge associativity across partitionings, and
estimate accuracy."""

import hashlib

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.sketch import hll_estimate, hll_registers

M = 256


def _reference_registers(values):
    regs = np.zeros(M, dtype=np.int64)
    for v in set(str(x) for x in values):
        h = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        reg, rest = h % M, h // M
        rho = 61 if rest == 0 else (rest & -rest).bit_length()
        regs[reg] = max(regs[reg], rho)
    idx = np.nonzero(regs)[0]
    return pd.DataFrame({"register": idx.astype("int64"), "max_rho": regs[idx]})


def test_registers_match_reference_any_partitioning():
    rng = np.random.default_rng(61)
    vals = rng.integers(0, 5000, 20_000)
    df = pd.DataFrame({"u": vals})
    want = _reference_registers(vals)
    for parts in (1, 8):
        got = hll_registers(
            ray.data.from_pandas(df).repartition(parts), "u", n_registers=M
        )
        pd.testing.assert_frame_equal(got, want)


def test_estimate_accuracy():
    rng = np.random.default_rng(67)
    true_n = 8000
    vals = rng.choice(true_n * 10, size=true_n, replace=False)
    df = pd.DataFrame({"u": np.repeat(vals, 3)})  # duplicates don't matter
    regs = hll_registers(ray.data.from_pandas(df), "u", n_registers=M)
    est = hll_estimate(regs, n_registers=M)
    assert abs(est - true_n) / true_n < 0.15  # ~1.04/sqrt(256) ≈ 6.5% typical


def test_empty_and_null_inputs():
    df = pd.DataFrame({"u": pd.Series([None, None], dtype="object")})
    regs = hll_registers(ray.data.from_pandas(df), "u")
    assert len(regs) == 0
    assert hll_estimate(regs) < 1.0


def test_grouped_registers_match_per_group_reference():
    rng = np.random.default_rng(71)
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 900, 4000),
            "g": rng.choice(["a", "b", "c"], 4000),
        }
    )
    from fastie_ray.ops.sketch import hll_registers_grouped

    got = hll_registers_grouped(
        ray.data.from_pandas(df).repartition(5), "u", "g", n_registers=M
    )
    for grp in ("a", "b", "c"):
        want = _reference_registers(df.loc[df["g"] == grp, "u"])
        sub = got[got["group"] == grp][["register", "max_rho"]].reset_index(drop=True)
        pd.testing.assert_frame_equal(sub, want)
