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


# ----------------------------------------------------------- count-min


def _cms_reference(texts, depth=4, width=512):
    import re

    grid = np.zeros((depth, width), dtype=np.int64)
    counts = {}
    for t in texts:
        for tok in re.findall(r"[A-Za-z0-9]+", t.lower()):
            counts[tok] = counts.get(tok, 0) + 1
    for tok, n in counts.items():
        for d in range(depth):
            h = int(hashlib.md5(f"{d}:{tok}".encode()).hexdigest()[:15], 16)
            grid[d, h % width] += n
    rows = [
        (d, c, grid[d, c])
        for d in range(depth)
        for c in np.nonzero(grid[d])[0]
    ]
    return (
        pd.DataFrame(rows, columns=["d", "cell", "count"])
        .astype("int64")
        .sort_values(["d", "cell"])
        .reset_index(drop=True)
    ), counts


def test_cms_registers_match_reference_any_partitioning():
    from fastie_ray.ops.sketch import cms_estimate, cms_token_registers

    rng = np.random.default_rng(71)
    words = ["alpha", "beta", "gamma", "delta", "x9", "longword"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(3, 12)))
        for _ in range(400)
    ]
    want, counts = _cms_reference(texts)
    df = pd.DataFrame({"text": texts})
    for parts in (1, 8):
        got = cms_token_registers(
            ray.data.from_pandas(df).repartition(parts), "text"
        )
        pd.testing.assert_frame_equal(got, want)
    # point estimates: exact upper bounds, exact when rows are sparse
    est = cms_estimate(got, list(counts) + ["absenttoken"])
    assert est["absenttoken"] >= 0
    for tok, n in counts.items():
        assert est[tok] >= n


def test_cms_empty_input():
    from fastie_ray.ops.sketch import cms_token_registers

    got = cms_token_registers(
        ray.data.from_pandas(pd.DataFrame({"text": pd.Series([], dtype=str)})),
        "text",
    )
    assert len(got) == 0 and list(got.columns) == ["d", "cell", "count"]


def test_hll_overlap_inclusion_exclusion(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.sketch import hll_estimate, hll_registers

    a_ids = list(range(3000))          # A = 0..2999
    b_ids = list(range(2000, 7000))    # B = 2000..6999; |A∩B| = 1000
    a = hll_registers(ray.data.from_items([{"u": i} for i in a_ids]), "u")
    b = hll_registers(ray.data.from_items([{"u": i} for i in b_ids]), "u")
    m = a.rename(columns={"max_rho": "ra"}).merge(
        b.rename(columns={"max_rho": "rb"}), on="register", how="outer"
    ).fillna(0)
    union = pd.DataFrame(
        {
            "register": m["register"].astype("int64"),
            "max_rho": m[["ra", "rb"]].max(axis=1).astype("int64"),
        }
    )
    est_a, est_b = hll_estimate(a), hll_estimate(b)
    est_u = hll_estimate(union)
    inter = est_a + est_b - est_u
    assert abs(est_u - 7000) / 7000 < 0.15
    assert abs(inter - 1000) < 0.25 * 7000  # intersection error scales with union
