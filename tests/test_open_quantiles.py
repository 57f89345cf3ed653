"""Test ops.stats.open_quantiles vs numpy on wide domains, boundary
qs, and a hot-value skew case."""

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def _disc(v: np.ndarray, q: float) -> int:
    # percentile_disc: smallest value with cum count >= ceil(q*n)
    s = np.sort(v)
    from fractions import Fraction

    f = Fraction(str(q))
    k = -(-(f.numerator * len(s)) // f.denominator)
    k = min(max(1, k), len(s))
    return int(s[k - 1])


def test_open_quantiles_wide_domain():
    from fastie_ray.ops.stats import open_quantiles

    rng = np.random.default_rng(53)
    v = rng.integers(-10**12, 10**12, 5000).astype(np.int64)
    df = pd.DataFrame({"x": v})
    qs = [0.01, 0.25, 0.5, 0.9, 1.0]
    got = open_quantiles(_ds(df, 4), "x", qs)
    for q in qs:
        assert (
            int(got.loc[got["q"] == q, "value"].iloc[0]) == _disc(v, q)
        ), q


def test_open_quantiles_hot_value_skew():
    from fastie_ray.ops.stats import open_quantiles

    # 90% of rows are one value; the hot rid ships counts, not rows
    v = np.concatenate(
        [np.full(9000, 42, dtype=np.int64),
         np.arange(1000, dtype=np.int64) * 1_000_003]
    )
    rng = np.random.default_rng(3)
    rng.shuffle(v)
    df = pd.DataFrame({"x": v})
    got = open_quantiles(_ds(df, 4), "x", [0.5, 0.99])
    assert int(got.loc[got["q"] == 0.5, "value"].iloc[0]) == _disc(v, 0.5)
    assert int(got.loc[got["q"] == 0.99, "value"].iloc[0]) == _disc(v, 0.99)


def test_open_quantiles_weighted():
    from fastie_ray.ops.stats import open_quantiles

    rng = np.random.default_rng(59)
    df = pd.DataFrame(
        {
            "x": rng.integers(-1000, 1000, 2000).astype(np.int64),
            "w": rng.integers(1, 9, 2000).astype(np.int64),
        }
    )
    got = open_quantiles(_ds(df, 4), "x", [0.5, 0.9], weight_col="w")
    # reference: expand by weight, then unweighted disc quantile
    expanded = np.repeat(df["x"].to_numpy(), df["w"].to_numpy())
    for q in (0.5, 0.9):
        assert (
            int(got.loc[got["q"] == q, "value"].iloc[0])
            == _disc(expanded, q)
        ), q


def test_grouped_open_quantiles_vs_numpy():
    from fastie_ray.ops.stats import grouped_open_quantiles

    rng = np.random.default_rng(61)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 6000),
            "x": rng.integers(-10**12, 10**12, 6000).astype(np.int64),
        }
    )
    # one group gets a hot value to exercise the in-rid count walk
    hot = df.index[df["g"] == "b"][:1500]
    df.loc[hot, "x"] = 777
    qs = [0.01, 0.5, 0.9, 1.0]
    got = grouped_open_quantiles(_ds(df, 4), "g", "x", qs)
    for g in ("a", "b", "c"):
        v = df.loc[df["g"] == g, "x"].to_numpy()
        for q in qs:
            want = _disc(v, q)
            row = got[(got["g"] == g) & (got["q"] == q)]
            assert int(row["value"].iloc[0]) == want, (g, q)


def test_grouped_open_quantiles_weighted(ray_session):
    from fastie_ray.ops.stats import grouped_open_quantiles

    rng = np.random.default_rng(83)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 3000),
            "x": rng.integers(-500, 500, 3000).astype(np.int64),
            "w": rng.integers(1, 7, 3000).astype(np.int64),
        }
    )
    got = grouped_open_quantiles(
        _ds(df, 4), "g", "x", [0.5, 0.9], weight_col="w"
    )
    for g in ("a", "b"):
        sub = df[df["g"] == g]
        expanded = np.repeat(sub["x"].to_numpy(), sub["w"].to_numpy())
        for q in (0.5, 0.9):
            want = _disc(expanded, q)
            row = got[(got["g"] == g) & (got["q"] == q)]
            assert int(row["value"].iloc[0]) == want, (g, q)


def test_grouped_psi_matches_global_per_slice(ray_session):
    from fastie_ray.ops.stats import grouped_psi_drift, psi_drift

    rng = np.random.default_rng(89)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], n),
            "m": rng.integers(0, 2, n).astype("int64"),
            "v": rng.integers(0, 16_000, n).astype("int64"),
        }
    )
    got = (
        grouped_psi_drift(
            ray.data.from_pandas(df).repartition(4),
            "g", "m", "v", n_bins=16, bin_width=1000, n_buckets=4,
        )
        .to_pandas()
        .sort_values(["g", "bin"])
        .reset_index(drop=True)
    )
    for gv in ("x", "y"):
        sub = df[df["g"] == gv]
        want = psi_drift(
            ray.data.from_pandas(
                sub[sub["m"] == 0][["v"]].reset_index(drop=True)
            ),
            ray.data.from_pandas(
                sub[sub["m"] == 1][["v"]].reset_index(drop=True)
            ),
            "v", n_bins=16, bin_width=1000,
        )
        part = got[got["g"] == gv][
            ["bin", "n_a", "n_b", "psi_term"]
        ].reset_index(drop=True)
        pd.testing.assert_frame_equal(part, want, check_dtype=False)
