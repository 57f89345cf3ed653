"""Oracles for `fastie_ray/ops/stats.py`: numpy references and
percentile_disc boundary semantics."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.stats import exact_quantiles, value_counts


def test_value_counts_matches_reference_any_layout():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"v": rng.integers(0, 40, size=1000).astype(np.int64)})
    want = df["v"].value_counts().to_dict()
    for parts in (1, 7):
        out = value_counts(
            ray.data.from_pandas(df).repartition(parts), "v"
        ).to_pandas()
        assert dict(zip(out["v"], out["n"])) == want


def test_exact_quantiles_boundary_cases():
    # n=20, q=0.3 → k=6 exactly (float 0.3*20 = 6.000000000000001 would
    # ceil to 7 — the Fraction arithmetic must not)
    df = pd.DataFrame({"v": np.arange(1, 21, dtype=np.int64)})
    out = exact_quantiles(ray.data.from_pandas(df).repartition(3), "v", [0.3, 0.5, 1.0])
    got = dict(zip(out["q"], out["value"]))
    assert got == {0.3: 6, 0.5: 10, 1.0: 20}


def test_exact_quantiles_with_duplicates_matches_cume_rule():
    vals = np.array([1, 2, 2, 3, 7, 9, 9, 9, 10, 50], dtype=np.int64)
    df = pd.DataFrame({"v": vals})
    out = exact_quantiles(ray.data.from_pandas(df), "v", [0.25, 0.5, 0.75, 0.9])
    got = dict(zip(out["q"], out["value"]))
    assert got == {0.25: 2, 0.5: 7, 0.75: 9, 0.9: 10}


def test_heavy_hitters_exact_on_skewed_stream(ray_session):
    """MG compression must actually trigger (vocab >> k) and the
    verify pass must return EXACTLY the brute-force heavy hitters."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.stats import heavy_hitters

    rng = np.random.default_rng(7)
    # 3 planted hot items + 20k-long Zipf-ish cold tail
    hot = np.repeat(["alpha", "beta", "gamma"], [4000, 2500, 1200])
    cold = np.array([f"t{int(i)}" for i in rng.integers(0, 20000, size=42000)])
    items = np.concatenate([hot, cold])
    rng.shuffle(items)
    df = pd.DataFrame({"text": items})
    ds = ray.data.from_pandas(df).repartition(8)

    min_share = 0.02  # k = 100 counters << 20k vocab
    out = (
        heavy_hitters(ds, min_share=min_share, item_fn=lambda d: d["text"])
        .to_pandas()
        .sort_values("item")
        .reset_index(drop=True)
    )
    vc = pd.Series(items).value_counts()
    import math
    thr = math.ceil(min_share * len(items))
    want = (
        vc[vc >= thr]
        .rename_axis("item")
        .reset_index(name="n_occ")
        .sort_values("item")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.astype({"n_occ": "int64"}), want.astype({"n_occ": "int64"})
    )


def test_grouped_quantiles_bruteforce(ray_session):
    """Grouped quantile_disc semantics: per-group ceil(q·n) cut,
    including singleton groups and heavy ties."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.stats import grouped_quantiles

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=200),
            "v": rng.integers(0, 12, size=200).astype("int64"),
        }
    )
    df = pd.concat(
        [df, pd.DataFrame({"g": ["solo"], "v": [np.int64(5)]})],
        ignore_index=True,
    )
    qs = [0.1, 0.5, 0.9, 0.99]
    got = (
        grouped_quantiles(ray.data.from_pandas(df), "g", "v", qs, n_buckets=4)
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    rows = []
    for key, grp in df.groupby("g"):
        vals = np.sort(grp["v"].to_numpy())
        for q in qs:
            from fractions import Fraction

            f = Fraction(str(q))
            k = -(-(f.numerator * len(vals)) // f.denominator)
            k = min(max(1, k), len(vals))
            rows.append((key, float(q), vals[k - 1]))
    ref = pd.DataFrame(rows, columns=["g", "q", "v"]).rename(
        columns={"v": "value"}
    )
    ref = ref.sort_values(["g", "q"]).reset_index(drop=True)
    ref["value"] = ref["value"].astype("int64")
    pd.testing.assert_frame_equal(got, ref)


def test_filter_by_quantile_modes_and_ties():
    import ray.data

    from fastie_ray.ops.stats import filter_by_quantile

    # values with heavy ties straddling the P25 threshold
    vals = [1, 2, 2, 2, 3, 4, 5, 5, 6, 7, 8, 9]
    ds = ray.data.from_pandas(pd.DataFrame({"x": np.array(vals, dtype="int64")}))
    n = len(vals)
    # quantile_disc(0.25): k = ceil(0.25 * 12) = 3 → sorted[2] = 2
    th = 2
    for keep, op in (("ge", lambda v: v >= th), ("gt", lambda v: v > th),
                     ("le", lambda v: v <= th), ("lt", lambda v: v < th)):
        got = sorted(
            filter_by_quantile(ds, "x", 0.25, keep=keep).to_pandas()["x"]
        )
        assert got == sorted(v for v in vals if op(v)), keep

    import pytest

    with pytest.raises(ValueError):
        filter_by_quantile(ds, "x", 0.25, keep="eq")


def test_grouped_heavy_hitters_matches_brute_force():
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.stats import grouped_heavy_hitters

    rng = np.random.default_rng(89)
    # zipfy items, three groups of very different sizes
    groups = rng.choice(["en", "de", "fr"], size=30_000, p=[0.7, 0.2, 0.1])
    items = np.array([f"w{int(x)}" for x in rng.zipf(1.5, 30_000) % 200])
    df = pd.DataFrame({"g": groups, "i": items})

    def pair_fn(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"group": b["g"], "item": b["i"]})

    share = 0.01  # p/q = 1/100
    brute = df.groupby(["g", "i"]).size().reset_index(name="n")
    tot = df.groupby("g").size()
    brute = brute[100 * brute["n"] >= tot.reindex(brute["g"]).to_numpy()]
    want = {
        (g, i): int(n) for g, i, n in brute.itertuples(index=False)
    }
    for parts in (1, 8):
        out = grouped_heavy_hitters(
            ray.data.from_pandas(df).repartition(parts), share, pair_fn
        ).to_pandas()
        got = {
            (g, i): int(n)
            for g, i, n in out[["group", "item", "n_occ"]].itertuples(index=False)
        }
        assert got == want


def test_grouped_heavy_hitters_empty():
    import pandas as pd
    import ray.data

    from fastie_ray.ops.stats import grouped_heavy_hitters

    df = pd.DataFrame({"g": pd.Series([], dtype=str), "i": pd.Series([], dtype=str)})
    out = grouped_heavy_hitters(
        ray.data.from_pandas(df), 0.01,
        lambda b: pd.DataFrame({"group": b["g"], "item": b["i"]}),
    ).to_pandas()
    assert len(out) == 0


def test_winsorized_stats_clamps_tails(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.stats import winsorized_stats

    # group 'a': 1..100 with an outlier 10_000 -> p95 clamps it
    rows = [{"g": "a", "v": i} for i in range(1, 101)] + [
        {"g": "a", "v": 10_000},
        {"g": "b", "v": 5},
        {"g": "b", "v": 7},
    ]
    ds = ray.data.from_items(rows).repartition(4)
    out = winsorized_stats(ds, "g", "v", lo_q=0.05, hi_q=0.95)
    a = out[out["g"] == "a"].iloc[0]
    # quantile_disc semantics: k = ceil(q*n) over 101 values
    assert a["lo"] == 6 and a["hi"] == 96
    expect = sum(min(max(v, 6), 96) for v in list(range(1, 101)) + [10_000])
    assert a["n"] == 101 and a["sum_w"] == expect
    b = out[out["g"] == "b"].iloc[0]
    assert b["n"] == 2 and b["lo"] == 5 and b["hi"] == 7 and b["sum_w"] == 12


def test_psi_drift_detects_shift(ray_session):
    import ray.data

    from fastie_ray.ops.stats import psi_drift

    a = ray.data.from_items([{"v": i % 4000} for i in range(2000)]).repartition(4)
    b_same = ray.data.from_items([{"v": i % 4000} for i in range(2000)])
    b_shift = ray.data.from_items([{"v": 8000 + i % 4000} for i in range(2000)])
    same = psi_drift(a, b_same, "v", n_bins=16, bin_width=1000)
    shift = psi_drift(a, b_shift, "v", n_bins=16, bin_width=1000)
    assert len(same) == 16
    assert same["n_a"].sum() == 2000 and same["n_b"].sum() == 2000
    assert abs(same["psi_term"].sum()) < 1e-9  # identical distributions
    assert shift["psi_term"].sum() > 0.2  # actionable drift


def test_grouped_mad_robust_to_outliers(ray_session):
    import ray.data

    from fastie_ray.ops.stats import grouped_mad

    rows = [{"g": "a", "v": v} for v in [1, 2, 3, 4, 100]] + [
        {"g": "b", "v": v} for v in [10, 10, 10]
    ]
    ds = ray.data.from_items(rows).repartition(3)
    out = grouped_mad(ds, "g", "v")
    a = out[out["g"] == "a"].iloc[0]
    # median of {1,2,3,4,100} = 3; |x-3| = {2,1,0,1,97} -> median 1
    assert a["median"] == 3 and a["mad"] == 1
    b = out[out["g"] == "b"].iloc[0]
    assert b["median"] == 10 and b["mad"] == 0


def test_poisson_bootstrap_ci_brackets_mean(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.stats import poisson_bootstrap_mean

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {"id": np.arange(4000), "v": rng.normal(50.0, 5.0, 4000).round(2)}
    )
    out = poisson_bootstrap_mean(
        ray.data.from_pandas(df).repartition(5), "id", "v", n_boot=16
    ).iloc[0]
    obs = out["obs_num"] / out["obs_den"]
    lo = out["lo_num"] / out["lo_den"]
    hi = out["hi_num"] / out["hi_den"]
    assert lo <= obs <= hi
    # bootstrap spread ~ sigma/sqrt(n) ~ 0.08 cents-scale; the band
    # must be tight around the observed mean, not degenerate
    assert 0 < hi - lo < 100  # cents
    # determinism: identical on re-run
    out2 = poisson_bootstrap_mean(
        ray.data.from_pandas(df).repartition(3), "id", "v", n_boot=16
    ).iloc[0]
    assert (out == out2).all()
