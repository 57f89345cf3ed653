"""Test ops.stats.skew_report against a brute-force integer oracle,
including a deliberately Zipf-headed key distribution."""

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def _ref(keys: pd.Series, top_k: int) -> dict:
    c = np.sort(keys.value_counts().to_numpy().astype(np.int64))
    nk, tot = len(c), int(c.sum())
    i = np.arange(1, nk + 1, dtype=np.int64)
    return {
        "n_keys": nk,
        "n_rows": tot,
        "top1_share_e6": (int(c[-1]) * 1_000_000) // tot,
        "topk_share_e6": (int(c[-top_k:].sum()) * 1_000_000) // tot,
        "gini_e6": ((2 * int((i * c).sum()) - (nk + 1) * tot) * 1_000_000)
        // (nk * tot),
    }


def test_skew_report_zipf_and_uniform():
    from fastie_ray.ops.stats import skew_report

    rng = np.random.default_rng(31)
    zipf = pd.DataFrame(
        {"k": np.minimum(rng.zipf(1.6, 2000), 500).astype(np.int64)}
    )
    uni = pd.DataFrame({"k": rng.integers(0, 100, 2000).astype(np.int64)})
    for df in (zipf, uni):
        got = skew_report(_ds(df, 4), "k", top_k=8, n_buckets=4)
        want = _ref(df["k"], 8)
        for col, v in want.items():
            assert int(got[col].iloc[0]) == v, col
    g_zipf = skew_report(_ds(zipf, 4), "k", top_k=8, n_buckets=4)
    g_uni = skew_report(_ds(uni, 4), "k", top_k=8, n_buckets=4)
    assert int(g_zipf["gini_e6"].iloc[0]) > int(g_uni["gini_e6"].iloc[0])


def test_skyline_2d_matches_bruteforce():
    from fastie_ray.ops.stats import skyline_2d

    rng = np.random.default_rng(61)
    df = pd.DataFrame(
        {
            "x": rng.integers(0, 200, 1500).astype(np.int64),
            "y": rng.integers(0, 200, 1500).astype(np.int64),
        }
    )
    got = (
        skyline_2d(_ds(df, 4), "x", "y")
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    p = df.drop_duplicates().to_numpy()
    keep = []
    for x, y in p:
        dom = (
            (p[:, 0] <= x) & (p[:, 1] >= y)
            & ((p[:, 0] < x) | (p[:, 1] > y))
        ).any()
        if not dom:
            keep.append((x, y))
    want = (
        pd.DataFrame(sorted(set(keep)), columns=["x", "y"])
        .astype("int64")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want)


def test_ks_stat_matches_scipy_free_reference():
    from fastie_ray.ops.stats import ks_stat

    rng = np.random.default_rng(67)
    a = pd.DataFrame({"v": rng.integers(0, 100, 1200).astype(np.int64)})
    b = pd.DataFrame(
        {"v": (rng.integers(0, 100, 900) + 10).astype(np.int64)}
    )
    got = ks_stat(_ds(a, 3), _ds(b, 3), "v", n_buckets=4)
    # reference: step CDFs over the merged support
    vals = np.sort(np.unique(np.concatenate([a["v"], b["v"]])))
    ca = np.searchsorted(np.sort(a["v"].to_numpy()), vals, side="right")
    cb = np.searchsorted(np.sort(b["v"].to_numpy()), vals, side="right")
    d_num = int(np.abs(ca * len(b) - cb * len(a)).max())
    assert int(got["d_num"].iloc[0]) == d_num
    assert int(got["ks_e6"].iloc[0]) == d_num * 1_000_000 // (
        len(a) * len(b)
    )
    # identical samples -> zero drift
    z = ks_stat(_ds(a, 3), _ds(a.copy(), 2), "v", n_buckets=4)
    assert int(z["d_num"].iloc[0]) == 0


def test_fd_violations_bruteforce():
    from fastie_ray.ops.stats import fd_violations

    df = pd.DataFrame(
        {
            "det": ["a", "a", "b", "b", "c", "c", "c"],
            "dep": ["x", "y", "x", "x", "p", "q", "r"],
        }
    )
    got = (
        fd_violations(_ds(df, 3), "det", "dep", n_buckets=4)
        .to_pandas()
        .sort_values("det")
        .reset_index(drop=True)
    )
    want = pd.DataFrame({"det": ["a", "c"], "n_values": [2, 3]}).astype(
        {"n_values": "int64"}
    )
    pd.testing.assert_frame_equal(got, want)


def test_permutation_test_detects_planted_effect():
    from fastie_ray.ops.stats import permutation_test

    rng = np.random.default_rng(103)
    n = 2000
    grp = (np.arange(n) % 2).astype(np.int64)
    value = np.round(rng.uniform(0, 10, n), 2) + grp * 5.0  # big effect
    df = pd.DataFrame(
        {"id": np.arange(n, dtype=np.int64), "grp": grp, "value": value}
    )
    got = permutation_test(_ds(df, 4), "id", "grp", "value", n_perms=48)
    # planted effect should beat (almost) every random split
    assert int(got["n_extreme"].iloc[0]) == 0

    # null: observed split IS one of the md5 bit splits' family
    df0 = df.assign(value=np.round(rng.uniform(0, 10, n), 2))
    got0 = permutation_test(_ds(df0, 4), "id", "grp", "value", n_perms=48)
    assert int(got0["n_extreme"].iloc[0]) > 0

    # block invariance
    got2 = permutation_test(_ds(df, 7), "id", "grp", "value", n_perms=48)
    pd.testing.assert_frame_equal(got, got2)


def test_grouped_ks_matches_global_per_group():
    from fastie_ray.ops.stats import grouped_ks, ks_stat

    rng = np.random.default_rng(109)
    n = 1500
    df = pd.DataFrame(
        {
            "g": rng.choice(["p", "q", "r"], n),
            "m": rng.integers(0, 2, n).astype(np.int64),
            "v": rng.integers(0, 60, n).astype(np.int64),
        }
    )
    # shift slice 1 of group q -> real drift there
    df.loc[(df["g"] == "q") & (df["m"] == 1), "v"] += 25
    got = (
        grouped_ks(_ds(df, 4), "g", "m", "v", n_buckets=4)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for grp in ("p", "q", "r"):
        sub = df[df["g"] == grp]
        ref = ks_stat(
            _ds(sub[sub["m"] == 0][["v"]], 2),
            _ds(sub[sub["m"] == 1][["v"]], 2),
            "v", n_buckets=4,
        )
        row = got[got["g"] == grp].iloc[0]
        for c in ("d_num", "n_a", "n_b", "ks_e6"):
            assert int(row[c]) == int(ref[c].iloc[0]), (grp, c)
    kq = int(got.loc[got["g"] == "q", "ks_e6"].iloc[0])
    kp = int(got.loc[got["g"] == "p", "ks_e6"].iloc[0])
    assert kq > kp
