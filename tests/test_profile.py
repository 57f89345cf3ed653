"""Oracles for `fastie_ray/ops/profile.py`: pandas reference with
nulls planted, native min/max ordering (the "10" < "9" trap), and
partition invariance."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.profile import table_profile


def _table(n=400, seed=59):
    rng = np.random.default_rng(seed)
    ids = np.arange(n).astype("int64")
    vals = rng.integers(0, 30, n).astype("int64")
    cat = rng.choice(["alpha", "beta", "gamma"], n).astype(object)
    cat[::17] = None  # planted nulls
    return pd.DataFrame({"id": ids, "val": vals, "cat": cat})


def test_profile_matches_pandas_reference_any_partitioning():
    df = _table()
    for parts in (1, 6):
        out = table_profile(
            ray.data.from_pandas(df).repartition(parts),
            ["id", "val", "cat"],
            n_buckets=4,
        ).set_index("column")
        for c in ("id", "val", "cat"):
            s = df[c]
            assert out.loc[c, "n_rows"] == len(s)
            assert out.loc[c, "n_nulls"] == int(s.isna().sum())
            assert out.loc[c, "n_distinct"] == s.dropna().nunique()
            assert out.loc[c, "min_val"] == str(s.dropna().min())
            assert out.loc[c, "max_val"] == str(s.dropna().max())


def test_profile_int_minmax_is_native_not_lexicographic():
    # 9 vs 10: string ordering would report max "9"
    df = pd.DataFrame({"x": np.array([9, 10, 2], dtype="int64")})
    out = table_profile(ray.data.from_pandas(df).repartition(3), ["x"])
    assert out["min_val"].iloc[0] == "2"
    assert out["max_val"].iloc[0] == "10"


def test_id_gaps_bruteforce_and_range_invariance(ray_session):
    from fastie_ray.ops.profile import id_gaps

    rng = np.random.default_rng(59)
    ids = np.unique(rng.integers(0, 3000, 1800)).astype("int64")
    df = pd.DataFrame({"id": np.concatenate([ids, ids[:50]])})  # dups
    s = set(ids.tolist())
    want_rows = []
    start = None
    for i in range(int(ids.min()), int(ids.max()) + 1):
        if i not in s:
            if start is None:
                start = i
        elif start is not None:
            want_rows.append((start, i - 1))
            start = None
    want = pd.DataFrame(want_rows, columns=["gap_start", "gap_end"]).astype(
        "int64"
    )
    for r in (10, 100, 10**6):  # cross-range stitching must not matter
        got = id_gaps(
            ray.data.from_pandas(df).repartition(4), "id",
            range_size=r, n_buckets=4,
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False), r


def test_id_gaps_contiguous_is_empty(ray_session):
    from fastie_ray.ops.profile import id_gaps

    df = pd.DataFrame({"id": np.arange(100, dtype=np.int64)})
    got = id_gaps(ray.data.from_pandas(df), "id", range_size=7, n_buckets=2)
    assert len(got) == 0
