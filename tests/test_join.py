"""Oracles for `fastie_ray/ops/join.py::hash_join`: pandas merge
references over multi-block layouts, 1:N fan-out, left-join NULLs,
and collision suffixing."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.join import hash_join


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[sorted(df.columns)]
        .sort_values(sorted(df.columns))
        .reset_index(drop=True)
    )


def test_inner_join_one_to_many_matches_pandas():
    left = pd.DataFrame(
        {
            "k": np.array([1, 1, 2, 3, 5], dtype=np.int64),
            "x": np.array([10, 11, 20, 30, 50], dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "rk": np.array([1, 2, 2, 4], dtype=np.int64),
            "y": ["a", "b", "c", "d"],
        }
    )
    out = hash_join(
        ray.data.from_pandas(left).repartition(3),
        ray.data.from_pandas(right).repartition(2),
        on="k",
        right_on="rk",
        n_buckets=4,
    ).to_pandas()
    want = left.merge(right, left_on="k", right_on="rk").drop(columns="rk")
    pd.testing.assert_frame_equal(_canon(out), _canon(want))


def test_left_join_keeps_unmatched_with_nulls():
    left = pd.DataFrame({"k": np.array([1, 9], dtype=np.int64)})
    right = pd.DataFrame({"k": np.array([1], dtype=np.int64), "y": ["a"]})
    out = (
        hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            how="left",
            n_buckets=2,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["k"]) == [1, 9]
    assert out["y"].iloc[0] == "a" and pd.isna(out["y"].iloc[1])


def test_collision_suffix_and_key_dedup():
    left = pd.DataFrame(
        {"k": np.array([1, 2], dtype=np.int64), "v": ["L1", "L2"]}
    )
    right = pd.DataFrame(
        {"k": np.array([1, 2], dtype=np.int64), "v": ["R1", "R2"]}
    )
    out = (
        hash_join(
            ray.data.from_pandas(left),
            ray.data.from_pandas(right),
            on="k",
            n_buckets=2,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert sorted(out.columns) == ["k", "v", "v_r"]
    assert list(out["v"]) == ["L1", "L2"]
    assert list(out["v_r"]) == ["R1", "R2"]


def test_semi_and_anti_join():
    left = pd.DataFrame(
        {
            "k": np.array([1, 1, 2, 3], dtype=np.int64),
            "x": np.array([10, 11, 20, 30], dtype=np.int64),
        }
    )
    right = pd.DataFrame({"rk": np.array([1, 1, 4], dtype=np.int64), "y": ["a", "b", "c"]})
    lds = ray.data.from_pandas(left).repartition(2)
    rds = ray.data.from_pandas(right).repartition(2)
    semi = (
        hash_join(lds, rds, on="k", right_on="rk", how="semi", n_buckets=4)
        .to_pandas().sort_values("x").reset_index(drop=True)
    )
    # no fan-out: both k=1 left rows kept ONCE despite two right matches
    assert list(semi["x"]) == [10, 11] and list(semi.columns) == ["k", "x"]
    anti = (
        hash_join(lds, rds, on="k", right_on="rk", how="anti", n_buckets=4)
        .to_pandas().sort_values("x").reset_index(drop=True)
    )
    assert list(anti["x"]) == [20, 30]


def test_salted_join_parity_with_planted_hot_key():
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.join import salted_join

    rng = np.random.default_rng(103)
    # 70% of left rows share one hot key
    keys = np.where(rng.random(5000) < 0.7, 7, rng.integers(0, 200, 5000))
    left = pd.DataFrame({"k": keys.astype("int64"), "lv": np.arange(5000, dtype="int64")})
    right = pd.DataFrame(
        {"k": np.arange(0, 200, dtype="int64"),
         "rv": np.arange(1000, 1200, dtype="int64")}
    )
    # drop some right keys so left-join NULL rows exist
    right = right[right["k"] % 7 != 3]

    for how in ("inner", "left"):
        got = (
            salted_join(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(2),
                on="k",
                how=how,
                n_salts=4,
            )
            .to_pandas()
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, on="k", how=how)
            .sort_values(["k", "lv"])
            .reset_index(drop=True)
        )
        assert len(got) == len(want)
        assert got["lv"].tolist() == want["lv"].tolist()
        pd.testing.assert_series_equal(
            got["rv"].astype("float64"), want["rv"].astype("float64")
        )


def test_salted_join_no_hot_keys_matches_hash_join():
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.join import hash_join, salted_join

    rng = np.random.default_rng(107)
    left = pd.DataFrame(
        {"k": rng.integers(0, 500, 2000).astype("int64"),
         "lv": np.arange(2000, dtype="int64")}
    )
    right = pd.DataFrame(
        {"k": np.arange(500, dtype="int64"), "rv": rng.random(500)}
    )
    a = (
        salted_join(ray.data.from_pandas(left), ray.data.from_pandas(right), on="k")
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    )
    b = (
        hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right), on="k")
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_bloom_join_equals_hash_join_and_prunes(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.join import bloom_bits, bloom_join, hash_join, _bloom_test

    rng = np.random.default_rng(9)
    left = ray.data.from_items(
        [{"k": int(x), "v": i} for i, x in enumerate(rng.integers(0, 10_000, 3000))]
    ).repartition(6)
    right = ray.data.from_items(
        [{"rk": k, "w": k * 2} for k in range(50)]  # tiny match set
    )
    for how in ("inner", "semi"):
        a = (
            bloom_join(left, right, on="k", right_on="rk", how=how,
                       left_cols=["k", "v"], right_cols=["rk", "w"], n_buckets=8)
            .to_pandas()
        )
        b = (
            hash_join(left, right, on="k", right_on="rk", how=how,
                      left_cols=["k", "v"], right_cols=["rk", "w"], n_buckets=8)
            .to_pandas()
        )
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            a[cols].sort_values(cols).reset_index(drop=True),
            b[cols].sort_values(cols).reset_index(drop=True),
        )
    # the filter actually prunes: almost all of the 0..9999 key space
    # misses the 50-key filter
    bits = bloom_bits(right, "rk")
    probe = pd.Series(range(10_000))
    pass_rate = _bloom_test(probe, bits, 1 << 20, 4).mean()
    assert pass_rate < 0.02


def test_hash_join_full_outer(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.join import hash_join

    left = ray.data.from_items(
        [{"k": 1, "v": 10}, {"k": 2, "v": 20}, {"k": 2, "v": 21}]
    )
    right = ray.data.from_items(
        [{"rk": 2, "w": 200}, {"rk": 3, "w": 300}]
    )
    out = (
        hash_join(left, right, on="k", right_on="rk", how="full",
                  left_cols=["k", "v"], right_cols=["rk", "w"], n_buckets=4)
        .to_pandas()
        .sort_values(["k", "v", "w"], na_position="first")
        .reset_index(drop=True)
    )
    # left-only 1, matched 2 (x2 rows), right-only 3 with its key total
    assert sorted(out["k"].astype(int)) == [1, 2, 2, 3]
    assert out.loc[out["k"] == 1, "w"].isna().all()
    assert out.loc[out["k"] == 3, "v"].isna().all()
    assert (out.loc[out["k"] == 2, "w"] == 200).all()


def test_join_size_estimate_exact():
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.join import hash_join, join_size_estimate

    def _ds(df, n=3):
        return ray.data.from_pandas(
            [p for p in np.array_split(df, n) if len(p)]
        )

    rng = np.random.default_rng(79)
    left = pd.DataFrame({"k": rng.integers(0, 40, 500).astype(np.int64)})
    right = pd.DataFrame({"rk": rng.integers(20, 60, 300).astype(np.int64)})
    est = join_size_estimate(_ds(left), _ds(right), on="k", right_on="rk",
                             n_buckets=4)
    actual = hash_join(
        _ds(left), _ds(right), on="k", right_on="rk",
        left_cols=["k"], right_cols=["rk"], n_buckets=4,
    ).count()
    assert int(est["join_rows"].iloc[0]) == actual
    assert int(est["n_left"].iloc[0]) == 500
    assert int(est["n_right"].iloc[0]) == 300
    m = left.merge(right, left_on="k", right_on="rk")
    vc = m.groupby("k").size()
    assert int(est["max_key_product"].iloc[0]) == int(vc.max())


def test_bloom_join_mixed_numeric_key_dtypes(ray_session):
    """float64 left keys vs int64 right keys: the Bloom prefilter must
    canonicalize before hashing or every genuine match is dropped
    (ADVICE r2) — the result must equal the unfiltered hash_join."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.join import bloom_join, hash_join

    left = ray.data.from_items(
        [{"k": float(i % 60), "v": i} for i in range(500)]  # float64 keys
    ).repartition(4)
    right = ray.data.from_items(
        [{"rk": k, "w": k * 2} for k in range(50)]  # int64 keys
    )
    a = (
        bloom_join(left, right, on="k", right_on="rk", how="inner",
                   left_cols=["k", "v"], right_cols=["rk", "w"], n_buckets=8)
        .to_pandas()
    )
    b = (
        hash_join(left, right, on="k", right_on="rk", how="inner",
                  left_cols=["k", "v"], right_cols=["rk", "w"], n_buckets=8)
        .to_pandas()
    )
    assert len(b) > 0  # the planted overlap actually matches
    cols = sorted(a.columns)
    pd.testing.assert_frame_equal(
        a[cols].sort_values(cols).reset_index(drop=True),
        b[cols].sort_values(cols).reset_index(drop=True),
    )


def test_bloom_test_negative_zero_and_int_float_equality():
    import pandas as pd

    from fastie_ray.ops.join import _bloom_key

    # -0.0 and +0.0 compare equal in a merge → must hash identically
    a = _bloom_key(pd.Series([-0.0, 1.0]))
    b = _bloom_key(pd.Series([0.0, 1]))
    assert (pd.util.hash_pandas_object(a, index=False).to_numpy()
            == pd.util.hash_pandas_object(b, index=False).to_numpy()).all()
