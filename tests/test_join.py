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
