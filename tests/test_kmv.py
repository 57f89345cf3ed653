"""Test KMV sketch: merge validity (sketch of union == merge of
sketches), exact path on small sets, and estimate accuracy."""

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 3):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def test_kmv_exact_when_unfilled():
    from fastie_ray.ops.sketch import kmv_overlap_estimate, kmv_sketch

    a = pd.DataFrame({"u": np.arange(0, 30, dtype=np.int64)})
    b = pd.DataFrame({"u": np.arange(20, 50, dtype=np.int64)})
    sa = kmv_sketch(_ds(a), "u", k=256)
    sb = kmv_sketch(_ds(b), "u", k=256)
    est = kmv_overlap_estimate(sa, sb, k=256)
    # unfilled sketches are the exact distinct hash sets
    assert int(est["union_est"].iloc[0]) == 50
    assert int(est["n_common"].iloc[0]) == 10
    assert int(est["inter_est"].iloc[0]) == 10


def test_kmv_estimate_accuracy_and_block_invariance():
    from fastie_ray.ops.sketch import kmv_overlap_estimate, kmv_sketch

    a = pd.DataFrame({"u": np.arange(0, 4000, dtype=np.int64)})
    b = pd.DataFrame({"u": np.arange(2000, 6000, dtype=np.int64)})
    sa = kmv_sketch(_ds(a, 3), "u", k=256)
    sa2 = kmv_sketch(_ds(a, 7), "u", k=256)
    pd.testing.assert_frame_equal(sa, sa2)  # block-count invariant
    sb = kmv_sketch(_ds(b, 3), "u", k=256)
    est = kmv_overlap_estimate(sa, sb, k=256)
    union = int(est["union_est"].iloc[0])
    inter = int(est["inter_est"].iloc[0])
    assert abs(union - 6000) / 6000 < 0.25
    assert abs(inter - 2000) / 2000 < 0.4
