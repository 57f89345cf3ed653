"""Test ops.spatial.grid_distance_self_join vs brute force, including
cell-boundary pairs and block-count invariance."""

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 3):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def test_grid_distance_self_join_bruteforce():
    from fastie_ray.ops.spatial import grid_distance_self_join

    rng = np.random.default_rng(73)
    df = pd.DataFrame(
        {
            "id": np.arange(400, dtype=np.int64),
            "x": rng.integers(0, 500, 400).astype(np.int64),
            "y": rng.integers(0, 500, 400).astype(np.int64),
        }
    )
    # plant exact cell-boundary neighbors (radius 16 -> cells of 16)
    df.loc[0, ["x", "y"]] = [15, 15]
    df.loc[1, ["x", "y"]] = [16, 16]   # adjacent cell, within radius
    df.loc[2, ["x", "y"]] = [31, 15]   # exactly radius away in x

    r = 16
    for n_blocks in (2, 5):
        got = (
            grid_distance_self_join(
                _ds(df, n_blocks), radius=r, n_buckets=4
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        p = df.to_numpy()
        rows = []
        for a in range(len(p)):
            for b in range(a + 1, len(p)):
                dx = int(p[b, 1] - p[a, 1])
                dy = int(p[b, 2] - p[a, 2])
                if abs(dx) <= r and abs(dy) <= r:
                    rows.append((p[a, 0], p[b, 0], dx, dy))
        want = (
            pd.DataFrame(rows, columns=["id_a", "id_b", "dx", "dy"])
            .astype("int64")
            .sort_values(["id_a", "id_b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype("int64"), want)
        pairs = set(zip(got["id_a"], got["id_b"]))
        assert (0, 1) in pairs and (0, 2) in pairs
