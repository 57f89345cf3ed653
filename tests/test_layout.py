"""Z-order layout (ops/layout): Morton codes, block zone maps, and the
pruning benefit over a 1-D layout."""

import numpy as np
import pandas as pd
import pyarrow as pa

from fastie_ray.ops.layout import interleave2, prune_fraction, zorder_blocks


def test_interleave2_known_values():
    # Morton order of the 2x2 grid: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3
    x = np.array([0, 1, 0, 1, 3, 255])
    y = np.array([0, 0, 1, 1, 5, 255])
    z = interleave2(x, y)
    assert list(z[:4]) == [0, 1, 2, 3]
    # 3=0b11, 5=0b101 -> z = 0b100111 = 39
    assert z[4] == 39
    assert z[5] == 2**16 - 1


def test_interleave2_is_injective_and_monotone_per_quadrant():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, 2000)
    y = rng.integers(0, 256, 2000)
    z = interleave2(x, y)
    assert len(np.unique(z + 0)) == len(np.unique(x * 256 + y))
    # top bit of z is the top bit of y: quadrants are contiguous
    assert np.array_equal((z >> 15) & 1, (y >> 7) & 1)


def _brute_blocks(df: pd.DataFrame, block_size: int) -> pd.DataFrame:
    df = df.copy()
    df["z"] = interleave2(df["x"].to_numpy(), df["y"].to_numpy())
    df = df.sort_values(["z", "tie"]).reset_index(drop=True)
    df["block"] = df.index // block_size
    out = df.groupby("block", as_index=False).agg(
        n=("tie", "count"),
        min_x=("x", "min"),
        max_x=("x", "max"),
        min_y=("y", "min"),
        max_y=("y", "max"),
        min_z=("z", "min"),
        max_z=("z", "max"),
    )
    return out.astype({c: "int64" for c in out.columns})


def test_zorder_blocks_match_brute_force(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame(
        {
            "tie": np.arange(n),
            "x": rng.integers(0, 256, n),
            "y": rng.integers(0, 256, n),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    got = zorder_blocks(ds, "x", "y", "tie", block_size=256, n_buckets=4)
    want = _brute_blocks(df, 256)
    pd.testing.assert_frame_equal(got, want)


def test_zorder_prunes_better_than_time_order(ray_session):
    import ray.data

    # clustered data: x ~ user, y ~ time; arrival order is y-sorted,
    # so a y-ordered layout has full-width x ranges per block.
    rng = np.random.default_rng(11)
    n = 8000
    df = pd.DataFrame(
        {
            "tie": np.arange(n),
            "x": rng.integers(0, 256, n),
            "y": np.sort(rng.integers(0, 256, n)),
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    zb = zorder_blocks(ds, "x", "y", "tie", block_size=256, n_buckets=4)

    lin = df.copy()
    lin["block"] = np.arange(n) // 256  # arrival (y) order
    lb = lin.groupby("block", as_index=False).agg(
        min_x=("x", "min"), max_x=("x", "max"),
        min_y=("y", "min"), max_y=("y", "max"),
    )
    # point-ish query on a single x stripe over all time
    z_frac = prune_fraction(zb, 10, 20, 0, 255)
    l_frac = prune_fraction(lb, 10, 20, 0, 255)
    assert z_frac < l_frac  # z-order reads fewer blocks
    assert l_frac == 1.0  # time layout must read everything
