"""Spatial distance self-join — all point pairs within an L∞ radius
(the grid-file / geohash-bucket join every spatial engine ships;
Euclidean or haversine predicates post-filter the L∞ candidate set,
which is a superset). Integer coordinates.

Scale shape — ONE exchange, single emission, the 2-D sibling of
``ops/interval.band_join``: the plane is cut into radius-sized cells;
every point sits in its own cell as the RIGHT copy and replicates to
the 3×3 neighborhood as the LEFT copy. A qualifying pair (i, j) with
``id_i < id_j`` co-locates exactly once as (left=i, right=j) in j's
unique cell — no dedup pass. Groups are (cell): density skew spreads
over cells; in-cell pair search is a vectorized merge bounded by
cell-density². Replication factor is the constant 9."""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:
    import ray.data


def grid_distance_self_join(
    ds: "ray.data.Dataset",
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    radius: int = 16,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Pairs (id_a < id_b) with |Δx| ≤ radius AND |Δy| ≤ radius.
    Returns (id_a, id_b, dx, dy)."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "id": np.array([], dtype=np.int64),
                    "x": np.array([], dtype=np.int64),
                    "y": np.array([], dtype=np.int64),
                    "__cx": np.array([], dtype=np.int64),
                    "__cy": np.array([], dtype=np.int64),
                    "__side": np.array([], dtype=object),
                    "__b": np.array([], dtype=np.int64),
                }
            )
        i = df[id_col].to_numpy(dtype=np.int64)
        x = df[x_col].to_numpy(dtype=np.int64)
        y = df[y_col].to_numpy(dtype=np.int64)
        cx = x // radius
        cy = y // radius
        frames = [
            pd.DataFrame(
                {"id": i, "x": x, "y": y, "__cx": cx, "__cy": cy,
                 "__side": "r"}
            )
        ]
        for ox in (-1, 0, 1):
            for oy in (-1, 0, 1):
                frames.append(
                    pd.DataFrame(
                        {"id": i, "x": x, "y": y, "__cx": cx + ox,
                         "__cy": cy + oy, "__side": "l"}
                    )
                )
        out = pd.concat(frames, ignore_index=True)
        h = (
            pd.util.hash_pandas_object(out["__cx"], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(out["__cy"], index=False).to_numpy()
        )
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    schema = pa.schema(
        [
            ("id_a", pa.int64()),
            ("id_b", pa.int64()),
            ("dx", pa.int64()),
            ("dy", pa.int64()),
        ]
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        lg = g[g["__side"] == "l"]
        rg = g[g["__side"] == "r"]
        if len(lg) == 0 or len(rg) == 0:
            return schema.empty_table()
        m = lg.merge(rg, on=["__cx", "__cy"], suffixes=("_a", "_b"))
        if len(m) == 0:
            return schema.empty_table()
        dx = m["x_b"].to_numpy() - m["x_a"].to_numpy()
        dy = m["y_b"].to_numpy() - m["y_a"].to_numpy()
        ok = (
            (np.abs(dx) <= radius)
            & (np.abs(dy) <= radius)
            & (m["id_a"].to_numpy() < m["id_b"].to_numpy())
        )
        m = m[ok]
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "id_a": m["id_a"].astype("int64"),
                    "id_b": m["id_b"].astype("int64"),
                    "dx": dx[ok],
                    "dy": dy[ok],
                }
            ),
            preserve_index=False,
            schema=schema,
        )

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: pairs(g.drop(columns="__b")), batch_format="pandas"
        )
    )
