"""Test ops.layout.sorted_range_export: global order across written
part files, sorted within each, and a manifest matching the data."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def test_sorted_range_export_order_and_manifest(tmp_path):
    from fastie_ray.ops.layout import sorted_range_export

    rng = np.random.default_rng(41)
    df = pd.DataFrame(
        {
            "rid": np.arange(3000, dtype=np.int64),
            "key": rng.integers(0, 10_000, 3000).astype(np.int64),
        }
    )
    out_dir = str(tmp_path / "sorted")
    summary = (
        sorted_range_export(
            _ds(df, 4), key_col="key", id_col="rid", out_dir=out_dir,
            n_parts=6, sample_k=128,
        )
        .to_pandas()
        .sort_values("part_id")
        .reset_index(drop=True)
    )
    assert summary["n_rows"].sum() == 3000
    # parts are disjoint, ascending ranges
    for a, b in zip(summary.itertuples(), summary.iloc[1:].itertuples()):
        assert a.max_key <= b.min_key
    # files: sorted within, matching the manifest
    total = 0
    for row in summary.itertuples():
        path = os.path.join(out_dir, f"part-{row.part_id:05d}.parquet")
        t = pq.read_table(path).to_pandas()
        total += len(t)
        assert len(t) == row.n_rows
        assert (t["key"].to_numpy() == np.sort(t["key"].to_numpy())).all()
        assert t["key"].min() == row.min_key
        assert t["key"].max() == row.max_key
    assert total == 3000
    # full concatenation in part order is globally sorted
    keys = np.concatenate(
        [
            pq.read_table(
                os.path.join(out_dir, f"part-{r.part_id:05d}.parquet")
            )["key"].to_numpy()
            for r in summary.itertuples()
        ]
    )
    assert (keys == np.sort(df["key"].to_numpy())).all()
