"""Oracles for `fastie_ray/ops/bucketed_io.py`: bucketed write layout,
exchange-free join parity vs pandas merge, and contract verification."""

import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data

from fastie_ray.ops.bucketed_io import bucketed_join, write_bucketed


def _tables(seed=41):
    rng = np.random.default_rng(seed)
    a = pd.DataFrame(
        {"k": rng.integers(0, 50, 300).astype("int64"),
         "va": rng.integers(0, 9, 300).astype("int64")}
    )
    b = pd.DataFrame(
        {"k2": np.arange(50, dtype="int64"),
         "vb": rng.integers(0, 9, 50).astype("int64")}
    )
    return a, b


def test_bucketed_join_matches_pandas_merge(tmp_path):
    a, b = _tables()
    pa_, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(ray.data.from_pandas(a).repartition(4), "k", 6, pa_)
    write_bucketed(ray.data.from_pandas(b), "k2", 6, pb)
    got = (
        bucketed_join(pa_, pb, "k", "k2", ["k", "va"], ["k2", "vb"])
        .to_pandas()
        .sort_values(["k", "va", "vb"])
        .reset_index(drop=True)
    )
    want = (
        a.merge(b, left_on="k", right_on="k2")
        .drop(columns="k2")[["k", "va", "vb"]]
        .sort_values(["k", "va", "vb"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "va", "vb"]], want)


def test_write_layout_and_manifest(tmp_path):
    a, _ = _tables()
    p = str(tmp_path / "t")
    meta = write_bucketed(ray.data.from_pandas(a), "k", 4, p)
    assert meta == {"key": "k", "n_buckets": 4}
    with open(os.path.join(p, "_bucketing.json")) as fh:
        assert json.load(fh) == meta
    dirs = [d for d in os.listdir(p) if d.startswith("__bucket=")]
    assert 1 <= len(dirs) <= 4
    # every row of a bucket dir hashes to that bucket
    import hashlib
    import pyarrow.parquet as pq

    for d in dirs:
        bnum = int(d.split("=")[1])
        t = pq.read_table(os.path.join(p, d), columns=["k"]).to_pandas()
        hb = t["k"].map(
            lambda k: int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16) % 4
        )
        assert (hb == bnum).all()


def test_contract_mismatch_raises(tmp_path):
    a, b = _tables()
    pa_, pb = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed(ray.data.from_pandas(a), "k", 4, pa_)
    write_bucketed(ray.data.from_pandas(b), "k2", 8, pb)
    with pytest.raises(ValueError, match="bucket count"):
        bucketed_join(pa_, pb, "k", "k2", ["k"], ["k2"])
    with pytest.raises(ValueError, match="not bucketed"):
        bucketed_join(pa_, pa_, "wrong", "k", ["k"], ["k"])


def test_smb_merge_join_equals_hash_semantics(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.bucketed_io import (
        bucketed_merge_join,
        write_bucketed_sorted,
    )

    rng = np.random.default_rng(21)
    left = pd.DataFrame(
        {"k": rng.integers(0, 40, 300), "v": np.arange(300)}
    )
    right = pd.DataFrame(
        {"rk": rng.integers(0, 40, 120), "w": np.arange(120) * 10}
    )
    pa_dir, pb_dir = str(tmp_path / "a"), str(tmp_path / "b")
    write_bucketed_sorted(
        ray.data.from_items(left.to_dict("records")).repartition(5),
        "k", 8, pa_dir,
    )
    write_bucketed_sorted(
        ray.data.from_items(right.to_dict("records")).repartition(3),
        "rk", 8, pb_dir,
    )
    got = (
        bucketed_merge_join(pa_dir, pb_dir, "k", "rk", ["k", "v"], ["rk", "w"])
        .to_pandas()
        .sort_values(["k", "v", "w"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, left_on="k", right_on="rk")[["k", "v", "w"]]
        .sort_values(["k", "v", "w"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # written buckets really are key-sorted (the SMB contract)
    import os

    import pyarrow.parquet as pq

    for d in os.listdir(pa_dir):
        if d.startswith("__bucket="):
            ks = pq.read_table(os.path.join(pa_dir, d)).column("k").to_pylist()
            assert ks == sorted(ks)

    # contract violation: plain bucketed table refused
    from fastie_ray.ops.bucketed_io import write_bucketed

    pc_dir = str(tmp_path / "c")
    write_bucketed(
        ray.data.from_items(right.to_dict("records")), "rk", 8, pc_dir
    )
    import pytest

    with pytest.raises(ValueError):
        bucketed_merge_join(pa_dir, pc_dir, "k", "rk", ["k", "v"], ["rk", "w"])
