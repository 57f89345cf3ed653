"""Oracles for `fastie_ray/ops/splits.py`: group-atomicity (the whole
point), fraction calibration, determinism across partitionings, and
threshold boundary semantics."""

import hashlib

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.splits import GRANULARITY, leakage_safe_split


def _docs(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "site": [f"site-{i}" for i in rng.integers(0, 150, n)],
        }
    )


def test_groups_never_straddle_splits_any_partitioning():
    df = _docs()
    outs = []
    for parts in (1, 6):
        out = leakage_safe_split(
            ray.data.from_pandas(df).repartition(parts), "site"
        ).to_pandas()
        per_site = out.groupby("site")["split"].nunique()
        assert (per_site == 1).all()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_buckets_match_md5_reference_and_fractions_roughly_hold():
    df = _docs(5000)
    out = leakage_safe_split(ray.data.from_pandas(df), "site").to_pandas()
    want = df["site"].map(
        lambda g: int(hashlib.md5(("split:" + g).encode()).hexdigest()[:8], 16)
        % GRANULARITY
    )
    assert (out.sort_values("doc_id")["split_bucket"].to_numpy() == want.to_numpy()).all()
    frac = out["split"].value_counts(normalize=True)
    assert 0.80 < frac.get("train", 0) < 0.97  # group-level hashing is lumpy


def test_threshold_boundaries_exact():
    # plant groups whose buckets straddle the 9000/9500 thresholds
    df = pd.DataFrame({"doc_id": [0], "site": ["x"]})
    out = leakage_safe_split(
        ray.data.from_pandas(df),
        "site",
        fractions={"a": 0.5, "b": 0.5},
    ).to_pandas()
    b = out["split_bucket"].iloc[0]
    assert out["split"].iloc[0] == ("a" if b < GRANULARITY // 2 else "b")


def test_shuffle_shards_is_a_permutation(ray_session):
    import ray.data

    from fastie_ray.ops.splits import shuffle_shards

    ds = ray.data.from_items([{"doc_id": i} for i in range(300)]).repartition(6)
    out = shuffle_shards(ds, id_col="doc_id", shard_size=50).to_pandas()
    assert len(out) == 300
    assert sorted(out["doc_id"]) == list(range(300))
    # exactly 6 full shards, each with positions 0..49
    g = out.groupby("shard")["pos"].agg(["count", "min", "max"])
    assert list(g.index) == list(range(6))
    assert (g["count"] == 50).all() and (g["min"] == 0).all() and (g["max"] == 49).all()
    # shuffled: shard 0 is not just the first 50 ids
    assert set(out.loc[out["shard"] == 0, "doc_id"]) != set(range(50))
    # deterministic across runs
    out2 = shuffle_shards(ds, id_col="doc_id", shard_size=50).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        out2.sort_values("doc_id").reset_index(drop=True),
    )


def test_split_leakage_audit_group_vs_row(ray_session):
    import ray.data

    from fastie_ray.ops.splits import split_leakage_audit

    # pairs within the same "site" group: a group-keyed split cannot
    # leak; a row-keyed split of the same pairs can.
    pairs = ray.data.from_items(
        [{"doc_a": f"site{i}", "doc_b": f"site{i}"} for i in range(200)]
    )
    out = split_leakage_audit(pairs)
    leaks = out[out["split_a"] != out["split_b"]]
    assert len(leaks) == 0 and out["n_pairs"].sum() == 200

    row_pairs = ray.data.from_items(
        [{"doc_a": 2 * i, "doc_b": 2 * i + 1} for i in range(400)]
    )
    out2 = split_leakage_audit(row_pairs)
    assert out2["n_pairs"].sum() == 400
    assert out2.loc[out2["split_a"] != out2["split_b"], "n_pairs"].sum() > 0
