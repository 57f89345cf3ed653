"""Oracles for `fastie_ray/ops/batching.py`: window-function reference
parity, batch invariants (same-bucket batches, contiguous slots), and
partition invariance."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.batching import _len_bucket, length_bucketed_batches


def _docs(n=300, seed=31):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "text": [" ".join(["tok"] * int(k)) for k in rng.integers(1, 200, n)],
        }
    )


def _reference(df, batch_size):
    n = df["text"].str.count(r"[A-Za-z0-9]+").to_numpy(dtype=np.int64)
    b = _len_bucket(n)
    out = pd.DataFrame({"doc_id": df["doc_id"], "n_tokens": n, "len_bucket": b})
    out = out.sort_values(["len_bucket", "doc_id"]).reset_index(drop=True)
    rank = out.groupby("len_bucket").cumcount().to_numpy()
    out["batch_id"] = (out["len_bucket"] * 1_000_000 + rank // batch_size).astype(
        "int64"
    )
    out["slot"] = (rank % batch_size).astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True).astype("int64")


def test_batches_match_window_reference_any_partitioning():
    df = _docs()
    want = _reference(df, 16)
    for parts in (1, 6):
        got = (
            length_bucketed_batches(
                ray.data.from_pandas(df).repartition(parts),
                batch_size=16, range_size=50, n_buckets=4,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[want.columns].astype("int64"), want)


def test_batch_invariants():
    df = _docs(200)
    got = length_bucketed_batches(
        ray.data.from_pandas(df), batch_size=8, range_size=64
    ).to_pandas()
    g = got.groupby("batch_id")
    # a batch never mixes length buckets and never exceeds batch_size
    assert (g["len_bucket"].nunique() == 1).all()
    assert (g.size() <= 8).all()
    # slots within a batch are 0..k-1 (contiguous, no gaps)
    for _, grp in g:
        assert sorted(grp["slot"]) == list(range(len(grp)))
    # every doc appears exactly once
    assert got["doc_id"].is_unique and len(got) == len(df)
