"""Test ops.retrieval.rrf_fuse against a brute-force fusion oracle,
including docs present in only one run."""

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 2):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def test_rrf_fuse_matches_bruteforce():
    from fastie_ray.ops.retrieval import rrf_fuse

    rng = np.random.default_rng(37)
    runs = []
    for seed in (1, 2, 3):
        rows = []
        r = np.random.default_rng(seed)
        for q in range(3):
            docs = r.choice(50, size=8, replace=False)
            rows += [(q, int(d), i + 1) for i, d in enumerate(docs)]
        runs.append(
            pd.DataFrame(rows, columns=["query_id", "doc_id", "rank"])
        )

    got = (
        rrf_fuse([_ds(r) for r in runs], k_const=60, top_k=4, n_buckets=4)
        .to_pandas()
        .sort_values(["query_id", "fused_rank"])
        .reset_index(drop=True)
    )

    allr = pd.concat(runs, ignore_index=True)
    allr["s"] = 1_000_000 // (60 + allr["rank"])
    f = allr.groupby(["query_id", "doc_id"], as_index=False)["s"].sum()
    f = f.sort_values(["query_id", "s", "doc_id"],
                      ascending=[True, False, True])
    f["fused_rank"] = f.groupby("query_id", sort=False).cumcount() + 1
    want = (
        f[f["fused_rank"] <= 4]
        .rename(columns={"s": "score_e6"})
        .astype("int64")
        .sort_values(["query_id", "fused_rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want)
