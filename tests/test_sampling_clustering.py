"""Oracles for the sampling and clustering operators
(`fastie_ray/ops/sampling.py`, `fastie_ray/ops/clustering.py`):
single-process references computed on the same rows, plus determinism
across block layouts."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data

from fastie_ray.ops.clustering import (
    init_centroids,
    kmeans_assign,
    kmeans_cluster_sizes,
    kmeans_fit,
)
from fastie_ray.ops.sampling import (
    grouped_topk,
    hash_sample,
    rate_threshold,
    stratified_sample,
)


def _docs(n=400, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": rng.choice(["en", "zh", "de"], size=n, p=[0.6, 0.3, 0.1]),
            "n_chars": rng.integers(10, 5000, size=n).astype(np.int64),
        }
    )


def test_rate_threshold_bounds():
    assert rate_threshold(0.0) == "0000"
    assert rate_threshold(1.0) == "g"  # sorts after all hex
    assert rate_threshold(0.5) == "8000"


def test_hash_sample_matches_python_reference():
    df = _docs()
    out = hash_sample(ray.data.from_pandas(df), rate=0.25).to_pandas()
    thr = rate_threshold(0.25)
    want = df[
        [hashlib.md5(str(i).encode()).hexdigest()[:4] < thr for i in df["doc_id"]]
    ]
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])
    # deterministic: independent of block layout
    out8 = hash_sample(
        ray.data.from_pandas(df).repartition(8), rate=0.25
    ).to_pandas()
    assert sorted(out8["doc_id"]) == sorted(out["doc_id"])


def test_stratified_sample_rates_and_default():
    df = _docs()
    rates = {"en": 0.1, "zh": 1.0}  # de falls to default_rate=0 → dropped
    out = stratified_sample(
        ray.data.from_pandas(df), rates, stratum_col="lang", id_col="doc_id"
    ).to_pandas()
    assert set(out["lang"]) <= {"en", "zh"}
    assert (out[out["lang"] == "zh"].shape[0]) == (df["lang"] == "zh").sum()
    thr = rate_threshold(0.1)
    want_en = df[
        (df["lang"] == "en")
        & [hashlib.md5(str(i).encode()).hexdigest()[:4] < thr for i in df["doc_id"]]
    ]
    assert sorted(out[out["lang"] == "en"]["doc_id"]) == sorted(want_en["doc_id"])


def test_grouped_topk_matches_window_reference():
    df = _docs()
    out = (
        grouped_topk(
            ray.data.from_pandas(df).repartition(8),
            k=5,
            group_col="lang",
            value_col="n_chars",
            id_col="doc_id",
        )
        .to_pandas()
        .sort_values(["lang", "rank"])
        .reset_index(drop=True)
    )
    want = df.sort_values(
        ["lang", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    want = want.groupby("lang", sort=True).head(5).copy()
    want["rank"] = want.groupby("lang").cumcount() + 1
    want = want.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["lang", "doc_id", "n_chars"]], want[["lang", "doc_id", "n_chars"]]
    )
    assert (out["rank"].to_numpy() == want["rank"].to_numpy()).all()


def _emb(n=300, dim=16, k=6, seed=3):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(k, dim)) * 3
    labels = rng.integers(0, k, size=n)
    x = cents[labels] + rng.normal(size=(n, dim)) * 0.4
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(x.astype(np.float32)),
        }
    )


def _reference_lloyd(df, k, iters):
    """Single-process Lloyd's mirroring the distributed kernel's
    float64 per-cluster sums and first-minimum tie-break."""
    x = np.array(list(df["embedding"]), dtype=np.float64)
    cents = x[np.argsort(df["vec_id"].to_numpy())[:k]].copy()
    for _ in range(iters):
        d = (x * x).sum(1)[:, None] - 2.0 * (x @ cents.T) + (cents * cents).sum(1)[None, :]
        a = d.argmin(1)
        for j in range(k):
            if (a == j).any():
                cents[j] = x[a == j].sum(0) / (a == j).sum()
    d = (x * x).sum(1)[:, None] - 2.0 * (x @ cents.T) + (cents * cents).sum(1)[None, :]
    return cents, d.argmin(1)


def test_kmeans_single_block_bitwise_matches_reference():
    df = _emb()
    ds = ray.data.from_pandas(df)  # one block → identical reduce order
    cids, cents = kmeans_fit(ds, k=6, iters=5, tol=0.0)
    ref_cents, ref_a = _reference_lloyd(df, k=6, iters=5)
    assert np.array_equal(cids, np.arange(6))
    assert np.array_equal(cents, ref_cents)
    out = kmeans_assign(ds, cids, cents).to_pandas().sort_values("vec_id")
    assert np.array_equal(out["cluster_id"].to_numpy(), ref_a)


def test_kmeans_block_layout_invariance():
    df = _emb(seed=11)
    s1 = kmeans_cluster_sizes(ray.data.from_pandas(df), k=6, iters=5, tol=0.0)
    s8 = kmeans_cluster_sizes(
        ray.data.from_pandas(df).repartition(8), k=6, iters=5, tol=0.0
    )
    pd.testing.assert_frame_equal(s1, s8)
    assert s1["n_members"].sum() == len(df)


def test_kmeans_assign_duplicate_centroid_tie_breaks_low_id():
    df = pd.DataFrame(
        {
            "vec_id": np.array([5, 9], dtype=np.int64),
            "embedding": [np.zeros(4, dtype=np.float32)] * 2,
        }
    )
    cents = np.zeros((2, 4))
    out = (
        kmeans_assign(ray.data.from_pandas(df), np.array([9, 3]), cents)
        .to_pandas()
    )
    assert (out["cluster_id"] == 3).all()


def test_kmeans_assign_frozen_int_matches_reference_and_ties_low_index():
    from fastie_ray.ops.clustering import kmeans_assign_frozen_int

    df = _emb(seed=3)
    cents_f = np.array(list(df["embedding"][:4]), dtype=np.float64)
    ints = np.floor(cents_f * 1000.0).astype(np.int64)
    out = (
        kmeans_assign_frozen_int(ray.data.from_pandas(df).repartition(4), ints)
        .to_pandas()
        .sort_values("vec_id")
    )
    x = np.floor(np.array(list(df["embedding"]), dtype=np.float64) * 1000.0).astype(
        np.int64
    )
    d = (x * x).sum(1)[:, None] - 2 * (x @ ints.T) + (ints * ints).sum(1)[None, :]
    assert np.array_equal(out["cluster_id"].to_numpy(), d.argmin(1))
    # duplicate centroids: exact-tie distances must pick the lowest index
    dup = np.vstack([ints[0], ints[0]])
    out2 = kmeans_assign_frozen_int(ray.data.from_pandas(df), dup).to_pandas()
    assert (out2["cluster_id"] == 0).all()


def test_init_centroids_smallest_ids():
    df = _emb(n=50)
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=0)).repartition(4)
    cids, cents = init_centroids(ds, k=3)
    assert list(cids) == [0, 1, 2]
    want = np.array(list(df.sort_values("vec_id")["embedding"][:3]), dtype=np.float64)
    assert np.array_equal(cents, want)


def test_scalar_quantize_roundtrip_and_edges():
    """SQ8 codes: range, monotonicity per dim, zero-span dim, and
    reconstruction error bounded by one step."""
    import ray.data

    from fastie_ray.ops.similarity import scalar_quantize

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(40, 6))
    vecs[:, 3] = 2.5  # zero-span dimension
    df = pd.DataFrame(
        {"vec_id": np.arange(40, dtype="int64"), "embedding": list(vecs)}
    )
    out = scalar_quantize(ray.data.from_pandas(df)).to_pandas()
    assert len(out) == 40 * 6
    assert out["q"].between(-127, 127).all()
    assert (out.loc[out["dim"] == 4, "q"] == -127).all()
    # per-dim: min value → -127, max value → 127
    for d in (1, 2, 3, 5, 6):
        col = vecs[:, d - 1]
        sub = out[out["dim"] == d].set_index("vec_id")["q"]
        assert sub[int(np.argmin(col))] == -127
        assert sub[int(np.argmax(col))] == 127
        # reconstruction within one quantization step
        mn, mx = col.min(), col.max()
        step = (mx - mn) / 254.0
        recon = mn + (sub.loc[np.arange(40)].to_numpy() + 127.5) * step
        assert np.abs(recon - col[np.arange(40)]).max() <= step * 1.01


def test_systematic_resample_matches_window_reference():
    from fastie_ray.ops.sampling import systematic_resample

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {"doc_id": np.arange(500), "w": rng.integers(0, 50, 500).astype("int64")}
    )
    m = 120
    cum = df["w"].cumsum().to_numpy()
    grand = int(cum[-1])
    n = (cum * m) // grand - ((cum - df["w"].to_numpy()) * m) // grand
    want = pd.DataFrame(
        {"doc_id": df["doc_id"], "weight": df["w"], "n_copies": n.astype("int64")}
    )
    want = want[want["n_copies"] > 0].reset_index(drop=True)
    for parts in (1, 7):
        got = (
            systematic_resample(
                ray.data.from_pandas(df).repartition(parts), "w", m=m,
                range_size=64, n_buckets=4,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))
    # multiplicity budget: total copies == m exactly (floor telescope)
    assert want["n_copies"].sum() == m


def test_systematic_resample_zero_weight_docs_never_selected():
    from fastie_ray.ops.sampling import systematic_resample

    df = pd.DataFrame({"doc_id": [0, 1, 2, 3], "w": [0, 10, 0, 10]})
    got = systematic_resample(
        ray.data.from_pandas(df), "w", m=4, range_size=2, n_buckets=2
    ).to_pandas()
    assert set(got["doc_id"]) <= {1, 3}
    assert got["n_copies"].sum() == 4


def test_kcenter_coreset_matches_numpy_reference():
    from fastie_ray.ops.clustering import kcenter_coreset

    rng = np.random.default_rng(23)
    n, d, k = 120, 8, 6
    emb = rng.normal(size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n), "embedding": list(emb)})

    iv = np.floor(1000 * emb.astype(np.float64)).astype(np.int64)
    picks = [(0, 0, 0)]
    mind = ((iv - iv[0]) ** 2).sum(axis=1)
    for r in range(1, k):
        order = np.lexsort((np.arange(n), -mind))
        b = order[0]
        picks.append((r, int(b), int(mind[b])))
        mind = np.minimum(mind, ((iv - iv[b]) ** 2).sum(axis=1))
    want = pd.DataFrame(picks, columns=["rank", "vec_id", "dist"]).astype("int64")

    for parts in (1, 5):
        got = kcenter_coreset(
            ray.data.from_pandas(df).repartition(parts), k=k
        )
        pd.testing.assert_frame_equal(got, want)


def test_kcenter_first_pick_is_min_id_and_dists_decrease():
    from fastie_ray.ops.clustering import kcenter_coreset

    rng = np.random.default_rng(5)
    emb = rng.normal(size=(60, 4)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(10, 70), "embedding": list(emb)})
    got = kcenter_coreset(ray.data.from_pandas(df), k=4)
    assert got["vec_id"].iloc[0] == 10 and got["dist"].iloc[0] == 0
    d = got["dist"].iloc[1:].to_numpy()
    assert (np.diff(d) <= 0).all()  # farthest-first radii are non-increasing


def test_bottom_k_sample_exact_and_deterministic(ray_session):
    import ray.data

    from fastie_ray.ops.sampling import bottom_k_sample

    ds = ray.data.from_items([{"doc_id": i} for i in range(500)]).repartition(8)
    a = bottom_k_sample(ds, k=25, id_col="doc_id")
    assert len(a) == 25
    b = bottom_k_sample(ds, k=25, id_col="doc_id")
    assert a.equals(b)
    # different salt -> (almost surely) different members
    c = bottom_k_sample(ds, k=25, id_col="doc_id", salt="other:")
    assert set(a["doc_id"]) != set(c["doc_id"])
    # k > n degrades to the full table
    small = ray.data.from_items([{"doc_id": i} for i in range(7)])
    assert len(bottom_k_sample(small, k=25, id_col="doc_id")) == 7


def test_grouped_bottom_k_sample_exact_and_batch_invariant(ray_session):
    import hashlib

    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.sampling import grouped_bottom_k_sample

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(400, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr"], 400, p=[0.7, 0.2, 0.1]),
        }
    )
    # reference: per-group bottom-k by md5
    df2 = df.copy()
    df2["h"] = [
        int(hashlib.md5(("gbk:" + str(v)).encode()).hexdigest()[:8], 16)
        for v in df2["doc_id"]
    ]
    ref = (
        df2.sort_values(["lang", "h", "doc_id"])
        .groupby("lang", sort=False)
        .head(5)
    )
    ref = ref.assign(rank=ref.groupby("lang", sort=False).cumcount() + 1)[
        ["lang", "doc_id", "rank"]
    ].sort_values(["lang", "rank"]).reset_index(drop=True)
    for nparts in (2, 7):
        ds = ray.data.from_pandas(df).repartition(nparts)
        out = (
            grouped_bottom_k_sample(ds, k=5, group_col="lang", id_col="doc_id")
            .to_pandas()[["lang", "doc_id", "rank"]]
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        out["rank"] = out["rank"].astype(ref["rank"].dtype)
        pd.testing.assert_frame_equal(out, ref)
    # exact size per group
    assert (out.groupby("lang").size() == 5).all()
