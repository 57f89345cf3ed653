"""Product quantization (`fastie_ray/ops/pq.py`): encode parity with a
numpy reference, batch invariance, sampled-codeword self-assignment,
and ADC top-k recall vs exact brute force on clustered vectors."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.pq import pq_adc_topk, pq_encode, sample_codebook


def _vectors(n=300, dim=32, n_clusters=8, seed=21):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, (n_clusters, dim))
    rows = centers[rng.integers(0, n_clusters, n)] + rng.normal(0, 0.4, (n, dim))
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [r.astype(np.float32) for r in rows],
        }
    ), rows


def test_pq_encode_matches_numpy_and_batch_invariant(ray_session):
    df, _ = _vectors()
    n_sub, d_sub = 4, 8
    outs = []
    for nparts in (2, 5):
        ds = ray.data.from_pandas(df).repartition(nparts)
        cb = sample_codebook(ds, n_codes=8)
        out = (
            pq_encode(ds, cb, n_sub=n_sub)
            .to_pandas()
            .sort_values(["vec_id", "sub"])
            .reset_index(drop=True)
        )
        outs.append((cb, out))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    pd.testing.assert_frame_equal(outs[0][1], outs[1][1])
    cb, out = outs[0]
    v = np.stack([np.asarray(x, np.float64) for x in df["embedding"]])
    for m in range(n_sub):
        sl = slice(m * d_sub, (m + 1) * d_sub)
        d2 = ((v[:, None, sl] - cb[None, :, sl]) ** 2).sum(axis=2)
        got = out[out["sub"] == m].sort_values("vec_id")["code"].to_numpy()
        np.testing.assert_array_equal(got, d2.argmin(axis=1))


def test_pq_codeword_rows_encode_to_themselves(ray_session):
    df, _ = _vectors(n=64, seed=3)
    ds = ray.data.from_pandas(df).repartition(2)
    cb = sample_codebook(ds, n_codes=8)
    out = pq_encode(ds, cb, n_sub=4).to_pandas()
    v = np.stack([np.asarray(x, np.float64) for x in df["embedding"]])
    # find which vec_ids are codewords
    for code in range(len(cb)):
        matches = np.where((v == cb[code]).all(axis=1))[0]
        assert len(matches) == 1
        vid = df["vec_id"].iloc[matches[0]]
        rows = out[out["vec_id"] == vid]
        assert (rows["code"] == code).all()


def test_pq_adc_matches_numpy_reference_and_finds_cluster(ray_session):
    df, v = _vectors(n=400, seed=9)
    n_sub, d_sub = 4, 8
    ds = ray.data.from_pandas(df).repartition(4)
    cb = sample_codebook(ds, n_codes=16)
    qidx = [0, 7, 42]
    res = pq_adc_topk(
        ds, cb, queries=v[qidx], query_ids=qidx, k=10, n_sub=n_sub
    )
    # exact numpy ADC reference: distance to the QUANTIZED rows
    codes = np.empty((len(v), n_sub), dtype=np.int64)
    for m in range(n_sub):
        sl = slice(m * d_sub, (m + 1) * d_sub)
        codes[:, m] = ((v[:, None, sl] - cb[None, :, sl]) ** 2).sum(2).argmin(1)
    rows = []
    for qi in qidx:
        lut = np.empty((n_sub, len(cb)))
        for m in range(n_sub):
            sl = slice(m * d_sub, (m + 1) * d_sub)
            lut[m] = ((v[qi, sl][None, :] - cb[:, sl]) ** 2).sum(1)
        adc = sum(lut[m, codes[:, m]] for m in range(n_sub))
        order = np.lexsort((np.arange(len(v)), adc))[:10]
        for r, idx in enumerate(order):
            rows.append((qi, idx, r + 1))
    ref = pd.DataFrame(rows, columns=["query_id", "neighbor_id", "rank"])
    got = res.sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got, ref.astype({"query_id": "int64", "neighbor_id": "int64", "rank": "int64"})
    )
    # coarse correctness: ADC neighbours come from the query's cluster
    # (cross-cluster distances dwarf quantization error on this data)
    d2_all = ((v[:, None, :] - v[None, qidx, :]) ** 2).sum(-1)
    for col, qi in enumerate(qidx):
        cluster = set(np.where(d2_all[:, col] < 50.0)[0])
        got_ids = set(res[res["query_id"] == qi]["neighbor_id"])
        assert got_ids <= cluster
