"""Margin-based bitext mining (`fastie_ray/ops/bitext.py`): planted
noisy-copy pairs must mine as each source's best match, output must
equal a brute-force float64 reference (ids, margins, thresholding),
and the block-pair decomposition must be invariant to the block counts
(1×1 vs 2×2 vs 3×2 — local top-k partials merge to the same global
answer)."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.bitext import bitext_mine

K = 4


def _corpus(n=80, d=12, seed=3):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n, d)).astype(np.float32)
    for i in range(1, n, 2):  # odd i = noisy copy of even i-1
        emb[i] = emb[i - 1] + 0.05 * rng.normal(size=d).astype(np.float32)
    side = np.where(np.arange(n) % 2 == 0, "a", "b")
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "side": side,
            "embedding": [e for e in emb],
        }
    ), emb


def _ref(emb, thresh=1.0):
    m = emb.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    n = len(emb)
    A, B = np.arange(0, n, 2), np.arange(1, n, 2)
    S = m[A] @ m[B].T

    def topk(SM):
        idx = np.argsort(-SM, axis=1, kind="stable")[:, :K]
        return idx, SM[np.arange(SM.shape[0])[:, None], idx].mean(axis=1)

    fi, ax = topk(S)
    _, ay = topk(S.T)
    rows = []
    for qi, x in enumerate(A):
        best = None
        for j in fi[qi]:
            marg = S[qi, j] / ((ax[qi] + ay[j]) / 2)
            if marg > thresh and (best is None or marg > best[1]):
                best = (B[j], marg)
        if best:
            rows.append((x, best[0], round(best[1], 4)))
    return pd.DataFrame(rows, columns=["src_id", "tgt_id", "margin"])


def test_bitext_matches_bruteforce_and_mines_planted_pairs():
    df, emb = _corpus()
    ds = ray.data.from_pandas(df).repartition(4)
    out = bitext_mine(ds, k=K, margin_thresh=1.0, n_a_blocks=2, n_b_blocks=2)
    ref = _ref(emb)
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), ref.reset_index(drop=True)
    )
    # planted construction: every mined source pairs with its noisy copy
    assert len(out) > 0
    assert (out["tgt_id"] == out["src_id"] + 1).all()


def test_bitext_block_count_invariance():
    df, _ = _corpus(n=60, seed=9)
    outs = []
    for na, nb in ((1, 1), (2, 2), (3, 2)):
        ds = ray.data.from_pandas(df).repartition(3)
        outs.append(
            bitext_mine(
                ds, k=K, margin_thresh=1.0, n_a_blocks=na, n_b_blocks=nb
            ).reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_bitext_threshold_filters_and_empty_ok():
    df, emb = _corpus(n=40, seed=5)
    ds = ray.data.from_pandas(df).repartition(2)
    # impossible threshold → typed empty frame
    out = bitext_mine(ds, k=K, margin_thresh=100.0)
    assert len(out) == 0
    assert list(out.columns) == ["src_id", "tgt_id", "margin"]
    assert out["src_id"].dtype == np.int64
