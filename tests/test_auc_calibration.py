"""Tests: exact distributed AUC vs sklearn-free rank formula (with
deliberate score ties) and calibration bins vs pandas."""

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def _auc_ref(scores: np.ndarray, labels: np.ndarray) -> float:
    # midrank Mann-Whitney reference (scipy-free)
    order = np.argsort(scores, kind="mergesort")
    s, y = scores[order], labels[order]
    ranks = np.empty(len(s), dtype=np.float64)
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0
        i = j
    n_pos = int(y.sum())
    n_neg = len(y) - n_pos
    u = ranks[y == 1].sum() - n_pos * (n_pos + 1) / 2.0
    return u / (n_pos * n_neg)


def test_auc_exact_with_ties():
    from fastie_ray.ops.metrics import auc_exact

    rng = np.random.default_rng(23)
    n = 500
    labels = (rng.uniform(size=n) < 0.3).astype(np.int64)
    # coarse scores -> many ties, positives shifted
    scores = rng.integers(0, 20, n) + labels * 7
    df = pd.DataFrame({"score": scores, "label": labels})
    got = auc_exact(_ds(df, 4), "score", "label", n_buckets=4)
    n_pos = int(labels.sum())
    n_neg = n - n_pos
    assert int(got["n_pos"].iloc[0]) == n_pos
    assert int(got["n_neg"].iloc[0]) == n_neg
    auc = _auc_ref(scores.astype(np.int64), labels)
    # u2 = 2 * U  (exact integers)
    assert int(got["u2"].iloc[0]) == round(2 * auc * n_pos * n_neg)
    assert int(got["auc_e6"].iloc[0]) == int(auc * 1_000_000)


def test_calibration_bins_matches_pandas():
    from fastie_ray.ops.metrics import calibration_bins

    rng = np.random.default_rng(29)
    df = pd.DataFrame(
        {
            "score": rng.integers(0, 1000, 600).astype(np.int64),
            "label": (rng.uniform(size=600) < 0.4).astype(np.int64),
        }
    )
    got = (
        calibration_bins(_ds(df, 4), "score", "label", bin_width=250,
                         n_buckets=4)
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    want = (
        df.assign(bin=df["score"] // 250)
        .groupby("bin", as_index=False)
        .agg(n=("label", "count"), n_pos=("label", "sum"))
        .astype("int64")
        .sort_values("bin")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_grouped_auc_matches_sklearn_free_reference(ray_session):
    from fastie_ray.ops.metrics import grouped_auc_exact

    rng = np.random.default_rng(23)
    n = 4000
    df = pd.DataFrame(
        {
            "seg": rng.choice(["a", "b", "c"], n),
            "score": rng.integers(0, 50, n).astype("int64"),
            "label": rng.integers(0, 2, n).astype("int64"),
        }
    )
    # one degenerate single-class segment
    df.loc[df["seg"] == "c", "label"] = 1
    got = (
        grouped_auc_exact(
            ray.data.from_pandas(df).repartition(4),
            "seg", "score", "label", n_buckets=4,
        )
        .to_pandas()
        .sort_values("seg")
        .reset_index(drop=True)
    )
    for seg, grp in df.groupby("seg"):
        pos = grp.loc[grp["label"] == 1, "score"].to_numpy()
        neg = grp.loc[grp["label"] == 0, "score"].to_numpy()
        row = got[got["seg"] == seg].iloc[0]
        if len(pos) == 0 or len(neg) == 0:
            assert row["auc_e6"] == 0
            continue
        wins = (pos[:, None] > neg[None, :]).sum()
        ties = (pos[:, None] == neg[None, :]).sum()
        want = (2 * wins + ties) * 1_000_000 // (2 * len(pos) * len(neg))
        assert row["auc_e6"] == want, seg
