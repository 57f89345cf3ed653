"""Distributed micro P/R/F1 for extraction outputs (SURVEY §2.5 G2/G4).

Reference semantics:
``fastie/metrics/extraction/precision_recall_fscore.py:11-35``
(``_precision_recall_fscore`` + ``extract_tp_actual_correct``) and the
streaming accumulator ``fastie/metrics/extraction/score.py:9-31``
(``ExtractionScore.update``/``value``). The reference indexes sets by
example position ``(i, tuple)``; order is meaningless in a distributed
pipeline, so we key by an explicit stable row key (``url``) instead —
SURVEY §2.9 "no stage may rely on row order".

Distribution shape: the classic partial/final aggregate — each batch
contributes ``(tp, pred, true)`` counts via one merge inside
``map_batches`` (the combiner), then a single driver-side ``sum()``
over three int columns finalizes. The gold and predicted tables are
co-partitioned by a bucket of the key (one small shuffle each).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def precision_recall_fscore(
    pred_sum: int, tp_sum: int, true_sum: int
) -> dict[str, float]:
    """``_precision_recall_fscore`` port (smoothing-free, 0.0 on empty)."""
    recall = tp_sum / true_sum if true_sum > 0 else 0.0
    precision = tp_sum / pred_sum if pred_sum > 0 else 0.0
    if recall + precision == 0.0:
        f_score = 0.0
    else:
        f_score = 2 * recall * precision / (recall + precision)
    return {"precision": precision, "recall": recall, "f1": f_score}


def extraction_score(
    gold: "ray.data.Dataset",
    pred: "ray.data.Dataset",
    keys: Sequence[str],
    n_buckets: int = 32,
) -> dict[str, float]:
    """Micro P/R/F1 of ``pred`` vs ``gold``, where a prediction is
    correct iff its full ``keys`` tuple appears in gold (set semantics
    — both sides are deduplicated, like the reference's per-example
    sets). Returns {precision, recall, f1, tp, pred_sum, true_sum}."""
    keys = list(keys)

    def tag(side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[keys].drop_duplicates()
            out = out.copy()
            out["__side"] = side
            h = pd.util.hash_pandas_object(out[keys], index=False).to_numpy()
            out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64) if len(out) else np.array([], dtype=np.int64)
            return out

        return fn

    both = gold.map_batches(tag("g"), batch_format="pandas").union(
        pred.map_batches(tag("p"), batch_format="pandas")
    )

    def counts(g: pd.DataFrame) -> pd.DataFrame:
        gset = g[g["__side"] == "g"][keys].drop_duplicates()
        pset = g[g["__side"] == "p"][keys].drop_duplicates()
        merged = gset.merge(pset, on=keys, how="inner")
        return pd.DataFrame(
            {
                "tp": [len(merged)],
                "pred_sum": [len(pset)],
                "true_sum": [len(gset)],
            }
        )

    agg = (
        both.groupby("__b")
        .map_groups(counts, batch_format="pandas")
        .sum(["tp", "pred_sum", "true_sum"])
    )
    tp, ps, ts = int(agg["sum(tp)"]), int(agg["sum(pred_sum)"]), int(agg["sum(true_sum)"])
    out = precision_recall_fscore(ps, tp, ts)
    out.update({"tp": tp, "pred_sum": ps, "true_sum": ts})
    return out


def auc_exact(
    ds: "ray.data.Dataset",
    score_col: str,
    label_col: str,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """EXACT ROC-AUC over INTEGER scores and binary labels, distributed
    as the Mann-Whitney U statistic with midrank tie handling — the
    ranking half of the eval-metric family (P/R/F1 above are the
    set-match half). All arithmetic is integer (2×-scaled midranks):

        2·R⁺ = Σ_groups pos_g · (2·rank_below_g + n_g + 1)
        U2   = 2·R⁺ − n⁺·(n⁺+1)
        AUC  = U2 / (2·n⁺·n⁻)

    Scale shape: one (score → n, n_pos) combiner + ONE score-bucketed
    exchange; the driver prefix-scans the DISTINCT-score table (the
    same domain-bounded contract as ``ops.stats.exact_quantiles`` —
    quantize continuous scores first). Returns one row:
    (u2, n_pos, n_neg, auc_e6 = ⌊U2·10⁶ / (2·n⁺·n⁻)⌋)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"score": df[score_col].astype("int64"),
             "pos": df[label_col].astype("int64")}
        )
        out = g.groupby("score", as_index=False).agg(
            n=("pos", "count"), np_=("pos", "sum")
        )
        return out

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["score"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("score", as_index=False)[
            ["n", "np_"]
        ].sum()
        return out

    groups = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
        .sort_values("score")
        .reset_index(drop=True)
    )
    n = groups["n"].to_numpy(dtype=np.int64)
    np_pos = groups["np_"].to_numpy(dtype=np.int64)
    rank_below = np.concatenate([[0], np.cumsum(n)[:-1]])
    two_rpos = int((np_pos * (2 * rank_below + n + 1)).sum())
    n_pos = int(np_pos.sum())
    n_tot = int(n.sum())
    n_neg = n_tot - n_pos
    u2 = two_rpos - n_pos * (n_pos + 1)
    den = 2 * n_pos * n_neg
    auc_e6 = (u2 * 1_000_000) // den if den else 0
    return pd.DataFrame(
        {
            "u2": [np.int64(u2)],
            "n_pos": [np.int64(n_pos)],
            "n_neg": [np.int64(n_neg)],
            "auc_e6": [np.int64(auc_e6)],
        }
    )


def grouped_auc_exact(
    ds: "ray.data.Dataset",
    group_col: str,
    score_col: str,
    label_col: str,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-SEGMENT exact ROC-AUC (``auc_exact`` lifted to groups — the
    fairness/segment-eval audit: a model can hit 0.9 overall and 0.55
    on one slice): same integer Mann-Whitney midrank arithmetic, but
    with NO driver step at all — the (group, score) count combiner
    bounds the exchange by group×score domain, all of a group's scores
    co-locate in one bucket (hash on group), and the per-group prefix
    scan runs vectorized inside the final task. Returns a Dataset of
    (group, u2, n_pos, n_neg, auc_e6); degenerate one-class groups get
    auc_e6 = 0 (den = 0), matching the SQL guard."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                group_col: df[group_col],
                "score": df[score_col].astype("int64"),
                "pos": df[label_col].astype("int64"),
            }
        )
        return g.groupby([group_col, "score"], as_index=False).agg(
            n=("pos", "count"), np_=("pos", "sum")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.drop(columns="__b")
            .groupby([group_col, "score"], as_index=False)[["n", "np_"]]
            .sum()
            .sort_values([group_col, "score"])
        )
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            n = grp["n"].to_numpy(dtype=np.int64)
            np_pos = grp["np_"].to_numpy(dtype=np.int64)
            rank_below = np.concatenate([[0], np.cumsum(n)[:-1]])
            two_rpos = int((np_pos * (2 * rank_below + n + 1)).sum())
            n_pos = int(np_pos.sum())
            n_neg = int(n.sum()) - n_pos
            u2 = two_rpos - n_pos * (n_pos + 1)
            den = 2 * n_pos * n_neg
            rows.append(
                (key, u2, n_pos, n_neg,
                 (u2 * 1_000_000) // den if den else 0)
            )
        out = pd.DataFrame(
            rows, columns=[group_col, "u2", "n_pos", "n_neg", "auc_e6"]
        )
        for c in ("u2", "n_pos", "n_neg", "auc_e6"):
            out[c] = out[c].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def calibration_bins(
    ds: "ray.data.Dataset",
    score_col: str,
    label_col: str,
    bin_width: int = 100,
    n_buckets: int = 8,
    group_col: str | None = None,
) -> "ray.data.Dataset":
    """Reliability-diagram bins over integer scores: per score bucket,
    (n, n_pos) — the calibration audit next to AUC (a model can rank
    well and still be miscalibrated). ``group_col`` makes it the
    per-SEGMENT reliability report (the fairness/drift slice audit) —
    bins keyed (group, bin), same one combiner + one exchange;
    payload is segments × bins × two ints."""
    keys = ([group_col] if group_col else []) + ["bin"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"bin": df[score_col].astype("int64") // bin_width,
             "pos": df[label_col].astype("int64")}
        )
        if group_col:
            g[group_col] = df[group_col].to_numpy()
        return g.groupby(keys, as_index=False).agg(
            n=("pos", "count"), n_pos=("pos", "sum")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(keys, as_index=False)[
            ["n", "n_pos"]
        ].sum()
        return out.astype({"bin": "int64", "n": "int64", "n_pos": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
