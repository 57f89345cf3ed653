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
