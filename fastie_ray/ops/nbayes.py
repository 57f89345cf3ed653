"""Multinomial naive-Bayes text classification over the ``documents``
table — the generative sibling of ``ops/linear_train.py``'s perceptron
and the distributed analogue of the reference's classification stage
(`fastie/models/`'s sequence classifier family consumes exactly this
doc → label shape; SURVEY §2.2 M14 / §2.3 A15).

Everything is integer-exact against a SQL oracle:

- token = ``[a-z0-9]+`` runs of ``lower(text)`` (the engine-wide
  portable tokenizer, == DuckDB ``regexp_extract_all``);
- the model is COUNTS ONLY (per-class token counts, class token
  totals, class doc counts, vocab size) — all int64;
- a doc's class score is Laplace log-likelihood with every
  transcendental term floored to int64 INDEPENDENTLY, so sums are
  order-independent:

      score(d, l) = floor(1e6·ln(d_l / D))
                  + Σ_{distinct token t of d} tf_t · floor(1e6·ln((c_lt + 1)/(n_l + V)))

  (tf · floored-term keeps the occurrence-level sum exact).

Scale shape: training counts are per-batch combiners → ONE
vocab-bounded bucketed exchange; the finished model is a broadcast
dict (``ray.put`` once, read per actor) — vocabulary-sized, never
corpus-sized; scoring is embarrassingly-parallel ``map_batches``. At
100 TB cap the vocabulary with ``min_count`` (tokens below it fall
into the unseen-token term) — the default keeps everything so the
oracle stays exact.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _token_counts(texts: pd.Series) -> pd.DataFrame:
    """(row_idx, token, tf) long frame for a batch of texts."""
    toks = texts.astype(str).str.lower().str.findall(_TOKEN_RE)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    if lens.sum() == 0:
        return pd.DataFrame(
            {"i": pd.Series([], dtype="int64"),
             "token": pd.Series([], dtype="object"),
             "tf": pd.Series([], dtype="int64")}
        )
    flat = np.concatenate([np.asarray(x, dtype=object) for x in toks])
    idx = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    out = (
        pd.DataFrame({"i": idx, "token": flat})
        .groupby(["i", "token"], as_index=False)
        .size()
        .rename(columns={"size": "tf"})
    )
    out["tf"] = out["tf"].astype("int64")
    return out


def nb_train(
    train: "ray.data.Dataset",
    label_col: str = "lang",
    text_col: str = "text",
    n_buckets: int = 16,
) -> dict:
    """Count model over the training split: returns a plain dict
    (broadcastable with ``ray.put``) holding per-(label, token) counts,
    per-label token totals ``n_l``, per-label doc counts ``d_l``, the
    doc total ``D`` and vocab size ``V``."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        tc = _token_counts(df[text_col])
        tc["label"] = df[label_col].to_numpy()[tc["i"].to_numpy()]
        out = tc.groupby(["label", "token"], as_index=False)["tf"].sum()
        h = pd.util.hash_pandas_object(out["token"], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["label", "token"], as_index=False
        )["tf"].sum()
        out["tf"] = out["tf"].astype("int64")
        return out

    counts = (
        train.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    doc_counts = (
        train.map_batches(
            lambda df: df.groupby(label_col, as_index=False).size(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(label_col, as_index=False)["size"].sum()
    )
    n_l = counts.groupby("label")["tf"].sum().to_dict()
    d_l = dict(zip(doc_counts[label_col], doc_counts["size"].astype(int)))
    return {
        "counts": {(r.label, r.token): int(r.tf) for r in counts.itertuples()},
        "n_l": {k: int(v) for k, v in n_l.items()},
        "d_l": d_l,
        "D": int(sum(d_l.values())),
        "V": int(counts["token"].nunique()),
        "labels": sorted(d_l),
    }


def nb_score(
    test: "ray.data.Dataset",
    model_ref,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Score every test doc against every class and keep the argmax
    (score DESC, label ASC on ties). Returns
    (doc_id, pred, score_e6, is_true). ``model_ref`` is a ``ray.put``
    handle (or the dict itself, for tests) — fetched once per task,
    never re-shipped per batch."""
    import ray

    def score(df: pd.DataFrame) -> pd.DataFrame:
        model = (
            ray.get(model_ref)
            if isinstance(model_ref, ray.ObjectRef)
            else model_ref
        )
        labels = model["labels"]
        counts, n_l, d_l = model["counts"], model["n_l"], model["d_l"]
        D, V = model["D"], model["V"]
        prior = {
            l: int(np.floor(1e6 * np.log(d_l[l] / D))) for l in labels
        }
        tc = _token_counts(df[text_col])
        ids = df[id_col].to_numpy()
        true = df[label_col].to_numpy()
        best_lab = np.empty(len(df), dtype=object)
        best_score = np.full(len(df), np.iinfo(np.int64).min, dtype=np.int64)
        for lab in labels:
            denom = float(n_l.get(lab, 0) + V)
            if len(tc):
                c = np.fromiter(
                    (counts.get((lab, t), 0) for t in tc["token"]),
                    dtype=np.int64, count=len(tc),
                )
                term = np.floor(1e6 * np.log((c + 1.0) / denom)).astype(np.int64)
                contrib = np.bincount(
                    tc["i"].to_numpy(),
                    weights=(term * tc["tf"].to_numpy()).astype(np.float64),
                    minlength=len(df),
                ).astype(np.int64)
            else:
                contrib = np.zeros(len(df), dtype=np.int64)
            s = contrib + prior[lab]
            win = s > best_score  # strict: ties keep the earlier (ASC) label
            best_score = np.where(win, s, best_score)
            best_lab = np.where(win, lab, best_lab)
        return pd.DataFrame(
            {
                id_col: ids,
                "pred": best_lab,
                "score_e6": best_score,
                "is_true": (best_lab == true).astype(np.int64),
            }
        )

    return test.map_batches(score, batch_format="pandas")
