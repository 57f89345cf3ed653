"""UIE training-data augmentation (SURVEY §2.2 M17).

Reference: ``fastie/data/uie/augmenter.py`` —

- ``augment`` (25-109): per-text character-level delete / synonym
  replace / repeat augmentation, each method emitting up to
  ``*_aug_counts`` variants, dropping duplicates of earlier results;
- ``add_uie_relation_negative_samples`` (150-183): same content +
  empty ``result_list`` under ``{subject}的{negative_predicate}``
  prompts;
- ``add_positive_samples_by_swap_spo`` (269-326): pair samples that
  share a predicate, substitute the current subject/object surfaces
  into the partner sentence, re-locate the object span with
  ``str.find``.

Differences by design: randomness is an explicit
``numpy.random.Generator`` (the reference uses the global ``random``
module; a distributed pipeline needs per-row determinism — callers
derive the rng from a seed or row key), and the synonym source for
``replace`` is a plain ``dict[str, list[str]]`` (the reference imports
``jieba`` + ``synonyms``, neither of which exists in this container;
when no table is supplied the method is a no-op exactly like a word
with no ≥-threshold synonyms). The repeat/delete methods are
library-free and match the reference exactly.

``augment_docs`` lifts the per-text function to a Ray Data stage:
stateless ``map_batches`` fan-out (1 doc → ≤ 1+Σcounts rows), rng
seeded per row from the id column, so output is independent of batch
layout and partitioning.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Sequence

import numpy as np
import pandas as pd

from fastie_ray.functions.hashing import key_rng

if TYPE_CHECKING:
    import ray.data


def augment(
    text: str,
    methods: Sequence[str] | None = None,
    rng: np.random.Generator | None = None,
    delete_ratio: float = 0.2,
    len_threshold: int = 5,
    delete_aug_counts: int = 1,
    replace_ratio: float = 0.4,
    replace_aug_counts: int = 1,
    repeat_ratio: float = 0.32,
    repeat_aug_counts: int = 1,
    synonym_table: dict[str, list[str]] | None = None,
) -> list[str]:
    """→ [text, variant, ...]; variants that duplicate an earlier
    result are dropped (reference ``if temp_res not in results``)."""
    rng = rng or np.random.default_rng(0)
    results = [text]
    for method in methods or []:
        if method == "delete":
            n_del = int(len(text) * delete_ratio)
            if len(text) > len_threshold:
                for _ in range(delete_aug_counts):
                    drop = set(rng.choice(len(text), size=n_del, replace=False).tolist())
                    out = "".join(t for i, t in enumerate(text) if i not in drop)
                    if out not in results:
                        results.append(out)
        elif method == "replace":
            words = text.split()  # whitespace tokens (no jieba in container)
            n_rep = int(replace_ratio * len(words))
            table = synonym_table or {}
            for _ in range(replace_aug_counts):
                idx = set(rng.choice(len(words), size=n_rep, replace=False).tolist()) if words else set()
                out_words = []
                for i, w in enumerate(words):
                    cands = table.get(w, [])
                    if i in idx and len(cands) >= 2:
                        out_words.append(cands[int(rng.integers(len(cands)))])
                    else:
                        out_words.append(w)
                out = " ".join(out_words)
                if out not in results:
                    results.append(out)
        elif method == "repeat":
            n_rep = int(repeat_ratio * len(text))
            for _ in range(repeat_aug_counts):
                dup = set(rng.choice(len(text), size=n_rep, replace=False).tolist()) if text else set()
                out = "".join(w * 2 if i in dup else w for i, w in enumerate(text))
                if out not in results:
                    results.append(out)
        else:
            raise ValueError(
                f'No method called {method}, must in ["delete", "replace", "repeat"].'
            )
    return results


def add_uie_relation_negative_samples(
    sample: dict[str, Any],
    negative_predicates: Sequence[str],
    split: str = "的",
) -> list[dict[str, Any]]:
    """UIE relation negatives: same content, empty result_list, prompt
    re-predicated (``augmenter.py:150-183``)."""
    subject = split.join(sample["prompt"].split(split)[:-1])
    return [
        {
            "content": sample["content"],
            "result_list": [],
            "prompt": f"{subject}{split}{p}",
        }
        for p in negative_predicates
    ]


def add_positive_samples_by_swap_spo(
    samples: Sequence[dict[str, Any]],
    rng: np.random.Generator | None = None,
) -> tuple[list[dict[str, Any]], int, dict[str, list[dict[str, Any]]]]:
    """Swap-S/O positives (``augmenter.py:269-326``): for each
    single-answer relation sample, pick a random partner with the same
    predicate, substitute this sample's subject and object surfaces
    into the partner's sentence, keep it if the object re-locates."""
    rng = rng or np.random.default_rng(0)
    by_pred: dict[str, list[dict[str, Any]]] = {}
    for s in samples:
        if len(s["result_list"]) == 1 and "的" in s["prompt"]:
            by_pred.setdefault(s["prompt"].split("的")[-1], []).append(s)

    positives: list[dict[str, Any]] = []
    error_num = 0
    for _, group in by_pred.items():
        if len(group) < 2:
            continue
        for s in group:
            others = [c for c in group if c is not s]
            cand = others[int(rng.integers(len(others)))]
            cur_sub = "的".join(s["prompt"].split("的")[:-1])
            cur_obj = s["result_list"][0]["text"]
            cand_sub = "的".join(cand["prompt"].split("的")[:-1])
            cand_obj = cand["result_list"][0]["text"]
            new_text = cand["content"].replace(cand_sub, cur_sub).replace(cand_obj, cur_obj)
            pos = new_text.find(cur_obj)
            if pos != -1:
                positives.append(
                    {
                        "content": new_text,
                        "prompt": s["prompt"],
                        "result_list": [
                            {"text": cur_obj, "start": pos, "end": pos + len(cur_obj)}
                        ],
                    }
                )
            else:
                error_num += 1
    return positives, error_num, by_pred


def augment_docs(
    ds: "ray.data.Dataset",
    methods: Sequence[str] = ("delete", "repeat"),
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    **kw: Any,
) -> "ray.data.Dataset":
    """documents → (id, variant_id, text) rows: variant 0 is the
    original, ≥1 the augmented variants. Per-row rng derived from
    (seed, id) so output is partitioning-independent."""

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_var, out_text = [], [], []
        for doc_id, text in zip(df[id_col], df[text_col]):
            rng = key_rng(str(doc_id), seed)
            for vi, t in enumerate(augment(text, methods, rng=rng, **kw)):
                out_id.append(doc_id)
                out_var.append(vi)
                out_text.append(t)
        return pd.DataFrame(
            {
                id_col: pd.Series(out_id, dtype=df[id_col].dtype),
                "variant_id": pd.Series(out_var, dtype="int64"),
                text_col: pd.Series(out_text, dtype="object"),
            }
        )

    return ds.map_batches(fan_out, batch_format="pandas")
