"""UIE train-prep functions: negative sampling and the classification
majority vote (reference semantics, determinism-hardened).

Reference:
- ``add_entity_negative_example`` / ``add_relation_negative_example``:
  ``fastie/data/uie/utils.py:96-160`` — the negative prompt space is
  the set XOR of the full label/prompt vocabulary vs the example's
  positive prompts (D5), ratio-capped by ``negative_ratio × n_positive``
  via random sampling. The reference uses process-global
  ``random.sample``; here sampling is drawn from a per-key RNG
  (``key_rng(text)``) so results are independent of row order and
  partitioning (SURVEY §4 Determinism).
- classification majority vote (G5): ``fastie/models/uie/
  decode_utils.py:486-507`` — per document, count + probability-sum
  each predicted option across its chunks; winner = max by
  ``(count, prob_sum)``; reported probability = prob_sum / count.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

from fastie_ray.functions.hashing import key_rng


def negative_prompts(
    label_set: Sequence[str], positive_prompts: Sequence[str]
) -> list[str]:
    """The negative prompt space: sorted set-XOR (``utils.py:101``)."""
    return sorted(set(label_set) ^ set(positive_prompts))


def sample_negatives(
    text: str,
    positive_prompts: Sequence[str],
    label_set: Sequence[str],
    negative_ratio: int,
    n_positive_results: int,
    seed: int = 42,
) -> list[dict[str, Any]]:
    """Ratio-capped negative examples for one document
    (``utils.py:96-123`` semantics, per-key deterministic sampling).
    ``negative_ratio == -1`` keeps every redundant prompt."""
    redundants = negative_prompts(label_set, positive_prompts)
    num_positive = n_positive_results
    if num_positive != 0:
        actual_ratio = math.ceil(len(redundants) / num_positive)
    else:
        num_positive, actual_ratio = 1, 0

    if actual_ratio <= negative_ratio or negative_ratio == -1:
        idxs = list(range(len(redundants)))
    else:
        rng = key_rng(f"uie-neg:{text}", seed=seed)
        idxs = sorted(
            rng.choice(len(redundants), size=negative_ratio * num_positive, replace=False)
        )

    return [
        {"content": text, "result_list": [], "prompt": redundants[int(i)]}
        for i in idxs
    ]


def cls_majority_vote(
    chunk_results: Sequence[Sequence[dict[str, Any]]],
) -> list[dict[str, Any]]:
    """Majority vote of classification predictions across a document's
    chunks (``decode_utils.py:486-507``): winner by (count, prob_sum),
    probability = prob_sum / count. Empty if no chunk predicted."""
    cls_options: dict[str, list[float]] = {}
    for short_result in chunk_results:
        if len(short_result) == 0:
            continue
        text = short_result[0]["text"]
        if text in cls_options:
            cls_options[text][0] += 1
            cls_options[text][1] += short_result[0]["probability"]
        else:
            cls_options[text] = [1, short_result[0]["probability"]]
    if not cls_options:
        return []
    cls_res, cls_info = max(cls_options.items(), key=lambda x: x[1])
    return [{"text": cls_res, "probability": cls_info[1] / cls_info[0]}]
