"""Doccano → UIE example converter as a two-phase Ray Data ETL
(SURVEY §2.2 M16; reference ``fastie/data/uie/utils.py:229-448`` and
the driver ``fastie/data/uie/doccano.py:15-159``).

Phase 1 (wide, tiny result): global entity-label and predicate
vocabularies via distinct passes — the reference accumulates
``entity_label_set`` / ``predicate_set`` while looping the corpus in
memory; distributed, that's two ``unique()`` aggregations whose small
results are broadcast into phase 2.

Phase 2 (embarrassingly parallel): per-document conversion —

- entity examples grouped by label:
  ``{content, prompt=label, result_list=[{text,start,end}, ...]}``;
- relation examples grouped by prompt ``{subject}的{predicate}``
  (``schema_lang="en"`` → ``{predicate} of {subject}``), results =
  object spans (``utils.py:380-421``);
- entity negatives: label-set XOR, ratio-capped
  (``add_entity_negative_example``, here via
  ``functions.uie_prep.sample_negatives`` with per-key RNG);
- relation negatives: the reference's ``inverse_relation`` trick —
  ``{object}的{predicate}`` prompts with empty results, skipping any
  that is actually a positive prompt (``utils.py:389-395,440+``).

Supported input shapes: ``{text, label: [[start, end, label], ...]}``
(doccano ≥1.7), ``{text, entities: [...], relations: [...]}``
(relation export), and ``{text, label: {entities, relations}}``
(doccano <1.7). Aspect-level classification labels
(``##``-separated, ``utils.py:322-345``) emit ``entity_cls`` examples;
doc-level classification exports go through ``convert_cls_examples``
(``utils.py:210-228``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

import pandas as pd

from fastie_ray.functions.uie_prep import sample_negatives

if TYPE_CHECKING:
    import ray.data


def _normalize(row: dict) -> tuple[str, list[dict], list[dict]]:
    """Any doccano shape → (text, entities, relations): the ≥1.7 entity
    list ``{text, label: [[s, e, lb], ...]}``, the relation export
    ``{text, entities, relations}``, and the <1.7 dict shape
    ``{text, label: {entities, relations}}`` (``utils.py:283-295``)."""
    text = row["text"]
    if "entities" in row and row["entities"] is not None:
        return text, list(row["entities"]), list(row.get("relations") or [])
    label = row.get("label")
    if isinstance(label, dict):  # doccano < 1.7 exports a dict under "label"
        return text, list(label.get("entities") or []), list(label.get("relations") or [])
    ents = [
        {"id": i, "start_offset": s, "end_offset": e, "label": lb}
        for i, (s, e, lb) in enumerate(label or [])
    ]
    return text, ents, []


def _sep_cls_label(label: str, separator: str = "##") -> tuple[str, list[str] | None]:
    """``LOC##正向`` → (``LOC``, [``正向``]); plain labels → (label, None)
    (``utils.py:322-326``)."""
    parts = label.split(separator)
    if len(parts) == 1:
        return parts[0], None
    return parts[0], parts[1:]


def generate_cls_example(
    text: str,
    labels: list[str],
    prompt_prefix: str,
    options: list[str],
    rng=None,
) -> dict:
    """Classification example with the reference's in-prompt span
    convention (``utils.py:195-207``): options are shuffled into the
    prompt (seeded rng here instead of the global ``random``), and each
    gold label's span is NEGATIVE — relative to the prompt end — so the
    decoder's ``end < 0 → slice the prompt`` branch recovers it."""
    import numpy as np

    rng = rng or np.random.default_rng(0)
    options = list(options)
    rng.shuffle(options)
    prompt = f"{prompt_prefix}[{','.join(options)}]"
    result_list = []
    for label in labels:
        start = prompt.rfind(label) - len(prompt) - 1
        result_list.append({"text": label, "start": start, "end": start + len(label)})
    return {"content": text, "result_list": result_list, "prompt": prompt}


def convert_cls_examples(
    ds: "ray.data.Dataset",
    prompt_prefix: str = "情感倾向",
    options: list[str] | None = None,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Doc-level classification conversion (``utils.py:210-228``):
    rows ``{text | data, label: [..]}`` → one cls example per doc.
    Per-row rng derived from the text so output is partitioning-
    independent."""
    from fastie_ray.functions.hashing import key_rng

    options = options or ["正向", "负向"]

    def convert(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, r in df.iterrows():
            d = r.to_dict()
            text = d.get("data") if d.get("data") is not None else d["text"]
            ex = generate_cls_example(
                text, list(d.get("label") or []), prompt_prefix, options,
                rng=key_rng(text, seed),
            )
            rows.append((ex["content"], ex["prompt"], ex["result_list"], "cls"))
        return pd.DataFrame(rows, columns=["content", "prompt", "result_list", "kind"])

    return ds.map_batches(convert, batch_format="pandas")


def doccano_vocab(ds: "ray.data.Dataset") -> tuple[list[str], list[str]]:
    """Global (entity_label_set, predicate_set) — two distinct passes."""

    def labels(row: dict) -> list[dict]:
        _, ents, rels = _normalize(row)
        out = [{"v": e["label"], "k": "e"} for e in ents]
        out += [{"v": r["type"], "k": "p"} for r in rels]
        return out

    flat = ds.flat_map(labels)
    pairs = set(
        (r["k"], r["v"])
        for r in flat.groupby(["k", "v"]).count().take_all()
    )
    ent = sorted(v for k, v in pairs if k == "e")
    pred = sorted(v for k, v in pairs if k == "p")
    return ent, pred


def doccano_to_uie(
    ds: "ray.data.Dataset",
    negative_ratio: int = 5,
    schema_lang: str = "ch",
    seed: int = 42,
    prompt_prefix: str = "情感倾向",
    options: list[str] | None = None,
    separator: str = "##",
) -> "ray.data.Dataset":
    """doccano rows → UIE example rows
    (content, prompt, result_list, kind). Vocab is computed once and
    broadcast (closure capture of a small list). Aspect-level cls
    labels (``LOC##正向``) additionally emit one ``entity_cls`` example
    per annotated entity with the ``{entity}的{prompt_prefix}[opts]``
    prompt (``utils.py:322-345``)."""
    from fastie_ray.functions.hashing import key_rng

    options = options or ["正向", "负向"]
    entity_label_set, _ = doccano_vocab(ds)

    def prompt_of(subject: str, predicate: str) -> str:
        if schema_lang == "ch":
            return f"{subject}的{predicate}"
        return f"{predicate} of {subject}"

    def convert(df: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple[str, str, list, str]] = []
        for _, r in df.iterrows():
            text, entities, relations = _normalize(r.to_dict())
            entity_map: dict[Any, dict] = {}
            ent_examples: dict[str, list[dict]] = {}
            for e in entities:
                name = text[e["start_offset"] : e["end_offset"]]
                entity_map[e["id"]] = {
                    "name": name, "start": e["start_offset"], "end": e["end_offset"]
                }
                base_label, cls_labels = _sep_cls_label(e["label"], separator)
                ent_examples.setdefault(base_label, []).append(
                    {"text": name, "start": e["start_offset"], "end": e["end_offset"]}
                )
                if cls_labels is not None:  # aspect-level classification
                    prefix = (
                        f"{name}的{prompt_prefix}" if schema_lang == "ch"
                        else f"{prompt_prefix} of {name}"
                    )
                    ex = generate_cls_example(
                        text, cls_labels, prefix, options,
                        rng=key_rng(text + name, seed),
                    )
                    rows.append((text, ex["prompt"], ex["result_list"], "entity_cls"))
            for label, results in ent_examples.items():
                rows.append((text, label, results, "entity_pos"))

            rel_examples: dict[str, list[dict]] = {}
            inverse_prompts: list[str] = []
            for rel in relations:
                subj = entity_map[rel["from_id"]]
                obj = entity_map[rel["to_id"]]
                p = prompt_of(subj["name"], rel["type"])
                inverse_prompts.append(prompt_of(obj["name"], rel["type"]))
                rel_examples.setdefault(p, []).append(
                    {"text": obj["name"], "start": obj["start"], "end": obj["end"]}
                )
            for p, results in rel_examples.items():
                rows.append((text, p, results, "relation_pos"))

            # entity negatives: label-space XOR, ratio-capped, per-key RNG
            for neg in sample_negatives(
                text, sorted(ent_examples), entity_label_set,
                negative_ratio, max(len(ent_examples), 0), seed=seed,
            ):
                rows.append((text, neg["prompt"], [], "entity_neg"))

            # relation negatives: inverse prompts that aren't positives
            for ip in inverse_prompts:
                if ip not in rel_examples:
                    rows.append((text, ip, [], "relation_neg"))

        return pd.DataFrame(
            rows, columns=["content", "prompt", "result_list", "kind"]
        )

    return ds.map_batches(convert, batch_format="pandas")
