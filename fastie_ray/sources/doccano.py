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

Scope note: aspect-level classification examples (``##``-separated
cls labels) and the full doccano <1.7 format matrix are not ported;
both supported input shapes are the modern ones:
``{text, label: [[start, end, label], ...]}`` and
``{text, entities: [...], relations: [...]}``.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

import pandas as pd

from fastie_ray.functions.uie_prep import sample_negatives

if TYPE_CHECKING:
    import ray.data


def _normalize(row: dict) -> tuple[str, list[dict], list[dict]]:
    """Either doccano shape → (text, entities, relations)."""
    text = row["text"]
    if "entities" in row and row["entities"] is not None:
        return text, list(row["entities"]), list(row.get("relations") or [])
    ents = [
        {"id": i, "start_offset": s, "end_offset": e, "label": lb}
        for i, (s, e, lb) in enumerate(row.get("label") or [])
    ]
    return text, ents, []


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
) -> "ray.data.Dataset":
    """doccano rows → UIE example rows
    (content, prompt, result_list, kind). Vocab is computed once and
    broadcast (closure capture of a small list)."""
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
                ent_examples.setdefault(e["label"], []).append(
                    {"text": name, "start": e["start_offset"], "end": e["end_offset"]}
                )
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
