"""Reference-format corpus readers and train-prep operators on Ray Data
(SURVEY §2.1 S1-S7, §2.2 M6-M8, §2.5 G1).

Document shapes (reference ``examples/*/datasets/*/dev.json``):
- NER: ``{text, entities: [{id, entity, start_offset, end_offset, label}]}``
- RE:  ``{text, spo_list: [{predicate, subject, object}]}`` (no offsets;
  surfaces relocated by substring search, ``fastie/data/relation_extraction.py:25-29``)
- EE:  ``{text, id, event_list: [{event_type, trigger, trigger_start_index,
  arguments: [{argument_start_index, role, argument}]}]}``
- event schema file: JSONL of ``{event_type, role_list: [{role}]}`` →
  flat labels ``f"{event_type}@{role}"`` + synthetic 触发词 role
  (``fastie/data/event_extraction.py:42-50``)
"""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import pandas as pd

from fastie_ray.functions.textnorm import search

if TYPE_CHECKING:
    import ray.data

TRIGGER_ROLE = "触发词"


# ----------------------------------------------------------------- readers


def read_jsonl(path: str) -> "ray.data.Dataset":
    """S1: the ``load_dataset(extension, data_files=...)`` analogue —
    newline-delimited JSON → Dataset."""
    import ray.data

    return ray.data.read_json(path)


def read_event_schema(path: str) -> list[str]:
    """S4: event schema JSONL → sorted flat label list
    ``event_type@role`` incl. the synthetic trigger role (driver-side;
    the tiny result is broadcast to actors)."""
    labels = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            row = json.loads(line)
            t = row["event_type"]
            for r in [TRIGGER_ROLE] + [s["role"] for s in row["role_list"]]:
                labels.append(f"{t}@{r}")
    return sorted(labels)


# ------------------------------------------------------------- label vocab


def ner_label_vocab(ds: "ray.data.Dataset") -> list[str]:
    """G1: global distinct+sort over entity labels
    (``fastie/data/named_entity_recognition.py:60-62``) — flat_map to a
    one-column table, ``unique`` (the only shuffle), sorted on the
    driver (tiny result)."""
    labels = ds.flat_map(
        lambda row: [{"label": e["label"]} for e in row["entities"]]
    ).unique("label")
    return sorted(labels)


def rel_predicate_vocab(ds: "ray.data.Dataset") -> list[str]:
    """G1 for relations (``fastie/data/relation_extraction.py:103-105``)."""
    preds = ds.flat_map(
        lambda row: [{"predicate": s["predicate"]} for s in row["spo_list"]]
    ).unique("predicate")
    return sorted(preds)


# --------------------------------------------------------------- train prep


def process_rel_train(
    ds: "ray.data.Dataset", predicate2id: dict[str, int]
) -> "ray.data.Dataset":
    """M6: ``judge`` + ``convert`` (``fastie/data/relation_extraction.py:32-66``)
    — drop docs where no spo surface pair is findable in the text, and
    convert the rest to ``[sub_start, sub_end_incl, pred_id, obj_start,
    obj_end_incl]`` (END-INCLUSIVE, as the reference trains on)."""

    def convert(batch: pd.DataFrame) -> pd.DataFrame:
        texts, spos = [], []
        for text, spo_list in zip(batch["text"], batch["spo_list"]):
            out = []
            for spo in spo_list:
                sub = search(spo["subject"], text)
                obj = search(spo["object"], text)
                if sub == -1 or obj == -1:
                    continue
                out.append(
                    [
                        sub,
                        sub + len(spo["subject"]) - 1,
                        predicate2id[spo["predicate"]],
                        obj,
                        obj + len(spo["object"]) - 1,
                    ]
                )
            if out:  # judge: docs with zero locatable spos are dropped
                texts.append(text)
                spos.append(out)
        return pd.DataFrame({"text": texts, "spo_list": spos})

    return ds.map_batches(convert, batch_format="pandas")


def ner_dev_targets(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """M8: ``process_dev`` (``named_entity_recognition.py:82-95``) —
    gold entities as exploded relational rows (label, start, end,
    entity) keyed by text; the reference's per-row set becomes exact
    rows (sets are reconstituted by groupby when needed)."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for text, ents in zip(batch["text"], batch["entities"]):
            for e in ents:
                rows.append(
                    (text, e["label"], int(e["start_offset"]),
                     int(e["end_offset"]), e["entity"])
                )
        return pd.DataFrame(
            rows, columns=["text", "label", "start", "end", "entity"]
        )

    return ds.map_batches(project, batch_format="pandas")


def duee_v1_targets(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """M7: ``duee_v1_process`` (``event_extraction.py:71-98``) —
    lstrip-offset-corrected (event_type, role, argument, start, end)
    rows incl. the synthetic trigger role; ``event_idx`` keys arguments
    of one event together."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, text, events in zip(
            batch["id"], batch["text"], batch["event_list"]
        ):
            for k, e in enumerate(events):
                off1 = len(e["trigger"]) - len(e["trigger"].lstrip())
                rows.append(
                    (doc_id, k, e["event_type"], TRIGGER_ROLE,
                     e["trigger"].strip(),
                     int(e["trigger_start_index"]) + off1,
                     int(e["trigger_start_index"]) + off1 + len(e["trigger"].strip()))
                )
                for a in e["arguments"]:
                    off2 = len(a["argument"]) - len(a["argument"].lstrip())
                    rows.append(
                        (doc_id, k, e["event_type"], a["role"],
                         a["argument"].strip(),
                         int(a["argument_start_index"]) + off2,
                         int(a["argument_start_index"]) + off2 + len(a["argument"].strip()))
                    )
        return pd.DataFrame(
            rows,
            columns=["doc_id", "event_idx", "event_type", "role",
                     "argument", "start", "end"],
        )

    return ds.map_batches(project, batch_format="pandas")


# --------------------------------------------------------- split / shuffle


def split_train_val(
    ds: "ray.data.Dataset", val_pct: float, seed: int = 42
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """S2: ``train_test_split(pct)`` — seeded shuffle first so the split
    is deterministic and row-order-independent."""
    shuffled = ds.random_shuffle(seed=seed)
    val, train = shuffled.split_proportionately([val_pct])
    return train, val


def seeded_shuffle(ds: "ray.data.Dataset", seed: int = 42) -> "ray.data.Dataset":
    """S3: ``dataset.shuffle(seed)``."""
    return ds.random_shuffle(seed=seed)


def write_jsonl(ds: "ray.data.Dataset", out_dir: str) -> None:
    """S6: ``_save_examples`` → partitioned newline-JSON files."""
    ds.write_json(out_dir)


def mention_stats(
    ds: "ray.data.Dataset", n_buckets: int = 8
) -> "ray.data.Dataset":
    """Corpus-stats over a gold-mention table (the M8 projection shape,
    e.g. the committed real-CMeEE parquet ``data/golden/
    cmeee_dev.parquet``): per label — mention count, distinct docs,
    distinct surfaces, total span chars. Scale shape: plain count/sum
    ride a per-batch combiner; the two distincts ride per-batch
    ``drop_duplicates`` partials through ONE label-bucketed exchange
    (distinct domains are label×doc / label×surface bounded); the final
    table is label-domain tiny."""
    import numpy as np

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = df.groupby("label", as_index=False).agg(
            n_mentions=("label", "count"),
        )
        counts["sum_span_chars"] = (
            df.assign(w=df["end"] - df["start"])
            .groupby("label")["w"].sum().reindex(counts["label"]).to_numpy()
        )
        docs = df[["label", "doc_idx"]].drop_duplicates()
        surf = df[["label", "entity"]].drop_duplicates()
        counts["kind"] = "c"
        docs = docs.rename(columns={"doc_idx": "k"}).assign(kind="d")
        surf = surf.rename(columns={"entity": "k"}).assign(kind="s")
        docs["k"] = docs["k"].astype(str)
        out = pd.concat(
            [counts, docs, surf], ignore_index=True
        )
        for col, fill in [("n_mentions", 0), ("sum_span_chars", 0),
                          ("k", "")]:
            if col in out:
                out[col] = out[col].fillna(fill)
        return out

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["label"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        rows = []
        for label, sub in g.groupby("label"):
            c = sub[sub["kind"] == "c"]
            rows.append((
                label,
                int(c["n_mentions"].sum()),
                int(sub.loc[sub["kind"] == "d", "k"].nunique()),
                int(sub.loc[sub["kind"] == "s", "k"].nunique()),
                int(c["sum_span_chars"].sum()),
            ))
        return pd.DataFrame(
            rows,
            columns=["label", "n_mentions", "n_docs", "n_surfaces",
                     "sum_span_chars"],
        ).astype({"n_mentions": "int64", "n_docs": "int64",
                  "n_surfaces": "int64", "sum_span_chars": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def event_stats(
    ds: "ray.data.Dataset", n_buckets: int = 8
) -> "ray.data.Dataset":
    """Corpus-stats over a gold event-argument table (the M7
    ``duee_v1_targets`` shape, e.g. the committed real-DuEE parquet):
    per event_type — distinct events, argument rows, distinct roles,
    total argument chars. Same combiner + one type-bucketed exchange
    discipline as :func:`mention_stats`."""
    import numpy as np

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        counts = df.groupby("event_type", as_index=False).agg(
            n_args=("event_type", "count"),
        )
        counts["sum_arg_chars"] = (
            df.assign(w=df["end"] - df["start"])
            .groupby("event_type")["w"].sum()
            .reindex(counts["event_type"]).to_numpy()
        )
        counts["kind"] = "c"
        ev = (
            df.assign(k=df["doc_id"].astype(str) + "\x1f"
                      + df["event_idx"].astype(str))
            [["event_type", "k"]].drop_duplicates().assign(kind="e")
        )
        rl = (
            df[["event_type", "role"]].drop_duplicates()
            .rename(columns={"role": "k"}).assign(kind="r")
        )
        out = pd.concat([counts, ev, rl], ignore_index=True)
        for col, fill in [("n_args", 0), ("sum_arg_chars", 0), ("k", "")]:
            if col in out:
                out[col] = out[col].fillna(fill)
        return out

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df["event_type"], index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        rows = []
        for et, sub in g.groupby("event_type"):
            c = sub[sub["kind"] == "c"]
            rows.append((
                et,
                int(sub.loc[sub["kind"] == "e", "k"].nunique()),
                int(c["n_args"].sum()),
                int(sub.loc[sub["kind"] == "r", "k"].nunique()),
                int(c["sum_arg_chars"].sum()),
            ))
        return pd.DataFrame(
            rows,
            columns=["event_type", "n_events", "n_args", "n_roles",
                     "sum_arg_chars"],
        ).astype({"n_events": "int64", "n_args": "int64",
                  "n_roles": "int64", "sum_arg_chars": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
