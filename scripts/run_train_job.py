"""Extraction-head training job entry point — the ``fastie-cli train
config.yaml`` analogue (reference ``fastie/cli.py:48-55`` dispatch,
``fastie/train/tuner.py:100-186`` wiring) on the distributed trainer
(``fastie_ray/pipelines/trainer.py``).

Two data modes:

- ``--train-json``: reference-format JSONL — NER ``{text, entities}``,
  RE ``{text, spo_list: [{predicate, subject, object}]}`` (surface
  strings relocated by substring search, the M6 judge+convert), EE
  DuEE ``{id, text, event_list}`` with ``--schema-file``. Label
  vocabularies are derived by the reference's global distinct+sort.
- no ``--train-json`` (NER only): distant supervision from the pages
  table under ``--sf-dir`` — extract → chunk → gazetteer self-labels,
  the same corpus the KG pipeline consumes.

Writes per-epoch checkpoints (bitwise-resumable: rerun with
``--resume`` after an interruption replays to identical weights),
a training-history parquet, the final weights ``.npz``, and prints a
one-line JSON job report.

    ray job submit --working-dir . -- \
        python scripts/run_train_job.py --task ner \
        --train-json data/train.jsonl --out-dir s3://bucket/run1

YAML config surface: ``python scripts/run_train_job.py
examples/train_job.yaml`` (keys mirror flags 1:1)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ner_distant_rows(sf_dir: str):
    """Gazetteer distant supervision over chunked pages (the
    ``gp_train`` query's corpus shape)."""
    import pandas as pd

    from fastie_ray.functions.hashing import stable_hash64
    from fastie_ray.sources.pages import pages_from_documents
    from fastie_ray.stages.chunk import chunk_pages
    from fastie_ray.stages.extract import extract_text
    from fastie_ray.synth import build_world

    world = build_world()

    class _SelfLabel:
        def __init__(self):
            from fastie_ray.featurizer import GazetteerFeaturizer

            self.fz = GazetteerFeaturizer(world)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            from fastie_ray.functions.textnorm import space_to_dash

            texts, ents = [], []
            for text in df["chunk_text"]:
                hits = self.fz.mention_hits(space_to_dash(text))
                if not hits and stable_hash64(text) % 4 != 0:
                    continue  # ratio-capped negative sampling (M15)
                texts.append(text)
                ents.append([
                    {"start_offset": h.cs, "end_offset": h.ce,
                     "label": self.fz.id2label[h.label_id],
                     "entity": text[h.cs:h.ce]}
                    for h in hits
                ])
            return pd.DataFrame({"text": texts, "entities": ents})

    chunks = chunk_pages(
        extract_text(pages_from_documents(sf_dir, world,
                                          override_num_blocks=16)),
        max_length=122,
    )
    return chunks.map_batches(_SelfLabel, batch_format="pandas",
                              concurrency=2)


def _ee_nested_rows(ds):
    """Raw DuEE rows → the nested ``events`` column
    ``ee_convert_to_features`` consumes (lstrip-offset-corrected,
    synthetic trigger role — M7 semantics)."""
    import pandas as pd

    from fastie_ray.sources.corpus import TRIGGER_ROLE

    def nest(batch: pd.DataFrame) -> pd.DataFrame:
        texts, events = [], []
        for text, evs in zip(batch["text"], batch["event_list"]):
            out = []
            for e in evs:
                ev = []
                off = len(e["trigger"]) - len(e["trigger"].lstrip())
                tr = e["trigger"].strip()
                s = int(e["trigger_start_index"]) + off
                ev.append((e["event_type"], TRIGGER_ROLE, tr, s, s + len(tr)))
                for a in e["arguments"]:
                    off2 = len(a["argument"]) - len(a["argument"].lstrip())
                    w = a["argument"].strip()
                    s2 = int(a["argument_start_index"]) + off2
                    ev.append((e["event_type"], a["role"], w, s2, s2 + len(w)))
                out.append(ev)
            texts.append(text)
            events.append(out)
        return pd.DataFrame({"text": texts, "events": events})

    return ds.map_batches(nest, batch_format="pandas")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", choices=["ner", "rel", "ee"], default="ner")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="pages source for distant-supervision NER mode")
    ap.add_argument("--train-json", default=None,
                    help="reference-format JSONL training file")
    ap.add_argument("--dev-json", default=None)
    ap.add_argument("--schema-file", default=None,
                    help="EE event schema JSONL (S4)")
    ap.add_argument("--val-split", type=float, default=0.1,
                    help="train/dev split when no --dev-json")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=0.15)
    ap.add_argument("--fgm-eps", type=float, default=None)
    ap.add_argument("--max-length", type=int, default=64)
    ap.add_argument("--engine", choices=["blockset", "dataset"],
                    default="blockset")
    ap.add_argument("--batch-rows", type=int, default=128)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="default: <out-dir>/checkpoints")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--mix-dim", type=int, default=0,
                    help="context-mixer width (0 = off); one trainable "
                         "±mix-window local attention layer on the "
                         "frozen backbone")
    ap.add_argument("--mix-window", type=int, default=8)
    from fastie_ray.config import job_argv

    args = ap.parse_args(job_argv())

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", ignore_reinit_error=True,
                     logging_level="ERROR")
        except ConnectionError:
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, ignore_reinit_error=True,
                     logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import numpy as np

    from fastie_ray.pipelines.train_prep import (
        ee_convert_to_features,
        ner_convert_to_features,
        rel_convert_to_features,
    )
    from fastie_ray.pipelines.trainer import (
        GPTrainConfig,
        _flatten,
        ee_task,
        gp_train,
        ner_task,
        rel_task,
    )
    from fastie_ray.sources.corpus import (
        ner_label_vocab,
        process_rel_train,
        read_event_schema,
        read_jsonl,
        rel_predicate_vocab,
        split_train_val,
    )

    t0 = time.monotonic()

    if args.train_json:
        raw = read_jsonl(args.train_json)
        if args.dev_json:
            raw_train, raw_dev = raw, read_jsonl(args.dev_json)
        else:
            raw_train, raw_dev = split_train_val(raw, val_pct=args.val_split)
    else:
        if args.task != "ner":
            raise SystemExit("distant-supervision mode supports --task ner")
        rows = _ner_distant_rows(args.sf_dir)
        raw_train, raw_dev = split_train_val(rows, val_pct=args.val_split)

    if args.task == "ner":
        labels = ner_label_vocab(raw_train)
        l2i = {lb: i for i, lb in enumerate(labels)}
        feats = ner_convert_to_features(
            raw_train, l2i, max_length=args.max_length)
        dev = ner_convert_to_features(
            raw_dev, l2i, max_length=args.max_length)
        spec = ner_task(len(labels))
    elif args.task == "rel":
        labels = rel_predicate_vocab(raw_train)
        p2i = {p: i for i, p in enumerate(labels)}
        feats = rel_convert_to_features(
            process_rel_train(raw_train, p2i), p2i,
            max_length=args.max_length)
        dev = rel_convert_to_features(
            process_rel_train(raw_dev, p2i), p2i,
            max_length=args.max_length)
        spec = rel_task(len(labels))
    else:
        if not args.schema_file:
            raise SystemExit("--task ee needs --schema-file")
        labels = read_event_schema(args.schema_file)
        l2i = {lb: i for i, lb in enumerate(labels)}
        feats = ee_convert_to_features(
            _ee_nested_rows(raw_train), l2i,
            max_length=args.max_length, label_col="events")
        dev = ee_convert_to_features(
            _ee_nested_rows(raw_dev), l2i,
            max_length=args.max_length, label_col="events")
        spec = ee_task(len(labels))

    os.makedirs(args.out_dir, exist_ok=True)
    ckpt = args.checkpoint_dir or os.path.join(args.out_dir, "checkpoints")
    cfg = GPTrainConfig(lr=args.lr, fgm_eps=args.fgm_eps,
                        mix_dim=args.mix_dim,
                        mix_window=args.mix_window)
    weights, hist = gp_train(
        feats, epochs=args.epochs, cfg=cfg, dev_features=dev,
        checkpoint_dir=ckpt, resume=args.resume,
        batch_rows=args.batch_rows, engine=args.engine, task=spec,
    )

    from fastie_ray.pipelines.trainer import save_trained_head

    hist.to_parquet(os.path.join(args.out_dir, "history.parquet"))
    # self-describing checkpoint: hf_backend.resolve_dense_backend
    # dispatches on it, so the trained head drives the production
    # scorer (NerScorer(ner_backend="hf", hf_model=<weights.npz>))
    save_trained_head(
        os.path.join(args.out_dir, "weights.npz"),
        weights, args.task, labels, cfg, max_length=args.max_length,
    )
    last = hist.iloc[-1].to_dict() if len(hist) else {}
    report = {
        "job": "train", "task": args.task, "epochs": args.epochs,
        "n_labels": len(labels), "n_channels": spec.n_channels,
        "final": {k: int(v) for k, v in last.items()},
        "weight_l2_e6": int(float(np.sqrt((_flatten(weights) ** 2).sum()))
                           * 1_000_000),
        "checkpoint_dir": ckpt, "out_dir": args.out_dir,
        "wall_s": round(time.monotonic() - t0, 2),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
