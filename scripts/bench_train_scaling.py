"""Training-path scaling evidence: one gp_train epoch is a data-parallel
gradient wave over pinned feature blocks, so it should scale like any
other per-block stage. Runs the SAME distant-supervision NER training
(all chunks of the sf pages, no negative sampling — the bigger, honest
workload) at two CPU counts in fresh Ray sessions and reports epoch
throughput + scaling efficiency, the bench.py --scaling shape.

    python scripts/bench_train_scaling.py            # 8 vs 32 cpus
    python scripts/bench_train_scaling.py --lo 4 --hi 16
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEG = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import logging; logging.getLogger("ray.data").setLevel(logging.ERROR)
import pandas as pd

from fastie_ray.featurizer import GazetteerFeaturizer
from fastie_ray.functions.textnorm import space_to_dash
from fastie_ray.pipelines.train_prep import ner_convert_to_features
from fastie_ray.pipelines.trainer import GPTrainConfig, gp_train
from fastie_ray.sources.pages import pages_from_documents
from fastie_ray.stages.chunk import chunk_pages
from fastie_ray.stages.extract import extract_text
from fastie_ray.synth import LABELS, build_world

world = build_world()

class SelfLabel:
    def __init__(self):
        self.fz = GazetteerFeaturizer(world)
    def __call__(self, df):
        texts, ents = [], []
        for text in df["chunk_text"]:
            hits = self.fz.mention_hits(space_to_dash(text))
            texts.append(text)
            ents.append([{{"start_offset": h.cs, "end_offset": h.ce,
                          "label": self.fz.id2label[h.label_id],
                          "entity": text[h.cs:h.ce]}} for h in hits])
        return pd.DataFrame({{"text": texts, "entities": ents}})

chunks = chunk_pages(
    extract_text(pages_from_documents({sf_dir!r}, world,
                                      override_num_blocks=16)),
    max_length=122,
).map_batches(SelfLabel, batch_format="pandas",
             concurrency=max(2, {cpus} // 4))
labels = sorted(LABELS)
l2i = {{lb: i for i, lb in enumerate(labels)}}
feats = ner_convert_to_features(chunks, l2i, max_length=64).materialize()
n_rows = feats.count()
# warm epoch (actors, plasma, imports), then the timed window
gp_train(feats, len(labels), epochs=1,
         cfg=GPTrainConfig(lr=0.15, mix_dim={mix_dim}), n_blocks={cpus} * 2)
t0 = time.monotonic()
_, hist = gp_train(feats, len(labels), epochs={epochs},
                   cfg=GPTrainConfig(lr=0.15, mix_dim={mix_dim}), n_blocks={cpus} * 2)
wall = time.monotonic() - t0
print(json.dumps({{"cpus": {cpus}, "n_rows": n_rows, "epochs": {epochs},
                  "wall_s": round(wall, 3),
                  "rows_per_sec": round(n_rows * {epochs} / wall, 1)}}))
ray.shutdown()
"""


def run_leg(cpus: int, sf_dir: str, epochs: int) -> dict:
    mix_dim = int(os.environ.get("GRAFT_MIX_DIM", 0))
    code = _LEG.format(repo=REPO, cpus=cpus, sf_dir=sf_dir, epochs=epochs,
                       mix_dim=mix_dim)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--lo", type=int, default=8)
    ap.add_argument("--hi", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=8)
    args = ap.parse_args()

    lo = run_leg(args.lo, args.sf_dir, args.epochs)
    hi = run_leg(args.hi, args.sf_dir, args.epochs)
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (args.hi / args.lo)
    print(json.dumps({
        "metric": "train_scaling_efficiency",
        "num_cpus_lo": args.lo, "num_cpus_hi": args.hi,
        "lo": lo, "hi": hi,
        "scaling_efficiency": round(eff, 3),
        "sf": args.sf_dir,
    }))


if __name__ == "__main__":
    main()
