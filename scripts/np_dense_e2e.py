"""Full-corpus dense-path witness (VERDICT r3 #1): run the kg
doc_triples pipeline over ALL of sf0.001 twice — featurizer sparse
path vs the compiled numpy-transformer dense path loaded from an .npz
checkpoint — and report triple P/R (gate: ≥ 0.95, BASELINE.json) and
throughput. Usage: python scripts/np_dense_e2e.py [sf_dir]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from fastie_ray.featurizer import GazetteerFeaturizer
    from fastie_ray.np_transformer import compile_gazetteer_lm
    from fastie_ray.pipelines.kg import doc_triples
    from fastie_ray.sources.pages import pages_from_documents
    from fastie_ray.synth import build_world

    world = build_world(200, 400, 42)
    t0 = time.time()
    w = compile_gazetteer_lm(GazetteerFeaturizer(world), max_length=512)
    path = tempfile.mktemp(suffix=".npz")
    w.save(path)
    print(f"compiled+self-checked checkpoint in {time.time() - t0:.2f}s -> {path}")

    key = ["url", "predicate", "subject", "object"]
    t0 = time.time()
    ref = doc_triples(pages_from_documents(sf_dir, world), concurrency=12).to_pandas()
    t_ref = time.time() - t0
    t0 = time.time()
    got = doc_triples(
        pages_from_documents(sf_dir, world), concurrency=12,
        rel_backend="hf", hf_model=path,
    ).to_pandas()
    t_np = time.time() - t0

    ref_set = set(map(tuple, ref[key].itertuples(index=False)))
    got_set = set(map(tuple, got[key].itertuples(index=False)))
    tp = len(ref_set & got_set)
    p = tp / max(len(got_set), 1)
    r = tp / max(len(ref_set), 1)
    n_pages = len(ref["url"].unique())
    print(f"pages={n_pages} ref_triples={len(ref_set)} np_triples={len(got_set)}")
    print(f"RE precision={p:.4f} recall={r:.4f} (gate 0.95)")
    print(f"featurizer path: {t_ref:.1f}s  numpy-dense path: {t_np:.1f}s "
          f"({n_pages / t_np:.0f} pages/s dense)")
    assert p >= 0.95 and r >= 0.95, (p, r)

    # EE leg: doc_events through the 3-layer EE heads
    from fastie_ray.pipelines.kg import doc_events

    ekey = ["url", "event_type", "role", "argument", "start", "end"]
    eref = doc_events(pages_from_documents(sf_dir, world), concurrency=12).to_pandas()
    t0 = time.time()
    egot = doc_events(
        pages_from_documents(sf_dir, world), concurrency=12,
        backend="hf", hf_model="compile:gazetteer-ee",
    ).to_pandas()
    t_ee = time.time() - t0
    eref_set = set(map(tuple, eref[ekey].itertuples(index=False)))
    egot_set = set(map(tuple, egot[ekey].itertuples(index=False)))
    etp = len(eref_set & egot_set)
    ep = etp / max(len(egot_set), 1)
    er = etp / max(len(eref_set), 1)
    print(f"EE rows ref={len(eref_set)} np={len(egot_set)} "
          f"precision={ep:.4f} recall={er:.4f} ({t_ee:.1f}s)")
    assert ep >= 0.95 and er >= 0.95, (ep, er)
    print("PASS")
    ray.shutdown()


if __name__ == "__main__":
    main()
