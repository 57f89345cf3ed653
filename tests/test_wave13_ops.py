"""Brute-force parity tests for the round-3 wave-13 operators:
doc_novelty (first-seen bigram attribution) and cc_incremental
(delta-fold connected components vs full recompute)."""

from __future__ import annotations

import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def test_doc_novelty_brute_force():
    from fastie_ray.ops.text_analysis import doc_novelty

    rng = np.random.RandomState(41)
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for i in range(150):
        n = rng.randint(4, 20)
        rows.append(
            {"doc_id": i,
             "text": " ".join(vocab[j] for j in rng.randint(0, 25, n))}
        )
    df = pd.DataFrame(rows)
    got = (
        doc_novelty(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    first: dict[str, int] = {}
    per_doc: dict[int, set] = {}
    for _, r in df.sort_values("doc_id").iterrows():
        ts = re.findall(r"[a-z0-9]+", r["text"].lower())
        bgs = {" ".join(p) for p in zip(ts, ts[1:])}
        per_doc[int(r["doc_id"])] = bgs
        for b in bgs:
            first.setdefault(b, int(r["doc_id"]))
    want_rows = []
    for did, bgs in sorted(per_doc.items()):
        if not bgs:
            continue
        novel = sum(1 for b in bgs if first[b] == did)
        want_rows.append(
            (did, len(bgs), novel, novel * 1_000_000 // len(bgs))
        )
    want = pd.DataFrame(
        want_rows,
        columns=["doc_id", "n_distinct", "n_novel", "novelty_e6"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the first doc is 100% novel; later docs trend below that
    assert got.iloc[0]["novelty_e6"] == 1_000_000
    assert got.iloc[-1]["novelty_e6"] < 1_000_000


def _full_cc(edges: list[tuple]) -> dict:
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp = defaultdict(list)
    for n in list(parent):
        comp[find(n)].append(n)
    return {n: min(m) for m in comp.values() for n in m}


def test_cc_incremental_matches_full_recompute():
    from fastie_ray.stages.canonicalize import (
        cc_incremental,
        connected_components_ds,
    )

    rng = np.random.RandomState(9)
    edges = set()
    while len(edges) < 160:
        a, b = rng.randint(0, 90, 2)
        if a != b:
            edges.add((f"n{min(a, b):02d}", f"n{max(a, b):02d}"))
    edges = sorted(edges)
    base, delta = edges[::2], edges[1::2]
    base_ds = ray.data.from_pandas(pd.DataFrame(base, columns=["u", "v"]))
    delta_ds = ray.data.from_pandas(pd.DataFrame(delta, columns=["u", "v"]))
    labels = connected_components_ds(base_ds, n_buckets=8)
    got = (
        cc_incremental(labels, delta_ds, n_buckets=8)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want_map = _full_cc(edges)
    want = pd.DataFrame(
        sorted(want_map.items()), columns=["node", "component_id"]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # delta must actually merge some base components for this test to
    # mean anything
    base_map = _full_cc(base)
    merged = {want_map[n] for n in base_map} < {
        base_map[n] for n in base_map
    } or len({want_map[n] for n in base_map}) < len(
        {base_map[n] for n in base_map}
    )
    assert merged


def test_cc_incremental_all_new_nodes():
    from fastie_ray.stages.canonicalize import cc_incremental

    base = ray.data.from_pandas(
        pd.DataFrame({"node": ["a", "b"], "component_id": ["a", "a"]})
    )
    delta = ray.data.from_pandas(
        pd.DataFrame({"u": ["x"], "v": ["y"]})
    )
    got = (
        cc_incremental(base, delta, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"node": ["a", "b", "x", "y"],
         "component_id": ["a", "a", "x", "x"]}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cc_incremental_empty_delta():
    from fastie_ray.stages.canonicalize import cc_incremental

    base = ray.data.from_pandas(
        pd.DataFrame(
            {"node": ["a", "b", "c"], "component_id": ["a", "a", "c"]}
        )
    )
    delta = ray.data.from_pandas(
        pd.DataFrame({"u": pd.Series([], dtype=object),
                      "v": pd.Series([], dtype=object)})
    )
    got = (
        cc_incremental(base, delta, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"node": ["a", "b", "c"], "component_id": ["a", "a", "c"]}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_cc_incremental_delta_only_merges_touched():
    from fastie_ray.stages.canonicalize import cc_incremental

    # two base components; delta merges only one pair — the other
    # passes through the left join untouched
    base = ray.data.from_pandas(
        pd.DataFrame(
            {"node": ["a", "b", "x", "y"],
             "component_id": ["a", "a", "x", "x"]}
        )
    )
    delta = ray.data.from_pandas(pd.DataFrame({"u": ["b"], "v": ["c"]}))
    got = (
        cc_incremental(base, delta, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"node": ["a", "b", "c", "x", "y"],
         "component_id": ["a", "a", "a", "x", "x"]}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
