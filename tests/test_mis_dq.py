"""Tests for ops.graph.mis (vs a line-for-line Luby reference and the
MIS invariants) and the ops.profile data-quality helpers."""

import hashlib

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def _pri(n: int, cap: int = 10_000_000) -> int:
    return int(hashlib.md5(f"mis:{n}".encode()).hexdigest()[:8], 16) * cap + n


def _luby(edges: pd.DataFrame) -> dict:
    sym = pd.concat(
        [edges, edges.rename(columns={"src": "dst", "dst": "src"})]
    )
    sym = sym[sym["src"] != sym["dst"]].drop_duplicates()
    adj: dict = {}
    for s, d in sym.itertuples(index=False):
        adj.setdefault(s, set()).add(d)
    nodes = sorted(set(sym["src"]) | set(sym["dst"]))
    rem = set(nodes)
    out = {n: 0 for n in nodes}
    while rem:
        win = {
            v for v in rem
            if all(_pri(v) < _pri(u) for u in adj.get(v, ()) if u in rem)
        }
        for v in win:
            out[v] = 1
        drop = set(win)
        for v in win:
            drop |= {u for u in adj.get(v, ()) if u in rem}
        rem -= drop
    return out


def test_mis_matches_reference_and_invariants():
    from fastie_ray.ops.graph import mis

    rng = np.random.default_rng(13)
    edges = pd.DataFrame(
        {
            "src": rng.integers(0, 60, 150).astype(np.int64),
            "dst": rng.integers(0, 60, 150).astype(np.int64),
        }
    )
    edges = edges[edges["src"] != edges["dst"]].drop_duplicates()
    got = (
        mis(_ds(edges, 3), max_rounds=12, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = _luby(edges)
    assert dict(zip(got["node"], got["in_mis"])) == want
    # invariants: independent and maximal
    in_set = set(got.loc[got["in_mis"] == 1, "node"])
    sym = pd.concat(
        [edges, edges.rename(columns={"src": "dst", "dst": "src"})]
    ).drop_duplicates()
    adj: dict = {}
    for s, d in sym.itertuples(index=False):
        adj.setdefault(s, set()).add(d)
    for v in in_set:
        assert not (adj.get(v, set()) & in_set)
    for v in set(got["node"]) - in_set:
        assert adj.get(v, set()) & in_set, f"{v} could join (not maximal)"


def test_dq_helpers():
    from fastie_ray.ops.profile import (
        distinct_violations,
        orphan_count,
        violation_count,
    )

    df = pd.DataFrame(
        {"k": [1, 2, 2, 3, 3, 3], "v": [5, -1, 2, 8, -3, 1]}
    )
    viol, total = violation_count(_ds(df, 3), lambda d: d["v"] < 0)
    assert (viol, total) == (2, 6)
    dup, total = distinct_violations(_ds(df, 3), "k", n_buckets=4)
    assert (dup, total) == (3, 6)
    child = pd.DataFrame({"fk": [1, 2, 9, 9, 3]})
    parent = pd.DataFrame({"pk": [1, 2, 3]})
    orph, total = orphan_count(
        _ds(child, 2), _ds(parent, 2), on="fk", right_on="pk", n_buckets=4
    )
    assert (orph, total) == (2, 5)
