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


def test_markov_next_eval_bruteforce():
    from fastie_ray.ops.sequence import markov_next_eval

    rng = np.random.default_rng(101)
    n = 300
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 12, n).astype(np.int64),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 20 * 86400_000, n), unit="ms"),
            "event_type": rng.choice(["a", "b", "c"], n),
        }
    )
    cut = "2024-01-12"
    got = markov_next_eval(_ds(ev, 4), cut_ts=cut)

    s = ev.sort_values(["user_id", "ts", "event_id"])
    same = s["user_id"].eq(s["user_id"].shift(-1))
    pairs = pd.DataFrame(
        {
            "prev": s["event_type"],
            "nxt": s["event_type"].shift(-1),
            "t": s["ts"].shift(-1),
        }
    )[same]
    cut_ts = pd.Timestamp(cut)
    train = pairs[pairs["t"] < cut_ts]
    cnt = train.groupby(["prev", "nxt"]).size().reset_index(name="n")
    model = dict(
        cnt.sort_values(["prev", "n", "nxt"], ascending=[True, False, True])
        .drop_duplicates("prev")[["prev", "nxt"]]
        .itertuples(index=False)
    )
    test = pairs[pairs["t"] >= cut_ts]
    ok = test["prev"].map(model) == test["nxt"]
    want = (
        pd.DataFrame({"prev_type": test["prev"], "ok": ok.astype("int64")})
        .groupby("prev_type", as_index=False)
        .agg(n_test=("ok", "count"), n_correct=("ok", "sum"))
        .astype({"n_test": "int64", "n_correct": "int64"})
        .sort_values("prev_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def _greedy_matching_ref(edges: pd.DataFrame) -> list:
    out = []
    rem = [
        (a, b,
         int(hashlib.md5(f"gm:{a}:{b}".encode()).hexdigest()[:15], 16))
        for a, b in edges[["a", "b"]].itertuples(index=False)
    ]
    rnd = 0
    while rem:
        rnd += 1
        nm: dict = {}
        for a, b, p in rem:
            nm[a] = min(nm.get(a, p), p)
            nm[b] = min(nm.get(b, p), p)
        win = [(a, b) for a, b, p in rem if nm[a] == p and nm[b] == p]
        assert win
        taken = set()
        for a, b in win:
            out.append((a, b, rnd))
            taken |= {a, b}
        rem = [(a, b, p) for a, b, p in rem
               if a not in taken and b not in taken]
    return out


def test_greedy_matching_reference_and_invariants():
    from fastie_ray.ops.graph import greedy_matching

    rng = np.random.default_rng(107)
    e = pd.DataFrame(
        {
            "a": rng.integers(0, 40, 150).astype(np.int64),
            "b": rng.integers(0, 40, 150).astype(np.int64),
        }
    )
    lo, hi = e.min(axis=1), e.max(axis=1)
    e = pd.DataFrame({"a": lo, "b": hi})
    e = e[e["a"] < e["b"]].drop_duplicates().reset_index(drop=True)

    got = (
        greedy_matching(_ds(e, 3), max_rounds=20, n_buckets=4)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype("int64")
    )
    want = (
        pd.DataFrame(_greedy_matching_ref(e), columns=["a", "b", "round"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, want)
    # matching invariants: node-disjoint, maximal
    used = pd.concat([got["a"], got["b"]])
    assert used.is_unique
    matched = set(used)
    for a, b in e[["a", "b"]].itertuples(index=False):
        assert a in matched or b in matched, "not maximal"


def test_weighted_matching_locally_dominant_reference(ray_session):
    import hashlib

    from fastie_ray.ops.graph import greedy_matching

    rng = np.random.default_rng(61)
    n_nodes, n_edges = 24, 70
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    m = u != v
    df = pd.DataFrame(
        {
            "a": np.minimum(u[m], v[m]).astype("int64"),
            "b": np.maximum(u[m], v[m]).astype("int64"),
        }
    ).drop_duplicates().reset_index(drop=True)
    df["w"] = rng.integers(1, 1000, len(df)).astype("int64")

    def prio(a, b, w):
        md = int(hashlib.md5(f"gm:{a}:{b}".encode()).hexdigest()[:10], 16)
        return (((1 << 22) - 1 - int(w)) << 40) | md

    # reference: iterated locally-dominant rounds
    e = {(int(r.a), int(r.b)): prio(r.a, r.b, r.w) for r in df.itertuples()}
    want = []
    rnd = 0
    while e:
        rnd += 1
        node_min = {}
        for (a, b), p in e.items():
            node_min[a] = min(node_min.get(a, p), p)
            node_min[b] = min(node_min.get(b, p), p)
        winners = [
            (a, b) for (a, b), p in e.items()
            if node_min[a] == p and node_min[b] == p
        ]
        assert winners
        want.extend((a, b, rnd) for a, b in sorted(winners))
        gone = {x for ab in winners for x in ab}
        e = {k: p for k, p in e.items() if k[0] not in gone and k[1] not in gone}
    want_df = pd.DataFrame(want, columns=["a", "b", "round"]).astype("int64")
    want_df = want_df.sort_values(["a", "b"]).reset_index(drop=True)

    got = (
        greedy_matching(
            ray.data.from_pandas(df).repartition(3),
            max_rounds=20, n_buckets=4, weight_col="w",
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, want_df)
    # round 1 must take the global min-priority (heaviest, md5-broken)
    # edge — it is locally dominant by construction
    best = min(
        ((prio(r.a, r.b, r.w), int(r.a), int(r.b)) for r in df.itertuples())
    )
    r1 = got[got["round"] == 1]
    assert ((r1["a"] == best[1]) & (r1["b"] == best[2])).any()
