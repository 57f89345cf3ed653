"""Tests for ops.line_dedup.line_dedup, ops.graph.hits,
ops.cooc.assoc_rules and ops.stats.pivot_counts — each against a
brute-force pandas/numpy oracle on small synthetic inputs."""

import hashlib

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_line_dedup_drops_heavy_lines_and_hashes_rest():
    from fastie_ray.ops.line_dedup import line_dedup

    rows = []
    for d in range(30):
        rows.append((d, 0, "boiler"))           # 30 copies -> dropped
        rows.append((d, 1, f"unique {d}"))      # kept
        if d % 2 == 0:
            rows.append((d, 2, "semi"))         # 15 copies -> dropped at 10
    df = pd.DataFrame(rows, columns=["doc_id", "idx", "line"])

    got = (
        line_dedup(_ds(df, 5), max_count=10, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["n_kept"] == 1).all()
    even = got["doc_id"] % 2 == 0
    assert (got.loc[even, "n_lines"] == 3).all()
    assert (got.loc[~even, "n_lines"] == 2).all()
    want_md5 = got["doc_id"].map(lambda d: _md5(f"unique {d}"))
    assert (got["clean_md5"] == want_md5).all()


def test_line_dedup_doc_with_all_lines_dropped():
    from fastie_ray.ops.line_dedup import line_dedup

    df = pd.DataFrame(
        [(d, 0, "common") for d in range(12)]
        + [(0, 1, "extra 0")],
        columns=["doc_id", "idx", "line"],
    )
    got = (
        line_dedup(_ds(df, 3), max_count=5, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    doc1 = got[got["doc_id"] == 1].iloc[0]
    assert doc1["n_kept"] == 0
    assert doc1["clean_md5"] == _md5("")
    doc0 = got[got["doc_id"] == 0].iloc[0]
    assert doc0["n_kept"] == 1 and doc0["clean_md5"] == _md5("extra 0")


def _hits_numpy(edges: pd.DataFrame, n_iter: int) -> pd.DataFrame:
    nodes = sorted(set(edges["src"]) | set(edges["dst"]))
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)), dtype=np.int64)
    for s, d in edges.itertuples(index=False):
        A[idx[s], idx[d]] = 1
    h = np.ones(len(nodes), dtype=np.int64)
    a = np.zeros(len(nodes), dtype=np.int64)
    for _ in range(n_iter):
        a = A.T @ h
        h = A @ a
    return pd.DataFrame({"node": nodes, "hub": h, "auth": a})


def test_hits_matches_power_iteration():
    from fastie_ray.ops.graph import hits

    rng = np.random.default_rng(3)
    edges = pd.DataFrame(
        {
            "src": "u" + pd.Series(rng.integers(0, 20, 120)).astype(str),
            "dst": "v" + pd.Series(rng.integers(0, 15, 120)).astype(str),
        }
    ).drop_duplicates()
    got = (
        hits(_ds(edges, 4), n_iter=3, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = _hits_numpy(edges, 3).sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_assoc_rules_matches_bruteforce():
    from fastie_ray.ops.cooc import assoc_rules

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for d in range(60):
        toks = rng.choice(vocab, size=rng.integers(2, 7), replace=False)
        docs.append((d, " ".join(toks)))
    df = pd.DataFrame(docs, columns=["doc_id", "text"])

    min_sup, min_conf = 3, 150_000
    got = (
        assoc_rules(
            _ds(df, 4), min_support=min_sup, min_conf_e6=min_conf,
            per_doc_cap=16, n_buckets=4,
        )
        .to_pandas()
        .sort_values(["antecedent", "consequent"])
        .reset_index(drop=True)
    )

    # brute force
    sets = {
        d: sorted(set(t.split()))[:16] for d, t in docs
    }
    n = len(sets)
    tok_n: dict = {}
    pair_n: dict = {}
    for toks in sets.values():
        for t in toks:
            tok_n[t] = tok_n.get(t, 0) + 1
        for i, a in enumerate(toks):
            for b in toks[i + 1:]:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    rows = []
    for (a, b), s in pair_n.items():
        if s < min_sup:
            continue
        for ant, con in ((a, b), (b, a)):
            conf = s * 1_000_000 // tok_n[ant]
            lift = s * n * 1_000_000 // (tok_n[ant] * tok_n[con])
            if conf >= min_conf:
                rows.append((ant, con, s, conf, lift))
    want = (
        pd.DataFrame(
            rows,
            columns=["antecedent", "consequent", "support", "conf_e6",
                     "lift_e6"],
        )
        .astype({"support": "int64", "conf_e6": "int64", "lift_e6": "int64"})
        .sort_values(["antecedent", "consequent"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_pivot_counts_matches_pandas():
    from fastie_ray.ops.stats import pivot_counts

    rng = np.random.default_rng(5)
    ev = pd.DataFrame(
        {
            "user_id": rng.integers(0, 25, 400).astype(np.int64),
            "event_type": rng.choice(["click", "view", "error"], 400),
            "value": np.round(rng.uniform(0, 50, 400), 2),
        }
    )
    got = (
        pivot_counts(
            _ds(ev, 4), "user_id", "event_type", ["click", "view"],
            value_col="value", n_buckets=4,
        )
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame({"user_id": np.sort(ev["user_id"].unique())})
    for c in ["click", "view"]:
        m = ev[ev["event_type"] == c]
        want[f"n_{c}"] = (
            want["user_id"].map(m.groupby("user_id").size()).fillna(0)
            .astype("int64")
        )
        cents = (m["value"] * 100).round().astype("int64")
        want[f"sum_{c}_e2"] = (
            want["user_id"]
            .map(cents.groupby(m["user_id"]).sum())
            .fillna(0)
            .astype("int64")
        )
    got = got[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)
