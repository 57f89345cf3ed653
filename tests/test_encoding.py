"""ops/encoding.py (target encoding, feature hashing), ops/stats.py
grouped_rank_sum, and ops/text_analysis.script_mix — brute-force
references on small in-memory frames."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 3):
    return ray.data.from_pandas(
        [p.reset_index(drop=True) for p in np.array_split(df, n_blocks)]
    )


def test_target_encode_oof_matches_bruteforce():
    from fastie_ray.ops.encoding import target_encode_oof

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "cat": rng.choice(["a", "b", "c"], 200),
            "fold": rng.integers(0, 4, 200).astype("int64"),
            "y": rng.integers(0, 1000, 200).astype("int64"),
        }
    )
    got = (
        target_encode_oof(_ds(df), "cat", "fold", "y", n_buckets=4)
        .to_pandas()
        .sort_values(["cat", "fold"])
        .reset_index(drop=True)
    )
    rows = []
    for (c, f), sub in df.groupby(["cat", "fold"]):
        oof = df[(df["cat"] == c) & (df["fold"] != f)]
        if len(oof) == 0:
            continue
        rows.append(
            (c, f, len(oof), (1_000_000 * int(oof["y"].sum())) // len(oof))
        )
    want = (
        pd.DataFrame(rows, columns=["cat", "fold", "n_oof", "te_scaled"])
        .sort_values(["cat", "fold"])
        .reset_index(drop=True)
        .astype({"fold": "int64", "n_oof": "int64", "te_scaled": "int64"})
    )
    pd.testing.assert_frame_equal(got, want)


def test_target_encode_single_fold_category_dropped():
    from fastie_ray.ops.encoding import target_encode_oof

    df = pd.DataFrame(
        {"cat": ["solo", "solo", "duo", "duo"],
         "fold": [1, 1, 0, 1], "y": [10, 20, 5, 7]}
    )
    got = target_encode_oof(_ds(df, 2), "cat", "fold", "y").to_pandas()
    # 'solo' lives in exactly one fold: no out-of-fold rows for it
    assert set(got["cat"]) == {"duo"}
    assert len(got) == 2


def test_hashed_features_matches_md5_reference():
    from fastie_ray.ops.encoding import hashed_features

    df = pd.DataFrame(
        {"doc_id": [1, 2, 3], "text": ["the cat sat", "Cat CAT dog", ""]}
    )
    got = (
        hashed_features(_ds(df, 2), "doc_id", "text", n_buckets=8)
        .to_pandas()
        .sort_values(["doc_id", "bucket"])
        .reset_index(drop=True)
    )

    def bkt(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 8

    rows = []
    for _, r in df.iterrows():
        toks = pd.Series(r["text"].lower()).str.findall(r"[a-z0-9]+")[0]
        if not toks:
            continue
        cnt = pd.Series([bkt(t) for t in toks]).value_counts().sort_index()
        rows.extend((r["doc_id"], b, n) for b, n in cnt.items())
    want = (
        pd.DataFrame(rows, columns=["doc_id", "bucket", "n"])
        .astype({"bucket": "int64", "n": "int64"})
        .sort_values(["doc_id", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_grouped_rank_sum_matches_bruteforce():
    from fastie_ray.ops.stats import grouped_rank_sum

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], 300),
            "m": rng.integers(0, 2, 300).astype("int64"),
            # small value domain forces heavy ties
            "v": rng.integers(0, 12, 300).astype("int64"),
        }
    )
    got = (
        grouped_rank_sum(_ds(df), "g", "m", "v", n_buckets=4)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for _, r in got.iterrows():
        sub = df[df["g"] == r["g"]]
        ranks = sub["v"].rank(method="average")  # tie-averaged
        r_b = float(ranks[sub["m"] == 1].sum())
        n_b = int((sub["m"] == 1).sum())
        n_a = int((sub["m"] == 0).sum())
        u_b = r_b - n_b * (n_b + 1) / 2
        assert r["n_a"] == n_a and r["n_b"] == n_b
        assert r["u2_b"] == int(round(2 * u_b))
        assert r["auc_e6"] == (1_000_000 * r["u2_b"]) // (2 * n_a * n_b)


def test_script_mix_counts():
    from fastie_ray.ops.text_analysis import script_mix

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["abc 123", "春江潮水", "mix春x9", ""],
        }
    )
    got = (
        script_mix(_ds(df, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_latin"].tolist() == [3, 0, 4, 0]
    assert got["n_cjk"].tolist() == [0, 4, 1, 0]
    assert got["n_digit"].tolist() == [3, 0, 1, 0]
    assert got["is_mixed"].tolist() == [0, 0, 1, 0]


def test_random_walks_matches_bruteforce():
    import ray.data as rd

    from fastie_ray.ops.graph import random_walks_frontier

    edges = pd.DataFrame(
        {"src": ["a", "a", "b", "c", "c", "d"],
         "dst": ["b", "c", "c", "a", "d", "e"]}
    )
    got = (
        random_walks_frontier(rd.from_pandas(edges), walk_len=3, n_buckets=4)
        .to_pandas()
        .sort_values(["start", "step"])
        .reset_index(drop=True)
    )
    adj: dict[str, list[str]] = {}
    for _, r in edges.iterrows():
        adj.setdefault(r["src"], []).append(r["dst"])
    for k in adj:
        adj[k] = sorted(set(adj[k]))

    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = []
    for s in sorted(set(edges["src"]) | set(edges["dst"])):
        cur = s
        rows.append((s, 0, cur))
        for t in range(3):
            nb = adj.get(cur)
            if not nb:
                break
            cur = nb[h(f"{s}|{t}|{cur}") % len(nb)]
            rows.append((s, t + 1, cur))
    want = (
        pd.DataFrame(rows, columns=["start", "step", "node"])
        .astype({"step": "int64"})
        .sort_values(["start", "step"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
