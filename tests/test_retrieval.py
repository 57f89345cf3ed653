"""BM25 retrieval (`fastie_ray/ops/retrieval.py`): brute-force
reference implementation on a hand-built corpus, rank/tie-break
semantics, and batch-size invariance (local top-k + driver merge must
equal the global answer regardless of block boundaries)."""

import math
import re

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.retrieval import bm25_topk

K1, B = 1.2, 0.75


def _docs(texts):
    return pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
    )


def _ref_bm25(texts, queries, k=10):
    toks = [
        [t.lower() for t in re.findall(r"[A-Za-z0-9]+", s)] for s in texts
    ]
    n = len(texts)
    avgdl = sum(len(t) for t in toks) / n
    rows = []
    for qid, q in queries.items():
        terms = list(dict.fromkeys(t.lower() for t in q.split()))
        for doc_id, ts in enumerate(toks):
            s = 0
            hit = False
            for t in terms:
                tf = ts.count(t)
                if tf == 0:
                    continue
                hit = True
                df = sum(1 for other in toks if t in other)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                norm = tf * (K1 + 1) / (tf + K1 * (1 - B + B * len(ts) / avgdl))
                s += int(np.round(idf * norm * 1e6))
            if hit:
                rows.append((qid, doc_id, s))
    out = pd.DataFrame(rows, columns=["qid", "doc_id", "score_scaled"])
    out = out.sort_values(
        ["qid", "score_scaled", "doc_id"], ascending=[True, False, True]
    )
    out = out.groupby("qid", sort=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("qid", sort=False).cumcount() + 1
    return out.astype(
        {"doc_id": "int64", "score_scaled": "int64", "rank": "int64"}
    )


TEXTS = [
    "apple banana cherry apple",
    "banana banana banana date",
    "cherry date elder fig",
    "apple apple apple apple apple apple",
    "unrelated words only here",
    "fig grape apple banana cherry date",
    "",
]
QUERIES = {"qa": "apple banana", "qb": "date", "qc": "zzz missing"}


def test_bm25_matches_bruteforce(ray_session):
    ds = ray.data.from_pandas(_docs(TEXTS))
    got = (
        bm25_topk(ds, QUERIES, k=10)
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref_bm25(TEXTS, QUERIES))
    # query with no matching docs yields no rows
    assert "qc" not in set(got["qid"])


def test_bm25_block_invariance(ray_session):
    # many tiny blocks: local top-k + merge == single-block answer
    ds1 = ray.data.from_pandas(_docs(TEXTS))
    ds2 = ray.data.from_pandas(_docs(TEXTS)).repartition(7)
    a = bm25_topk(ds1, QUERIES, k=3).reset_index(drop=True)
    b = bm25_topk(ds2, QUERIES, k=3).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a.sort_values(["qid", "rank"]).reset_index(drop=True),
        b.sort_values(["qid", "rank"]).reset_index(drop=True),
    )


def test_bm25_rare_term_outranks_common(ray_session):
    # 'date' appears in fewer docs than 'banana': for a doc with both
    # at equal tf, the rarer term contributes more
    texts = ["date banana", "banana x", "banana y", "banana z", "date q w e"]
    ds = ray.data.from_pandas(_docs(texts))
    got = bm25_topk(ds, {"q": "date"}, k=5)
    assert got.iloc[0]["doc_id"] in (0, 4)
    ref = _ref_bm25(texts, {"q": "date"}, k=5)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), ref)


def test_match_rules_conjunction_and_dupes(ray_session):
    from fastie_ray.ops.retrieval import match_rules

    df = pd.DataFrame(
        {
            "doc_id": pd.Series([1, 2, 3, 4], dtype="int64"),
            "text": [
                "alpha beta gamma",
                "alpha alpha delta",   # dup tokens collapse
                "beta gamma",
                "alpha beta beta",
            ],
        }
    )
    rules = {10: ["alpha", "beta"], 20: ["delta"], 30: ["alpha"],
             40: ["alpha", "zeta"]}
    got = (
        match_rules(ray.data.from_pandas(df).repartition(2), rules)
        .to_pandas()
        .sort_values(["doc_id", "rule_id"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [(1, 10), (1, 30), (2, 20), (2, 30), (4, 10), (4, 30)],
        columns=["doc_id", "rule_id"],
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
