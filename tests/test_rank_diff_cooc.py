"""Tests for ops.rank.global_rank, ops.urlnorm.url_dedup,
ops.diff.corpus_diff, ops.cooc.cooc_pairs — each against a brute-force
pandas oracle on small synthetic inputs."""

import itertools

import numpy as np
import pandas as pd
import pytest

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 4):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def test_global_rank_matches_row_number():
    from fastie_ray.ops.rank import global_rank

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(500, dtype=np.int64),
            "n_chars": rng.integers(0, 300, 500).astype(np.int64),
        }
    )
    got = (
        global_rank(
            _ds(df), key_col="n_chars", tie_col="doc_id", descending=True,
            range_size=32, keep_cols=["doc_id", "n_chars"],
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["n_chars", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    exp["rank"] = np.arange(1, len(exp) + 1, dtype=np.int64)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "n_chars", "rank"]], exp)


def test_global_rank_ascending():
    from fastie_ray.ops.rank import global_rank

    df = pd.DataFrame(
        {"doc_id": [3, 1, 2, 0], "key": [10, 10, 5, 99]}
    ).astype("int64")
    got = (
        global_rank(
            _ds(df, 2), key_col="key", tie_col="doc_id",
            range_size=4, keep_cols=["doc_id", "key"],
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [2, 1, 3, 0]
    assert got["rank"].tolist() == [1, 2, 3, 4]


def test_canonical_url_rules():
    from fastie_ray.ops.urlnorm import canonical_url

    s = pd.Series(
        [
            "https://www.a.com/x/",
            "http://a.com/x",
            "https://a.com/x?utm_source=feed&z=1",
            "a.com/x",
            "https://b.org/",
        ]
    )
    out = canonical_url(s).tolist()
    assert out == ["a.com/x", "a.com/x", "a.com/x", "a.com/x", "b.org"]


def test_url_dedup_keeps_earliest():
    from fastie_ray.ops.urlnorm import url_dedup

    df = pd.DataFrame(
        {
            "url": [
                "https://www.a.com/x/",
                "http://a.com/x",
                "https://a.com/x?utm_source=1",
                "https://b.org/y",
            ],
            "warc_ts": [5, 2, 9, 1],
        }
    )
    got = url_dedup(_ds(df, 3), n_buckets=4).to_pandas().sort_values("canon_url")
    assert got["canon_url"].tolist() == ["a.com/x", "b.org/y"]
    assert got["url"].tolist() == ["http://a.com/x", "https://b.org/y"]
    assert got["warc_ts"].tolist() == [2, 1]
    assert got["n_captures"].tolist() == [3, 1]


def test_url_dedup_ts_tie_breaks_on_url():
    from fastie_ray.ops.urlnorm import url_dedup

    df = pd.DataFrame(
        {"url": ["https://a.com/x", "http://a.com/x"], "warc_ts": [4, 4]}
    )
    got = url_dedup(_ds(df, 2), n_buckets=2).to_pandas()
    assert got["url"].tolist() == ["http://a.com/x"]


def test_corpus_diff_statuses():
    from fastie_ray.ops.diff import corpus_diff

    v1 = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["a", "b", "c", "d"]}
    )
    v2 = pd.DataFrame(
        {"doc_id": [2, 3, 4, 9], "text": ["b", "C", "d", "new"]}
    )
    got = (
        corpus_diff(_ds(v1, 2), _ds(v2, 2), n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(zip(got["doc_id"], got["status"])) == [
        (1, "removed"),
        (3, "changed"),
        (9, "added"),
    ]


def test_cooc_pairs_counts():
    from fastie_ray.ops.cooc import cooc_pairs

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "apple banana cherry",
                "Apple banana",
                "banana cherry dates",
            ],
        }
    )
    got = cooc_pairs(_ds(docs, 3), k=100, per_doc_cap=16)
    exp = {
        ("apple", "banana"): 2,
        ("banana", "cherry"): 2,
        ("apple", "cherry"): 1,
        ("banana", "dates"): 1,
        ("cherry", "dates"): 1,
    }
    assert {
        (a, b): int(n)
        for a, b, n in zip(got["tok_a"], got["tok_b"], got["n_docs"])
    } == exp
    # top ordering: count desc then pair asc
    assert got.iloc[0][["tok_a", "tok_b"]].tolist() == ["apple", "banana"]


def test_cooc_per_doc_cap_is_lexicographic():
    from fastie_ray.ops.cooc import cooc_pairs

    # 5 distinct tokens, cap 3 keeps {a1, b2, c3} only
    docs = pd.DataFrame({"doc_id": [0], "text": ["e5 d4 c3 b2 a1 a1"]})
    got = cooc_pairs(_ds(docs, 1), k=100, per_doc_cap=3)
    pairs = set(zip(got["tok_a"], got["tok_b"]))
    assert pairs == set(
        tuple(sorted(p)) for p in itertools.combinations(["a1", "b2", "c3"], 2)
    )


def test_grouped_rank_matches_window_semantics(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.rank import grouped_rank

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 400),
            "k": rng.integers(0, 1000, 400),
            "id": np.arange(400),
        }
    )
    ds = ray.data.from_items(df.to_dict("records")).repartition(8)
    got = (
        grouped_rank(ds, "g", "k", "id", descending=True, range_size=64, n_buckets=4)
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    want = df.copy()
    want["rank"] = (
        want.sort_values(["k", "id"], ascending=[False, True])
        .groupby("g")
        .cumcount()
        .add(1)
    )
    want = want.sort_values(["g", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["g", "k", "id", "rank"]].astype({"rank": "int64"}),
        want[["g", "k", "id", "rank"]].astype({"rank": "int64"}),
    )


def test_grouped_ntile_equal_share_buckets(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.rank import grouped_ntile

    rows = [{"g": "a", "k": i, "id": i} for i in range(10)] + [
        {"g": "b", "k": i, "id": 100 + i} for i in range(7)
    ]
    ds = ray.data.from_items(rows).repartition(4)
    out = grouped_ntile(ds, "g", "k", "id", k=4, n_buckets=4).to_pandas()
    a = out[out["g"] == "a"].sort_values("rank")
    # floor formula over n=10: sizes 3,2,3,2
    assert list(a["bucket"]) == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    b = out[out["g"] == "b"].sort_values("rank")
    # floor((r-1)*4/7) for r=1..7: sizes 2,2,2,1
    assert list(b["bucket"]) == [0, 0, 1, 1, 2, 2, 3]
    # bucket order follows the key order
    assert (a.groupby("bucket")["k"].max().diff().dropna() > 0).all()


def test_term_drift_matches_bruteforce():
    from fastie_ray.ops.text_analysis import term_drift

    rng = np.random.default_rng(97)
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for d in range(120):
        m = d % 2
        # slice B over-uses the high-index words
        p = np.ones(25)
        if m:
            p[15:] = 3.0
        p /= p.sum()
        rows.append((m, " ".join(rng.choice(vocab, size=20, p=p))))
    df = pd.DataFrame(rows, columns=["m", "text"])
    got = term_drift(_ds(df, 4), "m", k=5, n_buckets=4)

    toks = (
        df.assign(tok=df["text"].str.findall(r"[a-z0-9]+"))
        .explode("tok")
    )
    c = toks.groupby(["tok", "m"]).size().unstack(fill_value=0)
    na, nb = int(c[0].sum()), int(c[1].sum())
    s = pd.DataFrame(
        {
            "token": c.index,
            "n_a": c[0].to_numpy(),
            "n_b": c[1].to_numpy(),
        }
    )
    s["score"] = s["n_b"] * na - s["n_a"] * nb
    up = s.sort_values(["score", "token"], ascending=[False, True]).head(5)
    dn = s.sort_values(["score", "token"], ascending=[True, True]).head(5)
    want = pd.concat(
        [up.assign(direction="up"), dn.assign(direction="down")],
        ignore_index=True,
    ).astype({"n_a": "int64", "n_b": "int64", "score": "int64"})
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )


def test_frequent_triples_bruteforce_and_apriori_prune(ray_session):
    from itertools import combinations

    from fastie_ray.ops.cooc import frequent_triples

    rng = np.random.default_rng(67)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for i in range(120):
        toks = rng.choice(vocab, size=rng.integers(3, 8), replace=False)
        docs.append((i, " ".join(toks)))
    # plant a guaranteed-frequent triple
    for i in range(120, 150):
        docs.append((i, "aa bb cc " + rng.choice(vocab)))
    df = pd.DataFrame(docs, columns=["doc_id", "text"])
    min_s = 8
    got = (
        frequent_triples(
            ray.data.from_pandas(df).repartition(3),
            min_support=min_s, per_doc_cap=16, n_buckets=4,
        )
        .to_pandas()
        .sort_values(["item_a", "item_b", "item_c"])
        .reset_index(drop=True)
    )
    from collections import Counter

    cnt = Counter()
    for _, r in df.iterrows():
        ts = sorted(set(r["text"].lower().split()))[:16]
        for tri in combinations(ts, 3):
            cnt[tri] += 1
    want = pd.DataFrame(
        [(a, b, c, n) for (a, b, c), n in sorted(cnt.items()) if n >= min_s],
        columns=["item_a", "item_b", "item_c", "support"],
    )
    want["support"] = want["support"].astype("int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (
        (got["item_a"] == "aa") & (got["item_b"] == "bb")
        & (got["item_c"] == "cc")
    ).any()
