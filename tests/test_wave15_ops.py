"""Brute-force parity test for source_minhash_matrix: group-level
MinHash Jaccard estimation via sketch MIN-merge."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def _mh(p: int, tok: str) -> int:
    return int(hashlib.md5(f"mh:{p}:{tok}".encode()).hexdigest()[:15], 16)


def test_source_minhash_matrix_brute_force():
    from fastie_ray.ops.neardup import source_minhash_matrix

    rng = np.random.RandomState(19)
    vocab = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(90):
        # sources a and b share most vocabulary; c is disjoint-ish
        if i % 3 == 0:
            toks = [vocab[j] for j in rng.randint(0, 30, 12)]
            src = "a"
        elif i % 3 == 1:
            toks = [vocab[j] for j in rng.randint(5, 35, 12)]
            src = "b"
        else:
            toks = [vocab[j] for j in rng.randint(40, 60, 12)]
            src = "c"
        rows.append({"source": src, "text": " ".join(toks)})
    df = pd.DataFrame(rows)
    got = source_minhash_matrix(
        ray.data.from_pandas(df), num_perm=16
    )

    sets: dict[str, set] = {}
    for _, r in df.iterrows():
        sets.setdefault(r["source"], set()).update(r["text"].split())
    want_rows = []
    srcs = sorted(sets)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            n_match = sum(
                min(_mh(p, t) for t in sets[a])
                == min(_mh(p, t) for t in sets[b])
                for p in range(16)
            )
            want_rows.append((a, b, n_match, n_match * 1_000_000 // 16))
    want = pd.DataFrame(
        want_rows, columns=["src_a", "src_b", "n_match", "jaccard_est_e6"]
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    # the overlapping pair must estimate higher than the disjoint ones
    est = {(r["src_a"], r["src_b"]): r["jaccard_est_e6"]
           for _, r in got.iterrows()}
    assert est[("a", "b")] > est[("a", "c")]
    assert est[("a", "b")] > est[("b", "c")]


def test_ccnet_lang_buckets_terciles_per_lang():
    import __ray_entry__ as e

    got = e.queries()["ccnet_lang_buckets"](
        "/root/testdata/sf0.001"
    ).to_pandas()
    # every language has all three buckets roughly balanced and the
    # thresholds are per-language: within each lang, head familiarity
    # strictly dominates tail familiarity
    for lang, sub in got.groupby("lang"):
        if len(sub) < 6:
            continue
        h = sub[sub["ccnet_bucket"] == "head"]["familiarity"]
        t = sub[sub["ccnet_bucket"] == "tail"]["familiarity"]
        if len(h) and len(t):
            assert h.min() > t.max()


def test_zorder_prune_census_beats_row_order():
    from fastie_ray.ops.layout import zorder_prune_census

    rng = np.random.RandomState(7)
    df = pd.DataFrame(
        {
            "x": rng.randint(0, 1000, 4000),
            "y": rng.randint(0, 1000, 4000),
            "tie": np.arange(4000),
        }
    )
    got = zorder_prune_census(
        ray.data.from_pandas(df), "x", "y", "tie",
        query=(100, 200, 100, 200), block_rows=128,
    )
    z = got[got["layout"] == "zorder"].iloc[0]
    r = got[got["layout"] == "row"].iloc[0]
    assert z["n_blocks"] == r["n_blocks"] == (4000 + 127) // 128
    # random row order: every block spans the domain → all touched;
    # z-order: a 10%×10% rect touches a small minority
    assert r["n_blocks_touched"] == r["n_blocks"]
    assert z["n_blocks_touched"] < r["n_blocks_touched"] // 2


def test_grouped_gini_brute_force():
    from fastie_ray.ops.stats import grouped_gini

    rng = np.random.RandomState(2)
    rows = []
    for i in range(400):
        g = "equal" if i % 2 == 0 else "whale"
        # 'equal': identical values → gini 0; 'whale': skewed
        v = 10.0 if g == "equal" else float(rng.pareto(1.2) + 0.1)
        rows.append({"event_type": g, "value": v})
    df = pd.DataFrame(rows)
    got = (
        grouped_gini(ray.data.from_pandas(df), "event_type", "value")
        .to_pandas()
        .set_index("event_type")
    )
    for g, sub in df.groupby("event_type"):
        cents = np.sort(np.floor(sub["value"].to_numpy() * 100).astype(np.int64))
        n = len(cents)
        sx = int(cents.sum())
        ranksum = int((np.arange(1, n + 1) * cents).sum())
        assert got.loc[g, "n"] == n
        assert got.loc[g, "sum_cents"] == sx
        assert got.loc[g, "gini_num"] == 2 * ranksum - (n + 1) * sx
        assert got.loc[g, "gini_den"] == n * sx
    # identical values → gini exactly 0; pareto → clearly positive
    assert got.loc["equal", "gini_num"] == 0
    assert (
        got.loc["whale", "gini_num"] / got.loc["whale", "gini_den"] > 0.3
    )


def test_rich_club_brute_force():
    from fastie_ray.ops.graph import rich_club

    rng = np.random.RandomState(15)
    edges = set()
    # planted hub clique on 6 nodes + random periphery
    hubs = [f"h{i}" for i in range(6)]
    for i in range(6):
        for j in range(i + 1, 6):
            edges.add((hubs[i], hubs[j]))
    while len(edges) < 80:
        a, b = rng.randint(0, 40, 2)
        if a != b:
            u, v = sorted((f"p{a:02d}", f"p{b:02d}"))
            edges.add((u, v))
    # attach each hub to some periphery so hub degrees exceed 8
    for i, h in enumerate(hubs):
        for j in range(6):
            edges.add(tuple(sorted((h, f"p{(i * 6 + j) % 40:02d}"))))
    edges = sorted(edges)
    ds = ray.data.from_pandas(pd.DataFrame(edges, columns=["a", "b"]))
    got = rich_club(ds, ks=[2, 4, 8]).set_index("k")

    from collections import Counter

    deg: Counter = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    for k in (2, 4, 8):
        rich = {n for n, d in deg.items() if d > k}
        n_edges = sum(1 for a, b in edges if a in rich and b in rich)
        assert got.loc[k, "n_rich"] == len(rich)
        assert got.loc[k, "n_rich_edges"] == n_edges
        assert got.loc[k, "n_pairs"] == len(rich) * (len(rich) - 1) // 2
    # the planted clique keeps the k=8 club dense
    r8 = got.loc[8]
    if r8["n_pairs"]:
        assert r8["n_rich_edges"] * 2 > r8["n_pairs"]


def test_clean_funnel_first_reason_priority():
    from fastie_ray.pipelines.clean import clean_funnel

    df = pd.DataFrame(
        [
            {"doc_id": 0, "text": "short"},                    # too_short
            {"doc_id": 1, "text": "a a a a a a a a " * 20},    # repetitive
            {"doc_id": 2, "text": "unique words " + " ".join(
                f"w{i}" for i in range(60))},                  # kept
            {"doc_id": 3, "text": "unique words " + " ".join(
                f"w{i}" for i in range(60))},                  # duplicate of 2
            {"doc_id": 4, "text": "a a a a a a a a " * 20},    # rep BEFORE dup
        ]
    )
    got = (
        clean_funnel(
            ray.data.from_pandas(df), min_chars=50,
            max_dup_frac_e6=650_000,
        )
        .to_pandas()
        .set_index("doc_id")["reason"]
    )
    assert got[0] == "too_short"
    assert got[1] == "repetitive"
    assert got[2] == "kept"
    assert got[3] == "duplicate"
    # repetitive outranks duplicate: doc 4 duplicates doc 1 but the
    # fixed stage order labels it repetitive
    assert got[4] == "repetitive"


def test_window_dedup_halo_boundaries():
    from fastie_ray.ops.windows import window_dedup

    base = pd.Timestamp("2024-06-01")
    rows = []
    # key A: repeats 30 min apart STRADDLING a 4h bucket boundary —
    # the ghost copy must carry the predecessor across
    rows.append({"event_id": 0, "user_id": 1, "event_type": "A",
                 "ts": base + pd.Timedelta(hours=3, minutes=50)})
    rows.append({"event_id": 1, "user_id": 1, "event_type": "A",
                 "ts": base + pd.Timedelta(hours=4, minutes=10)})
    # key B: repeats 2h apart → NOT a dup at 1h window
    rows.append({"event_id": 2, "user_id": 2, "event_type": "B",
                 "ts": base})
    rows.append({"event_id": 3, "user_id": 2, "event_type": "B",
                 "ts": base + pd.Timedelta(hours=2)})
    # key C: equal timestamps never suppress each other, but a run of
    # equal stamps BEHIND a real predecessor still flags
    t = base + pd.Timedelta(hours=9)
    rows.append({"event_id": 4, "user_id": 3, "event_type": "C",
                 "ts": t - pd.Timedelta(minutes=5)})
    rows.append({"event_id": 5, "user_id": 3, "event_type": "C", "ts": t})
    rows.append({"event_id": 6, "user_id": 3, "event_type": "C", "ts": t})
    # key D: lone pair with equal stamps only → neither is a dup
    rows.append({"event_id": 7, "user_id": 4, "event_type": "D", "ts": t})
    rows.append({"event_id": 8, "user_id": 4, "event_type": "D", "ts": t})
    df = pd.DataFrame(rows)
    got = (
        window_dedup(
            ray.data.from_pandas(df), ["user_id", "event_type"],
            window_s=3600,
        )
        .to_pandas()
        .set_index("event_id")["is_dup"]
        .sort_index()
    )
    assert got[0] == 0 and got[1] == 1      # halo carried across bucket
    assert got[2] == 0 and got[3] == 0      # outside window
    assert got[4] == 0 and got[5] == 1 and got[6] == 1
    assert got[7] == 0 and got[8] == 0      # strict predecessor only


def test_ordered_triple_support_brute_force():
    from fastie_ray.ops.sequence import ordered_triple_support

    rng = np.random.RandomState(21)
    base = pd.Timestamp("2024-02-01")
    rows = []
    for u in range(40):
        n = rng.randint(3, 12)
        for j in range(n):
            rows.append(
                {"user_id": u,
                 "event_type": ["a", "b", "c", "d"][rng.randint(0, 4)],
                 "ts": base + pd.Timedelta(minutes=int(
                     rng.randint(0, 10000)))}
            )
    df = pd.DataFrame(rows)
    got = (
        ordered_triple_support(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values(["first_type", "mid_type", "then_type"])
        .reset_index(drop=True)
    )
    from collections import Counter

    cnt: Counter = Counter()
    for u, sub in df.groupby("user_id"):
        evs = sorted(zip(sub["ts"], sub["event_type"]))
        types = sorted(set(t for _, t in evs))
        found = set()
        import itertools

        for x, y, z in itertools.permutations(types, 3):
            ok = any(
                t1 < t2 < t3
                for t1, a in evs if a == x
                for t2, b in evs if b == y
                for t3, c in evs if c == z
            )
            if ok:
                found.add((x, y, z))
        for tr in found:
            cnt[tr] += 1
    want = pd.DataFrame(
        sorted((x, y, z, n) for (x, y, z), n in cnt.items()),
        columns=["first_type", "mid_type", "then_type", "n_keys"],
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_eval_ngram_coverage_brute_force():
    from fastie_ray.ops.decontaminate import eval_ngram_coverage

    rng = np.random.RandomState(33)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(90):
        n = rng.randint(8, 30)
        rows.append(
            {"doc_id": i,
             "text": " ".join(vocab[j] for j in rng.randint(0, 12, n))}
        )
    # a fully-covered planted eval doc: copy of a training doc at an
    # id that is 0 mod 37
    rows.append({"doc_id": 37 * 30, "text": rows[5]["text"]})
    df = pd.DataFrame(rows)
    got = (
        eval_ngram_coverage(ray.data.from_pandas(df), eval_mod=37, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    def grams(s):
        ts = s.split()
        return {" ".join(ts[i:i + 8]) for i in range(len(ts) - 7)}

    corpus = set()
    for _, r in df[df["doc_id"] % 37 != 0].iterrows():
        corpus |= grams(r["text"])
    want_rows = []
    for _, r in df[df["doc_id"] % 37 == 0].iterrows():
        gs = grams(r["text"])
        if not gs:
            continue
        cov = sum(1 for g in gs if g in corpus)
        want_rows.append(
            (int(r["doc_id"]), len(gs), cov, cov * 1_000_000 // len(gs))
        )
    want = pd.DataFrame(
        sorted(want_rows),
        columns=["doc_id", "n_grams", "n_covered", "coverage_e6"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # planted copy is fully covered
    assert got[got["doc_id"] == 37 * 30]["coverage_e6"].iloc[0] == 1_000_000


def test_encoding_census_scheme_selection():
    from fastie_ray.ops.layout import encoding_census

    rng = np.random.RandomState(44)
    n = 3000
    df = pd.DataFrame(
        {
            "tie": np.arange(n),
            # constant runs → RLE wins
            "runs": np.repeat(np.arange(n // 100), 100),
            # tiny range → FOR wins easily
            "narrow": rng.randint(0, 4, n),
            # full-range 63-bit values → plain wins (FOR pays header)
            "wide": rng.randint(0, 2**62, n),
        }
    )
    got = encoding_census(
        ray.data.from_pandas(df), ["runs", "narrow", "wide"], "tie",
        block_rows=512,
    )
    best = {
        c: got[(got["column"] == c) & (got["n_blocks_best"] > 0)]
        .sort_values("n_blocks_best", ascending=False)["scheme"].iloc[0]
        for c in ("runs", "narrow", "wide")
    }
    assert best["runs"] == "rle"
    assert best["narrow"] == "for"
    # 62-bit ranges: FOR still edges plain (bits < 64) but by a hair —
    # its estimate must sit within 3% of plain's
    w_for = int(got[(got["column"] == "wide")
                    & (got["scheme"] == "for")]["est_bytes"].iloc[0])
    w_plain = int(got[(got["column"] == "wide")
                      & (got["scheme"] == "plain")]["est_bytes"].iloc[0])
    assert best["wide"] == "for" and w_plain * 97 <= w_for * 100 <= w_plain * 100
    # per-column totals: plain is exactly 8 bytes/row
    plain = got[(got["column"] == "runs") & (got["scheme"] == "plain")]
    assert int(plain["est_bytes"].iloc[0]) == 8 * n


def test_join_cardinality_est_exact_on_uniform():
    from fastie_ray.ops.stats import join_cardinality_est

    # every key appears exactly twice → per-bucket n=2d, est per bucket
    # = (2d)²/d = 4d vs true 4d... est == true when counts are uniform
    df = pd.DataFrame({"k": list(range(500)) * 2})
    ds = ray.data.from_pandas(df)
    got = join_cardinality_est(ds, ds, "k", "k")
    assert int(got["true_size"].iloc[0]) == 4 * 500
    assert int(got["est_size"].iloc[0]) == 4 * 500
    assert int(got["err_e6"].iloc[0]) == 0


def test_join_cardinality_est_underestimates_skew():
    from fastie_ray.ops.stats import join_cardinality_est

    # one whale key with 900 rows + 100 singletons: the uniform
    # assumption smears the whale across its bucket's distincts
    df = pd.DataFrame({"k": [0] * 900 + list(range(1, 101))})
    ds = ray.data.from_pandas(df)
    got = join_cardinality_est(ds, ds, "k", "k")
    true = 900 * 900 + 100
    assert int(got["true_size"].iloc[0]) == true
    assert int(got["est_size"].iloc[0]) < true  # skew → underestimate
    assert int(got["err_e6"].iloc[0]) > 0


def test_bloom_fpr_matches_brute_force():
    import hashlib

    from fastie_ray.ops.sketch import bloom_fpr

    members = pd.DataFrame({"v": range(400)})
    probes = pd.DataFrame({"v": range(10_000, 10_800)})
    got = bloom_fpr(
        ray.data.from_pandas(members), ray.data.from_pandas(probes),
        "v", "v", m_bits=2048, k_hashes=3,
    )

    def pos(v, i):
        return int(
            hashlib.md5(f"b{i}:{v}".encode()).hexdigest()[:15], 16
        ) % 2048

    bits = {pos(v, i) for v in members["v"] for i in range(3)}
    fp = sum(
        1 for v in probes["v"] if all(pos(v, i) in bits for i in range(3))
    )
    assert int(got["n_fp"].iloc[0]) == fp
    assert int(got["n_bits_set"].iloc[0]) == len(bits)
    # a 2048-bit filter at ~1100 set bits: observed FPR must be in the
    # right ballpark of p³ (loose band, it is deterministic anyway)
    p = len(bits) / 2048
    assert got["fpr_e6"].iloc[0] <= int(3 * p**3 * 1_000_000)
