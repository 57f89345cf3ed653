"""Tests: near-dup family (MinHash+LSH, SimHash, n-gram Jaccard,
embedding cosine), multimodal plumbing, extraction-score aggregate.

The MinHash integration test is the strong one: pairs found by the
banded-LSH pipeline must EXACTLY equal a brute-force exact-Jaccard
scan of the same corpus (recall of the banding + precision of the
verification, end to end through a real Ray shuffle)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

import ray.data

from fastie_ray.functions.hashing import stable_hash64
from fastie_ray.ops.metrics import extraction_score, precision_recall_fscore
from fastie_ray.ops.multimodal import (
    FrameSampler,
    ImageFeaturizer,
    featurize_images,
    sample_frames,
    synth_media_table,
)
from fastie_ray.ops.neardup import (
    MinHashBander,
    SimHasher,
    _token_shingles,
    embedding_neardup,
    jaccard_pairs_batch,
    minhash_lsh_dups,
    minhash_signature,
    _perm_params,
    simhash_dups,
)

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- minhash


def test_minhash_signature_deterministic_and_monotone():
    seeds = _perm_params(64, seed=42)
    sh1 = np.asarray([stable_hash64(s) for s in ("a b c", "b c d", "c d e")], dtype=np.uint64)
    s1 = minhash_signature(sh1, seeds)
    s2 = minhash_signature(sh1, seeds)
    assert (s1 == s2).all()
    # identical shingle sets → identical signatures; supersets only lower mins
    s3 = minhash_signature(np.concatenate([sh1, sh1[:1]]), seeds)
    assert (s3 == s1).all()


def test_minhash_estimates_jaccard():
    seeds = _perm_params(256, seed=0)
    A = np.asarray([stable_hash64(f"x{i}") for i in range(100)], dtype=np.uint64)
    B = np.asarray([stable_hash64(f"x{i}") for i in range(50, 150)], dtype=np.uint64)
    sa, sb = minhash_signature(A, seeds), minhash_signature(B, seeds)
    est = (sa == sb).mean()
    assert abs(est - 1 / 3) < 0.1  # true J = 50/150


def test_minhash_lsh_matches_bruteforce(ray_session):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = (
        minhash_lsh_dups(docs, threshold=0.7, concurrency=2)
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )

    # brute force oracle (exact distinct-trigram jaccard)
    pdf = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    sets = {r.doc_id: set(_token_shingles(r.text, 3)) for r in pdf.itertuples()}
    exp = []
    ids = sorted(sets)
    for i, da in enumerate(ids):
        for db in ids[i + 1 :]:
            A, B = sets[da], sets[db]
            u = len(A | B)
            j = len(A & B) / u if u else 0.0
            if j >= 0.7:
                exp.append((da, db, len(A & B) * 1_000_000 // u))
    exp_df = pd.DataFrame(exp, columns=["doc_a", "doc_b", "jaccard_e6"])
    assert len(got) == len(exp_df)
    pd.testing.assert_frame_equal(
        got[["doc_a", "doc_b", "jaccard_e6"]].astype("int64"),
        exp_df.astype("int64"),
    )
    assert len(got) > 0  # corpus contains natural near-dups


# ------------------------------------------------------------- simhash


def test_simhash_identical_and_perturbed():
    s = SimHasher.simhash64("alpha beta gamma delta epsilon zeta eta theta")
    s_same = SimHasher.simhash64("alpha beta gamma delta epsilon zeta eta theta")
    assert s == s_same
    s_pert = SimHasher.simhash64("alpha beta gamma delta epsilon zeta eta")
    ham = bin(s ^ s_pert).count("1")
    assert 0 < ham <= 24  # near but not identical


def test_simhash_dups_finds_planted_pairs(ray_session):
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] % 50 == 0].copy()
        d["doc_id"] = d["doc_id"] + 1_000_000
        # identical text → hamming 0, guaranteed found
        return pd.concat([df, d], ignore_index=True)

    corpus = docs.map_batches(plant, batch_format="pandas")
    pairs = simhash_dups(corpus, hamming_thresh=0, concurrency=2).to_pandas()
    planted = pairs[(pairs.doc_b - pairs.doc_a) == 1_000_000]
    assert set(planted.doc_a) >= {i for i in range(0, 500, 50)}
    assert (pairs.hamming == 0).all()


# ------------------------------------------------------------- jaccard


def test_jaccard_pairs_batch_prefix_property():
    t = "a b c d e f g h i j"
    t2 = " ".join(t.split()[:-1])
    df = pd.DataFrame({"text_a": [t], "text_b": [t2]})
    out = jaccard_pairs_batch(df)
    # distinct trigrams: 8 vs 7, prefix subset → 7/8
    assert out["jaccard_e6"].iloc[0] == 7 * 1_000_000 // 8


# ----------------------------------------------------------- embedding


def test_embedding_neardup_planted(ray_session):
    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["vec_id"] % 5 == 0].copy()
        d["vec_id"] = d["vec_id"] + 1_000_000
        d["embedding"] = [
            (np.asarray(e, dtype=np.float32) * 1.01).tolist() for e in d["embedding"]
        ]
        return pd.concat([df, d], ignore_index=True)

    corpus = emb.map_batches(plant, batch_format="pandas")
    pairs = embedding_neardup(corpus, threshold=0.9).to_pandas()
    exp = {(i, i + 1_000_000) for i in range(0, 500, 5)}
    got = set(zip(pairs.id_a, pairs.id_b))
    assert got == exp  # scaling preserves cosine exactly; no natural pair ≥ .9
    assert (pairs.cosine > 0.999).all()


# ---------------------------------------------------------- multimodal


def test_media_stub_schema_and_determinism():
    t = synth_media_table(12)
    assert t.num_rows == 12
    f = ImageFeaturizer(dim=16)
    out = f(t)
    assert out["feature"].type.value_type == "float"
    v1 = out["feature"][0].as_py()
    out2 = ImageFeaturizer(dim=16)(t)
    assert out2["feature"][0].as_py() == v1  # content-hash seeded

    fs = FrameSampler(n_frames=3, dim=8)
    frames = fs(t)
    assert frames.num_rows == 12 * 3
    assert frames["frame_idx"].to_pylist()[:3] == [0, 1, 2]


def test_media_pipeline_through_ray(ray_session):
    t = synth_media_table(30)
    ds = ray.data.from_arrow(t)
    feats = featurize_images(ds, dim=8).to_pandas()
    assert len(feats) == 30
    frames = sample_frames(ds, n_frames=2).to_pandas()
    assert len(frames) == 60


def test_image_codec_gated():
    with pytest.raises(NotImplementedError):
        ImageFeaturizer(codec="pil")  # Pillow absent in container
    with pytest.raises(NotImplementedError):
        ImageFeaturizer(codec="jpeg2000")


# ------------------------------------------------------------- metrics


def test_precision_recall_fscore_reference_semantics():
    assert precision_recall_fscore(0, 0, 0) == {
        "precision": 0.0, "recall": 0.0, "f1": 0.0
    }
    out = precision_recall_fscore(4, 2, 8)
    assert out["precision"] == 0.5 and out["recall"] == 0.25
    assert abs(out["f1"] - (2 * 0.5 * 0.25 / 0.75)) < 1e-12


def test_extraction_score_distributed(ray_session):
    gold = ray.data.from_items(
        [
            {"url": "u1", "s": "a", "p": "x", "o": "b"},
            {"url": "u1", "s": "c", "p": "x", "o": "d"},
            {"url": "u2", "s": "e", "p": "y", "o": "f"},
        ]
    )
    pred = ray.data.from_items(
        [
            {"url": "u1", "s": "a", "p": "x", "o": "b"},  # tp
            {"url": "u1", "s": "a", "p": "x", "o": "b"},  # duplicate → ignored
            {"url": "u2", "s": "e", "p": "y", "o": "WRONG"},  # fp
        ]
    )
    m = extraction_score(gold, pred, keys=["url", "s", "p", "o"])
    assert m["tp"] == 1 and m["pred_sum"] == 2 and m["true_sum"] == 3
    assert m["precision"] == 0.5 and m["recall"] == 1 / 3


# ----------------------------------------------------------------- lsh


def test_lsh_knn_multiprobe_recall(ray_session):
    from fastie_ray.ops.similarity import knn_bruteforce, lsh_knn

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    bf = knn_bruteforce(ds, query_ids=[0, 1, 2, 3], k=5)
    approx = lsh_knn(ds, query_ids=[0, 1, 2, 3], k=5, probe_radius=2)
    assert set(approx.columns) >= {"query_id", "neighbor_id", "rank"}
    got = set(zip(approx.query_id, approx.neighbor_id))
    exp = set(zip(bf.query_id, bf.neighbor_id))
    # weakly-similar corpus: multiprobe recall is partial but nonzero
    assert len(got & exp) / len(exp) >= 0.3
    # near-identical planted vector must always be found
    import numpy as np
    import pandas as pd

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["vec_id"] == 0].copy()
        d["vec_id"] = 9_000_000
        d["embedding"] = [
            (np.asarray(e, dtype=np.float32) * 1.02).tolist() for e in d["embedding"]
        ]
        return pd.concat([df, d], ignore_index=True)

    planted = ds.map_batches(plant, batch_format="pandas")
    out = lsh_knn(planted, query_ids=[0], k=1, probe_radius=1)
    assert out.neighbor_id.tolist() == [9_000_000]


# ------------------------------------------------------------- windows


def test_tumbling_window_and_topk(ray_session):
    import pandas as pd
    from fastie_ray.ops.windows import top_k_by_sum, tumbling_window_agg

    rows = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:10", "2024-01-01 00:50", "2024-01-01 01:10",
                 "2024-01-01 00:20"]
            ),
            "event_type": ["a", "a", "a", "b"],
            "value": [1.0, 2.0, 4.0, 8.0],
            "user_id": [1, 2, 1, 3],
        }
    )
    ds = ray.data.from_pandas(rows)
    w = tumbling_window_agg(ds, freq="1h").to_pandas().sort_values(
        ["window_start", "event_type"]).reset_index(drop=True)
    assert len(w) == 3
    h0a = w[(w.event_type == "a") & (w.window_start == pd.Timestamp("2024-01-01 00:00"))]
    assert int(h0a.n_events.iloc[0]) == 2 and h0a.sum_value.iloc[0] == 3.0

    top = top_k_by_sum(ds, k=2)
    assert top.user_id.tolist() == [3, 1]  # 8.0, then 1+4=5.0
    assert top["rank"].tolist() == [1, 2]


def test_minhash_estimate_mode_recalls_exact_pairs(ray_session):
    """verify="estimate" (the 100-TB constant-payload mode): same
    banding → same candidate set; signature-agreement verification must
    keep every exact pair at a margin below the threshold and estimate
    jaccard within the num_perm sampling error."""
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    exact = (
        minhash_lsh_dups(docs, threshold=0.7, concurrency=2, verify="exact")
        .to_pandas()
    )
    est = (
        minhash_lsh_dups(docs, threshold=0.55, concurrency=2, verify="estimate")
        .to_pandas()
    )
    got = set(zip(est.doc_a, est.doc_b))
    want = set(zip(exact.doc_a, exact.doc_b))
    assert want <= got  # every true pair recalled at the slack threshold
    # estimates are close to exact jaccard on the true pairs
    ex = exact.set_index(["doc_a", "doc_b"])["jaccard_e6"]
    es = est.set_index(["doc_a", "doc_b"])["jaccard_e6"]
    for k in want:
        assert abs(es[k] - ex[k]) < 150_000  # |est - true| < 0.15 (128 perms)


def test_simhash_dups_matches_bruteforce(ray_session):
    """Full-pair semantics of the value-level design: output equals
    brute-force pairwise popcount at hamming ≤ n_bands-1 (pigeonhole
    recall), with no duplicate pairs."""
    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = simhash_dups(docs, hamming_thresh=3, concurrency=2).to_pandas()
    assert not got.duplicated(["doc_a", "doc_b"]).any()

    from fastie_ray.ops.neardup import popcount64, simhash64_batch

    pdf = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    sigs = simhash64_batch(list(pdf["text"]))
    ids = pdf["doc_id"].to_numpy()
    order = np.argsort(ids)
    ids, sigs = ids[order], sigs[order]
    ii, jj = np.triu_indices(len(ids), k=1)
    ham = popcount64(sigs[ii] ^ sigs[jj]).astype(np.int64)
    keep = ham <= 3
    exp = pd.DataFrame(
        {"doc_a": ids[ii[keep]], "doc_b": ids[jj[keep]], "hamming": ham[keep]}
    )
    g = got.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    e = exp.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(g.astype("int64"), e.astype("int64"))


def test_ivf_knn_recall_vs_bruteforce(ray_session):
    """IVF with generous nprobe recalls most exact neighbors; planted
    exact-direction copies are always recalled (same Voronoi cell)."""
    from fastie_ray.ops.similarity import ivf_knn, knn_bruteforce

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    exact = knn_bruteforce(emb, query_ids=[0, 1, 2, 3], k=5)
    approx = ivf_knn(emb, query_ids=[0, 1, 2, 3], k=5,
                     n_centroids=8, nprobe=4)
    got = set(zip(approx.query_id, approx.neighbor_id))
    want = set(zip(exact.query_id, exact.neighbor_id))
    assert len(got & want) / len(want) >= 0.6  # recall at nprobe=C/2

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["vec_id"].isin([0, 1])].copy()
        d["vec_id"] = d["vec_id"] + 1_000_000
        d["embedding"] = [
            (np.asarray(e, dtype=np.float32) * 2.0).tolist() for e in d["embedding"]
        ]
        return pd.concat([df, d], ignore_index=True)

    planted = ivf_knn(emb.map_batches(plant, batch_format="pandas"),
                      query_ids=[0, 1], k=3, n_centroids=8, nprobe=2)
    r1 = planted[planted["rank"] == 1]
    assert dict(zip(r1.query_id, r1.neighbor_id)) == {0: 1_000_000, 1: 1_000_001}


def test_hopping_session_asof_windows(ray_session):
    """New wide ops: hopping windows double-count each event across
    overlapping windows; sessions split on gaps; as-of join picks the
    latest prior right row per key."""
    import pandas as pd

    from fastie_ray.ops.windows import (
        asof_join,
        hopping_window_agg,
        session_window_agg,
    )

    ts = pd.to_datetime(
        ["2024-01-01 00:05", "2024-01-01 00:40", "2024-01-01 02:00"]
    ).astype("datetime64[us]")
    ev = pd.DataFrame(
        {"ts": ts, "event_type": ["a", "a", "a"], "user_id": [1, 1, 1],
         "value": [1.0, 2.0, 4.0]}
    )
    ds = ray.data.from_pandas(ev)

    hop = hopping_window_agg(ds, size="1h", hop="30min").to_pandas()
    # every event appears in exactly 2 windows
    assert hop["n_events"].sum() == 6
    w = hop.set_index("window_start")["n_events"]
    assert w[pd.Timestamp("2024-01-01 00:00")] == 2  # 00:05 and 00:40
    assert w[pd.Timestamp("2023-12-31 23:30")] == 1  # 00:05 only

    sess = session_window_agg(ds, gap="30min").to_pandas()
    # 00:05→00:40 gap is 35min > 30min → three singleton sessions
    assert len(sess) == 3 and (sess["n_events"] == 1).all()
    sess2 = session_window_agg(ds, gap="36min").to_pandas()
    assert sorted(sess2["n_events"]) == [1, 2]

    clicks = ray.data.from_pandas(
        pd.DataFrame({"event_id": [10], "ts": [ts[2]], "user_id": [1]})
    )
    views = ray.data.from_pandas(
        pd.DataFrame({"event_id": [1, 2, 99], "ts": list(ts),
                      "user_id": [1, 1, 2]})
    )
    j = asof_join(clicks, views, key_col="user_id", ts_col="ts",
                  right_cols=["event_id"]).to_pandas()
    assert len(j) == 1 and j.iloc[0]["event_id_r"] == 2  # latest prior view


def test_session_two_phase_equals_single_shuffle(ray_session):
    """The scalable two-phase sessionization must emit EXACTLY the
    sessions of the single-shuffle version — including sessions that
    span time-bucket boundaries."""
    import pandas as pd

    from fastie_ray.ops.windows import session_window_agg, session_window_agg_scalable

    # crafted cross-midnight chain: 23:50 → 00:10 → 00:25 is ONE session
    ts = pd.to_datetime(
        ["2024-01-01 23:50", "2024-01-02 00:10", "2024-01-02 00:25",
         "2024-01-02 09:00", "2024-01-01 12:00"]
    ).astype("datetime64[us]")
    crafted = pd.DataFrame(
        {"ts": ts, "user_id": [7, 7, 7, 7, 8], "value": [1.0, 2.0, 3.0, 4.0, 5.0]}
    )
    ds = ray.data.from_pandas(crafted)
    a = session_window_agg(ds, gap="30min").to_pandas()
    b = session_window_agg_scalable(ds, gap="30min", bucket="1d").to_pandas()
    key = ["user_id", "session_start"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    u7 = b[b.user_id == 7]
    assert 3 in set(u7.n_events)  # the cross-midnight chain merged

    # full events table equality
    ev = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["ts", "user_id", "value"])
    a = session_window_agg(ev, gap="30min").to_pandas()
    b = session_window_agg_scalable(ev, gap="30min", bucket="6h").to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_range_join_cross_bucket_boundary(ray_session):
    """Right rows within the window but in the PREVIOUS time bucket are
    replicated across the boundary; out-of-window rows never match."""
    import pandas as pd

    from fastie_ray.ops.windows import range_join

    ts_l = pd.to_datetime(["2024-01-02 00:20"]).astype("datetime64[us]")
    left = ray.data.from_pandas(
        pd.DataFrame({"event_id": [100], "ts": ts_l, "user_id": [1]})
    )
    ts_r = pd.to_datetime(
        ["2024-01-01 23:40",  # prev bucket, within 1h window → match
         "2024-01-01 22:00",  # prev bucket, outside window → no match
         "2024-01-02 00:10",  # same bucket, within → match
         "2024-01-02 00:30"]  # after the left ts → no match
    ).astype("datetime64[us]")
    right = ray.data.from_pandas(
        pd.DataFrame({"event_id": [1, 2, 3, 4], "ts": ts_r, "user_id": [1] * 4})
    )
    out = range_join(
        left, right, window="1h", bucket="1d", right_cols=["event_id"],
        left_cols=["event_id", "ts", "user_id"],
    ).to_pandas()
    assert sorted(out["event_id_r"]) == [1, 3]
    assert (out["event_id"] == 100).all()


def test_fuzzy_dedup_keep_one_chain_and_singletons():
    """Keep-one semantics over a pair graph: transitive chains collapse
    to one cluster (1-2, 2-3 => {1,2,3} kept=1), disjoint pairs keep
    their min, unpaired docs are singletons of size 1."""
    import ray.data

    from fastie_ray.ops.dedup import fuzzy_dedup_keep_one

    docs = ray.data.from_items([{"doc_id": i} for i in [1, 2, 3, 10, 11, 42, 99]])
    pairs = ray.data.from_items(
        [
            {"doc_a": 1, "doc_b": 2},
            {"doc_a": 2, "doc_b": 3},
            {"doc_a": 10, "doc_b": 11},
        ]
    )
    out = (
        fuzzy_dedup_keep_one(docs, pairs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(out["doc_id"], out["cluster_size"]))
    assert got == {1: 3, 10: 2, 42: 1, 99: 1}


def test_minhash_join_mode_matches_exact():
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.neardup import minhash_lsh_dups

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    texts, ids = [], []
    for i in range(120):
        toks = list(rng.choice(vocab, size=60))
        ids.append(i)
        texts.append(" ".join(toks))
        if i % 4 == 0:
            # near-dup: drop two tokens
            ids.append(1000 + i)
            texts.append(" ".join(toks[:-2]))
    docs = pd.DataFrame({"doc_id": ids, "text": texts})
    ds = ray.data.from_pandas([p for p in np.array_split(docs, 4)])

    cols = ["doc_a", "doc_b", "jaccard_e6"]
    exact = (
        minhash_lsh_dups(ds, threshold=0.7, concurrency=2, verify="exact")
        .to_pandas()
        .sort_values(cols[:2])
        .reset_index(drop=True)[cols]
    )
    joined = (
        minhash_lsh_dups(ds, threshold=0.7, concurrency=2, verify="join")
        .to_pandas()
        .sort_values(cols[:2])
        .reset_index(drop=True)[cols]
    )
    assert len(exact) >= 30  # the planted near-dups were recalled
    pd.testing.assert_frame_equal(exact, joined)


def test_semantic_dedup_exists_semantics_and_groups():
    """EXISTS-earlier pruning vs a brute-force reference, including the
    chain case (b near a, c near b but not a): EXISTS drops BOTH b and
    c — order-independent, unlike greedy keep-first."""
    import ray.data

    from fastie_ray.ops.neardup import semantic_dedup

    rng = np.random.default_rng(3)

    def ref(rows, num=95, den=100, scale=100):
        kept = []
        by_g = {}
        for vid, g, v in rows:
            by_g.setdefault(g, []).append((vid, v))
        for g, items in by_g.items():
            items.sort()
            qs = {vid: np.floor(np.asarray(v) * scale).astype(np.int64)
                  for vid, v in items}
            for j, (vj, _) in enumerate(items):
                dropped = False
                for vi, _ in items[:j]:
                    d = int(qs[vi] @ qs[vj])
                    if d > 0 and den * den * d * d >= num * num * int(
                        qs[vi] @ qs[vi]
                    ) * int(qs[vj] @ qs[vj]):
                        dropped = True
                        break
                if not dropped:
                    kept.append(vj)
        return sorted(kept)

    base = rng.normal(size=(6, 16))
    rows = []
    vid = 0
    for g in (0, 1):
        for b in base:
            rows.append((vid, g, b / np.linalg.norm(b))); vid += 1
    # chain: b = a rotated slightly, c = b rotated slightly
    a = base[0] / np.linalg.norm(base[0])
    for eps in (0.02, 0.04):
        v = a + eps * base[1] / np.linalg.norm(base[1])
        rows.append((vid, 0, v / np.linalg.norm(v))); vid += 1
    df = pd.DataFrame(
        {"vec_id": [r[0] for r in rows],
         "label": np.array([r[1] for r in rows], dtype=np.int32),
         "embedding": [r[2] for r in rows]}
    )
    got = semantic_dedup(
        ray.data.from_pandas(df), n_buckets=4
    ).to_pandas()
    assert sorted(got["vec_id"]) == ref(
        [(r[0], r[1], r[2]) for r in rows]
    )


def test_ann_recall_int_matches_single_process_reference(ray_session):
    """ann_recall_int vs a straight-line numpy replay of the same
    integer-grid semantics (cells, probes, buckets, top-k tie-breaks),
    plus block-layout invariance of the partial-top-k combiner."""
    import numpy as np

    from fastie_ray.ops.similarity import ann_recall_int

    rng = np.random.default_rng(5)
    n, dim, k = 200, 16, 5
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [rng.standard_normal(dim).astype(np.float32) for _ in range(n)],
        }
    )
    cents = np.floor(rng.standard_normal((4, dim)) * 500).astype(np.int64)
    planes = np.floor(rng.standard_normal((3, dim)) * 100).astype(np.int64)
    anchors = [0, 40, 80, 120]

    out1 = ann_recall_int(
        ray.data.from_pandas(df), anchors, k, cents, planes, nprobe=2
    ).sort_values(["method", "query_id"]).reset_index(drop=True)
    out8 = ann_recall_int(
        ray.data.from_pandas(df).repartition(8), anchors, k, cents, planes, nprobe=2
    ).sort_values(["method", "query_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out1, out8)

    x = np.floor(np.stack(df["embedding"].to_numpy()).astype(np.float64) * 1000.0).astype(np.int64)
    ids = df["vec_id"].to_numpy()
    dc = (x * x).sum(1)[:, None] - 2 * (x @ cents.T) + (cents * cents).sum(1)[None, :]
    cell = dc.argmin(1)
    probes = np.argsort(dc, axis=1, kind="stable")[:, :2]
    bits = (x @ planes.T) > 0
    bucket = np.zeros(n, dtype=np.int64)
    for j in range(3):
        bucket |= bits[:, j].astype(np.int64) << j

    for _, row in out1.iterrows():
        a = int(row["query_id"])
        qi = int(np.where(ids == a)[0][0])
        d = ((x - x[qi]) ** 2).sum(1)
        elig = ids != a
        exact = set(ids[np.flatnonzero(elig)[np.lexsort((ids[elig], d[elig]))[:k]]])
        if row["method"] == "ivf":
            m = elig & np.isin(cell, probes[qi])
        else:
            m = elig & (bucket == bucket[qi])
        idx = np.flatnonzero(m)
        approx = set(ids[idx[np.lexsort((ids[idx], d[idx]))[:k]]]) if len(idx) else set()
        assert row["n_exact"] == len(exact)
        assert row["n_hits"] == len(approx & exact)
        assert row["recall_e6"] == (len(approx & exact) * 1_000_000) // len(exact)


def test_session_window_agg_negative_int_keys(ray_session):
    """Code-review r5: the Arrow bucket fast path must handle NEGATIVE
    integer keys (a cast-to-uint64 formulation raised ArrowInvalid;
    bit_wise_and on int64 two's-complement low bits does not)."""
    import pandas as pd

    from fastie_ray.ops.windows import session_window_agg

    df = pd.DataFrame({
        "user_id": [-1, -1, -1, 7, 7],
        "ts": pd.to_datetime([
            "2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00",
            "2024-01-01 00:00", "2024-01-01 00:05",
        ]),
        "value": [1.0, 2.0, 4.0, 8.0, 16.0],
    })
    got = (
        session_window_agg(ray.data.from_pandas(df), gap="30min")
        .to_pandas().sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    # user -1: two sessions (gap 1h50m breaks); user 7: one session
    neg = got[got["user_id"] == -1]
    assert len(neg) == 2
    assert list(neg["n_events"]) == [2, 1]
    assert list(neg["sum_value"]) == [3.0, 4.0]
    pos = got[got["user_id"] == 7]
    assert len(pos) == 1 and float(pos["sum_value"].iloc[0]) == 24.0
