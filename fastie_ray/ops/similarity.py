"""Similarity search over an embedding column (``list<float>``).

- ``knn_bruteforce``: exact cosine top-k — the broadcast-query pattern:
  the (small) query matrix is ``ray.put`` once; every batch does ONE
  numpy matmul against it and emits only its local top-k rows, so the
  driver-side final merge sees ``n_batches × n_queries × k`` tiny rows,
  never the corpus.
- ``lsh_knn``: the scale path — random-hyperplane LSH bucketing; only
  same-bucket (± multiprobe) candidates are scored. Recall vs
  brute-force is asserted in tests.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def knn_bruteforce(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k (excluding self): returns
    (query_id, neighbor_id, score, rank) — rank 1-based, deterministic
    tie-break on neighbor_id."""
    import ray

    qset = set(query_ids)
    q_rows = ds.map_batches(
        lambda df: df[df[id_col].isin(qset)], batch_format="pandas"
    ).to_pandas()
    q_rows = q_rows.sort_values(id_col)
    qids = q_rows[id_col].to_numpy()
    Q = _norm_rows(np.asarray(list(q_rows[emb_col]), dtype=np.float32))
    q_ref = ray.put((qids, Q))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_ = ray.get(q_ref)
        M = _norm_rows(np.asarray(list(df[emb_col]), dtype=np.float32))
        ids = df[id_col].to_numpy()
        S = M @ Q_.T  # [batch, nq]
        out = []
        kk = min(k + 1, len(ids))  # +1 to survive self-exclusion downstream
        for j, qid in enumerate(qids_):
            col = S[:, j]
            top = np.argpartition(-col, kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
            for i in top:
                out.append((int(qid), int(ids[i]), float(col[i])))
        return pd.DataFrame(out, columns=["query_id", "neighbor_id", "score"])

    partials = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    partials = partials[partials.query_id != partials.neighbor_id]
    # deterministic order: score desc, neighbor_id asc
    partials = partials.sort_values(
        ["query_id", "score", "neighbor_id"], ascending=[True, False, True]
    )
    topk = partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    topk["score"] = topk["score"].round(6)
    return topk


class LshIndexer:
    """Random-hyperplane signature per vector (seeded; planes generated
    once per actor). Corpus rows land in their own bucket; rows whose
    ``vec_id`` is in ``probe_ids`` are ADDITIONALLY replicated into all
    buckets within hamming distance ``probe_radius`` of their signature
    (multiprobe, marked ``is_probe`` so they never act as candidates)."""

    def __init__(
        self,
        dim: int = 64,
        n_planes: int = 6,
        seed: int = 42,
        probe_ids: frozenset | None = None,
        probe_radius: int = 1,
    ):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
        self.n_planes = n_planes
        self.probe_ids = probe_ids or frozenset()
        self.flips = [0]
        if probe_radius >= 1:
            self.flips += [1 << b for b in range(n_planes)]
        if probe_radius >= 2:
            self.flips += [
                (1 << a) | (1 << b)
                for a in range(n_planes)
                for b in range(a + 1, n_planes)
            ]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        M = np.asarray(list(df["embedding"]), dtype=np.float32)
        bits = (M @ self.planes) > 0
        sig = np.zeros(len(df), dtype=np.int64)
        for b in range(bits.shape[1]):
            sig |= bits[:, b].astype(np.int64) << b
        ids = df["vec_id"].to_numpy()
        embs = list(df["embedding"])
        out_id, out_bucket, out_emb, out_probe = [], [], [], []
        for i in range(len(df)):
            out_id.append(int(ids[i]))
            out_bucket.append(int(sig[i]))
            out_emb.append(embs[i])
            out_probe.append(False)
            if int(ids[i]) in self.probe_ids:
                for f in self.flips[1:]:
                    out_id.append(int(ids[i]))
                    out_bucket.append(int(sig[i]) ^ f)
                    out_emb.append(embs[i])
                    out_probe.append(True)
        return pd.DataFrame(
            {
                "vec_id": pd.Series(out_id, dtype="int64"),
                "bucket": pd.Series(out_bucket, dtype="int64"),
                "embedding": out_emb,
                "is_probe": pd.Series(out_probe, dtype="bool"),
            }
        )


def lsh_knn(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    seed: int = 42,
    probe_radius: int = 2,
) -> pd.DataFrame:
    """Approximate top-k: score only candidates sharing one of the
    query's probed LSH buckets (multiprobe: signature ± up to
    ``probe_radius`` bit flips). One groupby shuffle on the bucket id.

    Size ``n_planes`` to the corpus: ~log2(n / desired_bucket_size)
    (2^n_planes buckets); too many planes → singleton buckets and zero
    recall, too few → brute force within one bucket."""
    qset = set(query_ids)
    sigs = ds.map_batches(
        LshIndexer,
        fn_constructor_kwargs={
            "dim": dim, "n_planes": n_planes, "seed": seed,
            "probe_ids": frozenset(qset), "probe_radius": probe_radius,
        },
        batch_format="pandas",
        concurrency=2,
    )

    def _empty():
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        qmask = g["vec_id"].isin(qset)
        if not qmask.any():
            return _empty()
        cand_mask = (~g["is_probe"]).to_numpy()
        M = _norm_rows(np.asarray(list(g["embedding"]), dtype=np.float32))
        ids = g["vec_id"].to_numpy()
        # one query row per id (probe replicas share the embedding)
        q_rows = g[qmask].drop_duplicates("vec_id")
        out = []
        for qid, qemb in zip(q_rows["vec_id"], q_rows["embedding"]):
            qv = np.asarray(qemb, dtype=np.float32)
            qn = np.linalg.norm(qv)
            qv = qv / qn if qn > 0 else qv
            scores = M @ qv
            for i in np.flatnonzero(cand_mask):
                if ids[i] != qid:
                    out.append((int(qid), int(ids[i]), float(scores[i])))
        if not out:
            return _empty()
        return pd.DataFrame(out, columns=["query_id", "neighbor_id", "score"])

    cand = sigs.groupby("bucket").map_groups(per_bucket, batch_format="pandas").to_pandas()
    if len(cand) == 0:  # all groups empty → Ray drops the schema
        cand = _empty()
    cand = cand.drop_duplicates(["query_id", "neighbor_id"]).sort_values(
        ["query_id", "score", "neighbor_id"], ascending=[True, False, True]
    )
    topk = cand.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    topk["score"] = topk["score"].round(6)
    return topk


# --------------------------------------------------------------- IVF


def _kmeans(sample: np.ndarray, n_centroids: int, n_iter: int = 10,
            seed: int = 42) -> np.ndarray:
    """Small deterministic Lloyd's k-means on a driver-side SAMPLE
    (normalized rows; cosine ≈ dot). The sample is bounded (never the
    corpus); centroids are the broadcast index."""
    rng = np.random.default_rng(seed)
    n = len(sample)
    C = sample[rng.choice(n, size=min(n_centroids, n), replace=False)].copy()
    for _ in range(n_iter):
        assign = np.argmax(sample @ C.T, axis=1)
        for c in range(len(C)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    C[c] = m / nrm
    return C


def ivf_knn(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    seed: int = 42,
) -> pd.DataFrame:
    """IVF approximate top-k — the inverted-file scale path beside
    ``lsh_knn``: k-means centroids trained once on a bounded sample
    (driver), broadcast; every vector is assigned to its nearest
    centroid inside ``map_batches`` (one matmul per batch); each query
    probes its ``nprobe`` nearest centroid lists and scores ONLY
    vectors assigned there. The only driver-sized structures are the
    [C, dim] centroid matrix and the final ``n_batches × nq × k``
    merge; the corpus itself never leaves the batch stream.

    Recall is governed by nprobe/n_centroids (cells are Voronoi regions
    of the centroid set); exact-direction duplicates of a query always
    share its cell, so their recall is 1."""
    import ray

    # bounded sample for training (deterministic: first blocks)
    sample_rows = ds.limit(sample_size).to_pandas()
    S = _norm_rows(np.asarray(list(sample_rows["embedding"]), dtype=np.float32))
    C = _kmeans(S, n_centroids, seed=seed)

    qset = set(query_ids)
    q_rows = ds.map_batches(
        lambda df: df[df["vec_id"].isin(qset)], batch_format="pandas"
    ).to_pandas().sort_values("vec_id")
    qids = q_rows["vec_id"].to_numpy()
    Q = _norm_rows(np.asarray(list(q_rows["embedding"]), dtype=np.float32))
    # per-query probe cells: nprobe nearest centroids
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # [nq, nprobe]
    ref = ray.put((qids, Q, C, probe))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_, C_, probe_ = ray.get(ref)
        M = _norm_rows(np.asarray(list(df["embedding"]), dtype=np.float32))
        ids = df["vec_id"].to_numpy()
        cell = np.argmax(M @ C_.T, axis=1)  # IVF assignment
        out = []
        for j, qid in enumerate(qids_):
            mask = np.isin(cell, probe_[j]) & (ids != qid)
            if not mask.any():
                continue
            idx = np.flatnonzero(mask)
            scores = M[idx] @ Q_[j]
            kk = min(k, len(idx))
            top = np.argpartition(-scores, kk - 1)[:kk] if len(idx) > kk else np.arange(len(idx))
            for i in top:
                out.append((int(qid), int(ids[idx[i]]), float(scores[i])))
        return pd.DataFrame(out, columns=["query_id", "neighbor_id", "score"])

    partials = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    partials = partials.sort_values(
        ["query_id", "score", "neighbor_id"], ascending=[True, False, True]
    )
    topk = partials.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    topk["rank"] = topk.groupby("query_id").cumcount() + 1
    topk["score"] = topk["score"].round(6)
    return topk


def scalar_quantize(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """FAISS-SQ8-style scalar quantization of an embedding column —
    the storage-compression prep for ANN at 100 TB (4× smaller than
    float32, 8× than float64): two passes,

    1. global per-DIMENSION min/max — per-batch elementwise reduce to
       one (dim, mn, mx) frame per batch, merged on the driver (64–4k
       doubles, a scalar broadcast, never corpus rows);
    2. streaming quantize: ``floor((x − mn) · 254.0 / (mx − mn)) − 127``
       per element, clipped to [−127, 127]. The expression is evaluated
       in IEEE double in exactly this operation order, so the SQL
       oracle reproduces every code bit-for-bit; a zero-span dimension
       quantizes to −127 both sides.

    Output is the UNNESTED (id, dim_1based, q) long form — integer
    values, hash-exact, and directly joinable for ADC-style scoring.
    """

    def mm_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        return pd.DataFrame(
            {"dim": np.arange(1, m.shape[1] + 1, dtype=np.int64),
             "mn": m.min(axis=0), "mx": m.max(axis=0)}
        )

    mm = (
        ds.map_batches(mm_partial, batch_format="pandas")
        .to_pandas()
        .groupby("dim", as_index=False)
        .agg(mn=("mn", "min"), mx=("mx", "max"))
        .sort_values("dim")
    )
    mn = mm["mn"].to_numpy()
    span = mm["mx"].to_numpy() - mn

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(df[vec_col].to_numpy()).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            q = np.floor((m - mn) * 254.0 / span) - 127.0
        q = np.where(span == 0, -127.0, q)
        q = np.clip(q, -127, 127).astype(np.int64)
        n, d = q.shape
        return pd.DataFrame(
            {id_col: np.repeat(df[id_col].to_numpy(), d),
             "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), n),
             "q": q.reshape(-1)}
        )

    return ds.map_batches(quant, batch_format="pandas")


# ------------------------------------------------- ANN recall oracle


def _int_grid(df: pd.DataFrame, vec_col: str, scale: int) -> np.ndarray:
    """floor(scale * x) in float64 — bit-identical to DuckDB's
    ``floor(scale * x)`` over a FLOAT column promoted to DOUBLE."""
    m = np.stack(df[vec_col].to_numpy()).astype(np.float64)
    return np.floor(m * float(scale)).astype(np.int64)


def ann_recall_int(
    ds: "ray.data.Dataset",
    query_ids: list[int],
    k: int,
    int_centroids: "list[list[int]] | np.ndarray",
    int_planes: "list[list[int]] | np.ndarray",
    nprobe: int = 3,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Retrieval-QUALITY oracle for the approximate-NN family (VERDICT
    r3 #2): recall@k of IVF (frozen integer-grid coarse centroids,
    ``nprobe`` probed cells) and sign-LSH (frozen integer hyperplanes,
    exact-bucket candidates) against the exact top-k — everything in
    the ``floor(scale·x)`` int64 grid under integer squared-L2, so the
    whole computation (cell argmin, probe ranking, bucket bits,
    distances, top-k tie-breaks, the recall ratio itself) is
    bit-reproducible in a DuckDB oracle. Ties break on (distance,
    neighbor_id); cell/probe ties on (distance, centroid index).

    Scale shape: queries/centroids/planes are broadcast once
    (``ray.put``); ONE streaming pass emits per-block partial top-k
    candidate rows for all three methods (exact, ivf, lsh) — top-k is
    a valid per-block combiner — so the driver merge sees
    ``n_blocks × n_queries × k × 3`` tiny integer rows, never corpus
    vectors. No shuffle, no groupby.

    Returns (method, query_id, n_exact, n_hits, recall_e6) with
    ``recall_e6 = n_hits * 1_000_000 // n_exact``.
    """
    import ray

    cents = np.asarray(int_centroids, dtype=np.int64)
    planes = np.asarray(int_planes, dtype=np.int64)
    qset = set(int(q) for q in query_ids)

    q_rows = (
        ds.map_batches(
            lambda df: df[df[id_col].isin(qset)], batch_format="pandas"
        )
        .to_pandas()
        .sort_values(id_col)
    )
    qids = q_rows[id_col].to_numpy()
    Q = _int_grid(q_rows, vec_col, scale)  # [nq, dim] int64

    def cells_of(x: np.ndarray) -> np.ndarray:
        d = (
            (x * x).sum(1)[:, None]
            - 2 * (x @ cents.T)
            + (cents * cents).sum(1)[None, :]
        )
        return d.argmin(1)  # first minimum → lowest centroid index

    def probe_of(x: np.ndarray) -> np.ndarray:
        d = (
            (x * x).sum(1)[:, None]
            - 2 * (x @ cents.T)
            + (cents * cents).sum(1)[None, :]
        )
        # ascending (distance, centroid index): argsort is stable on
        # the index for equal keys
        return np.argsort(d, axis=1, kind="stable")[:, :nprobe]

    def buckets_of(x: np.ndarray) -> np.ndarray:
        bits = (x @ planes.T) > 0
        b = np.zeros(len(x), dtype=np.int64)
        for j in range(planes.shape[0]):
            b |= bits[:, j].astype(np.int64) << j
        return b

    q_probe = probe_of(Q)  # [nq, nprobe]
    q_bucket = buckets_of(Q)  # [nq]
    ref = ray.put((qids, Q, q_probe, q_bucket))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qids_, Q_, q_probe_, q_bucket_ = ray.get(ref)
        if len(df) == 0:
            return pd.DataFrame(
                {"method": pd.Series([], dtype="object"),
                 "query_id": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "d": pd.Series([], dtype="int64")}
            )
        x = _int_grid(df, vec_col, scale)
        ids = df[id_col].to_numpy()
        cell = cells_of(x)
        bucket = buckets_of(x)
        D = (
            (x * x).sum(1)[:, None]
            - 2 * (x @ Q_.T)
            + (Q_ * Q_).sum(1)[None, :]
        )  # [n, nq]
        out_m, out_q, out_n, out_d = [], [], [], []
        for j, qid in enumerate(qids_):
            not_self = ids != qid
            masks = (
                ("exact", not_self),
                ("ivf", not_self & np.isin(cell, q_probe_[j])),
                ("lsh", not_self & (bucket == q_bucket_[j])),
            )
            for method, m in masks:
                idx = np.flatnonzero(m)
                if len(idx) == 0:
                    continue
                dj = D[idx, j]
                order = np.lexsort((ids[idx], dj))[:k]
                take = idx[order]
                out_m.extend([method] * len(take))
                out_q.extend([int(qid)] * len(take))
                out_n.extend(int(i) for i in ids[take])
                out_d.extend(int(v) for v in D[take, j])
        return pd.DataFrame(
            {"method": out_m,
             "query_id": pd.Series(out_q, dtype="int64"),
             "neighbor_id": pd.Series(out_n, dtype="int64"),
             "d": pd.Series(out_d, dtype="int64")}
        )

    cand = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["method", "query_id", "d", "neighbor_id"])
    top = cand.groupby(["method", "query_id"], as_index=False).head(k)
    sets: dict[tuple[str, int], set[int]] = {
        (m, q): set(g["neighbor_id"])
        for (m, q), g in top.groupby(["method", "query_id"])
    }
    rows = []
    for qid in qids:
        exact = sets.get(("exact", int(qid)), set())
        n_exact = len(exact)
        for method in ("ivf", "lsh"):
            hits = len(sets.get((method, int(qid)), set()) & exact)
            rows.append(
                (method, int(qid), n_exact, hits,
                 (hits * 1_000_000) // n_exact if n_exact else 0)
            )
    return pd.DataFrame(
        rows, columns=["method", "query_id", "n_exact", "n_hits", "recall_e6"]
    ).astype({"query_id": "int64", "n_exact": "int64",
              "n_hits": "int64", "recall_e6": "int64"})
