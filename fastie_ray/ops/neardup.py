"""Near-duplicate detection over the ``documents`` / ``embeddings``
tables — the training-data-pipeline dedup family:

- ``minhash_lsh_dups``: shingle → MinHash → banded LSH candidate
  generation (ONE shuffle on the band key) → exact-Jaccard
  verification → pair dedup;
- ``simhash_dups``: 64-bit SimHash, banded by bit-slices (pigeonhole:
  hamming ≤ n_bands-1 ⇒ some band equal), verified by popcount;
- ``jaccard_pairs``: exact n-gram Jaccard for explicit row pairs
  (vectorized per batch, no shuffle);
- ``embedding_neardup``: all-pairs cosine ≥ threshold via per-batch
  matmul against a broadcast (``ray.put`` once) normalized matrix.

Scale notes (100 TB): band rows here carry the doc's shingle-hash set
so verification happens inside the band group with no second join —
payload ≈ bands × shingle bytes. At petabyte scale switch
``verify="estimate"`` (carry only the fixed-size MinHash signature and
verify by signature agreement) or re-join candidates to a shingle
table keyed by doc id. The band groupby key is ``(band, key)`` which
is uniform by construction (hash values), so no salting is needed.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.functions.hashing import stable_hash64
from fastie_ray.ops.dedup import dedup_exact

if TYPE_CHECKING:
    import ray.data

_MERSENNE = (1 << 61) - 1


def _token_shingles(text: str, k: int) -> list[str]:
    toks = text.strip().split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _perm_params(num_perm: int, seed: int) -> np.ndarray:
    """Per-permutation xor seeds for the splitmix64 hash family."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    # standard splitmix64 finalizer; uint64 multiply wraps mod 2^64,
    # which is exactly what the mixer wants
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def minhash_signature(shingle_hashes: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """[num_perm] uint64 signature: min over shingles of
    splitmix64(hash ^ seed_i) — an approximately min-wise independent
    family (each seed defines an independent pseudo-permutation of the
    64-bit hash universe), fully vectorized in uint64."""
    if len(shingle_hashes) == 0:
        return np.zeros(len(seeds), dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)[None, :] ^ seeds[:, None]  # [P, S]
    return _splitmix64(x).min(axis=1)


class MinHashBander:
    """Stateful map_batches stage: permutation params built once per
    actor (the 'index loaded once per worker' shape, SURVEY §2.3)."""

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        shingle_k: int = 3,
        num_perm: int = 128,
        bands: int = 32,
        seed: int = 42,
    ):
        assert num_perm % bands == 0
        self.id_col, self.text_col = id_col, text_col
        self.shingle_k, self.num_perm, self.bands = shingle_k, num_perm, bands
        self.rows_per_band = num_perm // bands
        self.seeds = _perm_params(num_perm, seed)

    def __call__(self, batch) -> "pa.Table":
        # Arrow in/out: the shingle sets ride the shuffle as a
        # list<uint64> column (fast columnar serialization), not pandas
        # object arrays (row-pickled, ~10x slower through the sort).
        import pyarrow as pa

        ids = batch[self.id_col].to_pylist() if isinstance(batch, pa.Table) else list(batch[self.id_col])
        texts = batch[self.text_col].to_pylist() if isinstance(batch, pa.Table) else list(batch[self.text_col])
        out_id, out_band, out_key, out_sh = [], [], [], []
        for doc_id, text in zip(ids, texts):
            sh = sorted({stable_hash64(s) for s in _token_shingles(text, self.shingle_k)})
            sh_arr = np.asarray(sh, dtype=np.uint64)
            sig = minhash_signature(sh_arr, self.seeds)
            for band in range(self.bands):
                rows = sig[band * self.rows_per_band : (band + 1) * self.rows_per_band]
                key = stable_hash64(rows.tobytes())
                out_id.append(doc_id)
                out_band.append(band)
                out_key.append(np.int64(key % (1 << 62)))
                out_sh.append(sh_arr)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "key": pa.array(out_key, pa.int64()),
                "shingles": pa.array([a.tolist() for a in out_sh], pa.list_(pa.uint64())),
            }
        )


def _pairs_in_partition(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Exact-Jaccard verification within one COARSE hash partition:
    a vectorized pandas groupby over (band, key) filters to buckets
    with ≥2 docs, then candidate pairs are verified. One partition =
    one task — iterating every (band, key) bucket as its own
    ``map_groups`` call costs a Python roundtrip per SINGLETON bucket
    (the overwhelming majority), ~150k calls at sf0.1."""
    out = []
    sizes = g.groupby(["band", "key"])["doc_id"].transform("size")
    cand = g[sizes >= 2]
    for (_, _), grp in cand.groupby(["band", "key"]):
        ids = grp["doc_id"].to_numpy()
        shingles = [np.asarray(x, dtype=np.uint64) for x in grp["shingles"]]
        order = np.argsort(ids)
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                if ids[i] == ids[j]:
                    continue
                A, B = shingles[i], shingles[j]
                inter = len(np.intersect1d(A, B, assume_unique=True))
                union = len(A) + len(B) - inter
                jac = inter / union if union else 0.0
                if jac >= threshold:
                    # integer-scaled jaccard: exactly reproducible in
                    # SQL (floor(inter*1e6/union)), no rounding skew
                    out.append((int(ids[i]), int(ids[j]), inter * 1_000_000 // union))
    return pd.DataFrame(
        {
            "doc_a": pd.Series([r[0] for r in out], dtype="int64"),
            "doc_b": pd.Series([r[1] for r in out], dtype="int64"),
            "jaccard_e6": pd.Series([r[2] for r in out], dtype="int64"),
        }
    )


def minhash_lsh_dups(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.7,
    seed: int = 42,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """All document pairs with distinct-``k``-token-shingle Jaccard ≥
    ``threshold`` → (doc_a, doc_b, jaccard), doc_a < doc_b.

    Recall is governed by the banding: P(candidate | J) =
    1-(1-J^r)^b with r = num_perm/bands; at the 128/32 default a
    J=0.7 pair is missed w.p. ≈1.5e-4. Verification is exact, so
    precision is 1 (no false pairs)."""
    banded = ds.map_batches(
        MinHashBander,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, shingle_k=shingle_k,
            num_perm=num_perm, bands=bands, seed=seed,
        ),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def add_part(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        part = pc.cast(pc.bit_wise_and(t["key"], 63), pa.int32())
        return t.append_column("__part", part)

    pairs = (
        banded.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda g: _pairs_in_partition(g.drop(columns="__part"), threshold),
            batch_format="pandas",
        )
    )
    return dedup_exact(pairs, ["doc_a", "doc_b"])


# --------------------------------------------------------------- simhash


class SimHasher:
    """64-bit SimHash over distinct whitespace tokens + bit-slice bands.
    Emits ``n_bands`` rows per doc: (doc_id, band, key, sig)."""

    def __init__(
        self, id_col: str = "doc_id", text_col: str = "text", n_bands: int = 8
    ):
        self.id_col, self.text_col, self.n_bands = id_col, text_col, n_bands
        assert 64 % n_bands == 0
        self.band_bits = 64 // n_bands

    @staticmethod
    def simhash64(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in set(text.strip().split()):
            h = stable_hash64(tok)
            bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        sig = 0
        for i in range(64):
            if acc[i] > 0:
                sig |= 1 << i
        return sig

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out_id, out_band, out_key, out_sig = [], [], [], []
        mask = (1 << self.band_bits) - 1
        for doc_id, text in zip(df[self.id_col], df[self.text_col]):
            sig = self.simhash64(text)
            for band in range(self.n_bands):
                out_id.append(doc_id)
                out_band.append(band)
                out_key.append((sig >> (band * self.band_bits)) & mask)
                out_sig.append(np.int64(sig - (1 << 63)))  # store signed
        return pd.DataFrame(
            {"doc_id": out_id, "band": out_band, "key": out_key, "sig": out_sig}
        )


def simhash_dups(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    hamming_thresh: int = 7,
    n_bands: int = 8,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Document pairs with SimHash hamming distance ≤ ``hamming_thresh``
    → (doc_a, doc_b, hamming). With ``n_bands`` bit-slice bands any
    pair at hamming ≤ n_bands-1 shares at least one exact band
    (pigeonhole), so recall is 1 for ``hamming_thresh ≤ n_bands-1``;
    popcount verification makes precision 1."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = []
        ids = g["doc_id"].to_numpy()
        sigs = (g["sig"].to_numpy().astype(np.int64).astype(np.uint64)) + np.uint64(1 << 63)
        order = np.argsort(ids)
        for ii in range(len(order)):
            for jj in range(ii + 1, len(order)):
                i, j = order[ii], order[jj]
                if ids[i] == ids[j]:
                    continue
                ham = int(bin(int(sigs[i]) ^ int(sigs[j])).count("1"))
                if ham <= hamming_thresh:
                    out.append((int(ids[i]), int(ids[j]), ham))
        return pd.DataFrame(
            {
                "doc_a": pd.Series([r[0] for r in out], dtype="int64"),
                "doc_b": pd.Series([r[1] for r in out], dtype="int64"),
                "hamming": pd.Series([r[2] for r in out], dtype="int64"),
            }
        )

    banded = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col, n_bands=n_bands),
        batch_format="pandas",
        concurrency=concurrency,
    )
    cand = banded.groupby(["band", "key"]).map_groups(pairs, batch_format="pandas")
    return dedup_exact(cand, ["doc_a", "doc_b"])


# ------------------------------------------------------------- jaccard


def jaccard_pairs_batch(
    df: pd.DataFrame,
    text_a: str = "text_a",
    text_b: str = "text_b",
    k: int = 3,
) -> pd.DataFrame:
    """Exact distinct-k-shingle Jaccard per row pair (vectorized per
    batch, no shuffle)."""
    out = []
    for ta, tb in zip(df[text_a], df[text_b]):
        A = set(_token_shingles(ta, k))
        B = set(_token_shingles(tb, k))
        union = len(A | B)
        out.append(len(A & B) * 1_000_000 // union if union else 0)
    res = df.copy()
    res["jaccard_e6"] = out
    return res


# ---------------------------------------------------------- embeddings


def embedding_neardup(
    ds: "ray.data.Dataset",
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """All vector pairs with cosine ≥ threshold → (id_a, id_b, cosine),
    id_a < id_b. The full normalized matrix is broadcast ONCE
    (``ray.put``); each batch does one matmul against it — O(n·B) work
    per batch, never a pairwise shuffle. At 10^9-vector scale replace
    the broadcast side with LSH buckets (``ops.similarity.lsh_knn``)."""
    import ray

    all_rows = ds.select_columns([id_col, emb_col]).to_pandas()
    all_rows = all_rows.sort_values(id_col)
    ids_all = all_rows[id_col].to_numpy()
    M = np.asarray(list(all_rows[emb_col]), dtype=np.float32)
    n = np.linalg.norm(M, axis=1, keepdims=True)
    n[n == 0] = 1.0
    M = M / n
    ref = ray.put((ids_all, M))

    def batch_pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_a, Mall = ray.get(ref)
        B = np.asarray(list(df[emb_col]), dtype=np.float32)
        nb = np.linalg.norm(B, axis=1, keepdims=True)
        nb[nb == 0] = 1.0
        B = B / nb
        ids_b = df[id_col].to_numpy()
        S = B @ Mall.T  # [batch, n]
        bi, ai = np.where(S >= threshold)
        out = []
        for x, y in zip(bi, ai):
            a, b = int(ids_b[x]), int(ids_a[y])
            if a < b:  # emit each unordered pair once; skip self
                out.append((a, b, round(float(S[x, y]), 6)))
        return pd.DataFrame(out, columns=["id_a", "id_b", "cosine"])

    return ds.map_batches(batch_pairs, batch_format="pandas")
