"""Near-duplicate detection over the ``documents`` / ``embeddings``
tables — the training-data-pipeline dedup family:

- ``minhash_lsh_dups``: shingle → MinHash → banded LSH candidate
  generation (ONE shuffle on the band key) → exact-Jaccard
  verification → pair dedup;
- ``simhash_dups``: 64-bit SimHash, banded by bit-slices (pigeonhole:
  hamming ≤ n_bands-1 ⇒ some band equal), verified by popcount;
- ``jaccard_pairs``: exact n-gram Jaccard for explicit row pairs
  (vectorized per batch, no shuffle);
- ``embedding_neardup``: cosine ≥ threshold pairs via multi-table
  random-hyperplane LSH — each row carries only its fixed-size bucket
  keys into the exchange (recall math in the function docstring); no
  corpus-sized broadcast anywhere.

Scale notes (100 TB): in ``verify="exact"`` mode band rows carry the
doc's shingle-hash set so verification happens inside the band group
with no second join — payload ≈ bands × shingle bytes, fine to ~TB.
``verify="estimate"`` carries only the fixed num_perm×8-byte MinHash
signature and verifies by signature agreement — the constant-payload
100-TB mode. The band groupby key is ``(band, key)`` which is uniform
by construction (hash values), so no salting is needed; all
verification runs inside 64 coarse partitions (one task each), never
one Python call per fine (mostly singleton) bucket.
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


def _pool_size(requested: int) -> int:
    """Cap an actor-pool size below the cluster's CPUs: a pool that
    claims every CPU starves its own downstream shuffle tasks (measured
    in this sandbox: a 4-actor pool + groupby at num_cpus=4 deadlocks).
    Leaves ≥2 CPUs of headroom; scales up with the cluster."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(1, min(requested, cpus - 2))


def _token_shingles(text: str, k: int) -> list[str]:
    toks = text.strip().split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _shingle_hashes(
    text: str, k: int, cache: dict[str, int]
) -> np.ndarray:
    """Sorted distinct 64-bit hashes of the k-token shingles of
    ``text`` — semantically identical to hashing the joined shingle
    strings (``_token_shingles``), but vectorized: each DISTINCT token
    is hashed once (cached across the actor's batches — Zipf token
    distributions make this a >90% hit rate), then consecutive token
    hashes are combined positionally (h_i·C_1 ⊕ h_{i+1}·C_2 ⊕ …,
    distinct odd constants so order matters) and finalized with
    splitmix64. Collisions are ~2^-64; exact-Jaccard verification is
    over these hash sets either way."""
    toks = text.strip().split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter(
        (
            cache[t] if t in cache else cache.setdefault(t, stable_hash64(t))
            for t in toks
        ),
        dtype=np.uint64,
        count=len(toks),
    )
    with np.errstate(over="ignore"):
        if len(toks) < k:
            acc = np.uint64(0)
            for j in range(len(toks)):
                acc ^= th[j] * _POS_MIX[j % len(_POS_MIX)]
            return _splitmix64(np.asarray([acc], dtype=np.uint64))
        m = len(toks) - k + 1
        acc = th[:m] * _POS_MIX[0]
        for j in range(1, k):
            acc = acc ^ (th[j : m + j] * _POS_MIX[j % len(_POS_MIX)])
    return np.unique(_splitmix64(acc))


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


# odd 64-bit mixing constants for positional token-hash combination
# (seeded family, forced odd so multiplication is a bijection mod 2^64)
_POS_MIX = _perm_params(8, seed=987) | np.uint64(1)


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
        carry: str = "shingles",
        side_col: str | None = None,
    ):
        assert num_perm % bands == 0
        assert carry in ("shingles", "signature", "none")
        self.side_col = side_col
        self.id_col, self.text_col = id_col, text_col
        self.shingle_k, self.num_perm, self.bands = shingle_k, num_perm, bands
        self.rows_per_band = num_perm // bands
        self.seeds = _perm_params(num_perm, seed)
        self.carry = carry
        self._tok_cache: dict[str, int] = {}  # per-actor, cross-batch

    def __call__(self, batch) -> "pa.Table":
        # Arrow in/out: the verification payload rides the shuffle as a
        # list<uint64> column (fast columnar serialization, built with
        # ListArray.from_arrays — no per-element Python objects).
        # carry="shingles" ships the doc's full shingle-hash set (exact
        # verification downstream, payload grows with doc length);
        # carry="signature" ships the fixed num_perm×8-byte MinHash
        # signature (estimate verification, 100-TB-safe payload).
        import pyarrow as pa

        ids = batch[self.id_col].to_pylist() if isinstance(batch, pa.Table) else list(batch[self.id_col])
        texts = batch[self.text_col].to_pylist() if isinstance(batch, pa.Table) else list(batch[self.text_col])
        if len(self._tok_cache) > 1_000_000:  # bound actor memory
            self._tok_cache.clear()
        b, r = self.bands, self.rows_per_band
        n = len(ids)
        key_parts: list[np.ndarray] = []
        payloads: list[np.ndarray] = []
        lengths = np.empty(n, dtype=np.int64)
        for i, text in enumerate(texts):
            sh = _shingle_hashes(text, self.shingle_k, self._tok_cache)
            sig = minhash_signature(sh, self.seeds)
            # per-band key: positional mix of the band's signature rows
            # (vectorized across bands; replaces 32 blake2 calls/doc)
            R = sig.reshape(b, r)
            with np.errstate(over="ignore"):
                mixed = _splitmix64(
                    np.bitwise_xor.reduce(R * _POS_MIX[:r][None, :], axis=1)
                )
            key_parts.append((mixed & np.uint64((1 << 62) - 1)).astype(np.int64))
            if self.carry != "none":
                payload = sh if self.carry == "shingles" else sig
                payloads.append(payload)
                lengths[i] = len(payload)
        cols = {
            "doc_id": pa.array(np.repeat(np.asarray(ids, dtype=np.int64), b)),
            "band": pa.array(np.tile(np.arange(b, dtype=np.int32), n)),
            "key": pa.array(
                np.concatenate(key_parts) if n else np.empty(0, np.int64)
            ),
        }
        if self.side_col is not None:
            sides = (
                batch[self.side_col].to_pylist()
                if isinstance(batch, pa.Table) else list(batch[self.side_col])
            )
            cols["side"] = pa.array(
                np.repeat(np.asarray(sides, dtype=np.int32), b)
            )
        if self.carry != "none":
            col = "shingles" if self.carry == "shingles" else "sig"
            counts = np.repeat(lengths, b)
            offsets = np.zeros(len(counts) + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            values = (
                np.concatenate([np.tile(p, b) for p in payloads])
                if n
                else np.empty(0, dtype=np.uint64)
            )
            cols[col] = pa.LargeListArray.from_arrays(
                pa.array(offsets, pa.int64()), pa.array(values, pa.uint64())
            )
        return pa.table(cols)


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
    # near-dup pairs co-bucket in MANY bands — collect the unique
    # candidate pairs (and one payload per doc) first so each pair is
    # verified once per partition, not once per shared band.
    payload: dict[int, np.ndarray] = {}
    pairs: set[tuple[int, int]] = set()
    for (_, _), grp in cand.groupby(["band", "key"]):
        gids = grp["doc_id"].to_numpy()
        for did, sh in zip(gids, grp["shingles"]):
            if did not in payload:
                payload[int(did)] = np.asarray(sh, dtype=np.uint64)
        uids = np.unique(gids)
        for ii in range(len(uids)):
            for jj in range(ii + 1, len(uids)):
                pairs.add((int(uids[ii]), int(uids[jj])))
    for a, b in sorted(pairs):
        A, B = payload[a], payload[b]
        inter = len(np.intersect1d(A, B, assume_unique=True))
        union = len(A) + len(B) - inter
        if union and inter / union >= threshold:
            # integer-scaled jaccard: exactly reproducible in
            # SQL (floor(inter*1e6/union)), no rounding skew
            out.append((a, b, inter * 1_000_000 // union))
    return pd.DataFrame(
        {
            "doc_a": pd.Series([r[0] for r in out], dtype="int64"),
            "doc_b": pd.Series([r[1] for r in out], dtype="int64"),
            "jaccard_e6": pd.Series([r[2] for r in out], dtype="int64"),
        }
    )


def _est_pairs_in_partition(g: pd.DataFrame, threshold: float, num_perm: int) -> pd.DataFrame:
    """Signature-agreement verification within one coarse partition:
    estimated Jaccard = matching signature components / num_perm. The
    payload per row is the FIXED num_perm×8-byte signature, so the
    shuffle stays 100-TB-safe regardless of doc length."""
    sizes = g.groupby(["band", "key"])["doc_id"].transform("size")
    cand = g[sizes >= 2]
    # unique pairs / one signature per doc (see _pairs_in_partition)
    sig_of: dict[int, np.ndarray] = {}
    pairs: set[tuple[int, int]] = set()
    for _, grp in cand.groupby(["band", "key"]):
        gids = grp["doc_id"].to_numpy()
        for did, s in zip(gids, grp["sig"]):
            if did not in sig_of:
                sig_of[int(did)] = np.asarray(s, dtype=np.uint64)
        uids = np.unique(gids)
        for ii in range(len(uids)):
            for jj in range(ii + 1, len(uids)):
                pairs.add((int(uids[ii]), int(uids[jj])))
    out: list[tuple[int, int, int]] = []
    if pairs:
        plist = sorted(pairs)
        A = np.stack([sig_of[a] for a, _ in plist])
        B = np.stack([sig_of[b] for _, b in plist])
        matches = (A == B).sum(axis=1)
        for (a, b), m in zip(plist, matches):
            if m / num_perm >= threshold:
                out.append((a, b, int(m) * 1_000_000 // num_perm))
    return pd.DataFrame(
        {
            "doc_a": pd.Series([r[0] for r in out], dtype="int64"),
            "doc_b": pd.Series([r[1] for r in out], dtype="int64"),
            "jaccard_e6": pd.Series([r[2] for r in out], dtype="int64"),
        }
    )


def _cand_pairs_in_partition(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs (no verification) within one coarse partition —
    the pair-generation half of ``_pairs_in_partition`` for the
    join-verify mode, over payload-free band rows."""
    sizes = g.groupby(["band", "key"])["doc_id"].transform("size")
    cand = g[sizes >= 2]
    pairs: set[tuple[int, int]] = set()
    for _, grp in cand.groupby(["band", "key"]):
        uids = np.unique(grp["doc_id"].to_numpy())
        for ii in range(len(uids)):
            for jj in range(ii + 1, len(uids)):
                pairs.add((int(uids[ii]), int(uids[jj])))
    plist = sorted(pairs)
    return pd.DataFrame(
        {
            "doc_a": pd.Series([p[0] for p in plist], dtype="int64"),
            "doc_b": pd.Series([p[1] for p in plist], dtype="int64"),
        }
    )


class ShingleEmitter:
    """Stateful map_batches stage: (doc_id, shingle-hash set) rows —
    the 1× corpus-payload side of the join-verify exchange."""

    def __init__(self, id_col: str, text_col: str, shingle_k: int):
        self.id_col, self.text_col, self.k = id_col, text_col, shingle_k
        self._tok_cache: dict[str, int] = {}

    def __call__(self, batch) -> "pa.Table":
        import pyarrow as pa

        if len(self._tok_cache) > 1_000_000:
            self._tok_cache.clear()
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        payloads = [
            _shingle_hashes(t, self.k, self._tok_cache) for t in texts
        ]
        offsets = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in payloads], out=offsets[1:])
        values = (
            np.concatenate(payloads) if ids else np.empty(0, dtype=np.uint64)
        )
        neg = np.full(len(ids), -1, dtype=np.int64)
        return pa.table(
            {
                "doc": pa.array(np.asarray(ids, dtype=np.int64)),
                "a": pa.array(neg),
                "b": pa.array(neg),
                "sh": pa.LargeListArray.from_arrays(
                    pa.array(offsets, pa.int64()), pa.array(values, pa.uint64())
                ),
            }
        )


def _verify_pairs_join(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    shingle_k: int,
    threshold: float,
    concurrency: int,
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact-Jaccard verification of candidate ``pairs`` WITHOUT
    shipping shingles through the band shuffle: the shingle stream is
    recomputed once (pruned read, actor pool) and crosses exactly ONE
    doc-bucketed exchange at 1× corpus payload; need-rows (two per
    pair) pick up their doc's shingles in-partition, then ONE
    pair-bucketed exchange computes Jaccard with both sides present.
    Bit-identical to ``verify="exact"`` (same candidates, same
    intersect arithmetic) — parity-tested."""
    import pyarrow as pa

    def needs(df: pd.DataFrame) -> "pa.Table":
        doc = np.concatenate([df["doc_a"].to_numpy(), df["doc_b"].to_numpy()])
        a = np.tile(df["doc_a"].to_numpy(), 2)
        b = np.tile(df["doc_b"].to_numpy(), 2)
        empty = pa.LargeListArray.from_arrays(
            pa.array(np.zeros(len(doc) + 1, dtype=np.int64), pa.int64()),
            pa.array(np.empty(0, dtype=np.uint64), pa.uint64()),
        )
        return pa.table(
            {
                "doc": pa.array(doc.astype(np.int64)),
                "a": pa.array(a.astype(np.int64)),
                "b": pa.array(b.astype(np.int64)),
                "sh": empty,
            }
        )

    shingles = ds.map_batches(
        ShingleEmitter,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, shingle_k=shingle_k
        ),
        batch_format="pyarrow",
        concurrency=_pool_size(concurrency),
    )
    tagged = pairs.map_batches(needs, batch_format="pandas").union(shingles)

    def add_doc_b(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        part = pc.cast(
            pc.bit_wise_and(t["doc"], np.int64(n_buckets - 1)), pa.int32()
        )
        return t.append_column("__p", part)

    def attach(g: pd.DataFrame) -> "pa.Table":
        is_sh = g["a"].to_numpy() == -1
        sh_of = {
            int(d): np.asarray(s, dtype=np.uint64)
            for d, s in zip(g["doc"][is_sh], g["sh"][is_sh])
        }
        need = g[~is_sh]
        docs = need["doc"].to_numpy()
        payloads = [sh_of.get(int(d), np.empty(0, np.uint64)) for d in docs]
        offsets = np.zeros(len(docs) + 1, dtype=np.int64)
        np.cumsum([len(p) for p in payloads], out=offsets[1:])
        values = (
            np.concatenate(payloads) if len(docs) else np.empty(0, np.uint64)
        )
        return pa.table(
            {
                "a": pa.array(need["a"].to_numpy().astype(np.int64)),
                "b": pa.array(need["b"].to_numpy().astype(np.int64)),
                "sh": pa.LargeListArray.from_arrays(
                    pa.array(offsets, pa.int64()), pa.array(values, pa.uint64())
                ),
            }
        )

    def add_pair_b(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        part = pc.cast(
            pc.bit_wise_and(
                pc.add(pc.multiply(t["a"], np.int64(1_000_003)), t["b"]),
                np.int64(n_buckets - 1),
            ),
            pa.int32(),
        )
        return t.append_column("__p", part)

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out: list[tuple[int, int, int]] = []
        for (a, b), grp in g.groupby(["a", "b"]):
            shs = [np.asarray(s, dtype=np.uint64) for s in grp["sh"]]
            if len(shs) != 2:
                continue
            A, B = shs
            inter = len(np.intersect1d(A, B, assume_unique=True))
            union = len(A) + len(B) - inter
            if union and inter / union >= threshold:
                out.append((int(a), int(b), inter * 1_000_000 // union))
        return pd.DataFrame(
            {
                "doc_a": pd.Series([r[0] for r in out], dtype="int64"),
                "doc_b": pd.Series([r[1] for r in out], dtype="int64"),
                "jaccard_e6": pd.Series([r[2] for r in out], dtype="int64"),
            }
        )

    attached = (
        tagged.map_batches(add_doc_b, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(attach, batch_format="pandas")
    )
    return (
        attached.map_batches(add_pair_b, batch_format="pyarrow")
        .groupby("__p")
        .map_groups(verify, batch_format="pandas")
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
    verify: str = "exact",
) -> "ray.data.Dataset":
    """All document pairs with distinct-``k``-token-shingle Jaccard ≥
    ``threshold`` → (doc_a, doc_b, jaccard_e6), doc_a < doc_b.

    Recall is governed by the banding: P(candidate | J) =
    1-(1-J^r)^b with r = num_perm/bands; at the 128/32 default a
    J=0.7 pair is missed w.p. ≈1.5e-4.

    ``verify="exact"``: band rows carry the doc's shingle-hash set and
    pairs are verified by exact Jaccard (precision 1; SQL-reproducible
    — the driver oracle uses this mode). Payload grows with doc length
    × bands, fine to ~TB scale.
    ``verify="estimate"``: band rows carry only the fixed
    num_perm×8-byte signature; Jaccard is estimated by signature
    agreement (stderr ≈ sqrt(J(1-J)/num_perm) ≈ 0.04 at J=0.7). The
    constant-payload mode.
    ``verify="join"``: band rows carry NOTHING (16 bytes/row through
    the band shuffle); candidate pairs are generated first, then
    verified by exact Jaccard via ``_verify_pairs_join`` — the shingle
    stream crosses ONE exchange at 1× corpus payload instead of
    ``bands``×. Bit-identical results to ``verify="exact"``
    (parity-tested); the 100-TB EXACT mode."""
    assert verify in ("exact", "estimate", "join")
    carry = {"exact": "shingles", "estimate": "signature", "join": "none"}[verify]
    banded = ds.map_batches(
        MinHashBander,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, shingle_k=shingle_k,
            num_perm=num_perm, bands=bands, seed=seed, carry=carry,
        ),
        batch_format="pyarrow",
        concurrency=_pool_size(concurrency),
    )

    def add_part(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        part = pc.cast(pc.bit_wise_and(t["key"], 63), pa.int32())
        return t.append_column("__part", part)

    if verify == "join":
        cands = (
            banded.map_batches(add_part, batch_format="pyarrow")
            .groupby("__part")
            .map_groups(
                lambda g: _cand_pairs_in_partition(g.drop(columns="__part")),
                batch_format="pandas",
            )
        )
        pairs = dedup_exact(cands, ["doc_a", "doc_b"])
        return _verify_pairs_join(
            ds, pairs, id_col, text_col, shingle_k, threshold, concurrency
        )

    if verify == "exact":
        in_partition = lambda g: _pairs_in_partition(g.drop(columns="__part"), threshold)  # noqa: E731
    else:
        in_partition = lambda g: _est_pairs_in_partition(g.drop(columns="__part"), threshold, num_perm)  # noqa: E731

    pairs = (
        banded.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(in_partition, batch_format="pandas")
    )
    return dedup_exact(pairs, ["doc_a", "doc_b"])


# --------------------------------------------------------------- simhash


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR; numpy<2 has no bitwise_count)."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


_BITPOS64 = np.arange(64, dtype=np.uint64)


def simhash64_batch(texts, cache: dict | None = None) -> np.ndarray:
    """Vectorized 64-bit SimHash per text over distinct whitespace
    tokens: token hashes are cached across the batch, then each doc is
    one [T, 64] bit-matrix sum + majority vote (no per-token Python
    bit loop). Returns uint64 [n]."""
    cache = {} if cache is None else cache
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, text in enumerate(texts):
        toks = set(text.strip().split())
        if not toks:
            continue
        hs = np.fromiter(
            (
                cache[t] if t in cache else cache.setdefault(t, stable_hash64(t))
                for t in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        ones = ((hs[:, None] >> _BITPOS64[None, :]) & np.uint64(1)).sum(axis=0)
        sig_bits = (2 * ones > len(toks)).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(sig_bits << _BITPOS64)
    return out


class SimHasher:
    """64-bit SimHash over distinct whitespace tokens + bit-slice bands.
    Emits ``n_bands`` rows per doc: (doc_id, band, key, sig, __part) —
    ``__part`` is a coarse 64-way hash of (band, key) so verification
    runs as 64 partition tasks, never one ``map_groups`` call per
    (mostly singleton) fine bucket. Token hashes are cached per actor
    across batches (the stateful-stage shape)."""

    def __init__(
        self, id_col: str = "doc_id", text_col: str = "text", n_bands: int = 8,
        emit: str = "bands",
    ):
        assert emit in ("bands", "sigs")
        self.id_col, self.text_col, self.n_bands = id_col, text_col, n_bands
        assert 64 % n_bands == 0
        self.band_bits = 64 // n_bands
        self.emit = emit
        self._cache: dict[str, int] = {}

    @staticmethod
    def simhash64(text: str) -> int:
        return int(simhash64_batch([text])[0])

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = simhash64_batch(list(df[self.text_col]), cache=self._cache)
        if len(self._cache) > 1_000_000:  # bound actor memory
            self._cache.clear()
        if self.emit == "sigs":  # one (doc_id, sig) row per doc
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(df[self.id_col].to_numpy(), dtype="int64"),
                    "sig": pd.Series(sigs.view(np.int64), dtype="int64"),
                }
            )
        n = len(df)
        nb = self.n_bands
        mask = np.uint64((1 << self.band_bits) - 1)
        ids = np.repeat(df[self.id_col].to_numpy(), nb)
        bands = np.tile(np.arange(nb, dtype=np.int64), n)
        rep_sigs = np.repeat(sigs, nb)
        keys = (rep_sigs >> (bands.astype(np.uint64) * np.uint64(self.band_bits))) & mask
        with np.errstate(over="ignore"):
            part = _splitmix64(keys * np.uint64(nb) + bands.astype(np.uint64)) & np.uint64(63)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "band": pd.Series(bands, dtype="int64"),
                "key": pd.Series(keys.astype(np.int64), dtype="int64"),
                "sig": pd.Series(rep_sigs.view(np.int64), dtype="int64"),
                "__part": pd.Series(part.astype(np.int64), dtype="int64"),
            }
        )


def _simhash_pairs_in_partition(g: pd.DataFrame, hamming_thresh: int) -> pd.DataFrame:
    """Popcount verification within one COARSE partition: filter to
    (band, key) buckets with ≥2 docs, then vectorized pairwise XOR +
    popcount per bucket (same shape as ``_pairs_in_partition``)."""
    empty = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "hamming": pd.Series([], dtype="int64"),
        }
    )
    sizes = g.groupby(["band", "key"])["doc_id"].transform("size")
    cand = g[sizes >= 2]
    if not len(cand):
        return empty
    # Dense corpora have big near-dup clusters: the same id set shows
    # up as a bucket in several bands of this partition (an exact-dup
    # cluster shares ALL band keys). Dedup buckets by content, encode
    # pairs as single int64 codes over the partition's unique-id index
    # (np.unique on 1-D codes ≫ faster than a 2-column lexsort), and
    # popcount each surviving pair once via vectorized sig lookup.
    ids_all = cand["doc_id"].to_numpy()
    uid, first_idx = np.unique(ids_all, return_index=True)
    usig = cand["sig"].to_numpy()[first_idx].view(np.uint64)
    n_uid = np.int64(len(uid))
    seen_buckets: set[int] = set()
    code_parts: list[np.ndarray] = []
    for _, grp in cand.groupby(["band", "key"]):
        u = np.unique(grp["doc_id"].to_numpy())
        if len(u) < 2:
            continue
        bkey = hash(u.tobytes())
        if bkey in seen_buckets:
            continue
        seen_buckets.add(bkey)
        idx = np.searchsorted(uid, u).astype(np.int64)
        ii, jj = np.triu_indices(len(idx), k=1)
        code_parts.append(idx[ii] * n_uid + idx[jj])
    if not code_parts:
        return empty
    codes = np.unique(np.concatenate(code_parts))
    ai, bi = codes // n_uid, codes % n_uid
    ham = popcount64(usig[ai] ^ usig[bi])
    keep = ham <= hamming_thresh
    return pd.DataFrame(
        {
            "doc_a": pd.Series(uid[ai[keep]], dtype="int64"),
            "doc_b": pd.Series(uid[bi[keep]], dtype="int64"),
            "hamming": pd.Series(ham[keep].astype(np.int64), dtype="int64"),
        }
    )


def simhash_dups(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    hamming_thresh: int = 7,
    n_bands: int | None = None,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Document pairs with SimHash hamming distance ≤ ``hamming_thresh``
    → (doc_a, doc_b, hamming). With ``n_bands`` bit-slice bands any
    pair at hamming ≤ n_bands-1 shares at least one exact band
    (pigeonhole), so recall is 1 for ``hamming_thresh ≤ n_bands-1``;
    popcount verification makes precision 1.

    ``n_bands`` defaults to the SMALLEST band count whose pigeonhole
    guarantee covers ``hamming_thresh`` — fewer bands mean wider band
    keys, and candidate collisions fall roughly quadratically with key
    width. On a template-heavy corpus this is the difference between
    ~30M and ~100k candidate pairs for the same 80k true pairs
    (measured at sf0.1, thresh=3: 8-bit keys vs 16-bit keys).

    Co-bucketing under bit-slice banding depends ONLY on the signature
    VALUES, so pair discovery runs over DISTINCT signatures: per-doc
    sigs → groupby sig (ids per signature) → band + verify the distinct
    sigs (tiny: ``d ≤ docs``, far smaller on dup-heavy corpora — the
    whole point of the op) → expand value pairs back to id pairs. A
    dup-heavy corpus (cluster of m same-sig docs) costs O(d²/bucket) +
    the inherent O(output) expansion instead of O(m²) per band; and
    because each doc has exactly one signature, expanded pairs are
    already unique — the output needs NO dedup shuffle."""
    if n_bands is None:
        n_bands = next(b for b in (2, 4, 8, 16, 32, 64) if b - 1 >= hamming_thresh)
    sig_rows = ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, n_bands=n_bands, emit="sigs"
        ),
        batch_format="pandas",
        concurrency=_pool_size(concurrency),
    ).materialize()  # (doc_id, sig), 16 B/row; read by 3 branches below

    import pyarrow as pa

    # THREE exchanges total (each ~seconds of fixed cost on this box —
    # operator count, not data volume, dominates small-corpus runs and
    # sets the per-stage floor at scale):
    #  1. discovery: band NEAR-distinct sig rows (batch-local dedup
    #     here, in-partition np.unique completes it — no dedicated
    #     distinct-sig shuffle) -> verified (sig_a, sig_b, hamming)
    #     value pairs;
    #  2. expansion step 1, bucketed on sig_a: pair dedup (multi-band
    #     rediscoveries share sig_a, hence the bucket), sig_a -> doc
    #     fan-out, AND self pairs (all docs of one sig share its
    #     bucket) — three jobs, one exchange;
    #  3. expansion step 2, bucketed on sig_b: fan-out to doc_b;
    #     finished self rows pass through untouched.
    band_bits = 64 // n_bands

    def band_local_distinct(df: pd.DataFrame) -> pd.DataFrame:
        u = df[["sig"]].drop_duplicates()
        sigs = u["sig"].to_numpy()
        n = len(u)
        mask = np.uint64((1 << band_bits) - 1)
        bands = np.tile(np.arange(n_bands, dtype=np.int64), n)
        rep = np.repeat(sigs, n_bands)
        keys = (rep.view(np.uint64) >> (bands.astype(np.uint64) * np.uint64(band_bits))) & mask
        with np.errstate(over="ignore"):
            part = _splitmix64(keys * np.uint64(n_bands) + bands.astype(np.uint64)) & np.uint64(63)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(rep, dtype="int64"),  # the sig, as id
                "band": pd.Series(bands, dtype="int64"),
                "key": pd.Series(keys.astype(np.int64), dtype="int64"),
                "sig": pd.Series(rep, dtype="int64"),
                "__part": pd.Series(part.astype(np.int64), dtype="int64"),
            }
        )

    def discover(g: pd.DataFrame):
        out = _simhash_pairs_in_partition(
            g.drop(columns="__part"), hamming_thresh
        ).rename(columns={"doc_a": "sig_a", "doc_b": "sig_b"})
        schema = pa.schema(
            [("sig_a", pa.int64()), ("sig_b", pa.int64()), ("hamming", pa.int64())]
        )
        return pa.Table.from_pandas(
            out.astype({"sig_a": "int64", "sig_b": "int64", "hamming": "int64"}),
            schema=schema, preserve_index=False,
        )

    value_pairs = (
        sig_rows.map_batches(band_local_distinct, batch_format="pandas")
        .groupby("__part")
        .map_groups(discover, batch_format="pandas")
    )

    nb_x = 16

    def _bucket_on(vals) -> pd.Series:
        h = _splitmix64(np.asarray(vals, dtype=np.int64).view(np.uint64)) % np.uint64(nb_x)
        return pd.Series(h.astype(np.int64))

    X1 = pa.schema(
        [("ida", pa.int64()), ("v2", pa.int64()), ("hamming", pa.int64()),
         ("fin", pa.int64())]
    )

    def tag_pairs1(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "__k": df["sig_a"].astype("int64"),
                "v2": df["sig_b"].astype("int64"),
                "hamming": df["hamming"].astype("int64"),
                "doc": np.int64(0),
                "__side": "l",
            }
        )
        out["__b"] = _bucket_on(out["__k"]) if len(out) else pd.Series([], dtype="int64")
        return out

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "__k": df["sig"].astype("int64"),
                "v2": np.int64(0),
                "hamming": np.int64(0),
                "doc": df["doc_id"].astype("int64"),
                "__side": "r",
            }
        )
        out["__b"] = _bucket_on(out["__k"]) if len(out) else pd.Series([], dtype="int64")
        return out

    def apply1(g: pd.DataFrame):
        rg = g[g["__side"] == "r"][["__k", "doc"]]
        lg = g[g["__side"] == "l"][["__k", "v2", "hamming"]].drop_duplicates()
        # self pairs: every two docs sharing a signature (hamming 0)
        m = rg.merge(rg, on="__k")
        m = m[m["doc_x"] < m["doc_y"]]
        selfp = pd.DataFrame(
            {
                "ida": m["doc_x"].astype("int64").to_numpy(),
                "v2": m["doc_y"].astype("int64").to_numpy(),
                "hamming": np.zeros(len(m), dtype=np.int64),
                "fin": np.ones(len(m), dtype=np.int64),
            }
        )
        # cross partials: sig_a -> its docs
        c = lg.merge(rg, on="__k")
        crossp = pd.DataFrame(
            {
                "ida": c["doc"].astype("int64").to_numpy(),
                "v2": c["v2"].astype("int64").to_numpy(),
                "hamming": c["hamming"].astype("int64").to_numpy(),
                "fin": np.zeros(len(c), dtype=np.int64),
            }
        )
        return pa.Table.from_pandas(
            pd.concat([selfp, crossp], ignore_index=True), schema=X1,
            preserve_index=False,
        )

    stage1 = (
        value_pairs.map_batches(tag_pairs1, batch_format="pandas")
        .union(sig_rows.map_batches(tag_docs, batch_format="pandas"))
        .groupby("__b")
        .map_groups(apply1, batch_format="pandas")
    )

    OUT = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
    )

    def tag_partials2(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "__k": df["v2"].astype("int64"),
                "ida": df["ida"].astype("int64"),
                "hamming": df["hamming"].astype("int64"),
                "fin": df["fin"].astype("int64"),
                "doc": np.int64(0),
                "__side": "l",
            }
        )
        out["__b"] = _bucket_on(out["__k"]) if len(out) else pd.Series([], dtype="int64")
        return out

    def tag_docs2(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "__k": df["sig"].astype("int64"),
                "ida": np.int64(0),
                "hamming": np.int64(0),
                "fin": np.int64(0),
                "doc": df["doc_id"].astype("int64"),
                "__side": "r",
            }
        )
        out["__b"] = _bucket_on(out["__k"]) if len(out) else pd.Series([], dtype="int64")
        return out

    def apply2(g: pd.DataFrame):
        lg = g[g["__side"] == "l"]
        rg = g[g["__side"] == "r"][["__k", "doc"]]
        fin = lg[lg["fin"] == 1]
        done = pd.DataFrame(
            {
                "doc_a": fin["ida"].astype("int64").to_numpy(),
                "doc_b": fin["__k"].astype("int64").to_numpy(),
                "hamming": fin["hamming"].astype("int64").to_numpy(),
            }
        )
        c = lg[lg["fin"] == 0][["__k", "ida", "hamming"]].merge(rg, on="__k")
        a = c["ida"].to_numpy()
        b = c["doc"].to_numpy()
        cross = pd.DataFrame(
            {
                "doc_a": np.minimum(a, b).astype(np.int64),
                "doc_b": np.maximum(a, b).astype(np.int64),
                "hamming": c["hamming"].astype("int64").to_numpy(),
            }
        )
        return pa.Table.from_pandas(
            pd.concat([done, cross], ignore_index=True), schema=OUT,
            preserve_index=False,
        )

    return (
        stage1.map_batches(tag_partials2, batch_format="pandas")
        .union(sig_rows.map_batches(tag_docs2, batch_format="pandas"))
        .groupby("__b")
        .map_groups(apply2, batch_format="pandas")
    )


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


class _HyperplaneBander:
    """L independent random-hyperplane hash tables per vector (planes
    generated once per actor). Emits L rows per vector:
    (id, table, bucket, emb, __part) — ``__part`` is a coarse 64-way
    hash of (table, bucket) for partition-level verification. Exact
    scalar multiples of a vector get identical sign patterns in every
    table, so exact-direction duplicates are recalled with p=1."""

    def __init__(
        self,
        id_col: str,
        emb_col: str,
        dim: int,
        n_planes: int = 8,
        n_tables: int = 4,
        seed: int = 42,
    ):
        rng = np.random.default_rng(seed)
        # [L, dim, p] plane stack, one slab per table
        self.planes = rng.standard_normal((n_tables, dim, n_planes)).astype(np.float32)
        self.id_col, self.emb_col = id_col, emb_col
        self.n_planes, self.n_tables = n_planes, n_tables

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        M = np.asarray(list(df[self.emb_col]), dtype=np.float32)
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        M = M / nrm
        n = len(df)
        ids = df[self.id_col].to_numpy()
        out = {"vec_id": [], "table": [], "bucket": [], "emb": [], "__part": []}
        weights = (np.int64(1) << np.arange(self.n_planes, dtype=np.int64))
        for t in range(self.n_tables):
            bits = (M @ self.planes[t]) > 0  # [n, p]
            buckets = bits.astype(np.int64) @ weights
            out["vec_id"].append(ids)
            out["table"].append(np.full(n, t, dtype=np.int64))
            out["bucket"].append(buckets)
            out["emb"].extend([M[i] for i in range(n)])
            with np.errstate(over="ignore"):
                combined = buckets.astype(np.uint64) * np.uint64(self.n_tables) + np.uint64(t)
                out["__part"].append((_splitmix64(combined) & np.uint64(63)).astype(np.int64))
        return pd.DataFrame(
            {
                "vec_id": pd.Series(np.concatenate(out["vec_id"]), dtype="int64"),
                "table": pd.Series(np.concatenate(out["table"]), dtype="int64"),
                "bucket": pd.Series(np.concatenate(out["bucket"]), dtype="int64"),
                "emb": out["emb"],
                "__part": pd.Series(np.concatenate(out["__part"]), dtype="int64"),
            }
        )


def _emb_pairs_in_partition(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Cosine verification within one coarse partition: filter to
    (table, bucket) cells with ≥2 vectors, one matmul per cell."""
    out: list[tuple[int, int, float]] = []
    sizes = g.groupby(["table", "bucket"])["vec_id"].transform("size")
    cand = g[sizes >= 2]
    for _, grp in cand.groupby(["table", "bucket"]):
        ids = grp["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.stack([np.asarray(e, dtype=np.float32) for e in grp["emb"]])[order]
        S = M @ M.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = (S[ii, jj] >= threshold) & (ids[ii] != ids[jj])
        for x, y, s in zip(ii[keep], jj[keep], S[ii, jj][keep]):
            out.append((int(ids[x]), int(ids[y]), round(float(s), 6)))
    return pd.DataFrame(
        {
            "id_a": pd.Series([r[0] for r in out], dtype="int64"),
            "id_b": pd.Series([r[1] for r in out], dtype="int64"),
            "cosine": pd.Series([r[2] for r in out], dtype="float64"),
        }
    )


def embedding_neardup(
    ds: "ray.data.Dataset",
    threshold: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Near-duplicate vector pairs (cosine ≥ threshold) → (id_a, id_b,
    cosine), id_a < id_b, via multi-table random-hyperplane LSH: each
    vector lands in ``n_tables`` independent sign-pattern buckets; only
    same-bucket candidates are verified (one matmul per non-singleton
    cell inside a coarse 64-way partition). NO driver materialization
    and no O(corpus) broadcast — the shuffle payload is n_tables ×
    (normalized vector + two int keys) per row, fixed-size.

    Recall: a plane separates a pair at angle θ w.p. θ/π; for
    cosine ≥ 0.9 (θ ≤ 25.8°, p_sep ≤ .084) a table keeps the pair w.p.
    ≥ (1-.084)^8 ≈ .50, so 4 tables give recall ≥ 1-(1-.50)^4 ≈ .94 —
    and EXACT-direction duplicates (scalar multiples) share every sign
    pattern, so their recall is 1. Verification is exact cosine, so
    precision is 1. Scale by raising ``n_tables`` (recall) and
    ``n_planes`` (bucket size ≈ n / 2^p per table)."""
    banded = ds.map_batches(
        _HyperplaneBander,
        fn_constructor_kwargs=dict(
            id_col=id_col, emb_col=emb_col, dim=dim,
            n_planes=n_planes, n_tables=n_tables, seed=seed,
        ),
        batch_format="pandas",
        concurrency=_pool_size(concurrency),
    )
    pairs = banded.groupby("__part").map_groups(
        lambda g: _emb_pairs_in_partition(g.drop(columns="__part"), threshold),
        batch_format="pandas",
    )
    return dedup_exact(pairs, ["id_a", "id_b"])


def semantic_dedup(
    ds: "ray.data.Dataset",
    vec_col: str = "embedding",
    group_col: str = "label",
    id_col: str = "vec_id",
    thresh_num: int = 95,
    thresh_den: int = 100,
    scale: int = 100,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic dedup: within each cluster, drop a
    vector when ANY lower-id vector of the same cluster is cosine-
    similar above ``thresh_num/thresh_den`` (the order-independent
    EXISTS semantics — exactly SQL-checkable, unlike the sequential
    greedy chain). ``group_col`` is the cluster id — at scale the
    output of ``kmeans_assign`` (SemDeDup's design: k-means buckets
    the corpus so the quadratic step runs per cluster); here the
    embeddings table's ``label`` column stands in.

    Exactness: embeddings are quantized to ``floor(x·scale)`` int64
    and the cosine test is cross-multiplied —
    ``dot > 0 AND den²·dot² ≥ num²·|u|²|v|²`` — so every comparison is
    integer arithmetic, bit-equal between numpy and the DuckDB oracle
    (all magnitudes < 2⁵³, exact in SQL doubles too). No float
    boundary flakiness at the threshold.

    Shape: ONE bucketed exchange on the cluster id co-locates each
    cluster; per cluster a single int64 Gram matmul + lower-triangle
    scan. Cluster sizes are the k-means granularity knob — the same
    skew contract as SemDeDup's; pick k so clusters fit a task.
    Output: the KEPT ``(id, group)`` rows.
    """

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    num2 = thresh_num * thresh_num
    den2 = thresh_den * thresh_den

    def prune(part: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        keep_ids, keep_grp = [], []
        for gval, g in part.groupby(group_col, sort=False):
            g = g.sort_values(id_col)
            q = np.floor(
                np.stack(g[vec_col].to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            d = q @ q.T  # int64 Gram matrix
            nn = np.diag(d)
            # dup[i, j] (i earlier than j): cosine ≥ threshold, exact
            dup = (d > 0) & (den2 * d * d >= num2 * np.outer(nn, nn))
            # drop column j when ANY row i < j (earlier id) is similar:
            # strict upper triangle holds exactly the (earlier, later)
            # pairs after the id sort
            drop = np.triu(dup, k=1).any(axis=0)
            keep_ids.extend(g[id_col].to_numpy()[~drop])
            keep_grp.extend([gval] * int((~drop).sum()))
        return pa.Table.from_pydict(
            {id_col: np.array(keep_ids, dtype=np.int64),
             group_col: np.array(keep_grp)},
            schema=pa.schema([(id_col, pa.int64()), (group_col, pa.int32())]),
        ).to_pandas()

    return (
        ds.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(prune, batch_format="pandas")
    )

def containment_pairs(
    tokens: "ray.data.Dataset",
    id_col: str = "id",
    token_col: str = "token",
    threshold: float = 0.8,
    max_df: int | None = None,
    assume_distinct: bool = False,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Directional set-CONTAINMENT join over a pre-tokenized
    (id, token) table: all ordered pairs (a, b) with
    |T(a) ∩ T(b)| / |T(a)| ≥ threshold — the quote / boilerplate-wrap
    / subset-document detector the symmetric Jaccard ops miss (a short
    doc fully inside a long one has low Jaccard but containment 1.0).
    Integer-exact: emits containment_e6 = ⌊inter·10⁶ / |T(a)|⌋ and the
    filter is the cross-multiplied inter·10⁶ ≥ thresh_e6·|T(a)|.

    Scale shape: EXACT intersection counts from the postings exchange
    itself — per-token groups emit per-batch pre-aggregated unordered
    pair counts (Σ over tokens = |A∩B|), ONE pair-bucketed count
    aggregate, then two task hash_joins attach |T(a)| / |T(b)| and the
    directional filter fans each unordered pair into 0–2 ordered rows.
    No set payload ever ships; candidate volume is Σ_t df(t)² — the
    co-citation/cooc bound. Hot tokens dominate it: ``max_df`` drops
    tokens with document frequency > max_df from BOTH the postings and
    the sizes (containment over the df-capped vocabulary — the
    standard stopword-cap semantic, documented, SQL-reproducible).
    Unless ``assume_distinct``, (id, token) rows are globally deduped
    first (duplicate rows would inflate counts). Ids must be int64
    (the pair exchanges emit typed integer frames)."""
    thresh_e6 = int(round(threshold * 1_000_000))
    if not assume_distinct:
        from fastie_ray.ops.dedup import dedup_exact

        tokens = dedup_exact(tokens, [id_col, token_col], n_buckets=n_buckets)

    if max_df is not None:
        # df per token (one token-bucketed count) → broadcast-free
        # heavy-token DROP folded into the postings scan via a task
        # anti-join (heavy set is usually tiny but unbounded in theory)
        from fastie_ray.ops.join import hash_join

        def df_partial(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(token_col, as_index=False).size()
            return out.rename(columns={"size": "n"})

        def add_bt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            if len(df) == 0:
                df["__b"] = np.array([], dtype=np.int64)
                return df
            h = pd.util.hash_pandas_object(
                df[token_col], index=False
            ).to_numpy()
            df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
            return df

        def heavy(g: pd.DataFrame) -> pd.DataFrame:
            out = g.drop(columns="__b").groupby(
                token_col, as_index=False
            )["n"].sum()
            return out.loc[out["n"] > max_df, [token_col]]

        heavy_ds = (
            tokens.map_batches(df_partial, batch_format="pandas")
            .map_batches(add_bt, batch_format="pandas")
            .groupby("__b")
            .map_groups(heavy, batch_format="pandas")
        )
        tokens = hash_join(
            tokens, heavy_ds, on=token_col, how="anti",
            left_cols=[id_col, token_col], n_buckets=n_buckets,
        )

    tokens = tokens.repartition(n_buckets).materialize()

    # |T(id)| sizes: per-batch combiner → one id-bucketed exchange
    def sz_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(id_col, as_index=False).size()
        return out.rename(columns={"size": "n"})

    def add_bi(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[id_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def sz_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(id_col, as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    sizes = (
        tokens.map_batches(sz_partial, batch_format="pandas")
        .map_batches(add_bi, batch_format="pandas")
        .groupby("__b")
        .map_groups(sz_final, batch_format="pandas")
    )

    # postings exchange: per-token unordered pair counts, pre-aggregated
    def add_bt2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[token_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        m = g.merge(g, on=token_col, suffixes=("_1", "_2"))
        m = m[m[id_col + "_1"] < m[id_col + "_2"]]
        if len(m) == 0:
            return pd.DataFrame(
                {"ia": pd.Series([], dtype="int64"),
                 "ib": pd.Series([], dtype="int64"),
                 "inter": pd.Series([], dtype="int64")}
            )
        out = (
            m.groupby([id_col + "_1", id_col + "_2"], as_index=False)
            .size()
            .rename(columns={id_col + "_1": "ia", id_col + "_2": "ib",
                             "size": "inter"})
        )
        out["inter"] = out["inter"].astype("int64")
        return out

    def add_bp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = (
            pd.util.hash_pandas_object(df["ia"], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(df["ib"], index=False).to_numpy()
        )
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def inter_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(["ia", "ib"], as_index=False)[
            "inter"
        ].sum()
        out["inter"] = out["inter"].astype("int64")
        return out

    inter = (
        tokens.map_batches(add_bt2, batch_format="pandas")
        .groupby("__b")
        .map_groups(pair_counts, batch_format="pandas")
        .map_batches(add_bp, batch_format="pandas")
        .groupby("__b")
        .map_groups(inter_final, batch_format="pandas")
    )

    from fastie_ray.ops.join import hash_join

    with_na = hash_join(
        inter, sizes, on="ia", right_on=id_col,
        left_cols=["ia", "ib", "inter"], right_cols=[id_col, "n"],
        n_buckets=n_buckets,
    )
    with_nb = hash_join(
        with_na, sizes, on="ib", right_on=id_col,
        left_cols=["ia", "ib", "inter", "n"], right_cols=[id_col, "n"],
        n_buckets=n_buckets, suffix="_b",
    )

    def directional(df: pd.DataFrame):
        import pyarrow as pa

        inter_v = df["inter"].to_numpy(dtype=np.int64)
        na = df["n"].to_numpy(dtype=np.int64)
        nb = df["n_b"].to_numpy(dtype=np.int64)
        ia = df["ia"].to_numpy(dtype=np.int64)
        ib = df["ib"].to_numpy(dtype=np.int64)
        fwd = inter_v * 1_000_000 >= thresh_e6 * na
        rev = inter_v * 1_000_000 >= thresh_e6 * nb
        out = pd.DataFrame(
            {
                "id_a": np.concatenate([ia[fwd], ib[rev]]),
                "id_b": np.concatenate([ib[fwd], ia[rev]]),
                "containment_e6": np.concatenate(
                    [
                        inter_v[fwd] * 1_000_000 // na[fwd],
                        inter_v[rev] * 1_000_000 // nb[rev],
                    ]
                ),
            }
        )
        # typed Arrow out: sparse pair blocks can be empty (NOTES 3/12)
        return pa.Table.from_pandas(
            out,
            preserve_index=False,
            schema=pa.schema(
                [("id_a", pa.int64()), ("id_b", pa.int64()),
                 ("containment_e6", pa.int64())]
            ),
        )

    return with_nb.map_batches(directional, batch_format="pandas")


def _cross_pairs_in_partition(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Exact-Jaccard verification of CROSS-SIDE candidates within one
    coarse partition (same vectorized bucket prefilter as
    ``_pairs_in_partition``, pairs restricted to increment × base)."""
    out = []
    sizes = g.groupby(["band", "key"])["doc_id"].transform("size")
    cand = g[sizes >= 2]
    payload: dict[tuple[int, int], np.ndarray] = {}
    pairs: set[tuple[int, int]] = set()
    for (_, _), grp in cand.groupby(["band", "key"]):
        sides = grp["side"].to_numpy()
        gids = grp["doc_id"].to_numpy()
        if sides.min() == sides.max():
            continue  # single-sided bucket: no cross pair
        for sd, did, sh in zip(sides, gids, grp["shingles"]):
            k = (int(sd), int(did))
            if k not in payload:
                payload[k] = np.asarray(sh, dtype=np.uint64)
        inc = np.unique(gids[sides == 1])
        bas = np.unique(gids[sides == 0])
        for i in inc:
            for b in bas:
                pairs.add((int(i), int(b)))
    for i, b in sorted(pairs):
        A, B = payload[(1, i)], payload[(0, b)]
        inter = len(np.intersect1d(A, B, assume_unique=True))
        union = len(A) + len(B) - inter
        if union and inter / union >= threshold:
            out.append((i, b, inter * 1_000_000 // union))
    return pd.DataFrame(
        {
            "inc_id": pd.Series([r[0] for r in out], dtype="int64"),
            "base_id": pd.Series([r[1] for r in out], dtype="int64"),
            "jaccard_e6": pd.Series([r[2] for r in out], dtype="int64"),
        }
    )


def minhash_dups_against(
    base: "ray.data.Dataset",
    increment: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    threshold: float = 0.7,
    seed: int = 42,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """INCREMENTAL near-dup detection: all (increment doc, base doc)
    pairs with shingle Jaccard ≥ ``threshold`` — the daily-crawl shape
    of ``minhash_lsh_dups`` (new documents checked against the
    standing corpus; the near-dup analogue of
    ``ops.dedup.dedup_against``). Same banding, same recall math, same
    exact-Jaccard verification; only cross-side pairs are generated,
    so a dup-heavy BASE costs nothing beyond its band rows.

    Scale note: both sides are banded here with the same permutation
    params, but at production scale the base's banded table is the
    artifact you PERSIST (bucketed parquet on (band, key) —
    ``ops.bucketed_io``) and only the increment is banded per run;
    the exchange and verification are unchanged. Returns
    (inc_id, base_id, jaccard_e6)."""
    from fastie_ray.ops.dedup import dedup_exact

    kw = dict(
        id_col=id_col, text_col=text_col, shingle_k=shingle_k,
        num_perm=num_perm, bands=bands, seed=seed, carry="shingles",
    )

    # ONE bander pool over the tagged union — two side-by-side pools
    # can together cover every CPU and starve their own downstream
    # exchange (NOTES fact 4, observed as a deadlock at num_cpus=8)
    def tag(side: int):
        def fn(t):
            import pyarrow as pa

            return t.append_column(
                "__side", pa.array(np.full(len(t), side, dtype=np.int32))
            )

        return fn

    tagged = base.map_batches(tag(0), batch_format="pyarrow").union(
        increment.map_batches(tag(1), batch_format="pyarrow")
    )
    banded = tagged.map_batches(
        MinHashBander,
        fn_constructor_kwargs=dict(kw, side_col="__side"),
        batch_format="pyarrow", concurrency=_pool_size(concurrency),
    )

    def add_part(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        part = pc.cast(pc.bit_wise_and(t["key"], 63), pa.int32())
        return t.append_column("__part", part)

    pairs = (
        banded
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda g: _cross_pairs_in_partition(
                g.drop(columns="__part"), threshold
            ),
            batch_format="pandas",
        )
    )
    return dedup_exact(pairs, ["inc_id", "base_id"])


def band_corpus_index(
    ds: "ray.data.Dataset",
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    seed: int = 42,
    concurrency: int = 4,
    n_parts: int = 64,
) -> str:
    """Persist the corpus's BANDED MinHash table as the standing
    near-dup INDEX: one banding pass, written as parquet partitioned
    by ``part = key & (n_parts-1)`` — the same coarse partition the
    pair search groups on, so an incremental run opens only the
    partitions its own band keys hit. Write is atomic per partition
    (data file, then the directory-level ``_BANDING.json`` manifest
    recording the banding params LAST — a reader refuses an index
    whose params don't match its own). Returns ``out_dir``."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    banded = ds.map_batches(
        MinHashBander,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, shingle_k=shingle_k,
            num_perm=num_perm, bands=bands, seed=seed, carry="shingles",
        ),
        batch_format="pyarrow",
        concurrency=_pool_size(concurrency),
    )

    def add_part(t: "pa.Table") -> "pa.Table":
        import pyarrow.compute as pc

        part = pc.cast(
            pc.bit_wise_and(t["key"], n_parts - 1), pa.int32()
        )
        return t.append_column("__part", part)

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        part = int(g["__part"].iloc[0]) if len(g) else -1
        sub = g.drop(columns="__part")
        # per-(band,key) groups stay whole inside a part by
        # construction (part is a function of key)
        pdir = os.path.join(out_dir, f"part={part}")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(sub, preserve_index=False),
            os.path.join(pdir, "data.parquet"),
        )
        return pd.DataFrame({"part": [part], "rows": [len(sub)]})

    os.makedirs(out_dir, exist_ok=True)
    manifest_rows = (
        banded.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
    )
    with open(os.path.join(out_dir, "_BANDING.json"), "w") as f:
        json.dump(
            {
                "shingle_k": shingle_k, "num_perm": num_perm,
                "bands": bands, "seed": seed, "n_parts": n_parts,
                "rows": int(manifest_rows["rows"].sum()),
            }, f,
        )
    return out_dir


def minhash_dups_against_index(
    index_dir: str,
    increment: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """The PRODUCTION shape of :func:`minhash_dups_against`: the
    standing corpus's banded table comes from a persisted
    :func:`band_corpus_index` (banding params read from the index
    manifest and applied to the increment — a param mismatch raises),
    so only the INCREMENT is shingled/banded per run. Base band rows
    load directly into the coarse partitions they were written under;
    pair generation and exact-Jaccard verification are unchanged.
    Returns (inc_id, base_id, jaccard_e6)."""
    import json
    import os

    import numpy as np
    import ray.data

    from fastie_ray.ops.dedup import dedup_exact

    with open(os.path.join(index_dir, "_BANDING.json")) as f:
        params = json.load(f)
    n_parts = int(params["n_parts"])

    def tag_base(t):
        import pyarrow as pa

        if "part" in t.column_names:  # hive partition column from read
            t = t.drop_columns(["part"])
        return t.append_column(
            "side", pa.array(np.zeros(len(t), dtype=np.int32))
        )

    base_banded = ray.data.read_parquet(index_dir).map_batches(
        tag_base, batch_format="pyarrow"
    )

    def tag_inc(t):
        import pyarrow as pa

        return t.append_column(
            "__side", pa.array(np.ones(len(t), dtype=np.int32))
        )

    inc_banded = increment.map_batches(
        tag_inc, batch_format="pyarrow"
    ).map_batches(
        MinHashBander,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col,
            shingle_k=int(params["shingle_k"]),
            num_perm=int(params["num_perm"]), bands=int(params["bands"]),
            seed=int(params["seed"]), carry="shingles", side_col="__side",
        ),
        batch_format="pyarrow",
        concurrency=_pool_size(concurrency),
    )

    def add_part(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        part = pc.cast(pc.bit_wise_and(t["key"], n_parts - 1), pa.int32())
        return t.append_column("__part", part)

    pairs = (
        base_banded.union(inc_banded)
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda g: _cross_pairs_in_partition(
                g.drop(columns="__part"), threshold
            ),
            batch_format="pandas",
        )
    )
    return dedup_exact(pairs, ["inc_id", "base_id"])


def token_sort_dups(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Token-order-insensitive exact duplicate groups: fingerprint =
    md5 of the doc's SORTED DISTINCT token list — catches shuffled
    boilerplate / reordered listicles that byte-exact dedup misses and
    MinHash wastes a banding pass on (the signature is already exact
    under permutation). Returns (doc_id, fingerprint, n_group) for
    every doc whose group has ≥ 2 members.

    Scale shape: fingerprints are fixed-size per-row state; ONE
    fingerprint-bucketed exchange groups them. The classic 'sorted
    bag-of-words key' blocking signature (record-linkage standard)."""
    import hashlib as _h

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        toks = (
            df[text_col].astype(str).str.lower().str.findall(r"[a-z0-9]+")
        )
        f = toks.map(
            lambda ts: _h.md5(" ".join(sorted(set(ts))).encode()).hexdigest()
        )
        out = pd.DataFrame({id_col: df[id_col], "fingerprint": f})
        h = pd.util.hash_pandas_object(
            out["fingerprint"], index=False
        ).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def groups(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        sz = g.groupby("fingerprint")[id_col].transform("size")
        out = g[sz >= 2].copy()
        out["n_group"] = sz[sz >= 2].astype("int64")
        return out.sort_values([("fingerprint"), id_col])

    return (
        ds.map_batches(fp, batch_format="pandas")
        .groupby("__b")
        .map_groups(groups, batch_format="pandas")
    )


def source_minhash_matrix(
    ds: "ray.data.Dataset",
    group_col: str = "source",
    text_col: str = "text",
    num_perm: int = 32,
    n_buckets: int = 8,
) -> pd.DataFrame:
    """GROUP-level similarity matrix by MinHash sketch algebra:
    estimate the token-set Jaccard between every pair of groups from
    ``num_perm`` min-hashes per group — corpus-level source similarity
    WITHOUT any doc-pair comparison (the property that makes sketch
    union the way to compare two 10-TB sources: signatures merge by
    MIN, so group sketches build in one streaming pass). Returns
    (src_a, src_b, n_match, jaccard_est_e6) for src_a < src_b.

    The permutation family is md5('mh:<perm>:<token>') truncated to 60
    bits — deliberately NOT the engine's fast splitmix family, so the
    DuckDB oracle reproduces every signature exactly with string md5.
    Scale shape: per-batch distinct (group, token) → num_perm mins per
    group per batch (groups × num_perm ints — fixed size); ONE tiny
    exchange merges by MIN; the pairwise compare runs on the
    groups² × num_perm driver table."""
    import hashlib as _h

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].str.lower().str.findall(r"[a-z0-9]+")
        t = (
            pd.DataFrame({"g": df[group_col], "tok": toks})
            .explode("tok")
            .dropna(subset=["tok"])
            .drop_duplicates()
        )
        rows = []
        for g, sub in t.groupby("g", sort=False):
            uniq = sub["tok"].unique()
            for p in range(num_perm):
                mh = min(
                    int(
                        _h.md5(f"mh:{p}:{tok}".encode()).hexdigest()[:15],
                        16,
                    )
                    for tok in uniq
                )
                rows.append((g, p, mh))
        return pd.DataFrame(rows, columns=["g", "perm", "mh"])

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    sig = parts.groupby(["g", "perm"], as_index=False)["mh"].min()
    m = sig.merge(sig, on="perm")
    m = m[m["g_x"] < m["g_y"]]
    m["match"] = (m["mh_x"] == m["mh_y"]).astype("int64")
    out = (
        m.groupby(["g_x", "g_y"], as_index=False)["match"]
        .sum()
        .rename(columns={"g_x": "src_a", "g_y": "src_b",
                         "match": "n_match"})
    )
    out["jaccard_est_e6"] = out["n_match"] * 1_000_000 // num_perm
    return out.astype(
        {"n_match": "int64", "jaccard_est_e6": "int64"}
    ).sort_values(["src_a", "src_b"]).reset_index(drop=True)
