"""Exact deduplication, hash-partitioned (SURVEY §2.7 D1).

The reference dedups by building Python ``set``s per document
(``modeling_gp.py:166-168``, ``gplinker/decode_utils.py:198``). At
engine scale that becomes: bucket rows by a stable hash of the dedup
key (ONE shuffle on a coarse bucket column, so groups stay large and
the per-group work is vectorized pandas ``drop_duplicates``), keep the
first row per key.

``pd.util.hash_pandas_object`` is deterministic across processes
(fixed default hash key), so bucket assignment is stable for resume.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_BUCKET = "__dedup_bucket"


def dedup_exact(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    n_buckets: int = 64,
    post=None,
) -> "ray.data.Dataset":
    """Distinct rows by ``keys`` (first-wins); other columns carried.

    ``n_buckets`` bounds shuffle fan-out — size it ≈ cluster cores at
    real scale so each bucket is one vectorized pandas task.

    ``post``, if given, runs on each deduped partition frame before it
    is emitted — fold a follow-up per-row transform into this exchange
    (e.g. entity linking of the deduped surfaces) instead of paying a
    separate pipeline stage or actor pool for it.
    """
    keys = list(keys)

    def pre_dedup(df: pd.DataFrame) -> pd.DataFrame:
        # pre-dedup inside the batch: shrinks the shuffle for free
        return df.drop_duplicates(subset=keys)

    def drop_dupes(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop_duplicates(subset=keys)
        return post(out) if post is not None else out

    # raw-task exchange instead of groupby(_BUCKET).map_groups: same
    # data movement minus the Ray Data sort barrier (NOTES facts
    # 10/11); drop_dupes handles multiple true keys per hash bucket by
    # construction, and input dtypes pass through untouched (no
    # NA-padded union concat)
    from fastie_ray.state.exchange import BlockSet

    return (
        BlockSet.from_dataset(ds)
        .exchange(keys, drop_dupes, n_buckets=n_buckets, map_fn=pre_dedup)
        .to_dataset()
    )


def dedup_docs_exact(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact document dedup by content hash: per distinct text emit
    (fingerprint, first_doc_id=min id, n_copies). Partial aggregate per
    batch (combiner) → hash-bucketed final — the same skew-safe shape
    as every wide aggregate in this engine. Fingerprint is md5 hex so
    the DuckDB oracle can recompute it (``md5(text)``)."""
    import hashlib

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        fp = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df[text_col]]
        tmp = pd.DataFrame({"fingerprint": fp, id_col: df[id_col]})
        return tmp.groupby("fingerprint", as_index=False).agg(
            first_doc_id=(id_col, "min"), n_copies=(id_col, "count")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["fingerprint"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("fingerprint", as_index=False).agg(
            first_doc_id=("first_doc_id", "min"), n_copies=("n_copies", "sum")
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(lambda g: final(g.drop(columns="__b")), batch_format="pandas")
    )


def _md5_hash_pair(texts) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per text from its md5 digest
    (double hashing: bit i = (h1 + i*h2) % m)."""
    import hashlib

    h1 = np.empty(len(texts), dtype=np.uint64)
    h2 = np.empty(len(texts), dtype=np.uint64)
    for j, t in enumerate(texts):
        d = hashlib.md5(t.encode("utf-8")).hexdigest()
        h1[j] = int(d[:16], 16)
        h2[j] = int(d[16:32], 16) | 1  # odd → full-period stride
    return h1, h2


def build_bloom(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    m_bits: int = 1 << 20,
    k: int = 7,
) -> np.ndarray:
    """Bloom filter over md5(text) of every row: per-batch bitmaps
    (fixed m_bits/8 bytes each, independent of batch rows) OR-reduced
    on the driver — the reduce payload is batches × filter-size, never
    corpus-sized. Returns the uint64 word array."""
    n_words = m_bits // 64

    def bitmap(df: pd.DataFrame) -> pd.DataFrame:
        words = np.zeros(n_words, dtype=np.uint64)
        if len(df):
            h1, h2 = _md5_hash_pair(df[text_col])
            for i in range(k):
                idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                np.bitwise_or.at(
                    words, (idx >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (idx & np.uint64(63)),
                )
        return pd.DataFrame({"bm": [words.tobytes()]})

    parts = ds.map_batches(bitmap, batch_format="pandas").to_pandas()
    out = np.zeros(n_words, dtype=np.uint64)
    for b in parts["bm"]:
        out |= np.frombuffer(b, dtype=np.uint64)
    return out


def dedup_against(
    new_ds: "ray.data.Dataset",
    ref_ds: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k: int = 7,
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Incremental dedup of a NEW shard against an EXISTING corpus —
    exact semantics (every emitted row's text is absent from ref),
    bloom-prefiltered for scale:

    1. ``build_bloom(ref)`` — one pass over ref, fixed-size reduce;
    2. every new row tests the broadcast filter: "definitely absent"
       rows (no false negatives) are emitted WITHOUT touching any
       exchange — for a mostly-new shard that is almost everything;
    3. only the bloom-positive CANDIDATES pay the exact
       anti-join against the ref fingerprint table (task-based
       ``hash_join``; right side ships one distinct key per ref text).

    Output: (id_col, fingerprint) per surviving new row. At real scale
    the ref fingerprint table would live as hash-bucketed parquet so
    step 3 reads only the buckets candidates hash into; here it is a
    second pass over ref."""
    import hashlib

    import ray

    from fastie_ray.ops.join import hash_join

    bloom_ref = ray.put(build_bloom(ref_ds, text_col, m_bits, k))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        fp = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in df[text_col]
        ]
        out = pd.DataFrame(
            {id_col: df[id_col].astype("int64"), "fingerprint": fp}
        )
        if len(df):
            words = ray.get(bloom_ref)
            h1, h2 = _md5_hash_pair(df[text_col])
            maybe = np.ones(len(df), dtype=bool)
            for i in range(k):
                idx = (h1 + np.uint64(i) * h2) % np.uint64(m_bits)
                bit = (
                    words[(idx >> np.uint64(6)).astype(np.int64)]
                    >> (idx & np.uint64(63))
                ) & np.uint64(1)
                maybe &= bit.astype(bool)
            out["maybe"] = maybe
        else:
            out["maybe"] = np.array([], dtype=bool)
        return out

    # consumed by both branches: pin the (id, fp, flag) rows — text is
    # already dropped, so this holds ~40 bytes/row, not the shard
    classified = new_ds.map_batches(classify, batch_format="pandas").materialize()
    fresh = classified.map_batches(
        lambda df: df[~df["maybe"]][[id_col, "fingerprint"]],
        batch_format="pandas",
    )
    cand = classified.map_batches(
        lambda df: df[df["maybe"]][[id_col, "fingerprint"]],
        batch_format="pandas",
    )

    def ref_fp(df: pd.DataFrame) -> pd.DataFrame:
        fp = [
            hashlib.md5(t.encode("utf-8")).hexdigest() for t in df[text_col]
        ]
        return pd.DataFrame({"fingerprint": fp}).drop_duplicates()

    ref_keys = ref_ds.map_batches(ref_fp, batch_format="pandas")
    survivors = hash_join(
        cand, ref_keys, on="fingerprint", how="anti",
        left_cols=[id_col, "fingerprint"], n_buckets=n_buckets,
    )
    return fresh.union(survivors)


def fuzzy_dedup_keep_one(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Cluster-level dedup over a near-duplicate PAIR graph: connected
    components over (doc_a, doc_b), keep the minimum-id doc per
    cluster; docs in no pair are singleton clusters and always kept.
    Returns (doc_id, cluster_size) for KEPT docs only — the standard
    training-corpus fuzzy-dedup step downstream of ``minhash_lsh_dups``
    / ``simhash_dups`` / ``embedding_neardup`` (any of which supplies
    ``pairs``).

    Scale shape: CC via ``connected_components_ds`` (skew-safe dedup →
    driver union-find or distributed min-label propagation by measured
    edge count; labels stay a dataset); cluster sizes by partial→
    bucketed-final aggregate; keeper/singleton resolution by ONE
    task-based tag-union exchange on the doc id (no Acero join, no
    driver structures)."""
    import pyarrow as pa

    from fastie_ray.stages.canonicalize import connected_components_ds

    def to_uv(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": df["doc_a"], "v": df["doc_b"]})

    # (node, component_id); min-id root in both CC implementations
    labels = connected_components_ds(
        pairs.map_batches(to_uv, batch_format="pandas"), n_buckets=n_buckets
    ).materialize()  # read twice below

    # cluster sizes keyed by the keeper id (component_id == min member)
    def size_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("component_id", as_index=False).agg(n=("node", "count"))

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = (
            pd.util.hash_pandas_object(df["component_id"], index=False).to_numpy()
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return df

    def size_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("component_id", as_index=False)["n"].sum()
        return out

    sizes = (
        labels.map_batches(size_partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(size_final, batch_format="pandas")
    )

    # one tag-union exchange on the doc id resolves keeper status:
    #  'd' rows = corpus docs; 'm' rows = paired nodes (membership);
    #  's' rows = (keeper id, cluster size). A doc is kept iff it is
    #  not a paired node (singleton, size 1) or it IS a keeper id.
    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"id": df[id_col], "n": np.int64(0), "__side": "d"})
        return _id_bucket(out, n_buckets)

    def tag_members(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"id": df["node"], "n": np.int64(0), "__side": "m"})
        return _id_bucket(out, n_buckets)

    def tag_sizes(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"id": df["component_id"], "n": df["n"], "__side": "s"})
        return _id_bucket(out, n_buckets)

    def resolve(g: pd.DataFrame):
        d = g[g["__side"] == "d"]["id"]
        members = g[g["__side"] == "m"]["id"].to_numpy()
        s = g[g["__side"] == "s"][["id", "n"]]
        ids = d.to_numpy()
        is_member = np.isin(ids, members)
        is_keeper = np.isin(ids, s["id"].to_numpy())
        kept = ids[~is_member | is_keeper]
        sizes_out = (
            pd.Series(kept).map(pd.Series(s["n"].to_numpy(), index=s["id"]))
            .fillna(1)
            .to_numpy()
            .astype(np.int64)
        )
        out = pd.DataFrame({"doc_id": kept, "cluster_size": sizes_out})
        schema = pa.schema([("doc_id", pa.int64()), ("cluster_size", pa.int64())])
        return pa.Table.from_pandas(
            out.astype({"doc_id": "int64"}), schema=schema, preserve_index=False
        )

    both = (
        docs.map_batches(tag_docs, batch_format="pandas")
        .union(labels.map_batches(tag_members, batch_format="pandas"))
        .union(sizes.map_batches(tag_sizes, batch_format="pandas"))
    )
    return both.groupby("__b").map_groups(resolve, batch_format="pandas")


def _id_bucket(df: pd.DataFrame, n_buckets: int) -> pd.DataFrame:
    if len(df) == 0:
        df["__b"] = np.array([], dtype=np.int64)
        return df
    df["__b"] = (
        pd.util.hash_pandas_object(df["id"], index=False).to_numpy()
        % np.uint64(n_buckets)
    ).astype(np.int64)
    return df


def dup_cluster_histogram(
    pairs: "ray.data.Dataset",
    total_docs: int,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """FineWeb-style dedup statistics: near-dup pairs → connected
    components → (cluster_size, n_clusters) histogram, with the
    singleton row filled in from ``total_docs``.

    Composition of existing distributed pieces: the CC labels come from
    ``connected_components_ds`` (min-label propagation, labels never a
    driver structure), component sizes finish in ONE bucketed exchange
    on component_id, and the histogram itself is cluster-count-bounded
    — per-batch partials then a driver merge of at most
    ``n_buckets × distinct_sizes`` rows (cluster sizes are tiny
    integers; the histogram is the small result by construction)."""
    from fastie_ray.stages.canonicalize import connected_components_ds

    def to_uv(df: pd.DataFrame):
        import pyarrow as pa

        # typed Arrow out: most pair blocks are empty (pairs ≪ blocks)
        # and zero-row pandas blocks lose their schema (NOTES fact 3),
        # which crashes the CC label-propagation join downstream
        return pa.Table.from_pandas(
            pd.DataFrame({"u": df[a_col].astype(str), "v": df[b_col].astype(str)}),
            schema=pa.schema([("u", pa.string()), ("v", pa.string())]),
            preserve_index=False,
        )

    # pairs are dup-bounded (≪ corpus); pin once — consumed by the
    # empty-guard count (CC label propagation joins crash on a fully
    # empty input, NOTES fact 2) and the CC pass.
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pd.DataFrame(
            {"cluster_size": [1], "n_clusters": [total_docs]}
        ).astype({"cluster_size": "int64", "n_clusters": "int64"})
    # compact away zero-row PANDAS blocks (schema-less sentinels, NOTES
    # fact 12) that sparse pair streams carry — the CC joins crash on
    # them and a map can't fix them (map_batches never sees empty
    # blocks). Block count must stay ≤ row count or the repartition
    # mints NEW empties; cap ~10k pairs per block at scale.
    k = min(n_buckets, max(1, -(-n_pairs // 10_000)))
    pairs = pairs.repartition(k).materialize()

    labels = connected_components_ds(
        pairs.map_batches(to_uv, batch_format="pandas"),
        n_buckets=n_buckets,
        driver_threshold=0,
        max_rounds=8,
    ).materialize()

    def size_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("component_id", as_index=False).agg(sz=("node", "count"))

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["component_id"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def hist_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sz = g.drop(columns="__b").groupby("component_id", as_index=False)["sz"].sum()
        out = sz.groupby("sz", as_index=False).agg(n_clusters=("component_id", "count"))
        return out.rename(columns={"sz": "cluster_size"})

    parts = (
        labels.map_batches(size_partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(hist_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(parts) == 0:
        hist = pd.DataFrame({"cluster_size": [], "n_clusters": []})
    else:
        hist = parts.groupby("cluster_size", as_index=False)["n_clusters"].sum()
    n_in_clusters = int(labels.count())
    singleton = pd.DataFrame(
        {"cluster_size": [1], "n_clusters": [total_docs - n_in_clusters]}
    )
    out = (
        pd.concat([hist, singleton], ignore_index=True)
        .groupby("cluster_size", as_index=False)["n_clusters"]
        .sum()
    )
    out = out.astype({"cluster_size": "int64", "n_clusters": "int64"})
    return out.sort_values("cluster_size").reset_index(drop=True)


def fuzzy_dedup_keep_best(
    docs: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    score_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> "ray.data.Dataset":
    """Quality-aware cluster dedup: like ``fuzzy_dedup_keep_one`` but
    each near-duplicate cluster keeps its HIGHEST-``score_col`` member
    (ties → smallest id) instead of the minimum id — the curation rule
    that keeps the best/freshest copy (score = quality, or the doc id
    itself for keep-latest-crawl). Returns (doc_id, cluster_size) for
    kept docs; unpaired docs are singletons (size 1).

    ``score_col`` MUST be an integer dtype (the exchange carries it as
    int64; see the validation in ``tag_docs``). Float quality scores
    would silently truncate — collapsing ties onto the wrong member —
    so they are rejected: pre-scale to integers (e.g. round(score*1e6))
    before calling.

    Scale shape: CC labels as a dataset, then TWO tag-union exchanges —
    (1) on the doc id: attach each member's score to its component and
    pass singleton docs straight through; (2) on the component id:
    vectorized per-component argmax + size. No Acero joins, no driver
    structures."""
    import pyarrow as pa

    from fastie_ray.stages.canonicalize import connected_components_ds

    def to_uv(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": df["doc_a"], "v": df["doc_b"]})

    labels = connected_components_ds(
        pairs.map_batches(to_uv, batch_format="pandas"), n_buckets=n_buckets
    )

    out_schema = pa.schema([("doc_id", pa.int64()), ("cluster_size", pa.int64())])
    mem_schema = pa.schema(
        [("comp", pa.int64()), ("id", pa.int64()), ("score", pa.int64())]
    )

    def tag_docs(df: pd.DataFrame) -> pd.DataFrame:
        if not pd.api.types.is_integer_dtype(df[score_col]):
            raise TypeError(
                f"fuzzy_dedup_keep_best requires an integer score_col; "
                f"got {df[score_col].dtype!r} for {score_col!r} — "
                "pre-scale float scores (e.g. round(score*1e6)) first"
            )
        out = pd.DataFrame(
            {
                "id": df[id_col].astype("int64"),
                "comp": np.int64(-1),
                "score": df[score_col].astype("int64"),
                "__side": "d",
            }
        )
        return _id_bucket(out, n_buckets)

    def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "id": df["node"].astype("int64"),
                "comp": df["component_id"].astype("int64"),
                "score": np.int64(0),
                "__side": "l",
            }
        )
        return _id_bucket(out, n_buckets)

    def attach(g: pd.DataFrame):
        # singletons (docs in no pair) ride the same downstream
        # exchange under a UNIQUE negative component id, so one
        # per-component argmax resolves keepers and singletons alike
        d = g[g["__side"] == "d"][["id", "score"]]
        l = g[g["__side"] == "l"][["id", "comp"]]
        m = d.merge(l, on="id", how="left")
        comp = m["comp"].fillna(-m["id"] - 1).astype("int64")
        return pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "comp": comp,
                    "id": m["id"].astype("int64"),
                    "score": m["score"].astype("int64"),
                }
            ),
            schema=mem_schema,
            preserve_index=False,
        )

    tagged = docs.map_batches(tag_docs, batch_format="pandas").union(
        labels.map_batches(tag_labels, batch_format="pandas")
    )
    members = tagged.groupby("__b").map_groups(attach, batch_format="pandas")

    def add_cb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = (
            df["comp"].to_numpy().view(np.uint64) % np.uint64(n_buckets)
        ).astype(np.int64)
        return df

    def best(g: pd.DataFrame):
        g = g.sort_values(["comp", "score", "id"], ascending=[True, False, True])
        sizes = g.groupby("comp", sort=False)["id"].transform("size")
        first = ~g["comp"].duplicated()
        out = pd.DataFrame(
            {
                "doc_id": g.loc[first, "id"].astype("int64"),
                "cluster_size": sizes[first].astype("int64"),
            }
        )
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)

    return (
        members.map_batches(add_cb, batch_format="pandas")
        .groupby("__b")
        .map_groups(best, batch_format="pandas")
    )


def cross_source_overlap(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    source_col: str = "source",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Cross-corpus contamination matrix: for every source pair, how
    many distinct document fingerprints they SHARE — the provenance
    audit run before mixing crawls/dumps into one training corpus
    (double-counted sources inflate dedup debt and leak test splits).

    Scale shape: per-batch distinct (md5, source) rows → ONE
    fingerprint-bucketed exchange where each fingerprint's distinct
    source set expands to sorted pairs (bounded by sources² per
    fingerprint, and the source DOMAIN is small by construction —
    crawls, dumps, datasets) → per-batch pair partials → one tiny
    pair-bucketed final. Document text never ships; only fingerprints
    do."""

    import hashlib

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        h = df[text_col].map(
            lambda t: hashlib.md5(t.encode("utf-8")).hexdigest()
        )
        return pd.DataFrame(
            {"h": h, "source": df[source_col]}
        ).drop_duplicates()

    def add_hb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        hh = pd.util.hash_pandas_object(df["h"], index=False).to_numpy()
        df["__b"] = (hh % np.uint64(n_buckets)).astype(np.int64)
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates(["h", "source"])
        m = g.merge(g, on="h", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        return m.groupby(["source_a", "source_b"], as_index=False).agg(
            n_shared=("h", "count")
        )

    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        hh = pd.util.hash_pandas_object(
            df["source_a"] + "\x00" + df["source_b"], index=False
        ).to_numpy()
        df["__b"] = (hh % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["source_a", "source_b"], as_index=False
        )["n_shared"].sum()
        out["n_shared"] = out["n_shared"].astype("int64")
        return out

    return (
        ds.map_batches(fp, batch_format="pandas")
        .map_batches(add_hb, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
        .map_batches(add_pb, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
