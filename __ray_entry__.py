"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG pipeline on sf0.001. ``queries()``
exposes one callable per implemented operator/pipeline (SURVEY.md §2);
``oracle_sql()`` gives the DuckDB-equivalent SQL over the same parquet
views. The KG path is made SQL-verifiable by deriving the pages table
deterministically from ``documents`` with the fact sentence injected at
an exact chunk boundary (see fastie_ray/sources/pages.py) and mirroring
the injection plan as an inline ``facts`` VALUES CTE.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or in the library.
"""

from __future__ import annotations

import os as _os
from collections.abc import Callable
from typing import Any

# the committed relational conversions of the reference's real dev
# corpora (scripts/convert_real_corpora.py) — read by BOTH sides of the
# cmeee_stats / duee_stats queries so Ray and DuckDB see identical bytes
_GOLDEN_CMEEE = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)),
    "data", "golden", "cmeee_dev.parquet",
)
_GOLDEN_DUEE = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)),
    "data", "golden", "duee_dev.parquet",
)

_WORLD = None


def _world():
    global _WORLD
    if _WORLD is None:
        from fastie_ray.synth import build_world

        _WORLD = build_world()
    return _WORLD


def _pages(sf_dir: str):
    from fastie_ray.sources.pages import pages_from_documents

    # 16 read blocks: same task-dispatch discipline as _read — the kg
    # queries chain an actor pool + exchanges off this source
    return pages_from_documents(sf_dir, _world(), override_num_blocks=16)


def _read(sf_dir: str, table: str, columns=None):
    """Table read with block count tracking DATA VOLUME, not CPU count:
    Ray's default splits even a 5k-row file into 64 blocks, and on
    multi-exchange corpus ops every downstream operator inherits that
    fan-out — ~1000 scheduled tasks against the ~50 tasks/s driver
    dispatch ceiling (measured: simhash_dups 18 s → 2.2 s at sf0.1
    from this change alone). At real scale the shard list itself
    provides the parallelism; 16 blocks per small file keeps every
    stage busy without drowning the driver."""
    import ray.data

    return ray.data.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, override_num_blocks=16
    )


def _conc(requested: int = 16) -> tuple[int, int]:
    """Scorer-pool sizing for the pipeline queries: an AUTOSCALING
    (min, max) pair — Ray Data spawns actors as input backs up, so a
    small input pays for 2 actors while a large one still fans out to
    the cluster (cold-start A/B at sf0.1: fixed 14 → 3.3 s,
    (2, 14) → 1.4 s). Max scales to the session's CPUs (the driver
    runs 32, tests 4) leaving headroom for downstream shuffle tasks."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return (2, max(2, min(requested, cpus - 2)))


# ----------------------------------------------------------------- entry


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: pages → extract →
    chunk → joint scorer actor pool → rejoin/dedup → doc triples."""
    from fastie_ray.pipelines.kg import doc_triples

    import ray

    world_ref = ray.put(_world())
    return doc_triples(
        _pages("/root/testdata/sf0.001"), world_ref=world_ref, concurrency=2
    )


# ----------------------------------------------------------------- queries


def _q_extract_text(sf_dir: str):
    from fastie_ray.stages.extract import extract_text

    return extract_text(_pages(sf_dir)).select_columns(["url", "text"])


def _q_chunk_stats(sf_dir: str):
    import pandas as pd

    from fastie_ray.stages.chunk import chunk_pages
    from fastie_ray.stages.extract import extract_text

    chunks = chunk_pages(extract_text(_pages(sf_dir)))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("url", as_index=False).agg(n_chunks=("chunk_id", "count"))

    from fastie_ray.pipelines.kg import _bucketed_groupby

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("url", as_index=False)["n_chunks"].sum()

    return _bucketed_groupby(
        chunks.select_columns(["url", "chunk_id"]).map_batches(partial, batch_format="pandas"),
        "url",
        final,
        16,
    )


def _q_kg_mentions(sf_dir: str):
    import ray

    from fastie_ray.pipelines.kg import extract_triples

    world_ref = ray.put(_world())
    mentions, _ = extract_triples(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())
    return mentions


def _q_kg_triples(sf_dir: str):
    import ray

    from fastie_ray.pipelines.kg import doc_triples

    world_ref = ray.put(_world())
    return doc_triples(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())


def _q_kg_triples_npnn(sf_dir: str):
    """kg_triples through the COMPILED NUMPY-TRANSFORMER dense backend
    (np_transformer.py, VERDICT r3 #1): the scorer actors compile the
    gazetteer checkpoint in __init__ (~1 s, self-checked) and every
    chunk goes through a real 2-layer RoPE-attention forward + the
    dense GPLinker decode — the TorchDenseBackend tensor contract,
    torch-free. Restricted to doc_id % 100 == 0 (dense forwards cost
    real GEMMs; the subset keeps bench wall bounded while the oracle
    stays the exact fact join)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from fastie_ray.pipelines.kg import doc_triples

    world_ref = ray.put(_world())

    def keep(batch: pa.Table) -> pa.Table:
        # url ends with the zero-padded doc id → "…0" ⟺ doc_id % 10 == 0
        return batch.filter(pc.ends_with(batch["url"], pattern="0"))

    pages = _pages(sf_dir).map_batches(keep, batch_format="pyarrow")
    return doc_triples(
        pages, world_ref=world_ref, concurrency=_conc(),
        rel_backend="hf", hf_model="compile:gazetteer",
    )


def _q_kg_edges(sf_dir: str):
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(_pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",))
    return t["edges"].select_columns(
        ["subject_id", "predicate", "object_id", "n_support"]
    )


def _q_kg_nodes(sf_dir: str):
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(_pages(sf_dir), world=_world(), concurrency=_conc(), want=("nodes",))
    return t["nodes"]


def _q_kg_events(sf_dir: str):
    import ray

    from fastie_ray.pipelines.kg import doc_events

    world_ref = ray.put(_world())
    return doc_events(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())


def _q_kg_events_npnn(sf_dir: str):
    """kg_events through the COMPILED NUMPY-TRANSFORMER EE heads
    (np_transformer.py compile_gazetteer_lm(ee=True)): each chunk runs
    the 3-layer RoPE forward and the dense GPLinker-EE decode
    (event_ee.decode_event_dense) — the torch EE contract, torch-free.
    Same doc_id % 10 subset and exact fact-join oracle discipline as
    kg_triples_npnn; correctness-only in bench (dense GEMMs)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from fastie_ray.pipelines.kg import doc_events

    world_ref = ray.put(_world())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.ends_with(batch["url"], pattern="0"))

    pages = _pages(sf_dir).map_batches(keep, batch_format="pyarrow")
    return doc_events(
        pages, world_ref=world_ref, concurrency=_conc(),
        backend="hf", hf_model="compile:gazetteer-ee",
    )


def _q_kg_edge_history(sf_dir: str):
    """TEMPORAL KG maintenance: per distinct surface triple, the
    capture-time validity window (first_seen_s / last_seen_s, seconds
    since the synth epoch = doc_id by construction, ``sources/pages.py``)
    and support count — the SCD-ish edge-history table a
    continuously-crawled KG keeps next to its edge aggregate. One
    streaming pass (the headline doc_triples operator) feeding ONE
    (s, p, o)-keyed exchange with per-batch min/max/count combiners."""
    import pandas as pd

    import ray

    from fastie_ray.pipelines.kg import doc_triples
    from fastie_ray.state.exchange import BlockSet

    world_ref = ray.put(_world())
    triples = doc_triples(
        _pages(sf_dir), world_ref=world_ref, concurrency=_conc()
    )
    KEYS = ["subject", "predicate", "object"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["url"].str[-6:].astype("int64")
        g = pd.DataFrame(
            {
                "subject": df["subject"], "predicate": df["predicate"],
                "object": df["object"],
                "first_seen_s": d, "last_seen_s": d, "n_seen": 1,
            }
        )
        return g.groupby(KEYS, as_index=False).agg(
            first_seen_s=("first_seen_s", "min"),
            last_seen_s=("last_seen_s", "max"),
            n_seen=("n_seen", "sum"),
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(KEYS, as_index=False).agg(
            first_seen_s=("first_seen_s", "min"),
            last_seen_s=("last_seen_s", "max"),
            n_seen=("n_seen", "sum"),
        )
        for c in ("first_seen_s", "last_seen_s", "n_seen"):
            out[c] = out[c].astype("int64")
        return out

    return BlockSet.from_dataset(triples).exchange(
        KEYS, final, n_buckets=16, map_fn=partial
    ).to_dataset()


def _q_kg_contradictions(sf_dir: str):
    """KG QUALITY — temporal contradiction audit: for each (subject,
    predicate) with two DISTINCT objects whose capture-time validity
    windows overlap, emit the conflicting pair and the overlap window.
    The shape a continuously-crawled KG runs before publishing edges
    for functional-ish predicates (one CEO at a time, one capital at a
    time). One streaming extraction pass feeding ONE exchange keyed on
    (subject, predicate): the per-batch combiner reduces to per-(s,p,o)
    windows, the bucket task finalizes windows and self-merges WITHIN
    the (s,p) group — the pairwise step is bounded by per-subject
    predicate fan-out (out-degree per predicate), never corpus-sized,
    the same partitioning contract as the edge aggregate itself."""
    import pandas as pd

    import ray

    from fastie_ray.pipelines.kg import doc_triples
    from fastie_ray.state.exchange import BlockSet

    world_ref = ray.put(_world())
    triples = doc_triples(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())
    SPO = ["subject", "predicate", "object"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["url"].str[-6:].astype("int64")
        g = pd.DataFrame(
            {
                "subject": df["subject"], "predicate": df["predicate"],
                "object": df["object"], "first_seen_s": d, "last_seen_s": d,
            }
        )
        return g.groupby(SPO, as_index=False).agg(
            first_seen_s=("first_seen_s", "min"),
            last_seen_s=("last_seen_s", "max"),
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(SPO, as_index=False).agg(
            first_seen_s=("first_seen_s", "min"),
            last_seen_s=("last_seen_s", "max"),
        )
        m = h.merge(h, on=["subject", "predicate"], suffixes=("_a", "_b"))
        m = m[m["object_a"] < m["object_b"]]
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "subject": pd.Series([], dtype="object"),
                    "predicate": pd.Series([], dtype="object"),
                    "object_a": pd.Series([], dtype="object"),
                    "object_b": pd.Series([], dtype="object"),
                    "overlap_start_s": pd.Series([], dtype="int64"),
                    "overlap_end_s": pd.Series([], dtype="int64"),
                }
            )
        m = m.assign(
            overlap_start_s=m[["first_seen_s_a", "first_seen_s_b"]]
            .max(axis=1).astype("int64"),
            overlap_end_s=m[["last_seen_s_a", "last_seen_s_b"]]
            .min(axis=1).astype("int64"),
        )
        m = m[m["overlap_start_s"] <= m["overlap_end_s"]]
        return m[
            ["subject", "predicate", "object_a", "object_b",
             "overlap_start_s", "overlap_end_s"]
        ].reset_index(drop=True)

    return BlockSet.from_dataset(triples).exchange(
        ["subject", "predicate"], final, n_buckets=16, map_fn=partial
    ).to_dataset()


def _q_kg_type_signatures(sf_dir: str):
    """KG QUALITY — predicate type-signature audit: per (predicate,
    subject_label, object_label), the number of extracted triple
    instances. Over a real crawl this is the ontology-conformance
    check (a `ceo_of` edge whose subject typed LOC is an extraction
    bug). The surface→label gazetteer is the SMALL side: shipped once
    in the task closure (200 entries here; `ray.put` + per-worker
    cache at real alias-table sizes, same discipline as
    `stages/link.py`), labels mapped inside the per-batch combiner, so
    the exchange carries only the ≤ |preds|×|labels|² aggregate."""
    import pandas as pd

    import ray

    from fastie_ray.pipelines.kg import doc_triples
    from fastie_ray.state.exchange import BlockSet

    w = _world()
    gaz = dict(w.gazetteer)
    world_ref = ray.put(w)
    triples = doc_triples(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())
    KEYS = ["predicate", "sub_label", "obj_label"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "predicate": df["predicate"],
                "sub_label": df["subject"].map(gaz),
                "obj_label": df["object"].map(gaz),
                "n": 1,
            }
        )
        return g.groupby(KEYS, as_index=False)["n"].sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(KEYS, as_index=False)["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    return BlockSet.from_dataset(triples).exchange(
        ["predicate"], final, n_buckets=8, map_fn=partial
    ).to_dataset()


def _q_kg_provenance(sf_dir: str):
    """KG QUALITY — provenance breadth per surface triple: how many
    documents support the edge and across how many distinct crawl
    languages (url path segment; the synth stand-in for distinct
    domains/snapshots). Single-language single-doc edges are the ones
    a production KG holds back for review. One exchange keyed on
    (s, p, o); the per-batch combiner pre-reduces to distinct
    (s, p, o, lang) rows with doc counts, so the wire carries at most
    |distinct triples| × |langs| rows, not the corpus."""
    import pandas as pd

    import ray

    from fastie_ray.pipelines.kg import doc_triples
    from fastie_ray.state.exchange import BlockSet

    world_ref = ray.put(_world())
    triples = doc_triples(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())
    SPO = ["subject", "predicate", "object"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "subject": df["subject"], "predicate": df["predicate"],
                "object": df["object"],
                "lang": df["url"].str.split("/").str[-2],
                "n_docs": 1,
            }
        )
        return g.groupby(SPO + ["lang"], as_index=False)["n_docs"].sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(SPO + ["lang"], as_index=False)["n_docs"].sum()
        out = h.groupby(SPO, as_index=False).agg(
            n_docs=("n_docs", "sum"), n_langs=("lang", "nunique")
        )
        out["n_docs"] = out["n_docs"].astype("int64")
        out["n_langs"] = out["n_langs"].astype("int64")
        return out

    return BlockSet.from_dataset(triples).exchange(
        SPO, final, n_buckets=16, map_fn=partial
    ).to_dataset()


def _q_kg_degree_profile(sf_dir: str):
    """KG QUALITY — per-entity degree profile over the CANONICAL edge
    table (out-degree, in-degree, distinct outgoing predicates): the
    hub/leaf census that sizes skew mitigation (salting thresholds)
    for every downstream graph pass. Tag-union shape: each edge emits
    one out-row and one in-row, ONE exchange keyed on entity id
    reduces both sides together — no self-join, no second pass."""
    import pandas as pd

    from fastie_ray.pipelines.kg import graph_tables
    from fastie_ray.state.exchange import BlockSet

    edges = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"].select_columns(["subject_id", "predicate", "object_id"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "entity_id": df["subject_id"], "out_deg": 1, "in_deg": 0,
                "predicate": df["predicate"],
            }
        )
        inn = pd.DataFrame(
            {
                "entity_id": df["object_id"], "out_deg": 0, "in_deg": 1,
                "predicate": "",
            }
        )
        return pd.concat([out, inn], ignore_index=True)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        preds = (
            g[g["predicate"] != ""]
            .groupby("entity_id")["predicate"].nunique()
        )
        out = g.groupby("entity_id", as_index=False).agg(
            out_deg=("out_deg", "sum"), in_deg=("in_deg", "sum")
        )
        out["n_out_predicates"] = (
            out["entity_id"].map(preds).fillna(0).astype("int64")
        )
        out["out_deg"] = out["out_deg"].astype("int64")
        out["in_deg"] = out["in_deg"].astype("int64")
        return out

    return BlockSet.from_dataset(edges).exchange(
        ["entity_id"], final, n_buckets=16, map_fn=tag
    ).to_dataset()


def _q_rw_corpus(sf_dir: str):
    """Random-walk corpus over the canonical KG entity graph
    (``ops.graph.random_walks_frontier``): one deterministic 3-step
    walk per entity, hash-chosen next hops (md5-ranked out-neighbors)
    — the DeepWalk/node2vec training-data generator, reproducible
    bit-exact across reruns and in SQL. Adjacency ranked once and
    pinned; each step is ONE frontier-sized exchange."""
    import pandas as pd

    from fastie_ray.ops.graph import random_walks_frontier
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"]
    edges = t.map_batches(
        lambda df: pd.DataFrame(
            {"src": df["subject_id"], "dst": df["object_id"]}
        ).drop_duplicates(),
        batch_format="pandas",
    )
    return random_walks_frontier(edges, walk_len=3, n_buckets=16)


def _q_walk_skipgrams(sf_dir: str):
    """SGNS training pairs from the KG random-walk corpus
    (``ops.graph.walk_skipgrams`` over ``random_walks_frontier``):
    window-2 positives within each walk plus one md5-chosen negative
    per positive from the entity vocabulary, aggregated to
    (center, context, label, n) — the word2vec/DeepWalk data half,
    bit-exact vs the SQL oracle. One start-keyed exchange for pair
    generation + one count exchange; vocab broadcast once."""
    import pandas as pd

    from fastie_ray.ops.graph import random_walks_frontier, walk_skipgrams
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"]
    edges = t.map_batches(
        lambda df: pd.DataFrame(
            {"src": df["subject_id"], "dst": df["object_id"]}
        ).drop_duplicates(),
        batch_format="pandas",
    )
    walks = random_walks_frontier(edges, walk_len=3, n_buckets=16)
    return walk_skipgrams(
        walks, window=2, negatives_per_pos=1, n_buckets=16
    )


def _q_uie(sf_dir: str):
    import ray

    from fastie_ray.pipelines.uie import uie_extract

    world_ref = ray.put(_world())
    return uie_extract(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())


def _q_lang_counts(sf_dir: str):
    import ray.data
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", columns=["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_docs"))


def _q_token_counts(sf_dir: str):
    import ray.data

    from fastie_ray.ops.text_analysis import token_counts

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return token_counts(ds)


def _q_doc_stats(sf_dir: str):
    import re

    import pandas as pd
    import ray.data

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": df["text"].str.len().astype("int64"),
                "n_tokens": df["text"].str.count(r"\S+").astype("int64"),
                "n_punct": df["text"].str.count(r"[.!?,;:]").astype("int64"),
            }
        )

    return ds.map_batches(stats, batch_format="pandas")


def _q_dedup_docs(sf_dir: str):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.dedup import dedup_docs_exact

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    # deterministic duplicated corpus: every 5th doc re-appears with
    # id+1e6 — originals and replicas emitted from ONE map over ONE
    # read (a read + union doubled block/task counts for no reason:
    # ~550 scheduled tasks → ~280)
    def with_dups(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] % 5 == 0].copy()
        d["doc_id"] = d["doc_id"] + 1_000_000
        return pd.concat([df, d], ignore_index=True)

    return dedup_docs_exact(ds.map_batches(with_dups, batch_format="pandas"))


def _planted_dup_docs_pairs(sf_dir: str):
    """Shared planted construction for the fuzzy-dedup family: every
    5th doc gains two verbatim copies (+1e6, +2e6); near-dup pairs are
    exact-dup STAR pairs per content fingerprint (each text-equality
    group co-located on its fingerprint bucket), so SQL oracles can
    reproduce clusters as GROUP BY text."""
    import hashlib

    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d1 = df[df["doc_id"] % 5 == 0].copy()
        d1["doc_id"] = d1["doc_id"] + 1_000_000
        d2 = df[df["doc_id"] % 5 == 0].copy()
        d2["doc_id"] = d2["doc_id"] + 2_000_000
        return pd.concat([df, d1, d2], ignore_index=True)

    planted = ds.map_batches(plant, batch_format="pandas")

    def fp_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "fp": [hashlib.md5(t.encode("utf-8")).hexdigest() for t in df["text"]],
                "doc_id": df["doc_id"].astype("int64"),
            }
        )
        if len(out) == 0:
            out["__b"] = np.array([], dtype=np.int64)
            return out
        out["__b"] = (
            pd.util.hash_pandas_object(out["fp"], index=False).to_numpy()
            % np.uint64(64)
        ).astype(np.int64)
        return out

    def stars(g: pd.DataFrame):
        import pyarrow as pa

        g = g.sort_values("doc_id")
        m = g.groupby("fp")["doc_id"].transform("min")
        d = g[g["doc_id"] != m.to_numpy()]
        out = pd.DataFrame(
            {
                "doc_a": m[g["doc_id"] != m.to_numpy()].astype("int64").to_numpy(),
                "doc_b": d["doc_id"].astype("int64").to_numpy(),
            }
        )
        schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    pairs = (
        planted.map_batches(fp_rows, batch_format="pandas")
        .groupby("__b")
        .map_groups(stars, batch_format="pandas")
    )
    return planted, pairs


def _q_fuzzy_dedup(sf_dir: str):
    """Cluster-level fuzzy dedup (pairs -> connected components -> keep
    min id per cluster). Planted construction shared with
    dedup_keep_best (``_planted_dup_docs_pairs``); transitive-chain CC
    semantics are pytest-covered on constructed graphs."""
    from fastie_ray.ops.dedup import fuzzy_dedup_keep_one

    planted, pairs = _planted_dup_docs_pairs(sf_dir)
    return fuzzy_dedup_keep_one(planted, pairs)


def _q_dedup_keep_best(sf_dir: str):
    """Quality-aware fuzzy dedup: each cluster keeps its HIGHEST-score
    member — score = doc_id here, i.e. keep-latest-crawl semantics
    (``ops.dedup.fuzzy_dedup_keep_best``)."""
    import pandas as pd

    from fastie_ray.ops.dedup import fuzzy_dedup_keep_best

    planted, pairs = _planted_dup_docs_pairs(sf_dir)
    scored = planted.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"], "score": df["doc_id"].astype("int64")}
        ),
        batch_format="pandas",
    )
    return fuzzy_dedup_keep_best(scored, pairs, score_col="score")


_STRAT_RATES = {"en": 0.3, "zh": 0.8, "es": 0.5, "de": 1.0}


def _stratified_sample_sql() -> str:
    from fastie_ray.ops.sampling import rate_threshold

    whens = " ".join(
        f"WHEN '{s}' THEN '{rate_threshold(r)}'" for s, r in _STRAT_RATES.items()
    )
    return f"""
        SELECT doc_id, lang FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
              < CASE lang {whens} ELSE '0000' END
    """


def _q_stratified_sample(sf_dir: str):
    """Deterministic per-language downsample (md5-prefix thresholds —
    the selection predicate is the same lexicographic hex comparison in
    Python and SQL, so the oracle reproduces the exact row set)."""
    import ray.data

    from fastie_ray.ops.sampling import stratified_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return stratified_sample(ds, _STRAT_RATES, stratum_col="lang", id_col="doc_id")


def _q_grouped_topk(sf_dir: str):
    """Top-5 longest docs per language (rank ties broken by doc_id)."""
    import ray.data

    from fastie_ray.ops.sampling import grouped_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return grouped_topk(ds, k=5, group_col="lang", value_col="n_chars", id_col="doc_id")


def _q_kmeans_assign(sf_dir: str):
    """Nearest-centroid assignment against the deterministic init
    centroids (the k smallest vec_ids) — the inner kernel of Lloyd's,
    SQL-reproducible via DuckDB list_distance."""
    import ray.data

    from fastie_ray.ops.clustering import init_centroids, kmeans_assign

    ds = _read(sf_dir, "embeddings")
    cids, cents = init_centroids(ds, k=10)
    return kmeans_assign(ds, cids, cents).select_columns(["vec_id", "cluster_id"])


def _q_cluster_keywords(sf_dir: str):
    """Corpus cartography: the per-CLUSTER keyword report — k-means
    cluster assignments (``ops.clustering.kmeans_assign``, vec_id ==
    doc_id by construction) hash-joined to the token stream, then the
    top-5 tokens per cluster by occurrence count (ties: token asc) via
    a (cluster, token)-combined count + one cluster-keyed top-k
    exchange. The map-of-the-corpus artifact every curation UI shows."""
    import pandas as pd

    from fastie_ray.ops.clustering import init_centroids, kmeans_assign
    from fastie_ray.ops.join import hash_join
    from fastie_ray.state.exchange import BlockSet
    from fastie_ray.ops.text_index import _TOKEN_RE

    emb = _read(sf_dir, "embeddings")
    cids, cents = init_centroids(emb, k=10)
    assign = kmeans_assign(emb, cids, cents).select_columns(
        ["vec_id", "cluster_id"]
    )
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].str.lower().str.findall(_TOKEN_RE)
        out = pd.DataFrame(
            {"vec_id": df["doc_id"].astype("int64").repeat(t.map(len)),
             "token": [x for lst in t for x in lst]}
        )
        return out.groupby(["vec_id", "token"], as_index=False).size()

    joined = hash_join(
        docs.map_batches(toks, batch_format="pandas"), assign,
        on="vec_id", left_cols=["vec_id", "token", "size"],
        right_cols=["vec_id", "cluster_id"], n_buckets=16,
    )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["cluster_id", "token"], as_index=False)[
            "size"
        ].sum()

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["cluster_id", "token"], as_index=False)[
            "size"
        ].sum()
        out = out.sort_values(
            ["cluster_id", "size", "token"],
            ascending=[True, False, True], kind="mergesort",
        )
        out = out.groupby("cluster_id", sort=False).head(5)
        return pd.DataFrame(
            {
                "cluster_id": out["cluster_id"].astype("int64"),
                "token": out["token"],
                "n_occ": out["size"].astype("int64"),
            }
        )

    return BlockSet.from_dataset(joined).exchange(
        ["cluster_id"], topk, n_buckets=8, map_fn=combine
    ).to_dataset()


def _q_kmeans_clusters(sf_dir: str):
    """Full Lloyd's (8 iterations) → cluster sizes. Iterative centroid
    averages are not SQL-expressible — rows-only driver check; the
    algorithm is pytest-oracled against a single-process numpy
    reference."""
    import ray.data

    from fastie_ray.ops.clustering import kmeans_cluster_sizes

    ds = _read(sf_dir, "embeddings")
    return kmeans_cluster_sizes(ds, k=10, iters=8)


# Frozen Lloyd's centroids for the SQL-oracled assignment half (the
# bpe_encode_apply split, VERDICT r3 #3): trained ONCE at sf0.01
# (kmeans_fit k=10, iters=8 over embeddings.parquet) and quantized to
# floor(1000 * c) int64, so the Ray query and the DuckDB oracle assign
# against the exact same integer grid at every scale factor. Row
# embeddings are quantized the same way at assign time → integer
# distances, bit-exact argmin, ties → lowest centroid index.
_KMEANS_FROZEN_INT_CENTROIDS: list[list[int]] = [
    [24, 12, 33, -85, -27, -29, -16, 16, 67, -38, -31, -13, -27, 1, -13, -6, 53, 33, 40, 37, -48, 38, -4, -4, 14, 63, 63, -1, -20, 65, -43, 71, -26, -46, 11, -54, -29, 18, -3, -4, 19, -3, -11, -10, 20, 46, 31, -45, 16, -38, -11, 36, 10, -40, 29, 9, 1, 18, -89, -38, -25, 69, 47, -46],
    [-30, 14, -6, -28, -17, 30, -64, -11, -14, -6, -34, 53, 78, -78, 28, -6, -9, -5, 68, -50, 5, 18, 10, 6, 77, 60, -9, -34, -9, 10, -43, 22, -7, 0, -32, 29, -63, -6, -7, -103, 17, -28, 34, 21, -18, 41, -46, -27, -47, -90, -27, -16, 1, -5, -35, 19, 70, -19, 13, -5, -4, 15, -65, -9],
    [-3, 21, -23, 56, 33, -16, -37, 23, -36, -73, 3, -8, -53, 57, 6, 27, -22, 56, 0, -47, -12, -5, 52, -12, 0, -78, 44, -28, 29, 3, -21, -91, 23, 9, -1, -22, 27, 70, 56, 27, -2, -25, -2, 6, -29, -3, -27, 11, 42, 18, 51, -58, -30, -50, 31, 26, -1, -3, -16, 46, 58, 25, 17, 33],
    [-31, 23, -24, -3, -24, 23, 43, 22, -10, 36, -3, 56, 2, 73, 11, 1, -16, -56, 2, 37, 2, -7, -25, 6, -1, 39, -40, -10, -71, -33, 2, 1, 71, -1, -17, -1, 33, -17, -61, -36, -4, -44, -63, -10, -6, -8, 6, -58, 83, -25, 42, -12, 18, 22, -17, -19, 25, -14, 24, -40, 33, -44, -21, -57],
    [-16, -6, 73, 23, -54, -80, 82, 23, -20, 41, 42, -31, 18, -46, 22, -9, 42, -13, -24, 16, -26, 16, -12, -16, -45, 13, 18, 24, 35, -19, 5, -36, 50, 7, -18, -19, 18, -81, -31, 13, 46, -32, -1, 63, -60, 18, -37, 62, -50, 0, 2, 60, 31, 27, 92, -13, 15, -19, 21, 1, -49, -12, 17, -9],
    [-17, -30, 27, 6, 56, -46, -46, 70, -15, -4, 13, -22, -2, 25, 2, -2, -12, -68, -50, 41, 8, -2, 36, -5, 38, 23, -44, -7, 19, 20, 24, -16, -5, -29, -8, 82, 46, 70, -5, 8, -34, 49, -17, 37, -63, -45, 40, -1, -15, 6, 28, 50, -22, 29, -85, -28, 35, -63, -34, -1, 19, 11, -22, 44],
    [9, -31, -4, -47, 39, 61, -10, -68, 3, 8, 68, 20, 1, 41, -46, 25, 17, 100, -55, -22, -26, 3, -16, -48, -13, -27, -11, 16, 18, -28, 22, 30, -4, -82, -28, 58, 22, -43, 16, -16, 35, -28, -6, -40, 33, -2, 29, 58, 10, 8, -20, -5, 64, -24, 21, 41, -50, 35, 11, -43, 15, -3, -7, 6],
    [83, 31, -21, 59, -27, 34, -9, 41, -23, 14, 3, -11, -75, -85, -17, 8, -18, 2, 22, 12, -4, -23, -24, 55, 6, -61, -16, 61, -13, 53, 68, 22, -18, 30, 16, 6, -16, -40, -8, 16, -28, -11, 18, -54, -8, 38, 23, 87, -50, 14, 32, -25, -13, -31, -28, 20, 17, 1, -86, -21, -7, -11, 7, -69],
    [-25, -72, -4, -13, 83, 55, -102, -25, 36, 36, -53, 48, 10, -17, 51, 25, -5, -47, -11, -8, 33, 2, -18, -41, -75, 80, 19, 11, 14, -76, 10, -36, -17, 24, 69, -84, -2, 12, -1, 10, -40, -15, -12, -28, 1, -46, -25, 0, -28, -12, -8, -37, -36, 16, -12, -28, -58, 39, 27, -1, -34, 34, 27, -38],
    [28, -4, -8, -22, 24, 16, -32, 8, -16, -48, 47, -89, 15, 37, -53, -16, 6, 60, 16, -13, 23, -19, 55, -24, -23, 13, -28, 73, -10, 25, 14, -42, 5, 27, 66, -8, -118, 13, 42, 87, -32, 22, 76, 22, 1, 5, -16, -46, -15, 9, -2, -10, 43, 6, 68, -76, -1, -10, 71, 28, -22, -26, -6, 16],
]


def _q_kmeans_lloyd_assign(sf_dir: str):
    """Cluster ASSIGNMENT against the frozen Lloyd's centroids (the
    SQL-oracled inference half of kmeans_clusters, split the way
    bpe_encode/bpe_encode_apply are): integer-grid distances, exact
    argmin, ties → lowest centroid index. Broadcast-only pass."""
    from fastie_ray.ops.clustering import kmeans_assign_frozen_int

    ds = _read(sf_dir, "embeddings")
    return kmeans_assign_frozen_int(ds, _KMEANS_FROZEN_INT_CENTROIDS)


def _q_doc_frequency(sf_dir: str):
    """(token, df) over the corpus — ASCII-exact tokenization so the
    DuckDB regexp_extract_all oracle reproduces the token stream."""
    import ray.data

    from fastie_ray.ops.text_index import doc_frequency

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return doc_frequency(ds)


def _q_tfidf_terms(sf_dir: str):
    """Per-doc top-3 TF-IDF terms; ranks cut on the rounded score so
    the SQL window oracle is exact."""
    import ray.data

    from fastie_ray.ops.text_index import tfidf_top_terms

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()
    return tfidf_top_terms(ds, n_docs=n_docs, k=3, min_df=2)


_QUANTILE_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _topic_sql() -> str:
    """Keyword-topic oracle generated from the SAME lexicon as
    ``_q_topic_labels`` — substring counts via the replace-length
    identity, full-condition argmax CASE (first match = lexicographic
    tie-break)."""
    topics = sorted(_TOPIC_LEXICON)

    def cnt(p: str) -> str:
        return (
            f"(length(lower(text)) - length(replace(lower(text), '{p}', '')))"
            f" // {len(p)}"
        )

    cols = ",\n".join(
        f"CAST({' + '.join(cnt(p) for p in _TOPIC_LEXICON[t])} AS BIGINT) AS s_{t}"
        for t in topics
    )
    allmax = "greatest(" + ", ".join(f"s_{t}" for t in topics) + ")"
    whens = "\n".join(
        f"WHEN {' AND '.join(f's_{t} >= s_{u}' for u in topics if u != t)} "
        f"THEN '{t}'"
        for t in topics
    )
    return f"""
        WITH s AS (SELECT doc_id, {cols} FROM documents)
        SELECT doc_id,
               CASE WHEN {allmax} = 0 THEN 'other'
               {whens}
               END AS topic,
               {allmax} AS score
        FROM s
    """


def _perceptron_sql(
    n_iter: int = 3,
    n_features: int = 64,
    label_expr: str = "CASE WHEN lang = 'en' THEN 1 ELSE -1 END",
) -> str:
    """Unrolled full-batch integer-perceptron oracle: hashed-bigram
    features, one (score, violations, gradient, weights) CTE group per
    iteration — mirrors ``ops.linear_train.perceptron_train``.
    ``label_expr`` parameterizes the y derivation (the noisy-label
    audit trains on planted flips)."""
    ctes = [
        f"""docs AS (SELECT doc_id, {label_expr} AS y,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)""",
        """tok AS (SELECT doc_id, y, unnest(toks) AS tok,
            generate_subscripts(toks, 1) AS i FROM docs)""",
        f"""f AS (SELECT a.doc_id AS doc, a.y,
            CAST(('0x' || substr(md5(a.tok || ' ' || b.tok), 1, 8)) AS BIGINT)
                % {n_features} AS bucket,
            CAST(count(*) AS BIGINT) AS cnt
            FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
            GROUP BY 1, 2, 3)""",
        f"""w0 AS (SELECT CAST(range AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS w
            FROM range({n_features}))""",
    ]
    for t in range(n_iter):
        ctes.append(
            f"""s{t} AS (SELECT f.doc, any_value(f.y) AS y,
            sum(f.cnt * w{t}.w) AS total
            FROM f JOIN w{t} USING (bucket) GROUP BY f.doc)"""
        )
        ctes.append(f"v{t} AS (SELECT doc FROM s{t} WHERE y * total <= 0)")
        ctes.append(
            f"""g{t} AS (SELECT f.bucket, sum(f.y * f.cnt) AS g
            FROM f JOIN v{t} USING (doc) GROUP BY f.bucket)"""
        )
        ctes.append(
            f"""w{t + 1} AS (SELECT w{t}.bucket,
            w{t}.w + coalesce(g{t}.g, 0) AS w
            FROM w{t} LEFT JOIN g{t} USING (bucket))"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT bucket, CAST(w AS BIGINT) AS weight FROM w{n_iter}"
    )


def _pagerank_sql_over(
    edges_cte: str,
    n_iter: int = 3,
    weighted: bool = False,
    seeds: list | None = None,
) -> str:
    """Unrolled fixed-point integer-PageRank oracle over any
    ``edges(src, dst)`` DISTINCT edge CTE (same arithmetic as the
    hand-written customer-supplier pagerank oracle). With ``weighted``
    the CTE must expose ``edges(src, dst, w)``; outdeg becomes the
    total out-weight and flow is ``rank · w // outdeg``. With ``seeds``
    the teleport + dangling mass concentrate on the seed set
    (personalized PageRank)."""
    deg_expr = "sum(w)" if weighted else "count(*)"
    if seeds is None:
        tele = "CAST(1000000000000 // p.n AS BIGINT)"
        dang_share = "d.dang // p.n"
        r0_rank = tele
    else:
        in_seeds = ", ".join(f"'{s}'" for s in seeds)
        ns = len(seeds)
        tele = (
            f"CAST(CASE WHEN r.node IN ({in_seeds}) "
            f"THEN {10**12 // ns} ELSE 0 END AS BIGINT)"
        )
        dang_share = (
            f"CASE WHEN r.node IN ({in_seeds}) THEN d.dang // {ns} ELSE 0 END"
        )
        r0_rank = (
            f"CAST(CASE WHEN node IN ({in_seeds}) "
            f"THEN {10**12 // ns} ELSE 0 END AS BIGINT)"
        )
    ctes = [
        edges_cte,
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        f"""deg AS (SELECT node, CAST(coalesce(d.d, 0) AS BIGINT) AS outdeg
            FROM nodes LEFT JOIN (
                SELECT src AS node, {deg_expr} AS d FROM edges GROUP BY 1
            ) d USING (node))""",
        "params AS (SELECT count(*) AS n FROM nodes)",
        f"""r0 AS (SELECT node, outdeg, {r0_rank} AS rank
            FROM deg, params p)""",
    ]
    for t in range(1, n_iter + 1):
        ctes.append(
            f"d{t} AS (SELECT coalesce(sum(rank), 0) AS dang "
            f"FROM r{t - 1} WHERE outdeg = 0)"
        )
        flow = "r.rank * e.w // r.outdeg" if weighted else "r.rank // r.outdeg"
        ctes.append(
            f"c{t} AS (SELECT e.dst AS node, sum({flow}) AS contrib "
            f"FROM edges e JOIN r{t - 1} r ON e.src = r.node GROUP BY 1)"
        )
        ctes.append(
            f"""r{t} AS (SELECT r.node, r.outdeg,
            CAST(((100-85) * {tele}
                + 85 * (coalesce(c.contrib, 0) + {dang_share})) // 100
                AS BIGINT) AS rank
            FROM r{t - 1} r LEFT JOIN c{t} c USING (node), params p, d{t} d)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, rank AS rank_scaled FROM r{n_iter}"
    )


def _walks_sql_over(
    edges_cte: str, walk_len: int = 4, walks_per_node: int = 2, salt: str = "walk"
) -> str:
    """Unrolled deterministic-random-walk oracle over any
    ``edges(src, dst)`` DISTINCT edge CTE — step choice is the md5-grid
    convention of ``ops.graph.random_walks``."""
    wvals = ", ".join(f"({w})" for w in range(walks_per_node))
    ctes = [
        edges_cte,
        "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1)",
        """nbr AS (SELECT src, dst,
            row_number() OVER (PARTITION BY src ORDER BY dst) AS rn FROM edges)""",
        f"""s0 AS (SELECT d.src AS start, w.walk, d.src AS node
            FROM deg d CROSS JOIN (VALUES {wvals}) w(walk))""",
    ]
    for t in range(1, walk_len):
        ctes.append(
            f"""s{t} AS (SELECT p.start, p.walk, n.dst AS node
            FROM s{t - 1} p
            JOIN deg ON deg.src = p.node
            JOIN nbr n ON n.src = p.node
             AND n.rn = 1 + (CAST(('0x' || substr(md5(
                 '{salt}:' || p.start || ':' || CAST(p.walk AS VARCHAR)
                 || ':{t}:' || p.node), 1, 8)) AS BIGINT) % deg.d)"""
            + ")"
        )
    selects = [
        f"SELECT start, CAST(walk AS BIGINT) AS walk, CAST({t} AS BIGINT) AS step, node FROM s{t}"
        for t in range(walk_len)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def _classifier_sql(
    n_iter: int = 3,
    n_features: int = 64,
    label_expr: str = "CASE WHEN lang = 'en' THEN 1 ELSE -1 END",
) -> str:
    """Train-then-infer oracle: the perceptron unroll plus one scoring
    CTE over the final weights."""
    base = _perceptron_sql(
        n_iter=n_iter, n_features=n_features, label_expr=label_expr
    )
    head, _, _ = base.rpartition("\nSELECT")
    return (
        head
        + f""",
        sf AS (SELECT f.doc, sum(f.cnt * w{n_iter}.w) AS score
               FROM f JOIN w{n_iter} USING (bucket) GROUP BY f.doc)
        SELECT doc AS doc_id, CAST(score AS BIGINT) AS score,
               CAST(CASE WHEN score > 0 THEN 1 ELSE -1 END AS BIGINT) AS pred
        FROM sf"""
    )


def _uncertain_sql(n_iter: int = 3, n_features: int = 64, k: int = 50) -> str:
    """Active-learning oracle: the classifier unroll wrapped in a
    margin-ordered LIMIT."""
    base = _classifier_sql(n_iter=n_iter, n_features=n_features)
    return (
        "SELECT doc_id, score, CAST(abs(score) AS BIGINT) AS margin "
        f"FROM ({base}) ORDER BY margin, doc_id LIMIT {k}"
    )


_NOISY_LABEL = (
    "(CASE WHEN lang = 'en' THEN 1 ELSE -1 END)"
    " * (CASE WHEN doc_id % 17 = 0 THEN -1 ELSE 1 END)"
)


def _noisy_sql(n_iter: int = 3, n_features: int = 64, k: int = 50) -> str:
    """Confident-learning oracle: train on the PLANTED-FLIP labels,
    then the k most-confident disagreements (pred != y, |score| desc)
    are the suspected label errors."""
    base = _perceptron_sql(
        n_iter=n_iter, n_features=n_features, label_expr=_NOISY_LABEL
    )
    head, _, _ = base.rpartition("\nSELECT")
    return (
        head
        + f""",
        sf AS (SELECT f.doc, any_value(f.y) AS y,
                      sum(f.cnt * w{n_iter}.w) AS score
               FROM f JOIN w{n_iter} USING (bucket) GROUP BY f.doc)
        SELECT doc AS doc_id, CAST(score AS BIGINT) AS score,
               CAST(y AS BIGINT) AS label
        FROM sf
        WHERE (CASE WHEN score > 0 THEN 1 ELSE -1 END) <> y
        ORDER BY abs(score) DESC, doc LIMIT {k}"""
    )


def _q_noisy_labels(sf_dir: str):
    """Label-noise audit (confident-learning shape): 1-in-17 labels are
    planted flips; the integer perceptron trains ON the noisy labels,
    scores the corpus, and the 50 most-CONFIDENT disagreements
    (pred != label, largest |score|) are the suspected errors —
    train + score streaming passes, one task hash_join to reattach
    labels, local top-k combiner (complete per-doc rows → per-batch
    top-k + driver merge is exact)."""
    import pandas as pd

    from fastie_ray.ops.join import hash_join
    from fastie_ray.ops.linear_train import (
        perceptron_score,
        perceptron_train,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        clean = (df["lang"] == "en").map({True: 1, False: -1})
        flip = (df["doc_id"].astype("int64") % 17 == 0).map(
            {True: -1, False: 1}
        )
        df["y"] = (clean * flip).astype("int64")
        return df

    labeled = ds.map_batches(lab, batch_format="pandas")
    w = perceptron_train(labeled, "y", n_iter=3, n_features=64)
    scored = perceptron_score(ds, w["weight"].to_numpy(), n_features=64)
    joined = hash_join(
        scored,
        labeled.map_batches(
            lambda df: df[["doc_id", "y"]], batch_format="pandas"
        ),
        on="doc_id", left_cols=["doc_id", "score", "pred"],
        right_cols=["doc_id", "y"], n_buckets=16,
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["pred"] != df["y"]].copy()
        df["margin"] = df["score"].abs()
        df = df.sort_values(
            ["margin", "doc_id"], ascending=[False, True]
        ).head(50)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "score": df["score"].astype("int64"),
                "label": df["y"].astype("int64"),
            }
        )

    cand = joined.map_batches(topk, batch_format="pandas").to_pandas()
    cand["margin"] = cand["score"].abs()
    out = cand.sort_values(
        ["margin", "doc_id"], ascending=[False, True]
    ).head(50)[["doc_id", "score", "label"]]
    return out.reset_index(drop=True)


def _kcenter_sql(k: int = 5) -> str:
    """Unrolled Gonzalez farthest-first oracle: one (pick, min-dist
    update) CTE pair per center, integer-grid distances."""

    def dist(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
            f"p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
        )

    ctes = [
        "iv AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(floor(1000 * CAST(x AS DOUBLE)) AS BIGINT)) AS v FROM embeddings)",
        "c0 AS (SELECT v FROM iv WHERE vec_id = (SELECT min(vec_id) FROM iv))",
        f"m1 AS (SELECT a.vec_id, a.v, {dist('a.v', 'c0.v')} AS mind FROM iv a, c0)",
    ]
    for i in range(1, k):
        ctes.append(
            f"p{i} AS (SELECT vec_id, v, mind FROM m{i} "
            f"ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        if i < k - 1:
            ctes.append(
                f"m{i + 1} AS (SELECT m.vec_id, m.v, "
                f"least(m.mind, {dist('m.v', 'p.v')}) AS mind "
                f"FROM m{i} m, p{i} p)"
            )
    selects = [
        "SELECT CAST(0 AS BIGINT) AS rank, "
        "(SELECT min(vec_id) FROM iv) AS vec_id, CAST(0 AS BIGINT) AS dist"
    ] + [
        f"SELECT CAST({i} AS BIGINT), vec_id, CAST(mind AS BIGINT) FROM p{i}"
        for i in range(1, k)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)


def _kcore_sql(k: int = 2, rounds: int = 4) -> str:
    """Unrolled k-core peel oracle (one degree+filter CTE pair per
    round) over the per-customer chain/cycle order graph — mirrors
    ``_q_kcore`` exactly."""
    ctes = [
        """o AS (SELECT o_custkey AS c, o_orderkey AS ok,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
            count(*) OVER (PARTITION BY o_custkey) AS n FROM orders)""",
        """chain AS (SELECT 'o' || a.ok AS a, 'o' || b.ok AS b
            FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 1)""",
        """cyc AS (SELECT 'o' || l.ok AS a, 'o' || f.ok AS b
            FROM o l JOIN o f ON l.c = f.c AND l.rn = l.n AND f.rn = 1
            AND l.n >= 2 AND l.c % 2 = 0)""",
        "j AS (SELECT a, b FROM chain UNION SELECT a, b FROM cyc)",
        "e0 AS (SELECT a AS src, b AS dst FROM j UNION SELECT b AS src, a AS dst FROM j)",
    ]
    for r in range(rounds):
        ctes.append(f"d{r} AS (SELECT src, count(*) AS deg FROM e{r} GROUP BY src)")
        ctes.append(
            f"""e{r + 1} AS (SELECT e.src, e.dst FROM e{r} e
            JOIN d{r} a ON e.src = a.src JOIN d{r} b ON e.dst = b.src
            WHERE a.deg >= {k} AND b.deg >= {k})"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT src AS node, count(*) AS deg FROM e{rounds} GROUP BY src"
    )


def _lpa_sql(rounds: int = 4) -> str:
    """Unrolled label-propagation oracle (one count/argmax CTE pair per
    round) over the same chain/cycle order graph as ``_kcore_sql`` —
    mirrors ``_q_lpa_communities`` exactly (ties → smallest label)."""
    ctes = [
        """o AS (SELECT o_custkey AS c, o_orderkey AS ok,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
            count(*) OVER (PARTITION BY o_custkey) AS n FROM orders)""",
        """chain AS (SELECT 'o' || a.ok AS a, 'o' || b.ok AS b
            FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 1)""",
        """cyc AS (SELECT 'o' || l.ok AS a, 'o' || f.ok AS b
            FROM o l JOIN o f ON l.c = f.c AND l.rn = l.n AND f.rn = 1
            AND l.n >= 2 AND l.c % 2 = 0)""",
        "j AS (SELECT a, b FROM chain UNION SELECT a, b FROM cyc)",
        "e0 AS (SELECT a AS src, b AS dst FROM j UNION SELECT b AS src, a AS dst FROM j)",
        "lab0 AS (SELECT DISTINCT dst AS node, dst AS lab FROM e0)",
    ]
    for r in range(rounds):
        ctes.append(
            f"""c{r} AS (SELECT e.dst AS node, l.lab, count(*) AS cnt
            FROM e0 e JOIN lab{r} l ON l.node = e.src GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""lab{r + 1} AS (SELECT node, lab FROM (
                SELECT node, lab,
                       row_number() OVER (PARTITION BY node
                                          ORDER BY cnt DESC, lab) AS rk
                FROM c{r}) WHERE rk = 1)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, lab AS community_id FROM lab{rounds}"
    )


def _q_len_quantiles(sf_dir: str):
    """Exact discrete quantiles of doc length: value-count aggregate
    (bounded by the distinct-length domain) + driver cumsum — no
    global sort, no sketch; matches SQL quantile_disc exactly."""
    import ray.data

    from fastie_ray.ops.stats import exact_quantiles

    ds = _read(sf_dir, "documents", columns=["n_chars"])
    return exact_quantiles(ds, "n_chars", _QUANTILE_QS)


def _q_knn(sf_dir: str):
    import ray.data

    from fastie_ray.ops.similarity import knn_bruteforce

    ds = _read(sf_dir, "embeddings")
    out = knn_bruteforce(ds, query_ids=[0, 1, 2, 3], k=5)
    return out[["query_id", "neighbor_id", "rank"]]


def _q_bitext_pairs(sf_dir: str):
    """Margin-based bitext mining (CCMatrix / LASER recipe) between the
    even-id and odd-id halves of the embeddings table: block-pair exact
    kNN in one exchange, ratio-margin = cos / mean of the forward and
    backward top-k averages, best-margin pair per source above 1.0."""
    import pandas as pd

    from fastie_ray.ops.bitext import bitext_mine

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def sides(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["side"] = df["vec_id"].map(lambda v: "a" if v % 2 == 0 else "b")
        return df

    return bitext_mine(
        ds.map_batches(sides, batch_format="pandas"),
        k=4, margin_thresh=1.0, n_a_blocks=2, n_b_blocks=2,
    )


def _q_events_by_type(sf_dir: str):
    import pandas as pd
    import ray.data

    from fastie_ray.pipelines.kg import _bucketed_groupby

    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            n_events=("value", "count"), sum_value=("value", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), sum_value=("sum_value", "sum")
        )
        out["sum_value"] = out["sum_value"].round(4)
        return out

    return _bucketed_groupby(ds.map_batches(partial, batch_format="pandas"), "event_type", final, 8)


def _q_windowed_events(sf_dir: str):
    import ray.data

    from fastie_ray.ops.windows import tumbling_window_agg

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    return tumbling_window_agg(ds, freq="1h")


def _q_grid_fill(sf_dir: str):
    """Gap-fill resampling: daily grid per user (global [t0, t1] from a
    two-scalar aggregate, distributed key×slot expansion) ASOF-filled
    with the latest prior observation (null before the first)."""
    from fastie_ray.ops.windows import grid_fill_resample

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    return grid_fill_resample(ds, step="1d")


def _q_interval_overlaps(sf_dir: str):
    """Interval×interval overlap self-join per supplier: shipping
    windows (l_shipdate .. +1-5 days, deterministic from quantity)
    that overlap for the same supplier. Chunked replication + the
    canonical-chunk rule: ONE exchange, no pair dedup pass."""
    import pandas as pd

    from fastie_ray.ops.interval import interval_overlap_join

    ds = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate", "l_quantity"],
    )

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.to_datetime(df["l_shipdate"])
        days = (df["l_quantity"].astype("int64") % 5 + 1).to_numpy()
        return pd.DataFrame(
            {
                "iid": df["l_orderkey"].to_numpy() * 10
                + df["l_linenumber"].to_numpy(),
                "k": df["l_suppkey"].to_numpy(),
                "s": s,
                "e": s + pd.to_timedelta(days, unit="D"),
            }
        )

    return interval_overlap_join(
        ds.map_batches(mk, batch_format="pandas"),
        bucket="7d", n_buckets=16, self_pairs=True,
    )


def _q_rolling_avg(sf_dir: str):
    """Per-key bounded-lookback window frame (ROWS BETWEEN 3 PRECEDING
    AND CURRENT ROW moving sum/avg over (ts, id) order) via the
    two-phase scalable form — only each (key, day)'s first/last k-1
    rows cross the second exchange, so hot users never co-locate.
    round(4) is tie-free here: 2-decimal values and window divisors
    {1,2,3,4} can't land exactly on a 5e-5 rounding boundary."""
    from fastie_ray.ops.rolling import rolling_frame_scalable

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    return rolling_frame_scalable(ds, k=4, bucket="1d", n_buckets=16)


def _q_hopping_events(sf_dir: str):
    import ray.data

    from fastie_ray.ops.windows import hopping_window_agg

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    return hopping_window_agg(ds, size="1h", hop="30min")


def _q_session_stats(sf_dir: str):
    """Two-phase scalable sessionization (phase 1 partitions by
    (key, time bucket) so hot keys split across partitions; phase 2
    merges only boundary sessions) — output identical to the
    single-shuffle version (equality-tested in pytest)."""
    import ray.data

    from fastie_ray.ops.windows import session_window_agg_scalable

    ds = _read(sf_dir, "events", columns=["ts", "user_id", "value"])
    return session_window_agg_scalable(ds, gap="30min", bucket="1d")


def _q_asof_clicks(sf_dir: str):
    """As-of join demo: every click joined to the latest prior view of
    the same user (event_id_r null when none)."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.windows import asof_join

    import pyarrow.compute as pc

    # predicate pushdown: only the needed event types leave storage
    clicks = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"],
        filter=pc.field("event_type") == "click", override_num_blocks=16,
    )
    views = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"],
        filter=pc.field("event_type") == "view", override_num_blocks=16,
    )
    out = asof_join(clicks, views, key_col="user_id", ts_col="ts",
                    right_cols=["event_id"])

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "view_event_id": df["event_id_r"].fillna(-1).astype("int64"),
            }
        )

    return out.map_batches(fin, batch_format="pandas")


def _q_range_clicks(sf_dir: str):
    """Range join demo: every click x every view of the same user in
    the preceding hour (both ends inclusive)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.windows import range_join

    clicks = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"],
        filter=pc.field("event_type") == "click", override_num_blocks=16,
    )
    views = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"],
        filter=pc.field("event_type") == "view", override_num_blocks=16,
    )
    out = range_join(
        clicks, views, window="1h", bucket="1d", right_cols=["event_id"],
        left_cols=["event_id", "ts", "user_id"],
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "view_event_id": df["event_id_r"].astype("int64"),
            }
        )

    return out.map_batches(fin, batch_format="pandas")


def _q_top_users(sf_dir: str):
    import ray.data

    from fastie_ray.ops.windows import top_k_by_sum

    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    return top_k_by_sum(ds, k=10)


def _q_q1_lineitem(sf_dir: str):
    import pandas as pd
    import ray.data

    from fastie_ray.pipelines.kg import _bucketed_groupby

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["revenue"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_revenue=("revenue", "sum"),
            n_rows=("l_quantity", "count"),
        )
        g["__k"] = g["l_returnflag"] + "|" + g["l_linestatus"]
        return g

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("sum_qty", "sum"),
            sum_revenue=("sum_revenue", "sum"),
            n_rows=("n_rows", "sum"),
        )
        out["sum_qty"] = out["sum_qty"].round(4)
        out["sum_revenue"] = out["sum_revenue"].round(4)
        return out

    return _bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"), "__k", final, 4
    )


def _q_orders_by_segment(sf_dir: str):
    """Broadcast join: customer (small side, ray.put once) ⋈ orders."""
    import pandas as pd
    import ray
    import ray.data

    from fastie_ray.pipelines.kg import _bucketed_groupby

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    cust_ref = ray.put(dict(zip(cust.c_custkey, cust.c_mktsegment)))
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        seg = ray.get(cust_ref)
        df = df.copy()
        df["c_mktsegment"] = df["o_custkey"].map(seg)
        return df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("o_totalprice", "count"), sum_price=("o_totalprice", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("n_orders", "sum"), sum_price=("sum_price", "sum")
        )
        out["sum_price"] = out["sum_price"].round(4)
        return out

    return _bucketed_groupby(
        orders.map_batches(partial, batch_format="pandas"), "c_mktsegment", final, 4
    )


def _q_lineitem_orders(sf_dir: str):
    """Big⋈big equi-join via the task-based hash_join primitive, then
    revenue per order priority (partial→bucketed-final aggregate)."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.join import hash_join
    from fastie_ray.pipelines.kg import _bucketed_groupby

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_extendedprice", "l_discount"],
        right_cols=["o_orderkey", "o_orderpriority"],
        n_buckets=16,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        return df.groupby("o_orderpriority", as_index=False).agg(
            n_items=("rev", "count"), revenue=("rev", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("o_orderpriority", as_index=False).agg(
            n_items=("n_items", "sum"), revenue=("revenue", "sum")
        )
        out["n_items"] = out["n_items"].astype("int64")
        out["revenue"] = out["revenue"].round(4)
        return out

    return _bucketed_groupby(
        j.map_batches(partial, batch_format="pandas"), "o_orderpriority", final, 4
    )


def _q_heavy_tokens(sf_dir: str):
    """Exact heavy-hitter tokens (≥0.2% of all occurrences) via
    two-pass Misra-Gries sketch-then-verify — never shuffles the full
    vocabulary."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.stats import heavy_hitters
    from fastie_ray.ops.text_index import _TOKEN_RE

    def items(df: pd.DataFrame) -> pd.Series:
        return df["text"].str.findall(_TOKEN_RE).explode().dropna().str.lower()

    ds = _read(sf_dir, "documents", columns=["text"])
    out = heavy_hitters(ds, min_share=0.002, item_fn=items)
    return out.map_batches(
        lambda df: df.rename(columns={"item": "token"}), batch_format="pandas"
    )


def _q_cust_no_orders(sf_dir: str):
    """Anti-join (customers with no HIGH-VALUE orders) via hash_join
    how="anti", then segment rollup — the existence-filter shape used
    to drop flagged duplicates from a corpus. The price predicate is
    pushed to the parquet scan."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.join import hash_join
    from fastie_ray.pipelines.kg import _bucketed_groupby

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).filter(expr="o_totalprice > 300000.0")
    no_orders = hash_join(
        cust, orders, on="c_custkey", right_on="o_custkey", how="anti",
        left_cols=["c_custkey", "c_mktsegment", "c_acctbal"],
        n_buckets=16,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("c_mktsegment", as_index=False).agg(
            n_customers=("c_custkey", "count"), sum_acctbal=("c_acctbal", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("c_mktsegment", as_index=False).agg(
            n_customers=("n_customers", "sum"), sum_acctbal=("sum_acctbal", "sum")
        )
        out["n_customers"] = out["n_customers"].astype("int64")
        out["sum_acctbal"] = out["sum_acctbal"].round(2)
        return out

    return _bucketed_groupby(
        no_orders.map_batches(partial, batch_format="pandas"), "c_mktsegment", final, 4
    )


def _q_minhash_dups(sf_dir: str):
    import ray.data

    from fastie_ray.ops.neardup import minhash_lsh_dups

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    # verify="exact" carries shingles through the band shuffle — the
    # fastest mode at sandbox scale (fewest exchange floors). At 100 TB
    # use verify="join" (16-byte band rows, shingles cross ONE exchange
    # at 1x corpus payload) — bit-identical output, parity-tested.
    return minhash_lsh_dups(docs, threshold=0.7, concurrency=4)


def _q_neardup_incremental(sf_dir: str):
    """Incremental near-dup (``ops.neardup.minhash_dups_against``):
    a crawl increment (every 5th document, verbatim, id + 1e6) checked
    against the standing corpus — all cross pairs at shingle Jaccard
    ≥ 0.7. Oracle: exact pairwise Jaccard increment × base (the synth
    corpus is template-heavy, so non-planted near-dups are expected
    and must match too)."""
    import pandas as pd

    from fastie_ray.ops.neardup import minhash_dups_against

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inc(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["doc_id"].astype("int64") % 5 == 0]
        return pd.DataFrame(
            {
                "doc_id": sub["doc_id"].astype("int64") + 1_000_000,
                "text": sub["text"],
            }
        )

    return minhash_dups_against(
        docs, docs.map_batches(inc, batch_format="pandas"),
        threshold=0.7, concurrency=4,
    )


def _q_dup_clusters(sf_dir: str):
    """Dedup statistics (the FineWeb/CCNet dup-cluster-size report):
    MinHash near-dup pairs → distributed CC over the pair graph →
    (cluster_size, n_clusters) histogram with the singleton row filled
    from the corpus count. Oracle: exact pairwise Jaccard + recursive
    CTE CC + GROUP BY size."""
    from fastie_ray.ops.dedup import dup_cluster_histogram
    from fastie_ray.ops.neardup import minhash_lsh_dups

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_lsh_dups(docs, threshold=0.7, concurrency=4)
    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    return dup_cluster_histogram(pairs, total_docs=n_docs)


def _q_simhash_dups(sf_dir: str):
    """Planted-duplicate construction: every 5th doc re-appears
    verbatim with id+1e6 (simhash distance 0 by construction, so the
    banding must recall it); the SQL-checkable output is the planted
    subset (doc_b == doc_a + 1e6 identifies exactly those pairs —
    copies only exist for base ids). Full-corpus pair semantics are
    covered by pytest against brute-force hamming."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.neardup import simhash_dups

    # 16 blocks: this query is 3 chained exchanges whose per-block work
    # is trivial — at Ray's default 64-way split the ~1000 scheduled
    # tasks hit the ~50 tasks/s driver dispatch ceiling (NOTES #11);
    # block count should track data volume, not CPU count
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        override_num_blocks=16,
    )

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] % 5 == 0].copy()
        d["doc_id"] = d["doc_id"] + 1_000_000
        return pd.concat([df, d], ignore_index=True)

    pairs = simhash_dups(docs.map_batches(plant, batch_format="pandas"),
                         hamming_thresh=3, concurrency=4)

    def planted(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_b"] - df["doc_a"] == 1_000_000][
            ["doc_a", "doc_b", "hamming"]
        ]

    return pairs.map_batches(planted, batch_format="pandas")


def _q_jaccard_prefix(sf_dir: str):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.neardup import jaccard_pairs_batch

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text_a": df["text"],
                "text_b": [" ".join(t.strip().split()[:-1]) for t in df["text"]],
            }
        )
        return jaccard_pairs_batch(out)[["doc_id", "jaccard_e6"]]

    return docs.map_batches(pairs, batch_format="pandas")


def _q_embed_neardup(sf_dir: str):
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.neardup import embedding_neardup

    emb = _read(sf_dir, "embeddings")

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["vec_id"] % 5 == 0].copy()
        d["vec_id"] = d["vec_id"] + 1_000_000
        d["embedding"] = [
            (np.asarray(e, dtype=np.float32) * 1.01).tolist() for e in d["embedding"]
        ]
        return pd.concat([df, d], ignore_index=True)

    pairs = embedding_neardup(emb.map_batches(plant, batch_format="pandas"), threshold=0.9)
    return pairs.select_columns(["id_a", "id_b"])


def _q_triplet_mining(sf_dir: str):
    """Unsupervised contrastive training-pair mining (the SimCSE-style
    pseudo-labeling pass): per anchor, the nearest corpus vector is the
    mined positive and the next-nearest are hard negatives (ranks 2-4).
    Brute-force path: broadcast anchor matrix, per-batch local top-k,
    driver merges blocks × k rows."""
    import numpy as np

    from fastie_ray.ops.similarity import knn_bruteforce

    emb = _read(sf_dir, "embeddings")
    anchors = list(range(0, 500, 50))
    out = knn_bruteforce(emb, query_ids=anchors, k=4)
    out = out.rename(columns={"query_id": "anchor_id", "neighbor_id": "pair_id"})
    out["role"] = np.where(out["rank"] == 1, "pos", "neg")
    return out[["anchor_id", "pair_id", "role", "rank"]]


def _q_lsh_knn(sf_dir: str):
    """Planted-neighbor construction: each query vector gets a scaled
    (×1.01) copy at id+1e6 — identical direction means identical LSH
    sign pattern (always co-bucketed) and cosine exactly 1.0, so the
    approximate search MUST return it at rank 1. Full top-k recall vs
    brute force is asserted in pytest."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.similarity import lsh_knn

    ds = _read(sf_dir, "embeddings")

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["vec_id"].isin([0, 1, 2, 3])].copy()
        d["vec_id"] = d["vec_id"] + 1_000_000
        d["embedding"] = [
            (np.asarray(e, dtype=np.float32) * 1.01).tolist() for e in d["embedding"]
        ]
        return pd.concat([df, d], ignore_index=True)

    out = lsh_knn(ds.map_batches(plant, batch_format="pandas"),
                  query_ids=[0, 1, 2, 3], k=5)
    return out[out["rank"] == 1][["query_id", "neighbor_id", "rank"]]


_PLANT_LANGS = ["en", "de", "fr", "es", "zh"]


def _plant_lang_text(lang: str) -> str:
    """Deterministic language-marked text: sorted stopword inventory per
    language (mutually non-overlapping hit-rates under the LangId
    heuristic), pure CJK for zh."""
    if lang == "zh":
        return "数据处理系统的大规模分布式计算引擎"
    from fastie_ray.ops.text_analysis import _STOPWORDS

    return " ".join(sorted(_STOPWORDS[lang]))


def _q_ivf_knn(sf_dir: str):
    """Planted-neighbor construction (like lsh_knn): each query vector
    gets a scaled (×2.0) copy at id+1e6 — identical direction means the
    same Voronoi cell under the cosine-trained centroids and cosine
    exactly 1.0, so IVF MUST return it at rank 1. Recall vs brute force
    is asserted in pytest."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.similarity import ivf_knn

    ds = _read(sf_dir, "embeddings")

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["vec_id"].isin([0, 1, 2, 3])].copy()
        d["vec_id"] = d["vec_id"] + 1_000_000
        d["embedding"] = [
            (np.asarray(e, dtype=np.float32) * 2.0).tolist() for e in d["embedding"]
        ]
        return pd.concat([df, d], ignore_index=True)

    out = ivf_knn(ds.map_batches(plant, batch_format="pandas"),
                  query_ids=[0, 1, 2, 3], k=5, n_centroids=8, nprobe=2)
    return out[out["rank"] == 1][["query_id", "neighbor_id", "rank"]]


# Frozen integer hyperplanes for the ANN-recall oracle: generated once
# (seeded standard normal × 100, floored) and pinned so the Ray query
# and the DuckDB oracle hash sign bits against the exact same planes.
_ANN_FROZEN_INT_PLANES: list[list[int]] = [
    [-161, 6, 74, 15, 86, 291, -148, 94, -167, 34, -52, 132, -87, 51, -127, -216, 43, 173, 52, -101, 26, 76, 119, -116, 69, 35, -4, 1, -68, -63, 133, 25, -49, -250, -88, -51, -129, -134, 82, -25, -170, -134, -30, 111, -151, 159, -49, -172, 51, 143, -23, 64, -32, -2, 166, 89, -121, 279, -103, 84, 49, -9, 20, -17],
    [83, -72, -118, 47, 173, -14, 170, -9, 155, 96, 52, 93, -84, 9, -158, -178, 91, -15, 100, 13, -78, 289, 137, 17, 2, 165, -33, 152, 65, -133, 74, 111, 54, 96, 137, -50, 225, 16, 83, -159, 101, 72, -59, 68, 50, 100, 71, -56, 5, -170, 2, -52, 106, 134, 64, -186, 52, -111, 43, 15, -110, -132, 83, 211],
    [-5, 32, -55, -28, -168, 8, 19, -31, 10, -36, 133, -8, 26, 96, 19, 40, -183, -25, 191, 39, 102, 39, 188, -75, -81, 65, 78, 31, 29, -67, 103, 3, 49, -48, 205, -45, 16, -111, -82, -5, -83, 12, -84, 12, 2, 123, -51, -111, -81, -217, -219, 100, 212, -39, 9, -46, 95, -18, -13, -16, -162, 82, -123, 221],
    [134, 18, -274, 3, 73, 37, -65, 201, 73, -23, 214, 39, 15, 38, 121, 31, 21, 25, 189, 7, -136, -78, -50, 107, 117, -34, 0, -30, -144, -111, -132, 27, 79, -15, -49, 68, -94, -199, -8, 32, -109, -144, -71, -141, -31, -29, 14, 89, -3, 55, 43, -163, -25, -110, -119, 5, 104, 62, 42, 141, -6, -69, -47, -56],
    [-193, 120, -18, -13, -48, 2, -58, 92, -163, 66, 7, 114, 138, 136, -1, -88, 144, -106, 27, -50, 17, 193, 63, 36, -6, 39, 83, 59, -89, -64, 4, 76, 43, -16, -187, -122, 143, -48, 126, 28, -60, -170, -31, -66, -119, -36, 136, 170, -188, -29, -36, 32, 75, 36, 5, -153, -94, -43, -63, -159, -126, 71, -114, -46],
    [-65, 33, -56, -114, -57, 96, 150, 66, 30, -52, 58, 154, 184, -136, -95, 243, -31, 113, -60, 107, 134, -152, -225, 9, -114, -24, 110, 99, 112, -167, 61, -130, -71, 71, 88, 26, 50, -16, -120, -64, 47, -103, -96, -152, -106, -21, -19, 180, 137, -134, 142, -35, 181, -63, 20, 55, 105, 106, 39, -112, -55, -67, -40, -97],
]

_ANN_RECALL_ANCHORS = list(range(0, 500, 25))  # 20 query vectors
# 4 of the 6 frozen planes: 16 buckets. The synthetic embeddings are
# isotropic (hash-generated), so sign-LSH has little locality signal by
# construction — measured recall@10 ≈ 0.10 while scanning ~6% of the
# corpus, vs IVF ≈ 0.65 at nprobe=3/10. That spread is the point of the
# query: it MEASURES retrieval quality instead of asserting it.
_ANN_N_PLANES = 4


def _q_ann_recall(sf_dir: str):
    """Retrieval-QUALITY oracle for the ANN family (VERDICT r3 #2):
    recall@10 of IVF (frozen int-grid coarse centroids, nprobe=3) and
    sign-LSH (frozen int hyperplanes, exact-bucket candidates) vs the
    exact top-10 — all under integer squared-L2 in the floor(1000·x)
    grid, so candidate generation, tie-breaks and the recall ratio are
    bit-reproducible in SQL. One broadcast streaming pass, no shuffle."""
    from fastie_ray.ops.similarity import ann_recall_int

    ds = _read(sf_dir, "embeddings")
    return ann_recall_int(
        ds, _ANN_RECALL_ANCHORS, k=10,
        int_centroids=_KMEANS_FROZEN_INT_CENTROIDS,
        int_planes=_ANN_FROZEN_INT_PLANES[:_ANN_N_PLANES], nprobe=3,
    )


def _q_lang_id(sf_dir: str):
    """Planted-stopword construction (the synth `lang` column is
    independent of the synthetic token text, so the oracle plants
    texts whose language the heuristic provably identifies): every
    5th doc re-appears with id+1e6 and a language cycled by formula;
    the SQL-checkable output is the planted subset."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.text_analysis import lang_id

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] % 5 == 0].copy()
        d["text"] = [
            _plant_lang_text(_PLANT_LANGS[(int(i) // 5) % 5]) for i in d["doc_id"]
        ]
        d["doc_id"] = d["doc_id"] + 1_000_000
        return pd.concat([df, d], ignore_index=True)

    preds = lang_id(ds.map_batches(plant, batch_format="pandas"))

    def planted(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"] >= 1_000_000]

    return preds.map_batches(planted, batch_format="pandas")


def _q_quality(sf_dir: str):
    import ray.data

    from fastie_ray.ops.text_analysis import quality_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return quality_scores(ds)


def _q_srm_audit(sf_dir: str):
    """Sample-ratio-mismatch audit (``ops.stats.srm_audit``, the A/B
    first sanity check): per event_type, integer-exact chi-square of
    the user_id % 2 variant split vs 50/50, flagged above the
    chi2(0.95, df=1) critical value — count combiner, one
    group-bucketed exchange, int64 throughout."""
    from fastie_ray.ops.stats import srm_audit

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return srm_audit(ev)


def _q_cmeee_stats(sf_dir: str):
    """Corpus stats over the REAL CMeEE dev corpus (VERDICT r4 #1):
    per-label mention count / distinct docs / distinct surfaces / total
    span chars over the committed relational conversion of the
    reference's ``examples/named_entity_recognition/datasets/cmeee/
    dev.json`` (``data/golden/cmeee_dev.parquet``, written by
    ``scripts/convert_real_corpora.py``) — the one driver-oracled query
    running on real CJK data rather than synthetic fixtures. Ignores
    ``sf_dir`` by design: both sides read the identical committed
    bytes (the same ``_GOLDEN_CMEEE`` constant the oracle SQL
    interpolates)."""
    import ray.data

    from fastie_ray.sources.corpus import mention_stats

    ds = ray.data.read_parquet(_GOLDEN_CMEEE, override_num_blocks=8)
    return mention_stats(ds)


def _q_duee_stats(sf_dir: str):
    """Corpus stats over the REAL DuEE dev corpus: per event_type —
    distinct events, argument rows, distinct roles, total argument
    chars over the committed M7-shaped conversion of the reference's
    ``event_extraction/datasets/duee/dev.json`` (lstrip-corrected
    offsets). Ignores ``sf_dir`` by design: both sides read the
    identical committed bytes."""
    import ray.data

    from fastie_ray.sources.corpus import event_stats

    ds = ray.data.read_parquet(_GOLDEN_DUEE, override_num_blocks=8)
    return event_stats(ds)


def _q_boilerplate(sf_dir: str):
    """Per-source boilerplate share (``ops.text_analysis.
    boilerplate_windows``, the CCNet/RefinedWeb cleaning step):
    non-overlapping 8-token windows recurring in ≥3 distinct docs of
    the same source are boilerplate; per doc (n_windows, n_bp, bp_e6).
    Two bucketed exchanges — (source, window-md5) frequency+flag, then
    doc rollup — no driver-side flag table."""
    from fastie_ray.ops.text_analysis import boilerplate_windows

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "source", "text"])
    return boilerplate_windows(docs)


def _q_memorization_attrib(sf_dir: str):
    """Training-data attribution / memorization audit
    (``ops.attribution.memorization_attribution``): for each sample doc
    (doc_id % 61 == 0), the top-1 OTHER doc by shared distinct 4-gram
    hashes (df-capped at 200 — stopword-run grams carry no evidence and
    explode postings), with the share of the sample covered. On this
    corpus the only matches are the PLANTED near-duplicate families —
    exactly what a memorization audit should find. Two bucketed
    exchanges (gram postings + cap inside the gram bucket, then a
    sample-bucketed argmax); postings bounded by max_df."""
    from fastie_ray.ops.attribution import memorization_attribution

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return memorization_attribution(docs, shingle=4, max_df=200)


def _q_purged_folds(sf_dir: str):
    """Purged + embargoed time-series CV audit (``ops.splits.
    purged_time_folds``, the López-de-Prado leakage-safe CV shape):
    4 contiguous time folds over events by (ts, event_id) global rank
    (floor formula, no sort barrier), per test fold the 3-hour
    label-horizon PURGE (earlier rows whose label window crosses the
    fold's lower boundary) and the 6-hour post-fold embargo
    (inclusive lower bound — boundary-tied rows embargoed) counted out
    of training — integer audit (test_fold, n_test, n_purged,
    n_embargo, n_train)."""
    from fastie_ray.ops.splits import purged_time_folds

    ev = _read(sf_dir, "events", columns=["event_id", "ts"])
    return purged_time_folds(ev, k=4, purge_us=3 * 3600 * 1_000_000)


def _q_preference_pairs(sf_dir: str):
    """DPO-style preference pairs (``ops.selection.preference_pairs``):
    per (lang, 64-token length bucket), chosen = best integer quality
    score (mean_token_len_e6 − 2·punct_ratio_e6), rejected = worst,
    min-doc_id tie-breaks — classic combiner (2 candidate rows per
    group per block, ONE group-bucketed exchange; corpus never
    shuffles)."""
    from fastie_ray.ops.selection import preference_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return preference_pairs(ds)


def _q_winnow(sf_dir: str):
    """Winnowing fingerprint selection (k=8 grams, w=4 windows) — one
    shuffle-free map; oracle recomputes grams via generate_series +
    md5, window MIN, rightmost tie by max pos."""
    from fastie_ray.ops.text_analysis import winnow_fingerprints

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return winnow_fingerprints(ds, k=8, w=4)


def _q_graph_components(sf_dir: str):
    """Connected components over the undirected customer↔supplier
    graph, FORCED onto the distributed min-label-propagation path
    (driver_threshold=0 — the 100-TB shape, labels never a driver
    structure); component id = min reachable node id, oracle is a
    recursive CTE with MIN(comp)."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.join import hash_join
    from fastie_ray.stages.canonicalize import connected_components_ds

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"], right_cols=["o_orderkey", "o_custkey"],
    )
    edges = dedup_exact(
        j.map_batches(
            lambda df: pd.DataFrame(
                {"u": "c" + df["o_custkey"].astype(str),
                 "v": "s" + df["l_suppkey"].astype(str)}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        ["u", "v"], n_buckets=16,
    )
    return connected_components_ds(
        edges, n_buckets=16, driver_threshold=0, max_rounds=8
    )


def _q_embed_quantize(sf_dir: str):
    """SQ8 scalar quantization of the embeddings table: global per-dim
    min/max (tiny driver reduce) then streaming integer codes;
    IEEE-double op order matches the SQL oracle bit-for-bit."""
    from fastie_ray.ops.similarity import scalar_quantize

    return scalar_quantize(_read(sf_dir, "embeddings"))


def _q_pq_codes(sf_dir: str):
    """Product-quantization code assignment (4 × 16-dim subspaces,
    16 sampled codewords): codebook = bottom-16 md5 sample (no
    exchange), one streaming encode pass with vectorized per-subspace
    argmin. Deterministic sampled codebooks keep the assignment
    SQL-exact (Lloyd refinement documented as the non-oracle path)."""
    from fastie_ray.ops.pq import pq_encode, sample_codebook

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cb = sample_codebook(ds, n_codes=16)
    return pq_encode(ds, cb, n_sub=4)


def _q_winnow_overlap(sf_dir: str):
    """MOSS-style overlap pairs: docs sharing ≥3 rare winnowing
    fingerprints (fp degree capped at 8 to drop boilerplate-hot
    prints). Two bucketed exchanges after a shuffle-free fingerprint
    map."""
    from fastie_ray.ops.text_analysis import winnow_overlap_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return winnow_overlap_pairs(ds, k=8, w=4, max_fp_docs=8, min_shared=3)


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup-style within-cluster cosine pruning (EXISTS-earlier
    semantics, integer-quantized cosine so the SQL oracle is exact).
    Near-dups are planted deterministically inside ONE map over ONE
    read: vec_id%50==0 gets a LATER-id 1.001-scaled copy (the copy is
    pruned), vec_id%70==0 an EARLIER (negative) id copy (the ORIGINAL
    is pruned) — both prune directions exercised."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.neardup import semantic_dedup

    ds = _read(sf_dir, "embeddings")

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        # one consistent element type (float64) across original and
        # planted rows — values unchanged, and the quantization both
        # here and in the SQL oracle runs in double anyway
        df = df.assign(
            embedding=[np.asarray(v, dtype=np.float64) for v in df["embedding"]]
        )
        outs = [df]
        later = df[df["vec_id"] % 50 == 0]
        if len(later):
            outs.append(pd.DataFrame({
                "vec_id": later["vec_id"] + 100_000,
                "embedding": [
                    (np.asarray(v, dtype=np.float64) * 1.001).astype(np.float64)
                    for v in later["embedding"]
                ],
                "label": later["label"],
            }))
        earlier = df[df["vec_id"] % 70 == 0]
        if len(earlier):
            outs.append(pd.DataFrame({
                "vec_id": -(earlier["vec_id"] + 1),
                "embedding": [
                    (np.asarray(v, dtype=np.float64) * 1.001).astype(np.float64)
                    for v in earlier["embedding"]
                ],
                "label": earlier["label"],
            }))
        return pd.concat(outs, ignore_index=True)[["vec_id", "embedding", "label"]]

    return semantic_dedup(ds.map_batches(plant, batch_format="pandas"))


def _q_quantile_filter(sf_dir: str):
    """Quality-floor curation: keep docs at/above the global P10 of
    the mean-token-length score — exact two-pass quantile threshold
    (value-count histogram → scalar → streaming filter), no global
    sort. Matches SQL ``score >= quantile_disc(score, 0.10)``."""
    from fastie_ray.ops.stats import filter_by_quantile
    from fastie_ray.ops.text_analysis import quality_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scored = quality_scores(ds).materialize()
    return filter_by_quantile(scored, "mean_token_len_e6", 0.10, keep="ge")


_PROFILE_COLS = ["event_id", "user_id", "event_type", "props"]


def _q_json_stats(sf_dir: str):
    """JSON field extraction + grouped aggregate: pull props.$.k
    (vectorized regex on the engine side — one pattern scan per batch,
    no per-row json.loads) and reduce per event_type. Oracle uses
    DuckDB's json_extract."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["event_type", "props"])

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r'"k":\s*(-?\d+)', expand=False).astype("int64")
        g = pd.DataFrame({"event_type": df["event_type"], "k": k}).groupby(
            "event_type", as_index=False
        ).agg(n=("k", "count"), sum_k=("k", "sum"), min_k=("k", "min"), max_k=("k", "max"))
        return g

    parts = ev.map_batches(agg, batch_format="pandas").to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_k=("sum_k", "sum"),
        min_k=("min_k", "min"), max_k=("max_k", "max"),
    )
    return out.astype(
        {"n": "int64", "sum_k": "int64", "min_k": "int64", "max_k": "int64"}
    ).sort_values("event_type").reset_index(drop=True)


def _q_cohort_retention(sf_dir: str):
    """Cohort retention analytics: users cohorted by first-event week,
    cells = distinct users active per (cohort_week, weeks_since).
    Three exchanges: per-user first-event aggregate, events⋈cohort
    hash join, then a (cohort, week, user)-distinct dedup whose output
    counts combine per batch and merge on the driver (cells are a
    bounded grid)."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.join import hash_join

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def to_week(df: pd.DataFrame) -> pd.DataFrame:
        days = df["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        return pd.DataFrame(
            {"user_id": df["user_id"].astype("int64"), "week": days // 7}
        )

    weeks = ev.map_batches(to_week, batch_format="pandas")

    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(cohort_week=("week", "min"))

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = (df["user_id"].to_numpy() % 16).astype("int64")
        return df

    def first_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("user_id", as_index=False)[
            "cohort_week"
        ].min()
        return out.astype({"user_id": "int64", "cohort_week": "int64"})

    cohorts = (
        weeks.map_batches(first_partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(first_final, batch_format="pandas")
    )
    j = hash_join(
        weeks, cohorts, on="user_id",
        left_cols=["user_id", "week"], right_cols=["user_id", "cohort_week"],
        n_buckets=16,
    )

    def cell(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cohort_week": df["cohort_week"].astype("int64"),
                "weeks_since": (df["week"] - df["cohort_week"]).astype("int64"),
                "user_id": df["user_id"].astype("int64"),
            }
        )

    uniq = dedup_exact(
        j.map_batches(cell, batch_format="pandas"),
        ["cohort_week", "weeks_since", "user_id"],
        n_buckets=16,
    )
    counts = (
        uniq.map_batches(
            lambda df: df.groupby(
                ["cohort_week", "weeks_since"], as_index=False
            ).agg(n_users=("user_id", "count")),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(["cohort_week", "weeks_since"], as_index=False)["n_users"]
        .sum()
    )
    return counts.astype("int64").sort_values(
        ["cohort_week", "weeks_since"]
    ).reset_index(drop=True)


def _funnel_query(sf_dir: str, max_gap: "pd.Timedelta | None" = None):
    """Ordered funnel analytics (view → click → purchase, strict ts
    order, optional per-step deadline): ONE user-bucketed exchange
    co-locates each user's events; the three step times compute
    vectorized inside the bucket (filter → groupby-min → merge chain),
    and the per-bucket step counts merge on the driver. The SQL oracle
    needs two correlated joins — the engine shape is one exchange."""
    import numpy as np
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = (df["user_id"].to_numpy() % 16).astype("int64")
        return df

    def steps(g: pd.DataFrame) -> pd.DataFrame:
        t1 = (
            g[g["event_type"] == "view"]
            .groupby("user_id", as_index=False)["ts"].min()
            .rename(columns={"ts": "t1"})
        )
        c = g[g["event_type"] == "click"].merge(t1, on="user_id")
        ok_c = c["ts"] > c["t1"]
        if max_gap is not None:
            ok_c &= c["ts"] <= c["t1"] + max_gap
        t2 = (
            c[ok_c]
            .groupby("user_id", as_index=False)["ts"].min()
            .rename(columns={"ts": "t2"})
        )
        p = g[g["event_type"] == "purchase"].merge(t2, on="user_id")
        ok_p = p["ts"] > p["t2"]
        if max_gap is not None:
            ok_p &= p["ts"] <= p["t2"] + max_gap
        t3 = p[ok_p].groupby("user_id", as_index=False)["ts"].min()
        return pd.DataFrame(
            {
                "step": np.array([1, 2, 3], dtype="int64"),
                "event_type": ["view", "click", "purchase"],
                "n_users": np.array([len(t1), len(t2), len(t3)], dtype="int64"),
            }
        )

    parts = (
        ev.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(steps, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby(["step", "event_type"], as_index=False)["n_users"].sum()
    return out.astype({"step": "int64", "n_users": "int64"}).sort_values(
        "step"
    ).reset_index(drop=True)


def _q_funnel(sf_dir: str):
    return _funnel_query(sf_dir, max_gap=None)


def _q_funnel_windowed(sf_dir: str):
    """Deadline funnel: each next step must land within 7 days of the
    previous step's time (same one-exchange engine shape)."""
    import pandas as pd

    return _funnel_query(sf_dir, max_gap=pd.Timedelta(days=7))


def _q_hll_users(sf_dir: str):
    """Mergeable HLL distinct-count sketch over event users: per-batch
    fixed-size register partials, driver max-merge — the sketch STATE
    is integer-exact and SQL-verified (the float estimate is pinned by
    pytest instead)."""
    from fastie_ray.ops.sketch import hll_registers

    ds = _read(sf_dir, "events", columns=["user_id"])
    return hll_registers(ds, "user_id", n_registers=256)


def _q_hll_by_type(sf_dir: str):
    """Grouped HLL sketch: one distinct-user register array per event
    type (integer-exact state; the grouped form of hll_users)."""
    from fastie_ray.ops.sketch import hll_registers_grouped

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return hll_registers_grouped(ds, "user_id", "event_type", n_registers=64)


def _q_cms_tokens(sf_dir: str):
    """Count-min sketch over the document token stream: fixed
    depth×width counter grid per shard merged by element-wise sum —
    the mergeable COUNTER sketch (point-frequency upper bounds) beside
    the HLL distinct sketch. Register state is integer-exact and
    SQL-verified; the min-over-rows estimate is pinned by pytest."""
    from fastie_ray.ops.sketch import cms_token_registers

    ds = _read(sf_dir, "documents", columns=["text"])
    return cms_token_registers(ds, "text", depth=4, width=512)


def _q_bpe_pairs(sf_dir: str):
    """BPE tokenizer-training statistics: exact adjacent character-pair
    frequencies over the token stream (the statistic ranking the first
    BPE merge). Combiner extracts overlapping 2-grams from DISTINCT
    tokens per batch weighted by count; partials are bounded by the
    pair domain and merge on the driver."""
    from fastie_ray.ops.bpe import pair_counts

    ds = _read(sf_dir, "documents", columns=["text"])
    return pair_counts(ds, "text")


def _q_trend_by_type(sf_dir: str):
    """Per-event-type value trend (slope + intercept of value vs days
    since 2024-01-01): distributed OLS from five sufficient statistics
    per group per batch — one pass, no shuffle. Oracle: DuckDB's
    native regr_slope/regr_intercept."""
    import pandas as pd

    from fastie_ray.ops.linear_train import grouped_ols

    def xy_fn(df: pd.DataFrame) -> pd.DataFrame:
        x = (df["ts"] - pd.Timestamp("2024-01-01")).dt.total_seconds() / 86400.0
        return pd.DataFrame({"group": df["event_type"], "x": x, "y": df["value"]})

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = grouped_ols(ds, xy_fn)
    return out.rename(columns={"group": "event_type"})


def _q_embed_moments(sf_dir: str):
    """Distributed PCA's moment exchange: the exact second-moment
    matrix Σ x_i·x_j as (i, j, sum_xy) — each batch ships a FIXED d²
    partial (one X.T@X matmul) regardless of corpus size; the driver
    merge is blocks × d² rows. The eigendecomposition/projection half
    (pca_model/pca_project) is pytest-pinned (eigenvector sign/order
    aren't SQL-comparable)."""
    from fastie_ray.ops.pca import embedding_moments

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    return embedding_moments(ds)


def _q_skew_join(sf_dir: str):
    """Skew-defusing salted join: ~70% of left rows share one planted
    hot key (linenumber > 1 → key 1); the hot-key pre-pass flags it,
    hot left rows spread across 8 salts and their right matches
    replicate per salt, so no partition holds the hot key's full
    fan-in. Cold keys pay nothing."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.join import salted_join

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"],
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "k": np.where(df["l_linenumber"] > 1, 1, df["l_partkey"]).astype("int64"),
                "orderkey": df["l_orderkey"].astype("int64"),
                "linenumber": df["l_linenumber"].astype("int32"),
                "qty": df["l_quantity"],
            }
        ),
        batch_format="pandas",
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    return salted_join(
        li, part, on="k", right_on="p_partkey", how="left",
        n_salts=8, hot_share=0.05,
        left_cols=["k", "orderkey", "linenumber", "qty"],
        right_cols=["p_partkey", "p_brand"],
    )


def _q_windowed_delta(sf_dir: str):
    """Incremental window maintenance: even-id events are the committed
    base aggregate (unrounded sums), odd-id events arrive late and fold
    in via one tag-union exchange on the window key — cost O(base
    cells + delta events), never O(base events). The oracle is the
    full-batch aggregate: incremental must equal batch."""
    import pandas as pd

    from fastie_ray.ops.windows import merge_tumbling_aggregates, tumbling_window_agg

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "event_type", "value"])
    base_ev = ev.map_batches(
        lambda df: df[df["event_id"] % 2 == 0], batch_format="pandas"
    )
    late_ev = ev.map_batches(
        lambda df: df[df["event_id"] % 2 == 1], batch_format="pandas"
    )
    base = tumbling_window_agg(base_ev, freq="1h", round_output=False)
    return merge_tumbling_aggregates(base, late_ev, freq="1h")


def _q_cdc_state(sf_dir: str):
    """CDC MERGE (lakehouse upsert/delete): the latest order per
    customer is a change record — status F ⇒ delete, else upsert of the
    order's total as the new balance — applied to the customer base
    in ONE tag-union exchange (latest-change-per-key reduced in the
    bucket task; no Acero join actors, no driver materialization)."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.cdc import cdc_apply

    base = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]).map_batches(
        lambda df: df.rename(columns={"c_custkey": "custkey", "c_acctbal": "acctbal"}),
        batch_format="pandas",
    )
    chg = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus", "o_totalprice"],
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "custkey": df["o_custkey"],
                "acctbal": df["o_totalprice"],
                "ts": df["o_orderdate"],
                "seq": df["o_orderkey"].astype("int64"),
                "op": np.where(df["o_orderstatus"] == "F", "delete", "upsert"),
            }
        ),
        batch_format="pandas",
    )
    return cdc_apply(base, chg, "custkey", ["acctbal"])


def _q_scd2_intervals(sf_dir: str):
    """SCD2 validity intervals from the event log: each event row gains
    valid_to = the key's next event timestamp (open interval → NULL) —
    one key-bucketed exchange, vectorized lead."""
    from fastie_ray.ops.sequence import validity_intervals

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    return validity_intervals(ds)


# Frozen BPE merge table for the SQL-oracled encode half: learned ONCE
# from the sf0.01 vocab (learn_bpe, n_merges=32) and pinned as a
# literal so the Ray query and the DuckDB oracle segment with the
# exact same ranked merge list at every scale factor. Symbols never
# contain spaces ([A-Za-z0-9]+ tokens), so "a b" strings key the
# pair → rank lookup on both sides.
_BPE_FROZEN_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"),
]


def _q_bpe_encode_apply(sf_dir: str):
    """BPE ENCODE against a frozen merge table (the inference half,
    split from the rows-only ``bpe_encode`` training loop so it can be
    SQL-oracled): broadcast the pinned 32-merge list and segment every
    document — (id, n_tokens, n_subwords). The oracle replays the
    min-(rank, leftmost) merge loop as a recursive CTE over DISTINCT
    tokens (vocabulary-bounded, like the engine's per-batch distinct
    segmentation) and maps counts back per document."""
    from fastie_ray.ops.bpe import bpe_encode_docs

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bpe_encode_docs(docs, _BPE_FROZEN_MERGES)


def _q_bpe_encode(sf_dir: str):
    """Full BPE pipeline: learn 64 merges from the corpus vocab table
    (one corpus-sized aggregate; the merge loop is vocabulary-bounded,
    how production BPE trainers scale), broadcast the merge list, and
    encode every document — (id, n_tokens, n_subwords). Rows-only by
    design: the iterative merge loop is not SQL-expressible (the
    pair-count statistic it consumes IS oracle-checked via bpe_pairs);
    encode semantics are pytest-pinned."""
    from fastie_ray.ops.bpe import bpe_encode_docs, learn_bpe, token_vocab

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    merges = learn_bpe(token_vocab(docs, "text"), n_merges=64)
    return bpe_encode_docs(docs, merges)


def _q_lang_heavy_tokens(sf_dir: str):
    """Per-language heavy-hitter tokens (≥0.2% of the language's token
    occurrences): grouped Misra-Gries sketch-then-verify with the
    undercount bound carried per group — never shuffles the full
    vocabulary. Threshold is integer-exact (500·n ≥ N_lang)."""
    import pandas as pd

    from fastie_ray.ops.stats import grouped_heavy_hitters
    from fastie_ray.ops.text_index import _TOKEN_RE

    def pair_fn(df: pd.DataFrame) -> pd.DataFrame:
        toks = pd.DataFrame(
            {"group": df["lang"], "item": df["text"].str.findall(_TOKEN_RE)}
        ).explode("item")
        toks = toks.dropna(subset=["item"])
        toks["item"] = toks["item"].str.lower()
        return toks

    ds = _read(sf_dir, "documents", columns=["lang", "text"])
    out = grouped_heavy_hitters(ds, 0.002, pair_fn).to_pandas()
    return out.rename(columns={"group": "lang", "item": "token"})


def _q_entity_comentions(sf_dir: str):
    """Entity co-mention graph: per unordered entity pair, the number
    of documents mentioning both — distinct-(url, mention) combiner,
    ONE url-bucketed exchange whose final task links surfaces via the
    worker-cached alias index and enumerates per-doc pairs."""
    import ray

    from fastie_ray.pipelines.kg import comention_counts

    world_ref = ray.put(_world())
    return comention_counts(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())


def _q_event_transitions(sf_dir: str):
    """Markov transition counts over the per-user event stream via the
    two-phase shape (in-bucket pairs local, one boundary record per
    (user, day) across the second exchange) — no key ever co-locates
    all its rows; parity-tested against the single-exchange form."""
    from fastie_ray.ops.sequence import transition_counts_scalable

    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    return transition_counts_scalable(ds, bucket="1d")


def _q_table_profile(sf_dir: str):
    """Data-quality audit of the events table: per-column row/null
    counts, exact distinct counts (one tag-union distinct exchange),
    native-compare min/max stringified in the report."""
    from fastie_ray.ops.profile import table_profile

    ds = _read(sf_dir, "events", columns=_PROFILE_COLS)
    return table_profile(ds, _PROFILE_COLS)


def _profile_sql() -> str:
    arms = []
    for c in _PROFILE_COLS:
        arms.append(
            f"""SELECT '{c}' AS "column", count(*) AS n_rows,
            CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
            CAST(min({c}) AS VARCHAR) AS min_val,
            CAST(max({c}) AS VARCHAR) AS max_val
            FROM events"""
        )
    return "\nUNION ALL ".join(arms)


def _q_passages(sf_dir: str):
    """RAG passage windowing: 256-char windows at stride 128 (overlap
    coverage), md5 per passage — pure streaming expansion, no exchange.
    Oracle: unnest(range) + substr + md5."""
    from fastie_ray.ops.passages import passage_windows

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return passage_windows(ds, size=256, stride=128, emit="hash")


def _q_lm_familiarity(sf_dir: str):
    """CCNet-style LM filter: train a pruned bigram count model on the
    corpus itself (one bucketed exchange over the bigram vocab), then
    stream-score every doc against the broadcast model — n_bigrams,
    covered, familiarity (integer count-sum) and coverage_e6. Exact vs
    the SQL self-join + HAVING + LEFT JOIN oracle."""
    from fastie_ray.ops.lm_filter import lm_familiarity_pipeline

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return lm_familiarity_pipeline(ds, min_count=16)


def _q_ccnet_buckets(sf_dir: str):
    """CCNet head/middle/tail assignment: score docs with the
    self-trained bigram LM (lm_familiarity), then bucket by the exact
    tercile thresholds of the integer familiarity score (head = top
    third). Composition: LM scoring → exact quantiles → streaming
    CASE. Matches SQL quantile_disc terciles."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.lm_filter import lm_familiarity_pipeline
    from fastie_ray.ops.stats import exact_quantiles

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    scored = lm_familiarity_pipeline(ds, min_count=16).materialize()
    qs = exact_quantiles(scored, "familiarity", [1.0 / 3.0, 2.0 / 3.0])
    t1, t2 = int(qs["value"].iloc[0]), int(qs["value"].iloc[1])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        f = df["familiarity"].to_numpy()
        lab = np.where(f > t2, "head", np.where(f > t1, "middle", "tail"))
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "familiarity": f, "ccnet_bucket": lab}
        )

    return scored.map_batches(bucket, batch_format="pandas")


def _q_fingerprints(sf_dir: str):
    """md5 content fingerprint (SQL-reproducible: md5(text)) plus a
    SQL-checkable semantic invariant of the rolling-min-hash: it is
    computed over stripped token windows, so padding the text with
    whitespace must not change it (rolling_stable == 1)."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.text_analysis import fingerprint_batch

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        a = fingerprint_batch(df)
        b = fingerprint_batch(df.assign(text=" " + df["text"] + " "))
        return pd.DataFrame(
            {
                "doc_id": a["doc_id"],
                "fingerprint": a["fingerprint"],
                "rolling_stable": (
                    a["rolling_min_hash"].to_numpy() == b["rolling_min_hash"].to_numpy()
                ).astype("int64"),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")


def _q_pii_scrub(sf_dir: str):
    """PII scrub stats over the corpus with deterministically planted
    PII (the synth corpus carries none): every 3rd doc gets an email,
    an IP and a phone suffix derived from doc_id, reproduced verbatim
    in the SQL oracle. RE2-safe patterns → DuckDB regexp_* reproduces
    counts and redacted lengths exactly."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.pii import pii_scrub

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df.copy()
        m = d["doc_id"] % 3 == 0
        sfx = (
            " contact u" + d["doc_id"].astype(str) + "@ex.com from 10.0."
            + (d["doc_id"] % 200).astype(str) + ".7 call 555-0142"
        )
        d.loc[m, "text"] = d.loc[m, "text"] + sfx[m]
        return d

    return pii_scrub(ds.map_batches(plant, batch_format="pandas"))


def _q_repetition(sf_dir: str):
    """Gopher-style repetition quality signals (dup-token fraction,
    top-bigram fraction), integer-scaled for SQL exactness."""
    import ray.data

    from fastie_ray.ops.text_analysis import repetition_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return repetition_scores(ds)


def _q_decontaminate(sf_dir: str):
    """Benchmark decontamination: docs with doc_id % 37 == 0 act as the
    held-out eval set; every corpus doc is scored for distinct-8-gram
    overlap against the broadcast eval gram set. The eval docs
    themselves (and any true near-dups) come back contaminated=1."""
    import ray.data

    from fastie_ray.ops.decontaminate import collect_test_ngrams, decontaminate

    import pandas as pd

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    test_ds = ds.map_batches(
        lambda df: df[df["doc_id"] % 37 == 0], batch_format="pandas"
    )
    grams_ref = collect_test_ngrams(test_ds, n=8)
    return decontaminate(ds, grams_ref, n=8)


def _q_dup_spans(sf_dir: str):
    """Exact duplicated-substring stats (Lee et al. exact substring
    dedup, hashed-8-gram formulation): per doc the count of tokens
    covered by any corpus-duplicated 8-gram. key="gram" carries the
    literal n-gram so the dup set is bit-for-bit the SQL oracle's;
    the at-scale key="rolling" (u64 hash payload) is parity-tested in
    tests/."""
    import ray.data

    from fastie_ray.ops.substring_dedup import dup_span_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dup_span_stats(ds, n=8, min_count=2, key="gram")


def _q_pack_docs(sf_dir: str):
    """Sequence packing (concat-and-chunk into 512-token training
    contexts): the exploded (window_id, doc_id, seg_start, seg_len)
    loader plan. The global prefix sum runs as a two-pass distributed
    scan (range totals → broadcast exclusive offsets → one
    range-bucketed local cumsum)."""
    import ray.data

    from fastie_ray.ops.packing import pack_segments

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_segments(ds, ctx_len=512, range_size=100)


def _q_dedup_incremental(sf_dir: str):
    """Incremental dedup of a new shard against an existing corpus:
    ref = docs with doc_id % 3 == 0, new = docs with doc_id % 2 == 0
    (overlap at % 6 plus the synth corpus's natural exact dups). Bloom
    prefilter is exact by construction (no false negatives; positives
    verified by anti-join), so the result matches NOT EXISTS in SQL."""
    import ray.data

    from fastie_ray.ops.dedup import dedup_against

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ref = ds.map_batches(lambda df: df[df["doc_id"] % 3 == 0], batch_format="pandas")
    new = ds.map_batches(lambda df: df[df["doc_id"] % 2 == 0], batch_format="pandas")
    return dedup_against(new, ref)


_BM25_QUERIES = {
    "q1": "customer order query plan",
    "q2": "hash join merge sort",
    "q3": "stream window filter batch",
}


def _q_bm25(sf_dir: str):
    """BM25 top-10 retrieval for three fixed queries. Per-term
    contributions are integer-scaled before summing so the score is
    order-independent and bit-exact vs the SQL oracle."""
    import ray.data

    from fastie_ray.ops.retrieval import bm25_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_topk(ds, _BM25_QUERIES, k=10)


def _q_pagerank(sf_dir: str):
    """Fixed-point PageRank (3 iterations, d=0.85) over the distinct
    customer→supplier graph derived from orders⋈lineitem. Integer
    arithmetic end-to-end makes the iterative algorithm bit-exact vs
    the unrolled SQL oracle (one CTE pair per iteration)."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import pagerank
    from fastie_ray.ops.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"], right_cols=["o_orderkey", "o_custkey"],
    )
    edges = j.map_batches(
        lambda df: pd.DataFrame(
            {"src": "c" + df["o_custkey"].astype(str),
             "dst": "s" + df["l_suppkey"].astype(str)}
        ).drop_duplicates(),
        batch_format="pandas",
    )
    return pagerank(dedup_exact(edges, ["src", "dst"], n_buckets=16), n_iter=3)


def _q_khop_reach(sf_dir: str):
    """3-hop BFS levels over the undirected customer↔supplier graph
    (orders⋈lineitem distinct pairs), seeded at nation-0 customers.
    Per hop: frontier semi-join + one bucketed visited-merge exchange
    (Pregel superstep, no driver-side sets); oracle is a recursive CTE
    with UNION-dedup and MIN(hop) = BFS level."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import khop_reachability
    from fastie_ray.ops.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"], right_cols=["o_orderkey", "o_custkey"],
    )
    edges = dedup_exact(
        j.map_batches(
            lambda df: pd.DataFrame(
                {"src": "c" + df["o_custkey"].astype(str),
                 "dst": "s" + df["l_suppkey"].astype(str)}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        ["src", "dst"], n_buckets=16,
    )
    seeds = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda df: pd.DataFrame(
            {"node": "c" + df.loc[df["c_nationkey"] == 0, "c_custkey"].astype(str)}
        ),
        batch_format="pandas",
    )
    return khop_reachability(edges, seeds, k=3, n_buckets=16)


def _order_chain_edges(sf_dir: str):
    """Chain/cycle graph from per-customer order sequences (consecutive
    orders chained; even custkeys closed into cycles) — the shared
    deterministic graph source for kcore / lpa_communities."""
    import pandas as pd

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (df["o_custkey"].to_numpy() % 16).astype("int64")
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)
        ok = "o" + g["o_orderkey"].astype(str)
        same = (g["o_custkey"] == g["o_custkey"].shift(-1)).to_numpy()
        chain = pd.DataFrame(
            {"src": ok.to_numpy()[same], "dst": ok.shift(-1).to_numpy()[same]}
        )
        agg = g.groupby("o_custkey")["o_orderkey"].agg(["first", "last", "count"])
        agg = agg[(agg["count"] >= 2) & (agg.index % 2 == 0)]
        cyc = pd.DataFrame(
            {
                "src": "o" + agg["last"].astype(str),
                "dst": "o" + agg["first"].astype(str),
            }
        )
        return pd.concat([chain, cyc], ignore_index=True)

    return (
        orders.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
    )


def _q_kcore(sf_dir: str):
    """Bounded-round k-core peeling (k=2, 4 synchronized rounds) over a
    chain/cycle graph built from per-customer order sequences
    (consecutive orders chained; even custkeys closed into cycles so
    the core is non-empty while odd chains cascade-peel end-inward).
    Per round: node-sized degree exchange + two semi-joins; oracle is
    the unrolled per-round CTE pair."""
    from fastie_ray.ops.graph import kcore_peel

    return kcore_peel(_order_chain_edges(sf_dir), k=2, rounds=4, n_buckets=16)


def _q_lpa_communities(sf_dir: str):
    """Synchronous label-propagation community detection (4 rounds,
    ties → smallest label) over the chain/cycle order graph: per round
    ONE edge⋈label hash join + ONE bucketed count-argmax exchange,
    label table pinned and compacted per round. Oracle is the unrolled
    per-round count/argmax CTE chain."""
    from fastie_ray.ops.graph import lpa_communities

    return lpa_communities(_order_chain_edges(sf_dir), rounds=4, n_buckets=16)


_TOPIC_LEXICON = {
    "exec": ["scan", "sort", "merge", "hash", "join"],
    "storage": ["table", "row", "column", "part"],
    "stream": ["window", "batch", "stream"],
}


def _q_perceptron(sf_dir: str):
    """Distributed full-batch integer perceptron (lang=='en' vs rest)
    over hashed-bigram features: feature table materialized once, one
    streaming gradient pass per iteration, order-independent integer
    all-reduce; oracle is the unrolled 3-iteration SQL."""
    import pandas as pd

    from fastie_ray.ops.linear_train import perceptron_train

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["y"] = (df["lang"] == "en").map({True: 1, False: -1}).astype("int64")
        return df

    return perceptron_train(
        ds.map_batches(lab, batch_format="pandas"), "y", n_iter=3, n_features=64
    )


def _q_entity_salience(sf_dir: str):
    """Entity salience: PageRank over the extracted KG edge graph
    (distinct subject→object entity pairs from the full extraction
    path) — KG construction composed with the iterative graph family.
    Oracle: facts-plan edges + the unrolled integer-PageRank CTEs."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import pagerank
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"]
    edges = t.map_batches(
        lambda df: pd.DataFrame(
            {"src": df["subject_id"], "dst": df["object_id"]}
        ).drop_duplicates(),
        batch_format="pandas",
    )
    return pagerank(dedup_exact(edges, ["src", "dst"], n_buckets=16), n_iter=3)


def _q_blocking_pairs(sf_dir: str):
    """ER blocking: sorted-neighborhood candidate pairs over the
    distinct site-key vocabulary — successors in global sort order
    sharing a ≥4-char prefix (same-site near-ids). First-char
    bucketing makes the pass exchange-clean (module docstring proof);
    oracle is LEAD() + an unrolled prefix-indicator sum."""
    import pandas as pd

    from fastie_ray.ops.blocking import sorted_neighborhood_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def sites(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"v": df["source"] + "/" + (df["doc_id"] % 61).astype(str)}
        )

    return sorted_neighborhood_pairs(
        ds.map_batches(sites, batch_format="pandas"), "v", min_prefix=4
    )


def _q_er_matches(sf_dir: str):
    """End-to-end ER: sorted-neighborhood blocking → edit-distance
    verification of the candidate-bounded set (Levenshtein ≤ 2).
    The quadratic comparison never touches the full cross product."""
    import pandas as pd

    from fastie_ray.ops.blocking import (
        sorted_neighborhood_pairs,
        verify_pairs_edit_distance,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def sites(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"v": df["source"] + "/" + (df["doc_id"] % 61).astype(str)}
        )

    cands = sorted_neighborhood_pairs(
        ds.map_batches(sites, batch_format="pandas"), "v", min_prefix=4
    )
    return verify_pairs_edit_distance(cands, max_dist=2)


def _q_bucketed_join(sf_dir: str):
    """Storage-co-located join: both tables hash-bucketed on the join
    key at WRITE time (one exchange each, md5 bucket function), then
    joined bucket-by-bucket with NO exchange — one column-pruned
    read+merge task per bucket. Rollup: per-customer item count and
    integer quantity total."""
    import tempfile

    import numpy as np
    import pandas as pd

    from fastie_ray.ops.bucketed_io import bucketed_join, write_bucketed

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    base = tempfile.mkdtemp(prefix="bjoin_", dir="/tmp")
    write_bucketed(li, "l_orderkey", 8, base + "/li")
    write_bucketed(orders, "o_orderkey", 8, base + "/ord")
    j = bucketed_join(
        base + "/li", base + "/ord", "l_orderkey", "o_orderkey",
        ["l_orderkey", "l_quantity"], ["o_orderkey", "o_custkey"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(q=df["l_quantity"].astype("int64"))
        return df.groupby("o_custkey", as_index=False).agg(
            n_items=("q", "count"), sum_qty=("q", "sum")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = (df["o_custkey"].to_numpy() % 8).astype("int64")
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("o_custkey", as_index=False)[
            ["n_items", "sum_qty"]
        ].sum()
        return out.astype({"n_items": "int64", "sum_qty": "int64"})

    return (
        j.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def _q_source_ttr(sf_dir: str):
    """Per-source vocabulary richness: total tokens, distinct token
    types (two-level distinct-then-count — (source, token) deduped in
    a bucketed exchange, then per-source sums), and integer-scaled
    type-token ratio."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact

    ds = _read(sf_dir, "documents", columns=["source", "text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        t = (
            pd.DataFrame(
                {
                    "source": df["source"].to_numpy(),
                    "token": df["text"].str.lower().str.findall(r"[a-z0-9]+"),
                }
            )
            .explode("token")
            .dropna(subset=["token"])
        )
        return t

    tok = ds.map_batches(toks, batch_format="pandas")

    # totals per source: per-batch combiner → driver merge (sources
    # are a bounded domain)
    totals = (
        tok.map_batches(
            lambda df: df.groupby("source", as_index=False).agg(
                n_tokens=("token", "count")
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("source", as_index=False)["n_tokens"]
        .sum()
    )
    # distinct types per source: batch-local drop_duplicates combiner,
    # exact dedup exchange on (source, token), then a bounded count
    types = (
        dedup_exact(
            tok.map_batches(
                lambda df: df.drop_duplicates(), batch_format="pandas"
            ),
            ["source", "token"],
            n_buckets=16,
        )
        .map_batches(
            lambda df: df.groupby("source", as_index=False).agg(
                n_types=("token", "count")
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby("source", as_index=False)["n_types"]
        .sum()
    )
    out = totals.merge(types, on="source")
    out["ttr_e6"] = (
        out["n_types"].to_numpy() * 1_000_000 // out["n_tokens"].to_numpy()
    ).astype("int64")
    return out.astype(
        {"n_tokens": "int64", "n_types": "int64"}
    ).sort_values("source").reset_index(drop=True)


def _q_kg_violations(sf_dir: str):
    """KG consistency check: functional-constraint violations —
    (subject, predicate) pairs with >1 distinct object in the
    extracted edge aggregate. One subject-bucketed exchange over the
    graph-sized edge table."""
    from fastie_ray.ops.kg_quality import functional_violations
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"]
    return functional_violations(t)


def _q_kg_paths(sf_dir: str):
    """Rule-mining census: 2-hop relation compositions (p1, p2,
    n_paths) via one mid-node self-join of the distinct KG edge set."""
    import pandas as pd

    from fastie_ray.ops.kg_quality import relation_path_census
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"]
    edges = t.map_batches(
        lambda df: df[["subject_id", "predicate", "object_id"]],
        batch_format="pandas",
    )
    return relation_path_census(edges)


def _q_infer_batches(sf_dir: str):
    """Length-bucketed inference batch plan (padding-minimizing model
    serving): power-of-two token buckets, deterministic rank within
    bucket via grouped two-pass prefix scan → (batch_id, slot).
    Oracle is a window ROW_NUMBER per bucket."""
    from fastie_ray.ops.batching import length_bucketed_batches

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return length_bucketed_batches(ds, batch_size=16)


def _q_classifier_preds(sf_dir: str):
    """Train→infer composition: the integer perceptron's final weights
    applied in a streaming inference pass (score, ±1 prediction per
    doc). Oracle = the training unroll + one scoring CTE."""
    import pandas as pd

    from fastie_ray.ops.linear_train import perceptron_score, perceptron_train

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["y"] = (df["lang"] == "en").map({True: 1, False: -1}).astype("int64")
        return df

    labeled = ds.map_batches(lab, batch_format="pandas")
    w = perceptron_train(labeled, "y", n_iter=3, n_features=64)
    return perceptron_score(ds, w["weight"].to_numpy(), n_features=64)


def _q_kcenter(sf_dir: str):
    """Greedy k-center coreset (diversity sampling over embeddings):
    integer-grid distances, one streaming min-dist pass + local-argmax
    reduce per center; unrolled farthest-first SQL oracle."""
    from fastie_ray.ops.clustering import kcenter_coreset

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kcenter_coreset(ds, k=5)


def _q_topic_labels(sf_dir: str):
    """Weak-supervision taxonomy tagging: per-topic summed substring
    counts from a fixed keyword lexicon, argmax label with
    lexicographic tie-break, 'other' on zero hits. Oracle uses the
    replace-length counting identity."""
    from fastie_ray.ops.text_analysis import keyword_topics

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return keyword_topics(ds, _TOPIC_LEXICON)


def _q_resample_docs(sf_dir: str):
    """Systematic importance resampling by integer weight (n_chars —
    token-budget-proportional selection): two-pass distributed prefix
    scan, copies = floor-difference of scaled cumulative weights;
    oracle is a SQL window prefix sum."""
    from fastie_ray.ops.sampling import systematic_resample

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return systematic_resample(ds, "n_chars", m=1000)


def _q_dsir_select(sf_dir: str):
    """DSIR importance resampling: hashed-bigram feature counts over
    the corpus (target = lang 'en'), Laplace-smoothed integer
    target/raw ratio LUT broadcast once, streaming per-doc importance,
    keep the top-2-deciles by exact global quantile threshold."""
    import pandas as pd

    from fastie_ray.ops.dsir import dsir_select

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def mask(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["is_en"] = (df["lang"] == "en").astype("int64")
        return df

    return dsir_select(
        ds.map_batches(mask, batch_format="pandas"), "is_en", keep_quantile=0.8
    )


def _q_leakage_split(sf_dir: str):
    """Leakage-safe train/val/test assignment keyed on a site group
    (source + doc_id%61 — the url-host stand-in for the synth corpus):
    md5-bucket the GROUP so same-site near-dups can never straddle a
    split. Pure streaming pass; SQL-exact via md5 hex→int."""
    import pandas as pd

    from fastie_ray.ops.splits import leakage_safe_split

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def site(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "site": df["source"] + "/" + (df["doc_id"] % 61).astype(str),
            }
        )

    return leakage_safe_split(ds.map_batches(site, batch_format="pandas"), "site")


def _q_mixture_sample(sf_dir: str):
    """Domain-mixture budget sampling: even-numbered sources capped at
    600 tokens, others at 900 — docs taken in doc_id order per source
    while the running total stays within budget (grouped two-pass
    distributed prefix scan)."""
    import ray.data

    from fastie_ray.ops.mixture import budget_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    budgets = {f"src{i}": 600 for i in range(0, 20, 2)}
    return budget_sample(ds, budgets, default_budget=900, range_size=100)


def _q_grouped_quantiles(sf_dir: str):
    """Per-event-type exact value quantiles — fully distributed grouped
    quantile_disc (per-batch (group,value) combiner → one group-bucketed
    exchange → vectorized per-group cut; no driver step)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.stats import grouped_quantiles

    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    # quantize to cents so the value domain is discrete (the op's
    # stated contract for continuous columns) and SQL-reproducible
    cents = ds.map_batches(
        lambda df: pd.DataFrame(
            {"event_type": df["event_type"],
             # floor(x*100 + 0.5): identical IEEE ops in numpy and SQL
             # (pandas .round half-even vs SQL round half-away diverge)
             "cents": np.floor(df["value"] * 100 + 0.5).astype("int64")}
        ),
        batch_format="pandas",
    )
    return grouped_quantiles(cents, "event_type", "cents", _QUANTILE_QS)


def _q_corpus_clean(sf_dir: str):
    """Flagship pre-training corpus-cleaning composition (PII redact →
    repetition/length filters → decontamination vs the doc_id%37==0
    eval split → exact dedup), with exact duplicates planted (every
    7th doc re-appears with id+2e6) so the dedup stage does real work.
    One streaming map + one hash-bucketed exchange; value-exact SQL
    oracle reproduces the full chain."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.decontaminate import collect_test_ngrams
    from fastie_ray.ops.pii import pii_redact_batch
    from fastie_ray.pipelines.clean import clean_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    test_ds = ds.map_batches(
        lambda df: pii_redact_batch(df[df["doc_id"] % 37 == 0]),
        batch_format="pandas",
    )
    grams_ref = collect_test_ngrams(test_ds, n=8)

    def plant_dups(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] % 7 == 0].copy()
        d["doc_id"] = d["doc_id"] + 2_000_000
        return pd.concat([df, d], ignore_index=True)

    planted = ds.map_batches(plant_dups, batch_format="pandas")
    return clean_corpus(
        planted,
        grams_ref,
        n=8,
        min_tokens=20,
        max_dup_frac_e6=650_000,
        max_top_bigram_frac_e6=100_000,
    )


def _q_augment(sf_dir: str):
    """Text augmentation (M17: delete/repeat variants per doc). The
    SQL-checkable invariants are the exact variant counts and lengths:
    delete removes int(0.2·len) chars (only when len > 5), repeat
    doubles int(0.32·len) chars — both reference formulas
    (augmenter.py:60-67,95-104). Content-level semantics (multiset
    preservation, determinism, dedup) are asserted in pytest."""
    import pandas as pd
    import ray.data

    from fastie_ray.functions.augment import augment_docs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = augment_docs(ds, methods=("delete", "repeat"))

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "variant_id": df["variant_id"].astype("int64"),
                "n_chars": df["text"].str.len().astype("int64"),
            }
        )

    return out.map_batches(stats, batch_format="pandas")


def _q_extraction_f1(sf_dir: str):
    """Distributed micro P/R/F1 of pipeline triples vs the synthetic
    gold (injected facts) — exact by construction, so the oracle is the
    constant perfect score."""
    import pandas as pd
    import ray

    from fastie_ray.ops.metrics import extraction_score
    from fastie_ray.pipelines.kg import extract_triples

    world_ref = ray.put(_world())
    from fastie_ray.pipelines.kg import doc_triples as _dt
    triples = _dt(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())
    gold = _q_kg_triples_gold(sf_dir)
    m = extraction_score(gold, triples, keys=["url", "predicate", "subject", "object"])
    return pd.DataFrame(
        {
            "precision_e6": [int(m["precision"] * 1_000_000)],
            "recall_e6": [int(m["recall"] * 1_000_000)],
            "tp": [m["tp"]],
        }
    )


def _q_gp_train(sf_dir: str):
    """Distributed GlobalPointer-head training (``pipelines.trainer``,
    the ExtractionTrainer analogue — reference ``fastie/train/
    tuner.py:100-186``) over distant-supervision NER rows: gazetteer
    self-labels on the documents table → feature build → per-epoch
    streaming gradient pass with an integer fixed-point all-reduce →
    driver Adam step → streaming span-F1 eval. Emits the integer
    training history (epoch, loss_e6, n_units, grad_l1_q, tp, n_pred,
    n_true, f1_e6). Rows-only by design: an iterative float-Adam
    training loop is not SQL-expressible; the history is nonetheless
    bit-deterministic (integer gradient reduce), the eval metric shape
    is oracled via extraction_f1, and convergence/FGM/resume are
    pytest-pinned (tests/test_gp_trainer.py)."""
    import pandas as pd

    from fastie_ray.pipelines.train_prep import ner_convert_to_features
    from fastie_ray.pipelines.trainer import GPTrainConfig, gp_train
    from fastie_ray.stages.extract import extract_text
    from fastie_ray.synth import LABELS

    world = _world()
    # deterministic half of the pages by url hash (order-independent,
    # unlike limit()), then the REAL pipeline chunker (M4) so every
    # training sequence fits the 64-token feature budget — the same
    # shape the reference trains on (short sequences, auto_splitter)
    from fastie_ray.functions.hashing import stable_hash64
    from fastie_ray.stages.chunk import chunk_pages

    docs = chunk_pages(
        extract_text(_pages(sf_dir)).filter(
            lambda r: stable_hash64(r["url"]) % 2 == 0
        ),
        max_length=122,
    ).map_batches(
        lambda df: pd.DataFrame({"text": df["chunk_text"]}),
        batch_format="pandas",
    )

    class _SelfLabel:
        """Gazetteer distant supervision — featurizer compiled once
        per actor (stateful-stage discipline)."""

        def __init__(self):
            from fastie_ray.featurizer import GazetteerFeaturizer

            self.fz = GazetteerFeaturizer(world)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            from fastie_ray.functions.hashing import stable_hash64
            from fastie_ray.functions.textnorm import space_to_dash

            texts, ents = [], []
            for text in df["text"]:
                hits = self.fz.mention_hits(space_to_dash(text))
                # ratio-capped negative sampling (the reference's UIE
                # negative-example discipline, M15): keep every
                # positive chunk, 1 in 4 of the all-negative ones
                if not hits and stable_hash64(text) % 4 != 0:
                    continue
                texts.append(text)
                ents.append([
                    {"start_offset": h.cs, "end_offset": h.ce,
                     "label": self.fz.id2label[h.label_id],
                     "entity": text[h.cs:h.ce]}
                    for h in hits
                ])
            return pd.DataFrame({"text": texts, "entities": ents})

    rows = docs.map_batches(
        _SelfLabel, batch_format="pandas", concurrency=2
    )
    labels = sorted(LABELS)
    l2i = {lb: i for i, lb in enumerate(labels)}
    feats = ner_convert_to_features(rows, l2i, max_length=64)
    _, hist = gp_train(
        feats, len(labels), epochs=30,
        cfg=GPTrainConfig(lr=0.15), dev_features=feats,
    )
    return hist.astype("int64")


def _q_kg_triples_gold(sf_dir: str):
    """Gold triples dataset derived from the injection plan (one fact
    per doc, fact i = doc_id % n_facts)."""
    import pandas as pd
    import ray.data

    w = _world()
    nf = len(w.facts)
    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    from fastie_ray.synth import doc_url

    def gold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, lang in zip(df["doc_id"], df["lang"]):
            f = w.facts[int(doc_id) % nf]
            rows.append(
                (doc_url(int(doc_id), lang), f.predicate, f.subj.name, f.obj.name)
            )
        return pd.DataFrame(rows, columns=["url", "predicate", "subject", "object"])

    return docs.map_batches(gold, batch_format="pandas")


def _q_media_neardup(sf_dir: str):
    """Multimodal composition: synth media → actor-pool image
    featurization (deterministic fake codec: identical payloads →
    identical features) → LSH embedding near-dup. Every 4th item is
    re-planted with id+1e6 and the SAME payload, so its feature is an
    exact-direction duplicate (cosine 1.0, recalled w.p. 1); random
    64-dim features make natural pairs at ≥0.95 impossible, so the
    output is exactly the planted set."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.multimodal import featurize_images, synth_media_table
    from fastie_ray.ops.neardup import embedding_neardup

    media = ray.data.from_arrow(synth_media_table(256))

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["media_id"] % 4 == 0].copy()
        d["media_id"] = d["media_id"] + 1_000_000
        return pd.concat([df, d], ignore_index=True)

    feats = featurize_images(media.map_batches(plant, batch_format="pandas"))
    pairs = embedding_neardup(
        feats, threshold=0.95, id_col="media_id", emb_col="feature", dim=64
    )
    return pairs.select_columns(["id_a", "id_b"])


def _q_media_frames(sf_dir: str):
    import ray.data

    from fastie_ray.ops.multimodal import sample_frames, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(256))
    return sample_frames(ds, n_frames=4).select_columns(
        ["media_id", "frame_idx", "ts_ms"]
    )


def _q_doc_ranks(sf_dir: str):
    """Global ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
    without a total-order sort barrier: coarse value-range partition +
    two-pass distributed prefix count (``ops.rank.global_rank``)."""
    import ray.data

    from fastie_ray.ops.rank import global_rank

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return global_rank(
        ds, key_col="n_chars", tie_col="doc_id", descending=True,
        range_size=64, keep_cols=["doc_id", "n_chars"],
    )


def _q_url_dedup(sf_dir: str):
    """Canonical-URL dedup over a deterministic capture table: every
    doc is fetched three ways (https+www+slash / bare http / https
    with a utm query) at staggered timestamps; keep the earliest
    capture per canonical URL (``ops.urlnorm.url_dedup``)."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.urlnorm import url_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        d = df["doc_id"].astype("int64")
        base = "example-" + (d % 50).astype(str) + ".com/p/" + d.astype(str)
        forms = [
            ("https://www." + base + "/", 0),
            ("http://" + base, 1),
            ("https://" + base + "?utm_source=feed", 2),
        ]
        return pd.concat(
            [
                pd.DataFrame(
                    {"url": u, "warc_ts": ((d * 7 + 13 * j) % 101).astype("int64")}
                )
                for u, j in forms
            ],
            ignore_index=True,
        )

    return url_dedup(ds.map_batches(variants, batch_format="pandas"))


def _q_corpus_diff(sf_dir: str):
    """Snapshot diff v1→v2 (added/removed/changed) in one tag-union
    exchange shipping only md5 fingerprints (``ops.diff.corpus_diff``).
    v2 is a deterministic edit of v1: drop doc_id%17==0, append
    ' [rev2]' when doc_id%13==0, add a new doc per doc_id%19==0."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.diff import corpus_diff

    v1 = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def v2_of(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["doc_id"] % 17 != 0].copy()
        chg = keep["doc_id"] % 13 == 0
        keep.loc[chg, "text"] = keep.loc[chg, "text"] + " [rev2]"
        add = df[df["doc_id"] % 19 == 0].copy()
        add["doc_id"] = add["doc_id"] + 1_000_000
        add["text"] = "new " + add["doc_id"].astype(str)
        return pd.concat([keep, add], ignore_index=True)

    v2 = _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(v2_of, batch_format="pandas")
    return corpus_diff(v1, v2)


def _q_clean_pack(sf_dir: str):
    """End-to-end training-data assembly: the full corpus_clean chain
    (PII redact → quality filters → decontamination → exact dedup,
    keep_text=True) feeds sequence packing into 512-token contexts —
    clean and pack compose as streaming stages; only the pack's
    two-pass prefix scan touches an exchange. Oracle chains both SQL
    reconstructions over the survivors."""
    import pandas as pd

    from fastie_ray.ops.decontaminate import collect_test_ngrams
    from fastie_ray.ops.packing import pack_segments
    from fastie_ray.ops.pii import pii_redact_batch
    from fastie_ray.pipelines.clean import clean_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    test_ds = ds.map_batches(
        lambda df: pii_redact_batch(df[df["doc_id"] % 37 == 0]),
        batch_format="pandas",
    )
    grams_ref = collect_test_ngrams(test_ds, n=8)

    def plant_dups(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] % 7 == 0].copy()
        d["doc_id"] = d["doc_id"] + 2_000_000
        return pd.concat([df, d], ignore_index=True)

    cleaned = clean_corpus(
        ds.map_batches(plant_dups, batch_format="pandas"),
        grams_ref, n=8, min_tokens=20, max_dup_frac_e6=650_000,
        max_top_bigram_frac_e6=100_000, keep_text=True,
    )
    return pack_segments(cleaned, ctx_len=512, range_size=100)


def _q_kg_edges_delta(sf_dir: str):
    """Incremental KG maintenance: replica-0 pages are the
    checkpointed base graph, replica-1 pages the new crawl increment;
    ``merge_edge_aggregates`` folds the increment's edge aggregate into
    the base state with one graph-sized exchange. The oracle is the
    FULL-BATCH graph over both replicas (n_support exactly doubles) —
    incremental must equal batch bit-for-bit."""
    from fastie_ray.pipelines.kg import graph_tables, merge_edge_aggregates
    from fastie_ray.sources.pages import pages_from_documents

    w = _world()
    base = graph_tables(
        pages_from_documents(sf_dir, w, override_num_blocks=16, replica=0),
        world=w, concurrency=_conc(), want=("edges",),
    )["edges"]
    delta = graph_tables(
        pages_from_documents(sf_dir, w, override_num_blocks=16, replica=1),
        world=w, concurrency=_conc(), want=("edges",),
    )["edges"]
    return merge_edge_aggregates(base, delta).select_columns(
        ["subject_id", "predicate", "object_id", "n_support"]
    )


def _q_window_uniques(sf_dir: str):
    """Exact distinct-user count per hour window — the two-level
    distinct-then-count shape: level 1 dedups (window, user) inside one
    hash-bucketed exchange and emits per-partition window counts (each
    pair lands in exactly one partition, so counts sum exactly);
    level 2 is a tiny windows-sized aggregate. Never shuffles raw
    event rows — the per-batch distinct combiner shrinks the exchange
    to near-distinct pairs."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.pipelines.kg import _bucketed_groupby

    ev = _read(sf_dir, "events", columns=["ts", "user_id"])

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "window_start": df["ts"].dt.floor("h"),
                "user_id": df["user_id"].astype("int64"),
            }
        )
        return out.drop_duplicates()

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df[["window_start", "user_id"]], index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(32)).astype(np.int64)
        return df

    def count_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates()
        return g.groupby("window_start", as_index=False).agg(
            n_users=("user_id", "count")
        )

    partials = (
        ev.map_batches(distinct, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(count_part, batch_format="pandas")
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("window_start", as_index=False)["n_users"].sum()
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return _bucketed_groupby(partials, "window_start", final, 4)


def _q_sales_cube(sf_dir: str):
    """GROUPING SETS ((flag, status), (flag), ()) in ONE corpus pass:
    the per-batch combiner emits partial rows for every grouping level
    ('ALL' sentinel), so the exchange carries 3×groups rows instead of
    3 corpus scans. Revenue in integer cents — sums are exact int64,
    no float-order skew."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.pipelines.kg import _bucketed_groupby

    li = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "cents": np.floor(
                    df["l_extendedprice"] * 100 + 0.5
                ).astype("int64"),
            }
        )
        levels = []
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n_rows=("cents", "count"), sum_cents=("cents", "sum")
        )
        levels.append(g)
        g1 = df.groupby("l_returnflag", as_index=False).agg(
            n_rows=("cents", "count"), sum_cents=("cents", "sum")
        )
        g1["l_linestatus"] = "ALL"
        levels.append(g1)
        tot = pd.DataFrame(
            {
                "l_returnflag": ["ALL"],
                "l_linestatus": ["ALL"],
                "n_rows": [len(df)],
                "sum_cents": [int(df["cents"].sum())],
            }
        )
        levels.append(tot)
        out = pd.concat(levels, ignore_index=True)
        out["__k"] = out["l_returnflag"] + "|" + out["l_linestatus"]
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            n_rows=("n_rows", "sum"), sum_cents=("sum_cents", "sum")
        )
        out["n_rows"] = out["n_rows"].astype("int64")
        out["sum_cents"] = out["sum_cents"].astype("int64")
        return out

    return _bucketed_groupby(
        li.map_batches(partial, batch_format="pandas"), "__k", final, 8
    )


def _q_value_moments(sf_dir: str):
    """Exact distributed moments per event type: (n, Σcents, Σcents²)
    via the textbook sum/sum-of-squares combiner — all int64-exact
    (mean/variance derive on the consumer side without another corpus
    pass)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.pipelines.kg import _bucketed_groupby

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["value"] * 100 + 0.5).astype("int64")
        t = pd.DataFrame(
            {"event_type": df["event_type"], "c": c, "c2": c * c}
        )
        return t.groupby("event_type", as_index=False).agg(
            n=("c", "count"), sum_cents=("c", "sum"), sumsq_cents=("c2", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), sum_cents=("sum_cents", "sum"),
            sumsq_cents=("sumsq_cents", "sum"),
        )
        for col in ("n", "sum_cents", "sumsq_cents"):
            out[col] = out[col].astype("int64")
        return out

    return _bucketed_groupby(
        ev.map_batches(partial, batch_format="pandas"), "event_type", final, 4
    )


def _q_triangles(sf_dir: str):
    """Exact triangle count of the supplier co-supply graph (edge =
    two suppliers sharing an order, over the l_orderkey%20 order
    subsample — the unfiltered co-supply graph is near-complete, which
    is a degenerate benchmark: 124M triangles at sf0.1) via
    degree-oriented wedge generation (``ops.graph.triangle_count``)."""
    import pandas as pd
    import ray.data

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import triangle_count
    from fastie_ray.pipelines.kg import _bucketed_groupby

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def distinct_os(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["l_orderkey"] % 20 == 0].drop_duplicates()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_1", "_2"))
        m = m[m["l_suppkey_1"] < m["l_suppkey_2"]]
        out = pd.DataFrame({"a": m["l_suppkey_1"], "b": m["l_suppkey_2"]})
        return out.drop_duplicates()

    per_order = _bucketed_groupby(
        li.map_batches(distinct_os, batch_format="pandas"),
        "l_orderkey", pairs, 16,
    )
    edges = dedup_exact(per_order, ["a", "b"], n_buckets=16)
    return triangle_count(edges, n_buckets=16)


def _q_mention_contexts(sf_dir: str):
    """KWIC context windows per mention (±40 chunk-local chars) for
    entity-disambiguation reranking — computed inside the scorer call,
    where the chunk text still exists
    (``NerScorer(emit="doc_mentions_ctx")``)."""
    import ray

    from fastie_ray.stages.chunk import chunk_pages
    from fastie_ray.stages.extract import extract_text
    from fastie_ray.stages.scorers import score_mentions

    world_ref = ray.put(_world())
    chunks = chunk_pages(extract_text(_pages(sf_dir)))
    return score_mentions(
        chunks, world_ref=world_ref, concurrency=_conc(),
        emit="doc_mentions_ctx",
    )


def _q_kg_negatives(sf_dir: str):
    """TransE-style corrupted triples for KG-embedding training:
    negative object = successor of the true object in the predicate's
    sorted distinct-object vocabulary
    (``pipelines.train_prep.kg_negative_samples``)."""
    import ray

    from fastie_ray.pipelines.kg import doc_triples
    from fastie_ray.pipelines.train_prep import kg_negative_samples

    world_ref = ray.put(_world())
    triples = doc_triples(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())
    return kg_negative_samples(triples)


def _q_cooc_pairs(sf_dir: str):
    """Top-100 co-occurring token pairs (lexicographic per-doc cap of
    16 distinct tokens bounds pair volume at O(docs);
    ``ops.cooc.cooc_pairs``)."""
    import ray.data

    from fastie_ray.ops.cooc import cooc_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return cooc_pairs(ds, k=100, per_doc_cap=16)


def _q_host_links(sf_dir: str):
    """Host-level web link graph from the raw ``html`` column: regex
    link extraction per page (``ops.web_graph.extract_links``), then
    in-link stats per target host — per-batch combiner, one
    host-bucketed exchange. The synth corpus plants out-links by pure
    modular arithmetic on the doc id (``synth.planted_links``), so the
    oracle reproduces the plan in SQL."""
    from fastie_ray.ops.web_graph import host_links

    return host_links(_pages(sf_dir))


def _q_anchor_texts(sf_dir: str):
    """Anchor-text corpus per target host (the IR artifact: anchor text
    describes the *target* page): (dst_host, anchor, n) counts via the
    same combiner → one-exchange shape."""
    from fastie_ray.ops.web_graph import anchor_texts

    return anchor_texts(_pages(sf_dir))


def _q_zorder_layout(sf_dir: str):
    """OPTIMIZE ZORDER BY (user, hour) over events: Morton-code the two
    dims, global-rank (no full sort barrier — ``ops.rank.global_rank``),
    cut fixed 512-row blocks, emit per-block zone maps
    (``ops.layout.zorder_blocks``). Blocks get small bounding boxes in
    BOTH dims, so 2-D predicates prune reads."""
    import pandas as pd

    from fastie_ray.ops.layout import zorder_blocks

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "x": (df["user_id"] % 256).astype("int64"),
                "y": (
                    (
                        df["ts"].astype("datetime64[us]").astype("int64")
                        // 3_600_000_000
                    )
                    % 256
                ).astype("int64"),
            }
        )

    return zorder_blocks(
        ev.map_batches(prep, batch_format="pandas"),
        x_col="x",
        y_col="y",
        tie_col="event_id",
        block_size=512,
    )


def _q_q3_topk(sf_dir: str):
    """TPC-H Q3 shape: segment filter → semi-join orders to BUILDING
    customers (keys only ship) → big⋈big lineitem join with scan-pushed
    date predicates → per-order revenue (combiner + one orderkey-bucketed
    exchange with in-bucket top-k) → driver merges buckets × 10 rows."""
    import datetime as _dt

    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.join import hash_join

    cut = _dt.datetime(1997, 1, 1)
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).filter(
        lambda r: r["c_mktsegment"] == "BUILDING"
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pc.field("o_orderdate") < cut,
        override_num_blocks=16,
    )
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=pc.field("l_shipdate") > cut,
        override_num_blocks=16,
    )
    kept = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey", how="semi",
        left_cols=["o_orderkey", "o_custkey", "o_orderdate"],
        n_buckets=16,
    )
    j = hash_join(
        li, kept, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_extendedprice", "l_discount"],
        right_cols=["o_orderkey", "o_orderdate"],
        n_buckets=16,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["revenue"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        return df.groupby(["l_orderkey", "o_orderdate"], as_index=False).agg(
            revenue=("revenue", "sum")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        k = df["l_orderkey"].to_numpy() if len(df) else np.array([], dtype=np.int64)
        df["__b"] = (k.astype(np.uint64) % np.uint64(8)).astype(np.int64)
        return df

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["l_orderkey", "o_orderdate"], as_index=False
        )["revenue"].sum()
        out["revenue"] = out["revenue"].round(4)
        return out.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True]
        ).head(10)

    cand = (
        j.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(local_topk, batch_format="pandas")
        .to_pandas()
    )
    out = cand.sort_values(
        ["revenue", "l_orderkey"], ascending=[False, True]
    ).head(10)
    return out.reset_index(drop=True)


def _q_region_revenue(sf_dir: str):
    """TPC-H Q5 shape: the nation/region dimensions are broadcast-small
    (mapped per batch, never shuffled); the two big⋈big joins
    (orders⋈customer, lineitem⋈orders) are task-based hash joins;
    revenue per nation finishes in a tiny bucketed final."""
    import datetime as _dt

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.join import hash_join
    from fastie_ray.pipelines.kg import _bucketed_groupby

    nat = _read(sf_dir, "nation").to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    asia = set(reg.loc[reg["r_name"] == "ASIA", "r_regionkey"])
    nation_name = {
        int(k): n
        for k, n, rk in zip(nat["n_nationkey"], nat["n_name"], nat["n_regionkey"])
        if rk in asia
    }

    def tag_customer(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_name"] = df["c_nationkey"].map(nation_name)
        return df.dropna(subset=["n_name"])[["c_custkey", "n_name"]]

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        tag_customer, batch_format="pandas"
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= _dt.datetime(1996, 1, 1))
        & (pc.field("o_orderdate") < _dt.datetime(1997, 1, 1)),
        override_num_blocks=16,
    )
    oc = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey", "o_custkey"],
        right_cols=["c_custkey", "n_name"],
        n_buckets=16,
    )
    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    j = hash_join(
        li, oc, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_extendedprice", "l_discount"],
        right_cols=["o_orderkey", "n_name"],
        n_buckets=16,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["revenue"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        return df.groupby("n_name", as_index=False).agg(
            n_items=("revenue", "count"), revenue=("revenue", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("n_name", as_index=False).agg(
            n_items=("n_items", "sum"), revenue=("revenue", "sum")
        )
        out["n_items"] = out["n_items"].astype("int64")
        out["revenue"] = out["revenue"].round(4)
        return out

    return _bucketed_groupby(
        j.map_batches(partial, batch_format="pandas"), "n_name", final, 4
    )


def _q_evolved_read(sf_dir: str):
    """Schema-evolution read: two 'crawl generations' of fragments —
    the old one lacks the ``lang`` column — unified by
    ``ops.schema_evolution.read_union_by_name`` (per-schema-group reads
    + typed-null alignment, union), then aggregated per language with
    nulls bucketed as 'unknown'."""
    import os
    import tempfile

    import pandas as pd

    from fastie_ray.ops.schema_evolution import read_union_by_name
    from fastie_ray.pipelines.kg import _bucketed_groupby

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def gen0(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % 2 == 0]
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_chars": df["text"].str.len().astype("int64")}
        )

    def gen1(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["doc_id"] % 2 == 1]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars": df["text"].str.len().astype("int64"),
                "lang": df["lang"],
            }
        )

    base = tempfile.mkdtemp(prefix="evolve_", dir="/tmp")
    docs.map_batches(gen0, batch_format="pandas").write_parquet(base + "/gen0")
    docs.map_batches(gen1, batch_format="pandas").write_parquet(base + "/gen1")
    paths = sorted(
        os.path.join(base, g, f)
        for g in ("gen0", "gen1")
        for f in os.listdir(os.path.join(base, g))
        if f.endswith(".parquet")
    )
    ds = read_union_by_name(paths, override_num_blocks=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["lang"] = df["lang"].fillna("unknown")
        return df.groupby("lang", as_index=False).agg(
            n_docs=("doc_id", "count"), sum_chars=("n_chars", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("lang", as_index=False)[["n_docs", "sum_chars"]].sum()
        return out.astype({"n_docs": "int64", "sum_chars": "int64"})

    return _bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"), "lang", final, 4
    )


def _q_kg_walks(sf_dir: str):
    """DeepWalk training corpus over the extracted KG: 2 deterministic
    walks of length 4 from every entity with an outgoing edge
    (``ops.graph.random_walks``, md5-grid step choice) — the skip-gram
    stream for graph-embedding training, composed on the full
    extraction path like entity_salience."""
    import pandas as pd

    from fastie_ray.ops.graph import random_walks
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"]
    edges = t.map_batches(
        lambda df: pd.DataFrame(
            {"src": df["subject_id"], "dst": df["object_id"]}
        ).drop_duplicates(),
        batch_format="pandas",
    )
    return random_walks(edges, walk_len=4, walks_per_node=2)


def _q_shuffle_shards(sf_dir: str):
    """Global-shuffle shard export: every doc gets a uniform md5-grid
    position, the shuffled order is cut into 64-doc shards
    (``ops.splits.shuffle_shards`` — rank via range combiner + one
    exchange, no sort barrier)."""
    from fastie_ray.ops.splits import shuffle_shards

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    return shuffle_shards(docs, id_col="doc_id", shard_size=64)


def _q_bottomk_sample(sf_dir: str):
    """Exact-100 uniform document sample via the bottom-k md5 sketch
    (``ops.sampling.bottom_k_sample``): per-batch local bottom-k, driver
    merges blocks × k candidates — no exchange, exact size."""
    from fastie_ray.ops.sampling import bottom_k_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return bottom_k_sample(docs, k=100, id_col="doc_id", keep_cols=["doc_id", "lang"])


def _q_grouped_sample(sf_dir: str):
    """Exact-25-per-language uniform document sample (stratified
    reservoir) via per-group bottom-k md5: combiner-first, one
    group-bucketed exchange."""
    from fastie_ray.ops.sampling import grouped_bottom_k_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return grouped_bottom_k_sample(
        docs, k=25, group_col="lang", id_col="doc_id"
    )


def _q_golden_records(sf_dir: str):
    """ER survivorship: blocking + verification + cluster merge in ONE
    first-char-bucketed exchange (match edges are in-class successor
    pairs, so components are gaps-and-islands runs —
    ``ops.blocking.golden_records``). Canonical = longest member,
    ties lexicographic."""
    import pandas as pd

    from fastie_ray.ops.blocking import golden_records

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def sites(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"v": df["source"] + "/" + (df["doc_id"] % 61).astype(str)}
        )

    return golden_records(
        ds.map_batches(sites, batch_format="pandas"), "v",
        min_prefix=4, max_dist=2,
    )


def _q_dp_lang_counts(sf_dir: str):
    """Noisy aggregate release: per-language doc counts + the
    Laplace(1/epsilon)-noised publication value
    (``ops.privacy.dp_group_counts``; md5-grid draw — deterministic
    pseudo-noise, see the module's honesty note)."""
    from fastie_ray.ops.privacy import dp_group_counts

    docs = _read(sf_dir, "documents", columns=["lang"])
    return dp_group_counts(docs, "lang", epsilon=1.0)


def _q_winsorized_stats(sf_dir: str):
    """Winsorized per-type value stats: exact grouped [p5, p95]
    quantiles broadcast as clamp bounds, then streaming clamped sums
    (``ops.stats.winsorized_stats``); integer cents keep it SQL-exact."""
    import pandas as pd

    from fastie_ray.ops.stats import winsorized_stats

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "cents": (df["value"] * 100 + 0.5).astype("int64"),
            }
        )

    return winsorized_stats(
        ev.map_batches(cents, batch_format="pandas"),
        "event_type", "cents", lo_q=0.05, hi_q=0.95,
    )


def _q_asof_state(sf_dir: str):
    """Time-travel read: customer balances AS OF 1998-01-01 — the CDC
    merge restricted to the change prefix (``ops.cdc.asof_state``; the
    timestamp filter rides the scan, so old snapshots ship fewer
    change rows, not more)."""
    import datetime as _dt

    import numpy as np
    import pandas as pd

    from fastie_ray.ops.cdc import asof_state

    base = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"]).map_batches(
        lambda df: df.rename(columns={"c_custkey": "custkey", "c_acctbal": "acctbal"}),
        batch_format="pandas",
    )
    chg = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus", "o_totalprice"],
    ).map_batches(
        lambda df: pd.DataFrame(
            {
                "custkey": df["o_custkey"],
                "acctbal": df["o_totalprice"],
                "ts": df["o_orderdate"],
                "seq": df["o_orderkey"].astype("int64"),
                "op": np.where(df["o_orderstatus"] == "F", "delete", "upsert"),
            }
        ),
        batch_format="pandas",
    )
    return asof_state(base, chg, "custkey", ["acctbal"], as_of=_dt.datetime(1998, 1, 1))


def _q_psi_drift(sf_dir: str):
    """Score-distribution drift between the first and second half of
    the event month (``ops.stats.psi_drift``): fixed $10 value bins,
    Laplace-smoothed PSI terms — the ML-ops monitor that catches a
    crawl/source going stale."""
    import datetime as _dt

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.stats import psi_drift

    cut = _dt.datetime(2024, 1, 16)

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"cents": (df["value"] * 100 + 0.5).astype("int64")})

    def side(flt):
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "value"],
            filter=flt, override_num_blocks=16,
        ).map_batches(cents, batch_format="pandas")

    return psi_drift(
        side(pc.field("ts") < cut),
        side(pc.field("ts") >= cut),
        "cents",
        n_bins=16,
        bin_width=1000,
    )


def _q_host_cocitation(sf_dir: str):
    """Co-citation host similarity: top-100 host pairs linked by the
    same pages (``ops.web_graph.host_cocitation``; per-page pair
    enumeration is bounded by links-per-page, combiner + one
    pair-bucketed exchange)."""
    from fastie_ray.ops.web_graph import host_cocitation

    return host_cocitation(_pages(sf_dir), k=100)


def _q_uncertain_docs(sf_dir: str):
    """Active-learning acquisition: train the integer perceptron,
    score the corpus, keep the 50 docs with the smallest |score|
    (``ops.linear_train.uncertainty_sample`` — local bottom-k
    combiner, no exchange). Oracle = training unroll + scoring CTE +
    margin order."""
    import pandas as pd

    from fastie_ray.ops.linear_train import (
        perceptron_score,
        perceptron_train,
        uncertainty_sample,
    )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def lab(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["y"] = (df["lang"] == "en").map({True: 1, False: -1}).astype("int64")
        return df

    w = perceptron_train(
        ds.map_batches(lab, batch_format="pandas"), "y", n_iter=3, n_features=64
    )
    scored = perceptron_score(ds, w["weight"].to_numpy(), n_features=64)
    return uncertainty_sample(scored, k=50)


def _q_readability(sf_dir: str):
    """Flesch reading-ease per doc (vectorized regex counts, streaming;
    ``ops.text_analysis.readability_scores``)."""
    from fastie_ray.ops.text_analysis import readability_scores

    return readability_scores(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_lang_ranks(sf_dir: str):
    """Per-group global ROW_NUMBER (rank of every doc within its
    language by length desc): the two-phase (group, key-range)
    decomposition of ``ops.rank.grouped_rank`` — no sort barrier, hot
    groups spread across their key ranges."""
    from fastie_ray.ops.rank import grouped_rank

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return grouped_rank(
        docs, group_col="lang", key_col="n_chars", tie_col="doc_id",
        descending=True,
    )


def _q_value_mad(sf_dir: str):
    """Robust dispersion per event type: median + MAD of the integer
    value cents via two exact grouped-quantile passes
    (``ops.stats.grouped_mad``)."""
    import pandas as pd

    from fastie_ray.ops.stats import grouped_mad

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "cents": (df["value"] * 100 + 0.5).astype("int64"),
            }
        )

    return grouped_mad(ev.map_batches(cents, batch_format="pandas"),
                       "event_type", "cents")


def _q_kg_edge_spans(sf_dir: str):
    """Temporal KG lineage: per (subject, predicate, object) triple,
    support count and the first/last crawl timestamp it was observed
    (min/max warc_ts in microseconds) — the edge-validity layer an
    incremental KG needs to expire stale facts. Partial min/max/count
    combiner + one triple-bucketed exchange over the extraction path."""
    import numpy as np
    import pandas as pd
    import ray

    from fastie_ray.pipelines.kg import _bucketed_groupby, doc_triples
    from fastie_ray.synth import EPOCH_US

    world_ref = ray.put(_world())
    triples = doc_triples(_pages(sf_dir), world_ref=world_ref, concurrency=_conc())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        doc_id = df["url"].str.rsplit("/", n=1).str[-1].astype("int64")
        df["ts_us"] = (EPOCH_US + doc_id * 1_000_000).astype("int64")
        return df.groupby(
            ["subject", "predicate", "object"], as_index=False
        ).agg(n_docs=("ts_us", "count"), first_us=("ts_us", "min"),
              last_us=("ts_us", "max"))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["subject", "predicate", "object"], as_index=False).agg(
            n_docs=("n_docs", "sum"), first_us=("first_us", "min"),
            last_us=("last_us", "max"),
        )
        return out.astype(
            {"n_docs": "int64", "first_us": "int64", "last_us": "int64"}
        )

    return _bucketed_groupby(
        triples.map_batches(partial, batch_format="pandas"), "subject", final, 8
    )


def _q_weighted_salience(sf_dir: str):
    """Support-weighted entity salience: PageRank over the extracted
    KG with edge weight = total support count per (subject, object)
    pair (``ops.graph.pagerank(weight_col=…)``) — heavily-attested
    edges carry proportionally more rank than one-off extractions."""
    import pandas as pd

    from fastie_ray.ops.graph import pagerank
    from fastie_ray.pipelines.kg import _bucketed_groupby, graph_tables

    t = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "src": df["subject_id"],
                "dst": df["object_id"],
                "w": df["n_support"].astype("int64"),
            }
        )
        return out.groupby(["src", "dst"], as_index=False)["w"].sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["src", "dst"], as_index=False)["w"].sum()
        out["w"] = out["w"].astype("int64")
        return out

    edges = _bucketed_groupby(
        t.map_batches(partial, batch_format="pandas"), "src", final, 8
    )
    return pagerank(edges, n_iter=3, weight_col="w")


def _q_split_leakage(sf_dir: str):
    """Contamination audit: near-dup pairs (planted-duplicate
    construction) whose endpoints fall in different splits under a
    ROW-keyed md5 split — row-wise splitting of a dup-heavy corpus
    leaks, and this measures how much
    (``ops.splits.split_leakage_audit``)."""
    from fastie_ray.ops.splits import split_leakage_audit

    _, pairs = _planted_dup_docs_pairs(sf_dir)
    return split_leakage_audit(pairs)


def _ppr_seeds():
    f0 = _world().facts[0]
    return sorted({f0.subj.entity_id, f0.obj.entity_id})


def _q_related_entities(sf_dir: str):
    """Personalized PageRank from a 2-entity seed set over the
    extracted KG (``ops.graph.pagerank(seeds=…)``): teleport + dangling
    mass restart at the seeds, so ranks measure relatedness TO them —
    the KG entity-relatedness query."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import pagerank
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"]
    edges = t.map_batches(
        lambda df: pd.DataFrame(
            {"src": df["subject_id"], "dst": df["object_id"]}
        ).drop_duplicates(),
        batch_format="pandas",
    )
    return pagerank(
        dedup_exact(edges, ["src", "dst"], n_buckets=16),
        n_iter=3,
        seeds=_ppr_seeds(),
    )


def _q_hll_overlap(sf_dir: str):
    """Audience-overlap sketch state: HLL registers for click users,
    view users, and their UNION (element-wise register max — the
    mergeability that makes HLL the scale tool for set algebra;
    |A∩B| ≈ |A|+|B|−|A∪B| is the pytest-pinned float half). All three
    register columns are integer-exact and SQL-verified."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.sketch import hll_registers

    def regs(ev_type: str) -> pd.DataFrame:
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"],
            filter=pc.field("event_type") == ev_type, override_num_blocks=16,
        )
        return hll_registers(ds, "user_id", n_registers=256)

    c = regs("click").rename(columns={"max_rho": "r_click"})
    v = regs("view").rename(columns={"max_rho": "r_view"})
    out = c.merge(v, on="register", how="outer").fillna(0)
    out["r_union"] = out[["r_click", "r_view"]].max(axis=1)
    out = out.astype(
        {"register": "int64", "r_click": "int64", "r_view": "int64",
         "r_union": "int64"}
    )
    return out.sort_values("register").reset_index(drop=True)


def _q_entity_types(sf_dir: str):
    """Type consensus per canonical entity: majority mention label over
    all linked occurrences (``pipelines.kg.entity_type_consensus`` —
    occurrence-count combiner, one mention-bucketed exchange with
    worker-cached linking, vocabulary-bounded argmax)."""
    import ray

    from fastie_ray.pipelines.kg import entity_type_consensus

    world_ref = ray.put(_world())
    return entity_type_consensus(
        _pages(sf_dir), world_ref=world_ref, concurrency=_conc()
    )


def _q_curriculum(sf_dir: str):
    """Curriculum buckets: quartile of each doc within its language by
    length ascending (shortest = bucket 0 — the easy-first training
    order), via ``ops.rank.grouped_ntile`` (grouped rank + broadcast
    group sizes; contiguous-quantile floor formula)."""
    from fastie_ray.ops.rank import grouped_ntile

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    return grouped_ntile(
        docs, group_col="lang", key_col="n_chars", tie_col="doc_id", k=4
    )


def _q_burst_windows(sf_dir: str):
    """Volume-burst anomaly detection: hourly windows whose event count
    exceeds 3× the type's average windows-with-data count — exact
    integer cross-multiplied threshold (``ops.windows.burst_windows``).
    Planted: every 50th event is replayed into one fixed hour."""
    import pandas as pd

    from fastie_ray.ops.windows import burst_windows

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "ts"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        extra = df[df["event_id"] % 50 == 0].copy()
        extra["ts"] = pd.Timestamp("2024-01-05 00:30:00")
        return pd.concat(
            [df[["event_type", "ts"]], extra[["event_type", "ts"]]],
            ignore_index=True,
        )

    return burst_windows(
        ev.map_batches(plant, batch_format="pandas"),
        key_col="event_type", ts_col="ts",
        window_us=3_600_000_000, factor_num=3, factor_den=1,
    )


def _q_kg_degrees(sf_dir: str):
    """Graph profile: out-degree histogram of the extracted KG
    (``ops.graph.node_table`` combiner → degree counts; sinks appear at
    degree 0) — the shape check that catches extraction pathologies
    (a single super-node, a disconnected dust cloud)."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import node_table
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"]
    edges = dedup_exact(
        t.map_batches(
            lambda df: pd.DataFrame(
                {"src": df["subject_id"], "dst": df["object_id"]}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        ["src", "dst"],
        n_buckets=16,
    )
    deg = node_table(edges, n_buckets=16).to_pandas()
    out = deg.groupby("outdeg", as_index=False).agg(n_nodes=("node", "count"))
    out = out.astype({"outdeg": "int64", "n_nodes": "int64"})
    return out.sort_values("outdeg").reset_index(drop=True)


def _q_kg_reciprocity(sf_dir: str):
    """Edge reciprocity of the extracted KG (``ops.graph.reciprocity``:
    one canonical-pair-bucketed exchange) — symmetric predicates should
    reciprocate, functional ones should not."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import reciprocity
    from fastie_ray.pipelines.kg import graph_tables

    t = graph_tables(
        _pages(sf_dir), world=_world(), concurrency=_conc(), want=("edges",)
    )["edges"]
    edges = dedup_exact(
        t.map_batches(
            lambda df: pd.DataFrame(
                {"src": df["subject_id"], "dst": df["object_id"]}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        ["src", "dst"],
        n_buckets=16,
    )
    return reciprocity(edges)


def _q_user_activity(sf_dir: str):
    """FULL OUTER join: per-user click counts ⋈ per-user error counts —
    users active on either side appear once, missing sides as 0
    (``ops.join.hash_join(how="full")``, tag-union exchange, unmatched
    rows from BOTH sides survive)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.join import hash_join
    from fastie_ray.pipelines.kg import _bucketed_groupby

    def counts(ev_type: str, out: str):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "user_id"],
            filter=pc.field("event_type") == ev_type, override_num_blocks=16,
        )

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("user_id", as_index=False).agg(n=("user_id", "count"))
            return g.rename(columns={"n": out})

        def final(g: pd.DataFrame) -> pd.DataFrame:
            o = g.groupby("user_id", as_index=False)[out].sum()
            return o.astype({out: "int64"})

        return _bucketed_groupby(
            ds.map_batches(partial, batch_format="pandas"), "user_id", final, 8
        )

    clicks = counts("click", "n_clicks")
    errors = counts("error", "n_errors")
    j = hash_join(
        clicks, errors, on="user_id", how="full",
        left_cols=["user_id", "n_clicks"], right_cols=["user_id", "n_errors"],
        n_buckets=8,
    )

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "n_clicks": df["n_clicks"].fillna(0).astype("int64"),
                "n_errors": df["n_errors"].fillna(0).astype("int64"),
            }
        )

    return j.map_batches(fill, batch_format="pandas")


def _q_line_dedup(sf_dir: str):
    """CCNet-style line-level boilerplate removal
    (``ops.line_dedup.line_dedup``): corpus-wide line counts (combiner
    → one exchange, only heavy lines leave it), heavy-line left join,
    per-doc rebuild with an md5 of the surviving text. The
    line-structured corpus derives deterministically from documents —
    a cookie banner on every doc, a rotating promo line on every third
    doc, a unique body line, a low-frequency ref line — so the oracle
    replays the plant and the threshold in SQL."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.line_dedup import line_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_lines(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        frames = [
            pd.DataFrame(
                {
                    "doc_id": did,
                    "idx": np.int64(0),
                    "line": "cookie notice please accept cookies",
                }
            ),
            pd.DataFrame(
                {
                    "doc_id": did[did % 3 == 0],
                    "idx": np.int64(1),
                    "line": "promo code " + (did[did % 3 == 0] % 7).astype(str),
                }
            ),
            pd.DataFrame(
                {
                    "doc_id": did,
                    "idx": np.int64(2),
                    "line": "body " + did.astype(str) + " " + df["text"],
                }
            ),
            pd.DataFrame(
                {
                    "doc_id": did,
                    "idx": np.int64(3),
                    "line": "ref " + (did % 97).astype(str),
                }
            ),
        ]
        return pd.concat(frames, ignore_index=True)

    lines = ds.map_batches(to_lines, batch_format="pandas")
    return line_dedup(lines, max_count=16, n_buckets=16)


def _q_hits(sf_dir: str):
    """HITS hubs/authorities (3 unnormalized integer power steps —
    exact alternating-path counts) over the distinct customer→supplier
    graph from orders⋈lineitem; ``ops.graph.hits``. Per iteration: two
    edge⋈score hash joins + two bucketed sum exchanges, edge table
    materialized once, score tables node-sized."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import hits
    from fastie_ray.ops.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"], right_cols=["o_orderkey", "o_custkey"],
    )
    edges = j.map_batches(
        lambda df: pd.DataFrame(
            {"src": "c" + df["o_custkey"].astype(str),
             "dst": "s" + df["l_suppkey"].astype(str)}
        ).drop_duplicates(),
        batch_format="pandas",
    )
    return hits(dedup_exact(edges, ["src", "dst"], n_buckets=16), n_iter=3)


def _hits_sql(edges_cte: str, n_iter: int = 3) -> str:
    """Unrolled integer-HITS oracle over any ``edges(src, dst)``
    DISTINCT edge CTE (mirrors ``ops.graph.hits`` arithmetic)."""
    ctes = [
        edges_cte,
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "h0 AS (SELECT node, CAST(1 AS BIGINT) AS s FROM nodes)",
    ]
    for t in range(1, n_iter + 1):
        ctes.append(
            f"a{t} AS (SELECT e.dst AS node, sum(h.s) AS s "
            f"FROM edges e JOIN h{t - 1} h ON e.src = h.node GROUP BY 1)"
        )
        ctes.append(
            f"h{t} AS (SELECT e.src AS node, sum(a.s) AS s "
            f"FROM edges e JOIN a{t} a ON e.dst = a.node GROUP BY 1)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT n.node, CAST(coalesce(h.s, 0) AS BIGINT) AS hub,
               CAST(coalesce(a.s, 0) AS BIGINT) AS auth
        FROM nodes n LEFT JOIN h{n_iter} h USING (node)
                     LEFT JOIN a{n_iter} a USING (node)"""
    )


def _q_assoc_rules(sf_dir: str):
    """Size-2 association rules over per-doc distinct token sets
    (``ops.cooc.assoc_rules``): support-pruned pair counts + token
    doc-counts (combiner → one exchange each), two task hash joins for
    the denominators, integer-floor confidence and lift."""
    from fastie_ray.ops.cooc import assoc_rules

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return assoc_rules(
        ds, min_support=5, min_conf_e6=200_000, per_doc_cap=16
    )


def _q_event_pivot(sf_dir: str):
    """PIVOT events into a wide per-user profile — count + integer-cent
    value sum per event type over a FIXED category list
    (``ops.stats.pivot_counts``): per-batch wide combiner, one
    user-bucketed exchange."""
    from fastie_ray.ops.stats import pivot_counts

    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "value"])
    return pivot_counts(
        ev, "user_id", "event_type", ["click", "view", "purchase"],
        value_col="value",
    )


def _q_stream_join(sf_dir: str):
    """Stream-stream BAND join: click → purchase within 30 min per
    user (``ops.interval.band_join``): chunk-replicated left (2×),
    right in its own chunk, every pair emitted once in the right row's
    chunk — ONE exchange, no dedup, payload-free replication."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.interval import band_join

    def ev(kind: str):
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
            filter=pc.field("event_type") == kind,
            override_num_blocks=16,
        )

    j = band_join(
        ev("click"), ev("purchase"), key_col="user_id", ts_col="ts",
        band="30min", direction="forward", id_col="event_id", n_buckets=16,
    )

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["k"],
                "click_id": df["id_left"],
                "purchase_id": df["id_right"],
                "delta_us": df["delta_us"],
            }
        )

    return j.map_batches(rename, batch_format="pandas")


def _q_vocab_build(sf_dir: str):
    """Frequency-ranked vocabulary with a min-count cutoff
    (``ops.vocab.build_vocab``): token counts with the cutoff applied
    INSIDE the exchange, ids via sort-barrier-free global rank by
    (n DESC, token). A rare-token plant (one ``tk<doc_id%211>`` per
    doc) puts mass on BOTH sides of the cutoff."""
    import pandas as pd

    from fastie_ray.ops.vocab import build_vocab

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text": df["text"]
                + " tk"
                + (df["doc_id"].astype("int64") % 211).astype(str),
            }
        )

    return build_vocab(
        ds.map_batches(plant, batch_format="pandas"), min_count=5,
        n_buckets=16,
    )


def _q_scc(sf_dir: str):
    """Strongly connected components (``ops.graph.scc`` — FW-BW
    coloring, the standard distributed SCC algorithm) over a planted
    directed graph on customer keys: a permutation cycle inside each
    decade (x → 3·digit+1 mod 10) plus even-decade → next-decade chain
    edges, so SCCs are the decade cycles and the color DAG is 2 deep.
    Oracle is the recursive-CTE mutual-reachability closure."""
    import pandas as pd

    from fastie_ray.ops.graph import scc

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    maxk = int(cust.max("c_custkey"))

    def mk_edges(df: pd.DataFrame) -> pd.DataFrame:
        x = df["c_custkey"].astype("int64")
        e1 = pd.DataFrame(
            {"src": x, "dst": (x // 10) * 10 + ((x % 10) * 3 + 1) % 10}
        )
        m = (x // 10) % 2 == 0
        e2 = pd.DataFrame({"src": x[m & (x + 10 <= maxk)]})
        e2["dst"] = e2["src"] + 10
        return pd.concat([e1, e2], ignore_index=True).astype("int64")

    return scc(
        cust.map_batches(mk_edges, batch_format="pandas"),
        n_phases=4, max_rounds=16, n_buckets=16,
    )


def _q_running_total(sf_dir: str):
    """Per-user RUNNING TOTAL (SUM OVER PARTITION BY … ORDER BY …
    ROWS UNBOUNDED PRECEDING) via the two-phase (key, day-bucket)
    prefix shape — corpus rows cross ONE exchange; hot users spread
    over their days (``ops.rolling.grouped_running_sum``)."""
    import pandas as pd

    from fastie_ray.ops.rolling import grouped_running_sum

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out = grouped_running_sum(
        ev, "user_id", "ts", "event_id", "value", bucket="1d", n_buckets=16
    )

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["id"],
                "user_id": df["k"],
                "running_e2": df["running_e2"],
            }
        )

    return out.map_batches(rename, batch_format="pandas")


def _q_decayed_counts(sf_dir: str):
    """Time-decayed popularity counters per event type (feature-store
    exponential decay, halving per day): power-of-two weights keep
    every term integer-exact, so the distributed sum is
    order-independent (``ops.stats.decayed_counts``)."""
    from fastie_ray.ops.stats import decayed_counts

    ev = _read(sf_dir, "events", columns=["event_type", "ts"])
    return decayed_counts(
        ev, "event_type", "ts", ref_ts="2024-01-31", unit="1d",
        scale_bits=40, clamp=40,
    )


def _q_source_overlap(sf_dir: str):
    """Cross-source contamination matrix: shared distinct document
    fingerprints per source pair (``ops.dedup.cross_source_overlap``).
    Every 4th doc is planted onto one of 40 shared page texts so the
    overlap is non-trivial; the oracle replays the plant."""
    import pandas as pd

    from fastie_ray.ops.dedup import cross_source_overlap

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        shared = "shared page " + (did % 13).astype(str)
        uniq = df["text"] + " #" + did.astype(str)
        return pd.DataFrame(
            {
                "source": df["source"],
                "text": shared.where(did % 4 == 0, uniq),
            }
        )

    return cross_source_overlap(
        ds.map_batches(plant, batch_format="pandas"), "text", "source"
    )


def _mis_edges_sql() -> str:
    """Planted undirected graph for the MIS oracle: the scc decade
    graph, symmetrized with self-loops dropped (none exist)."""
    return """mx AS (SELECT max(c_custkey) AS m FROM customer),
            de AS (
                SELECT c_custkey AS src,
                       (c_custkey // 10) * 10
                           + ((c_custkey % 10) * 3 + 1) % 10 AS dst
                FROM customer
                UNION
                SELECT c_custkey, c_custkey + 10
                FROM customer, mx
                WHERE (c_custkey // 10) % 2 = 0 AND c_custkey + 10 <= mx.m
            ),
            edges AS (
                SELECT src, dst FROM de WHERE src != dst
                UNION SELECT dst, src FROM de WHERE src != dst
            )"""


def _mis_sql(n_rounds: int = 8) -> str:
    """Unrolled deterministic-Luby oracle: priorities are
    md5('mis:'||node)[:8 hex]·10^7 + node (unique), a node joins when
    it is a strict local minimum among remaining neighbors."""
    # round CTEs are MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, and the unrolled rounds reference each other 3-4×
    # each — inlining is exponential in rounds (measured: "Too many
    # open files" from re-scanning the parquet view thousands of times)
    ctes = [
        _mis_edges_sql(),
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM edges)",
        """p AS (SELECT node,
               CAST(('0x' || substr(md5('mis:' || CAST(node AS VARCHAR)),
                                    1, 8)) AS BIGINT) * 10000000 + node
                   AS c
           FROM nodes)""",
        "rem0 AS MATERIALIZED (SELECT node, c FROM p)",
        "e0 AS MATERIALIZED (SELECT src, dst FROM edges)",
        "m0 AS (SELECT node FROM rem0 WHERE 1 = 0)",
    ]
    for t in range(1, n_rounds + 1):
        ctes.append(
            f"""nm{t} AS MATERIALIZED (
                SELECT e.src AS node, min(r.c) AS nm
                FROM e{t - 1} e JOIN rem{t - 1} r ON e.dst = r.node
                GROUP BY 1)"""
        )
        ctes.append(
            f"""w{t} AS MATERIALIZED (
                SELECT r.node FROM rem{t - 1} r LEFT JOIN nm{t} n
                     USING (node)
                WHERE n.nm IS NULL OR r.c < n.nm)"""
        )
        ctes.append(
            f"""rm{t} AS MATERIALIZED (
                SELECT node FROM w{t}
                UNION
                SELECT e.dst FROM e{t - 1} e
                WHERE e.src IN (SELECT node FROM w{t}))"""
        )
        ctes.append(
            f"""rem{t} AS MATERIALIZED (
                SELECT node, c FROM rem{t - 1}
                WHERE node NOT IN (SELECT node FROM rm{t}))"""
        )
        ctes.append(
            f"""e{t} AS MATERIALIZED (
                SELECT src, dst FROM e{t - 1}
                WHERE src NOT IN (SELECT node FROM rm{t})
                  AND dst NOT IN (SELECT node FROM rm{t}))"""
        )
        ctes.append(
            f"m{t} AS MATERIALIZED (SELECT node FROM m{t - 1} "
            f"UNION SELECT node FROM w{t})"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT n.node,
               CAST(CASE WHEN m.node IS NULL THEN 0 ELSE 1 END AS BIGINT)
                   AS in_mis
        FROM nodes n LEFT JOIN m{n_rounds} m USING (node)"""
    )


def _q_mis(sf_dir: str):
    """Luby maximal independent set (``ops.graph.mis``) over the
    symmetrized planted decade graph — md5 priorities make every round
    deterministic, so the unrolled-CTE oracle matches bit-for-bit."""
    import pandas as pd

    from fastie_ray.ops.graph import mis

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    maxk = int(cust.max("c_custkey"))

    def mk_edges(df: pd.DataFrame) -> pd.DataFrame:
        x = df["c_custkey"].astype("int64")
        e1 = pd.DataFrame(
            {"src": x, "dst": (x // 10) * 10 + ((x % 10) * 3 + 1) % 10}
        )
        m = (x // 10) % 2 == 0
        e2 = pd.DataFrame({"src": x[m & (x + 10 <= maxk)]})
        e2["dst"] = e2["src"] + 10
        return pd.concat([e1, e2], ignore_index=True).astype("int64")

    return mis(
        cust.map_batches(mk_edges, batch_format="pandas"),
        max_rounds=8, n_buckets=16,
    )


def _q_dq_checks(sf_dir: str):
    """Deequ-style data-quality audit (``ops.profile``): range,
    uniqueness, referential-integrity, accepted-values and
    non-negativity constraints over lineitem/orders/events, each a
    driver-scalar metric from streaming partials or anti joins; the
    report is checks-bounded. The qty range [1, 30] and the
    ``o_orderkey % 7 != 0`` parent restriction plant real
    violations."""
    import pandas as pd

    from fastie_ray.ops.profile import (
        dq_report,
        distinct_violations,
        orphan_count,
        violation_count,
    )

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    ev = _read(sf_dir, "events", columns=["event_type"])

    qty_v, qty_n = violation_count(
        li, lambda df: (df["l_quantity"] < 1) | (df["l_quantity"] > 30)
    )
    uniq_v, uniq_n = distinct_violations(orders, "o_orderkey")
    parent = orders.map_batches(
        lambda df: df.loc[df["o_orderkey"] % 7 != 0, ["o_orderkey"]],
        batch_format="pandas",
    )
    orph_v, orph_n = orphan_count(
        li, parent, on="l_orderkey", right_on="o_orderkey"
    )
    known = {"click", "view", "error", "signup", "purchase"}
    dom_v, dom_n = violation_count(
        ev, lambda df: ~df["event_type"].isin(known)
    )
    neg_v, neg_n = violation_count(orders, lambda df: df["o_totalprice"] < 0)

    return dq_report(
        [
            ("qty_range", qty_v, qty_n),
            ("orderkey_unique", uniq_v, uniq_n),
            ("li_orphans", orph_v, orph_n),
            ("event_type_domain", dom_v, dom_n),
            ("price_nonneg", neg_v, neg_n),
        ]
    )


def _q_ivm_join(sf_dir: str):
    """Incremental join-view maintenance
    (``ops.join.incremental_join_delta``): lineitem/orders each split
    into base + append delta; the materialized old join plus the
    three-term delta equals the full fresh join EXACTLY — verified by
    the full-join oracle. Output is the per-order rollup of the
    incrementally-maintained join."""
    import pandas as pd

    from fastie_ray.ops.join import hash_join, incremental_join_delta
    from fastie_ray.pipelines.kg import _bucketed_groupby

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    li_delta = li.map_batches(
        lambda df: df[df["l_orderkey"] % 5 == 0], batch_format="pandas"
    )
    li_base = li.map_batches(
        lambda df: df[df["l_orderkey"] % 5 != 0], batch_format="pandas"
    )
    o_delta = orders.map_batches(
        lambda df: df[df["o_orderkey"] % 3 == 0], batch_format="pandas"
    )
    o_base = orders.map_batches(
        lambda df: df[df["o_orderkey"] % 3 != 0], batch_format="pandas"
    )

    cols = dict(
        left_cols=["l_orderkey", "l_extendedprice"],
        right_cols=["o_orderkey", "o_custkey"],
    )
    old = hash_join(li_base, o_base, on="l_orderkey", right_on="o_orderkey",
                    **cols)
    delta = incremental_join_delta(
        li_base, li_delta, o_base, o_delta,
        on="l_orderkey", right_on="o_orderkey", **cols,
    )
    full = old.union(delta)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.copy()
        g["rev_e2"] = (g["l_extendedprice"] * 100).round().astype("int64")
        out = g.groupby(["l_orderkey", "o_custkey"], as_index=False).agg(
            n_items=("rev_e2", "count"), rev_e2=("rev_e2", "sum")
        )
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["l_orderkey", "o_custkey"], as_index=False).agg(
            n_items=("n_items", "sum"), rev_e2=("rev_e2", "sum")
        )
        return out.astype({"n_items": "int64", "rev_e2": "int64"})

    return _bucketed_groupby(
        full.map_batches(partial, batch_format="pandas"),
        "l_orderkey", final, 16,
    )


def _q_csv_read(sf_dir: str):
    """CSV source breadth: events exported once to scratch CSV
    (``Dataset.write_csv``), read back with ``ray.data.read_csv`` and
    aggregated — oracle aggregates the parquet original, so the CSV
    round-trip must preserve values exactly."""
    import os

    import pandas as pd
    import ray.data

    from fastie_ray.pipelines.kg import _bucketed_groupby

    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = f"/tmp/fastie_csv_{tag}"
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
        ev.repartition(4).write_csv(out_dir)
        with open(marker, "w") as f:
            f.write("ok")
    csv = ray.data.read_csv(
        out_dir, file_extensions=["csv"], override_num_blocks=4
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.copy()
        g["cents"] = (g["value"] * 100).round().astype("int64")
        return g.groupby("user_id", as_index=False).agg(
            n=("event_id", "count"), sum_e2=("cents", "sum")
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", as_index=False).agg(
            n=("n", "sum"), sum_e2=("sum_e2", "sum")
        )
        return out.astype({"n": "int64", "sum_e2": "int64"})

    return _bucketed_groupby(
        csv.map_batches(partial, batch_format="pandas"), "user_id", final, 8
    )


def _q_dag_levels(sf_dir: str):
    """Condensation topological levels
    (``ops.graph.condensation_levels``): contract the planted decade
    graph's SCCs, then longest-path-from-source levels via monotone
    max propagation; oracle composes the mutual-reach closure with a
    recursive longest-path CTE."""
    import pandas as pd

    from fastie_ray.ops.graph import condensation_levels

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    maxk = int(cust.max("c_custkey"))

    def mk_edges(df: pd.DataFrame) -> pd.DataFrame:
        x = df["c_custkey"].astype("int64")
        e1 = pd.DataFrame(
            {"src": x, "dst": (x // 10) * 10 + ((x % 10) * 3 + 1) % 10}
        )
        m = (x // 10) % 2 == 0
        e2 = pd.DataFrame({"src": x[m & (x + 10 <= maxk)]})
        e2["dst"] = e2["src"] + 10
        return pd.concat([e1, e2], ignore_index=True).astype("int64")

    return condensation_levels(
        cust.map_batches(mk_edges, batch_format="pandas"),
        n_phases=4, max_rounds=16, n_buckets=16,
    )


def _q_kanon_audit(sf_dir: str):
    """k-anonymity audit (``ops.privacy.k_anonymity_audit``): customer
    equivalence classes on (nation, market segment) with fewer than 8
    members — the re-identifiable classes a release must suppress.
    Combiner → one exchange; only risky classes leave it."""
    from fastie_ray.ops.privacy import k_anonymity_audit

    cust = _read(sf_dir, "customer", columns=["c_nationkey", "c_mktsegment"])
    return k_anonymity_audit(
        cust, ["c_nationkey", "c_mktsegment"], k=8, n_buckets=8
    )


def _q_trigram_search(sf_dir: str):
    """Substring search via pattern-pruned character-trigram postings
    (``ops.text_index.trigram_search``, the pg_trgm / code-search
    shape): trigram-count candidates in one exchange, exact
    ``contains`` verification only on candidate rows."""
    from fastie_ray.ops.text_index import trigram_search

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return trigram_search(
        ds, ["window vector", "slow small data", "zzz nothing"],
        n_buckets=8,
    )


def _planted_scores(sf_dir: str):
    """Deterministic scored-and-labeled eval set: 40% positives with a
    +300 score shift over a (doc_id·37) % 1000 base — overlapping
    classes, so AUC is strictly between 0.5 and 1."""
    import pandas as pd

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        label = (did % 5 < 2).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": did,
                "score": (did * 37) % 1000 + 300 * label,
                "label": label,
            }
        )

    return ds.map_batches(plant, batch_format="pandas")


def _q_auc(sf_dir: str):
    """Exact distributed ROC-AUC (``ops.metrics.auc_exact``):
    Mann-Whitney U with integer midranks from one score-count
    exchange + a domain-bounded driver prefix scan."""
    from fastie_ray.ops.metrics import auc_exact

    return auc_exact(_planted_scores(sf_dir), "score", "label")


def _q_calibration(sf_dir: str):
    """Reliability-diagram bins (``ops.metrics.calibration_bins``):
    per score-bucket (n, n_pos) — the calibration audit next to AUC."""
    from fastie_ray.ops.metrics import calibration_bins

    return calibration_bins(
        _planted_scores(sf_dir), "score", "label", bin_width=100
    )


def _q_grouped_calibration(sf_dir: str):
    """Per-SEGMENT reliability bins (``ops.metrics.calibration_bins``
    with ``group_col``): the calibration audit sliced by language —
    the fairness/drift report that catches a model calibrated on
    average but off for one segment. Same planted score construction
    as ``calibration``; bins keyed (lang, bin)."""
    import pandas as pd

    from fastie_ray.ops.metrics import calibration_bins

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        label = (did % 5 < 2).astype("int64")
        return pd.DataFrame(
            {"lang": df["lang"], "score": (did * 37) % 1000 + 300 * label,
             "label": label}
        )

    return calibration_bins(
        docs.map_batches(plant, batch_format="pandas"),
        "score", "label", bin_width=100, group_col="lang",
    )


def _q_grouped_perm_test(sf_dir: str):
    """Per-segment permutation test (``ops.stats.
    grouped_permutation_test``): one exact-integer p-value numerator
    PER EVENT TYPE (user-parity split vs 48 md5-bit
    pseudo-permutations over each segment's own rows) — the sliced
    experimentation readout."""
    import pandas as pd

    from fastie_ray.ops.stats import grouped_permutation_test

    ev = _read(
        sf_dir, "events",
        columns=["event_id", "user_id", "value", "event_type"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "grp": df["user_id"].astype("int64") % 2,
                "value": df["value"],
                "segment": df["event_type"],
            }
        )

    return grouped_permutation_test(
        ev.map_batches(prep, batch_format="pandas"),
        "event_id", "grp", "value", "segment", n_perms=48,
    )


def _q_kfold_folds(sf_dir: str):
    """Leakage-safe k-fold CV assignment (``ops.splits.kfold_assign``):
    every document of a source lands in the same of 5 folds
    (fold = md5('fold:' || source)[:8] % 5) — exchange-free,
    resume-stable, SQL-auditable."""
    from fastie_ray.ops.splits import kfold_assign

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return kfold_assign(docs, "source", k=5).select_columns(
        ["doc_id", "source", "fold"]
    )


def _q_balanced_sample(sf_dir: str):
    """Class-balanced downsampling (``ops.sampling.
    class_balanced_sample``): at most 50 docs per language, selected
    by md5 rank — per-batch per-label combiner keeps the exchange at
    batches × labels × 50 rows, never a hot class in full."""
    from fastie_ray.ops.sampling import class_balanced_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return class_balanced_sample(
        docs, label_col="lang", id_col="doc_id", per_class=50
    )


def _q_skew_report(sf_dir: str):
    """Key-skew audit (``ops.stats.skew_report``) over lineitem's
    supplier key — top-1/top-16 shares and the Gini coefficient of
    per-key counts, integer-exact, from one count exchange + a
    domain-bounded driver sort."""
    from fastie_ray.ops.stats import skew_report

    li = _read(sf_dir, "lineitem", columns=["l_suppkey"])
    return skew_report(li, "l_suppkey", top_k=16)


def _q_rrf(sf_dir: str):
    """Reciprocal-rank fusion (``ops.retrieval.rrf_fuse``) of two
    deterministic ranked runs (planted hash orderings ranked with the
    no-sort-barrier ``grouped_rank``): floor-scaled per-term integer
    scores, one query-bucketed fuse exchange, per-query top-5."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.rank import grouped_rank
    from fastie_ray.ops.retrieval import rrf_fuse

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def run(mult: int, add: int, mod: int):
        def expand(df: pd.DataFrame) -> pd.DataFrame:
            did = df["doc_id"].astype("int64")
            frames = [
                pd.DataFrame(
                    {
                        "q": np.int64(q),
                        "doc_id": did,
                        "key": (did * mult + q * add) % mod,
                    }
                )
                for q in range(4)
            ]
            return pd.concat(frames, ignore_index=True)

        ranked = grouped_rank(
            docs.map_batches(expand, batch_format="pandas"),
            group_col="q", key_col="key", tie_col="doc_id",
            range_size=16, n_buckets=8,
        )
        return ranked.map_batches(
            lambda df: df.loc[df["rank"] <= 10,
                              ["q", "doc_id", "rank"]],
            batch_format="pandas",
        )

    return rrf_fuse(
        [run(31, 7, 101), run(17, 13, 89)],
        query_col="q", doc_col="doc_id", rank_col="rank",
        k_const=60, top_k=5,
    )


def _q_sorted_export(sf_dir: str):
    """TeraSort-shape sorted export (``ops.layout.sorted_range_export``)
    keyed on integer event-value cents: deterministic bottom-k-md5
    sample → range bounds → one part exchange with local sort; returns
    the range-pruning manifest (part, n_rows, min/max key)."""
    import pandas as pd

    from fastie_ray.ops.layout import sorted_range_export

    ev = _read(sf_dir, "events", columns=["event_id", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "cents": (df["value"] * 100).round().astype("int64"),
            }
        )

    return sorted_range_export(
        ev.map_batches(prep, batch_format="pandas"),
        key_col="cents", id_col="event_id", out_dir=None,
        n_parts=8, sample_k=256,
    )


def _q_clustering_coeff(sf_dir: str):
    """Per-node triangle counts + local clustering coefficient
    (``ops.graph.local_clustering``) over the subsampled supplier
    co-supply graph (same edge build as the triangles query)."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import local_clustering
    from fastie_ray.pipelines.kg import _bucketed_groupby

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def distinct_os(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["l_orderkey"] % 20 == 0].drop_duplicates()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_1", "_2"))
        m = m[m["l_suppkey_1"] < m["l_suppkey_2"]]
        out = pd.DataFrame({"a": m["l_suppkey_1"], "b": m["l_suppkey_2"]})
        return out.drop_duplicates()

    per_order = _bucketed_groupby(
        li.map_batches(distinct_os, batch_format="pandas"),
        "l_orderkey", pairs, 16,
    )
    edges = dedup_exact(per_order, ["a", "b"], n_buckets=16)
    return local_clustering(edges, n_buckets=16)


def _q_coverage_picks(sf_dir: str):
    """Greedy coverage maximization (``ops.selection.greedy_coverage``)
    over the rare-token-planted corpus: 5 rounds of anti-join marginal
    gains + bucketed argmax, deterministic (gain DESC, doc ASC)."""
    import pandas as pd

    from fastie_ray.ops.selection import greedy_coverage

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "text": df["text"]
                + " tk"
                + (df["doc_id"].astype("int64") % 211).astype(str),
            }
        )

    return greedy_coverage(
        ds.map_batches(plant, batch_format="pandas"), k=5, n_buckets=16
    )


def _coverage_sql(k: int = 5) -> str:
    """Unrolled greedy-coverage oracle (MATERIALIZED CTEs — same
    exponential-inlining hazard as the MIS oracle)."""
    ctes = [
        """planted AS MATERIALIZED (
            SELECT doc_id,
                   text || ' tk' || CAST(doc_id % 211 AS VARCHAR) AS text
            FROM documents)""",
        """toks AS MATERIALIZED (
            SELECT DISTINCT doc_id, tok FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS tok
                FROM planted))""",
    ]
    for t in range(1, k + 1):
        src = (
            "toks"
            if t == 1
            else f"(SELECT * FROM toks WHERE tok NOT IN "
                 f"(SELECT tok FROM c{t - 1}))"
        )
        ctes.append(
            f"""g{t} AS MATERIALIZED (
                SELECT doc_id, count(*) AS gain FROM {src} GROUP BY 1)"""
        )
        ctes.append(
            f"""p{t} AS MATERIALIZED (
                SELECT {t} AS round, doc_id, gain FROM g{t}
                ORDER BY gain DESC, doc_id LIMIT 1)"""
        )
        prev = f"SELECT tok FROM c{t - 1} UNION " if t > 1 else ""
        ctes.append(
            f"""c{t} AS MATERIALIZED (
                {prev}SELECT DISTINCT tok FROM toks
                WHERE doc_id IN (SELECT doc_id FROM p{t}))"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST(round AS BIGINT) AS round, "
        f"CAST(doc_id AS BIGINT) AS doc_id, "
        f"CAST(gain AS BIGINT) AS gain FROM p{t}"
        for t in range(1, k + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def _q_price_quantiles(sf_dir: str):
    """Exact quantiles over the UNBOUNDED price-cents domain
    (``ops.stats.open_quantiles``): two value-range refinement passes,
    each ≤ 4096 histogram rows — no sort, no domain-sized driver
    table (the exact_quantiles generalization)."""
    import pandas as pd

    from fastie_ray.ops.stats import open_quantiles

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"cents": (df["l_extendedprice"] * 100).round().astype("int64")}
        )

    return open_quantiles(
        li.map_batches(prep, batch_format="pandas"), "cents",
        [0.25, 0.5, 0.75, 0.95],
    )


def _q_weighted_median(sf_dir: str):
    """Exact WEIGHTED quantiles (price cents weighted by quantity) via
    ``ops.stats.open_quantiles(weight_col=...)`` — every histogram
    count becomes an integer weight sum, boundary ⌈q·W⌉; SQL has no
    weighted quantile aggregate, so the oracle is a cumulative-window
    reconstruction."""
    import pandas as pd

    from fastie_ray.ops.stats import open_quantiles

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cents": (df["l_extendedprice"] * 100).round().astype("int64"),
                "w": df["l_quantity"].round().astype("int64"),
            }
        )

    return open_quantiles(
        li.map_batches(prep, batch_format="pandas"), "cents",
        [0.5, 0.9], weight_col="w",
    )


def _q_skyline(sf_dir: str):
    """2-D Pareto skyline (``ops.stats.skyline_2d``): minimize price
    cents, maximize quantity — local skylines are a valid combiner
    (skyline of a union ⊆ union of skylines), driver filters the
    bounded candidate set once."""
    import pandas as pd

    from fastie_ray.ops.stats import skyline_2d

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice", "l_quantity"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cents": (df["l_extendedprice"] * 100).round().astype("int64"),
                "qty": df["l_quantity"].round().astype("int64"),
            }
        )

    return skyline_2d(
        li.map_batches(prep, batch_format="pandas"), "cents", "qty"
    )


def _q_kmv_overlap(sf_dir: str):
    """KMV / Theta-sketch set algebra (``ops.sketch.kmv_sketch`` +
    ``kmv_overlap_estimate``): click∩view audience estimate from two
    fixed-size bottom-k hash sketches — deterministic md5 state, so
    every number is SQL-exact (the sketch-family intersection
    companion to hll_overlap's union)."""
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.sketch import kmv_overlap_estimate, kmv_sketch

    def users(kind: str):
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"],
            filter=pc.field("event_type") == kind, override_num_blocks=16,
        )

    sa = kmv_sketch(users("click"), "user_id", k=64)
    sb = kmv_sketch(users("view"), "user_id", k=64)
    return kmv_overlap_estimate(sa, sb, k=64)


def _q_ks_drift(sf_dir: str):
    """Exact two-sample Kolmogorov-Smirnov drift statistic
    (``ops.stats.ks_stat``): click vs purchase value distributions,
    integer cross-multiplied CDFs (the nonparametric companion to
    psi_drift's binned test)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.stats import ks_stat

    def side(kind: str):
        ds = ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"],
            filter=pc.field("event_type") == kind, override_num_blocks=16,
        )
        return ds.map_batches(
            lambda df: pd.DataFrame(
                {"cents": (df["value"] * 100).round().astype("int64")}
            ),
            batch_format="pandas",
        )

    return ks_stat(side("click"), side("purchase"), "cents")


def _q_fd_check(sf_dir: str):
    """Functional-dependency audit (``ops.stats.fd_violations``):
    sources mapping to more than one language — distinct-pair
    combiner, one exchange, only violators leave it."""
    from fastie_ray.ops.stats import fd_violations

    docs = _read(sf_dir, "documents", columns=["source", "lang"])
    return fd_violations(docs, "source", "lang")


def _q_sssp(sf_dir: str):
    """Weighted SSSP (distributed Bellman-Ford, ``ops.graph.sssp``)
    over the undirected customer↔supplier graph (weight = 1 +
    (custkey+suppkey) % 7), seeded at nation-0 customers; node ids
    fold as cust·2 / supp·2+1. Exact (count, sum) fixed-point test."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import sssp
    from fastie_ray.ops.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"], right_cols=["o_orderkey", "o_custkey"],
    )

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        c = df["o_custkey"].astype("int64")
        s = df["l_suppkey"].astype("int64")
        w = 1 + (c + s) % 7
        fwd = pd.DataFrame({"src": c * 2, "dst": s * 2 + 1, "w": w})
        rev = pd.DataFrame({"src": s * 2 + 1, "dst": c * 2, "w": w})
        return pd.concat([fwd, rev], ignore_index=True).drop_duplicates()

    edges = dedup_exact(
        j.map_batches(mk, batch_format="pandas"), ["src", "dst", "w"],
        n_buckets=16,
    )
    seeds = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda df: pd.DataFrame(
            {"node": df.loc[df["c_nationkey"] == 0, "c_custkey"].astype("int64") * 2}
        ),
        batch_format="pandas",
    )
    return sssp(edges, seeds, weight_col="w", max_rounds=12, n_buckets=16)


def _sssp_sql(rounds: int = 12) -> str:
    """Unrolled Bellman-Ford oracle (MATERIALIZED rounds)."""
    ctes = [
        """je AS MATERIALIZED (
            SELECT DISTINCT o_custkey AS c, l_suppkey AS s
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
        """edges AS MATERIALIZED (
            SELECT c * 2 AS src, s * 2 + 1 AS dst, 1 + (c + s) % 7 AS w
            FROM je
            UNION ALL
            SELECT s * 2 + 1, c * 2, 1 + (c + s) % 7 FROM je)""",
        """d0 AS MATERIALIZED (
            SELECT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS dist
            FROM customer WHERE c_nationkey = 0)""",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"""c{t} AS MATERIALIZED (
                SELECT e.dst AS node, min(d.dist + e.w) AS dist
                FROM edges e JOIN d{t - 1} d ON e.src = d.node
                GROUP BY 1)"""
        )
        ctes.append(
            f"""d{t} AS MATERIALIZED (
                SELECT node, min(dist) AS dist FROM (
                    SELECT node, dist FROM d{t - 1}
                    UNION ALL SELECT node, dist FROM c{t})
                GROUP BY 1)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, CAST(dist AS BIGINT) AS dist FROM d{rounds}"
    )


def _q_spatial_pairs(sf_dir: str):
    """Spatial L∞ distance self-join (``ops.spatial.
    grid_distance_self_join``): planted integer points from event ids,
    radius-sized grid cells, 3×3 replication with single emission in
    the right point's cell — one exchange, no dedup."""
    import pandas as pd

    from fastie_ray.ops.spatial import grid_distance_self_join

    ev = _read(sf_dir, "events", columns=["event_id"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        i = df["event_id"].astype("int64")

        def h(prefix: str) -> "pd.Series":
            return i.map(
                lambda v: int(
                    hashlib.md5(f"{prefix}:{v}".encode()).hexdigest()[:8], 16
                )
                % 10000
            )

        # md5-grid coordinates: a multiplicative plant is a structured
        # permutation with ZERO close pairs in both dims at once
        return pd.DataFrame({"id": i, "x": h("sx"), "y": h("sy")})

    return grid_distance_self_join(
        ev.map_batches(plant, batch_format="pandas"),
        radius=16, n_buckets=16,
    )


def _q_join_cardinality(sf_dir: str):
    """Planner-grade exact join cardinality WITHOUT running the join
    (``ops.join.join_size_estimate``): Σ per-key count products for
    lineitem⋈orders plus side totals and the max single-key product
    (the salting-decision number)."""
    from fastie_ray.ops.join import join_size_estimate

    li = _read(sf_dir, "lineitem", columns=["l_orderkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey"])
    return join_size_estimate(li, orders, on="l_orderkey",
                              right_on="o_orderkey")


def _q_ldiv_audit(sf_dir: str):
    """l-diversity audit (``ops.privacy.l_diversity_audit``):
    equivalence classes on (nation, custkey%10) whose market-segment
    diversity is < 4 — the homogeneity-attack complement of
    kanon_audit."""
    import pandas as pd

    from fastie_ray.ops.privacy import l_diversity_audit

    cust = _read(
        sf_dir, "customer",
        columns=["c_nationkey", "c_custkey", "c_mktsegment"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_nationkey": df["c_nationkey"],
                "kb": df["c_custkey"].astype("int64") % 10,
                "c_mktsegment": df["c_mktsegment"],
            }
        )

    return l_diversity_audit(
        cust.map_batches(prep, batch_format="pandas"),
        ["c_nationkey", "kb"], "c_mktsegment", l=4, n_buckets=8,
    )


def _q_prop_sample(sf_dir: str):
    """Exact proportional stratified sampling with largest-remainder
    apportionment (``ops.sampling.proportional_sample``): a 100-doc
    budget split across languages by Hamilton's method, each stratum
    drawn with the deterministic bottom-k md5 sketch."""
    from fastie_ray.ops.sampling import proportional_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    return proportional_sample(
        docs, total_k=100, group_col="lang", id_col="doc_id"
    )


def _q_abandoned_clicks(sf_dir: str):
    """Temporal ANTI-join (cart abandonment): clicks with NO purchase
    by the same user within 30 min — the band join's pair ids feed a
    task anti-join, so the negative predicate never materializes the
    cross product (``band_join`` + ``hash_join(how="anti")``)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.interval import band_join
    from fastie_ray.ops.join import hash_join

    def ev(kind: str):
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
            filter=pc.field("event_type") == kind,
            override_num_blocks=16,
        )

    clicks = ev("click")
    pairs = band_join(
        clicks, ev("purchase"), key_col="user_id", ts_col="ts",
        band="30min", direction="forward", id_col="event_id", n_buckets=16,
    )
    converted = pairs.map_batches(
        lambda df: pd.DataFrame({"cid": df["id_left"]}).drop_duplicates(),
        batch_format="pandas",
    )
    out = hash_join(
        clicks, converted, on="event_id", right_on="cid", how="anti",
        left_cols=["event_id", "user_id"], n_buckets=16,
    )
    return out.map_batches(
        lambda df: df[["event_id", "user_id"]].astype("int64"),
        batch_format="pandas",
    )


def _q_term_drift(sf_dir: str):
    """Corpus keyness drift (``ops.text_analysis.term_drift``): the 30
    terms most over-represented in each half (doc_id parity split,
    rare-token plant), integer cross-product scores — no float rates."""
    import pandas as pd

    from fastie_ray.ops.text_analysis import term_drift

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        return pd.DataFrame(
            {
                "m": did % 2,
                "text": df["text"] + " tk" + (did % 211).astype(str),
            }
        )

    return term_drift(
        ds.map_batches(plant, batch_format="pandas"), "m", k=30
    )


def _q_markov_eval(sf_dir: str):
    """Temporal backtest of the first-order Markov next-event model
    (``ops.sequence.markov_next_eval``): train on pairs before
    2024-01-20, score per-prev argmax accuracy on the rest."""
    from fastie_ray.ops.sequence import markov_next_eval

    ev = _read(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    )
    return markov_next_eval(ev, cut_ts="2024-01-20")


def _q_conformal(sf_dir: str):
    """Split-conformal calibration: the 90th-percentile nonconformity
    threshold from the calibration split (doc_id%3==0, exact
    ``open_quantiles``), then the coverage it actually achieves on the
    rest — the distribution-free prediction-set recipe, all integer."""
    import pandas as pd

    from fastie_ray.ops.stats import open_quantiles

    ds = _planted_scores(sf_dir)

    calib = ds.map_batches(
        lambda df: df.loc[df["doc_id"] % 3 == 0, ["score"]],
        batch_format="pandas",
    )
    tau = int(
        open_quantiles(calib, "score", [0.9])["value"].iloc[0]
    )

    def cover(df: pd.DataFrame) -> pd.DataFrame:
        t = df[df["doc_id"] % 3 != 0]
        return pd.DataFrame(
            {
                "n_eval": [len(t)],
                "n_covered": [int((t["score"] <= tau).sum())],
            }
        )

    agg = ds.map_batches(cover, batch_format="pandas").to_pandas().sum()
    return pd.DataFrame(
        {
            "tau": pd.array([tau], dtype="int64"),
            "n_eval": pd.array([int(agg["n_eval"])], dtype="int64"),
            "n_covered": pd.array([int(agg["n_covered"])], dtype="int64"),
        }
    )


def _q_bootstrap_ci(sf_dir: str):
    """Poisson-bootstrap CI for the mean order price (``ops.stats.
    poisson_bootstrap_mean``): md5-deterministic Poisson(1) weights
    per (replicate, row) — the streaming bootstrap that needs no
    global resample draw; integer (Σw·cents, Σw) pairs end to end,
    CI = 2nd-smallest / 2nd-largest of 16 replicate means."""
    from fastie_ray.ops.stats import poisson_bootstrap_mean

    o = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return poisson_bootstrap_mean(o, "o_orderkey", "o_totalprice",
                                  n_boot=16)


def _q_perm_test(sf_dir: str):
    """Exact-arithmetic permutation significance test
    (``ops.stats.permutation_test``): user-parity split of event
    values vs 48 md5-bit pseudo-permutations, cross-multiplied
    integer statistics — the experimentation-platform test, fully
    SQL-reproducible."""
    import pandas as pd

    from fastie_ray.ops.stats import permutation_test

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "grp": df["user_id"].astype("int64") % 2,
                "value": df["value"],
            }
        )

    return permutation_test(
        ev.map_batches(prep, batch_format="pandas"),
        id_col="event_id", group_col="grp", value_col="value",
        n_perms=48,
    )


def _q_matching(sf_dir: str):
    """Deterministic greedy maximal matching (``ops.graph.
    greedy_matching``) over the customer↔supplier graph — the parallel
    one-to-one pairing primitive; md5 edge priorities, local-min-at-
    both-endpoints rounds."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import greedy_matching
    from fastie_ray.ops.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"], right_cols=["o_orderkey", "o_custkey"],
    )

    def mk(df: pd.DataFrame) -> pd.DataFrame:
        c = df["o_custkey"].astype("int64") * 2
        s = df["l_suppkey"].astype("int64") * 2 + 1
        return pd.DataFrame(
            {"a": np.minimum(c, s), "b": np.maximum(c, s)}
        ).drop_duplicates()

    edges = dedup_exact(
        j.map_batches(mk, batch_format="pandas"), ["a", "b"], n_buckets=16
    )
    return greedy_matching(edges, max_rounds=12, n_buckets=16)


def _matching_sql(rounds: int = 12, weighted: bool = False) -> str:
    """Unrolled greedy-matching oracle (MATERIALIZED rounds). With
    ``weighted`` the edge priority is (2²²−1−Σquantity)·2⁴⁰ + md5_40
    — the locally-dominant weighted matching."""
    if weighted:
        src = [
            """je AS MATERIALIZED (
                SELECT o_custkey AS c, l_suppkey AS s,
                       CAST(round(sum(l_quantity)) AS BIGINT) AS w
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                GROUP BY 1, 2)""",
            """e0 AS MATERIALIZED (
                SELECT least(c * 2, s * 2 + 1) AS a,
                       greatest(c * 2, s * 2 + 1) AS b,
                       (4194303 - w) * 1099511627776
                       + CAST(('0x' || substr(md5('gm:'
                           || CAST(least(c * 2, s * 2 + 1) AS VARCHAR)
                           || ':'
                           || CAST(greatest(c * 2, s * 2 + 1) AS VARCHAR)),
                           1, 10)) AS BIGINT) AS p
                FROM je)""",
        ]
    else:
        src = [
            """je AS MATERIALIZED (
                SELECT DISTINCT o_custkey AS c, l_suppkey AS s
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
            """e0 AS MATERIALIZED (
                SELECT least(c * 2, s * 2 + 1) AS a,
                       greatest(c * 2, s * 2 + 1) AS b,
                       CAST(('0x' || substr(md5('gm:'
                           || CAST(least(c * 2, s * 2 + 1) AS VARCHAR)
                           || ':'
                           || CAST(greatest(c * 2, s * 2 + 1) AS VARCHAR)),
                           1, 15)) AS BIGINT) AS p
                FROM je)""",
        ]
    ctes = src + [
        "m0 AS MATERIALIZED (SELECT a, b, 0 AS rnd FROM e0 WHERE 1 = 0)",
    ]
    for t in range(1, rounds + 1):
        ctes.append(
            f"""nm{t} AS MATERIALIZED (
                SELECT node, min(p) AS m FROM (
                    SELECT a AS node, p FROM e{t - 1}
                    UNION ALL SELECT b, p FROM e{t - 1})
                GROUP BY 1)"""
        )
        ctes.append(
            f"""w{t} AS MATERIALIZED (
                SELECT e.a, e.b FROM e{t - 1} e
                JOIN nm{t} x ON x.node = e.a AND x.m = e.p
                JOIN nm{t} y ON y.node = e.b AND y.m = e.p)"""
        )
        ctes.append(
            f"""mn{t} AS MATERIALIZED (
                SELECT a AS node FROM w{t}
                UNION SELECT b FROM w{t})"""
        )
        ctes.append(
            f"""e{t} AS MATERIALIZED (
                SELECT a, b, p FROM e{t - 1}
                WHERE a NOT IN (SELECT node FROM mn{t})
                  AND b NOT IN (SELECT node FROM mn{t}))"""
        )
        ctes.append(
            f"""m{t} AS MATERIALIZED (
                SELECT a, b, rnd FROM m{t - 1}
                UNION ALL SELECT a, b, {t} AS rnd FROM w{t})"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT a, b, CAST(rnd AS BIGINT) AS round FROM m{rounds}"""
    )


def _q_weighted_matching(sf_dir: str):
    """Locally-dominant WEIGHTED matching (Preis ½-approx of
    max-weight matching, ``greedy_matching(weight_col=...)``): the
    customer↔supplier graph weighted by total lineitem quantity —
    heaviest-at-both-endpoints rounds, md5 tie-break in the low
    bits."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.graph import greedy_matching
    from fastie_ray.ops.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_quantity"]
    )
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey", "l_quantity"],
        right_cols=["o_orderkey", "o_custkey"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["o_custkey"].astype("int64") * 2
        s = df["l_suppkey"].astype("int64") * 2 + 1
        out = pd.DataFrame(
            {
                "a": np.minimum(c, s),
                "b": np.maximum(c, s),
                "w": df["l_quantity"].round().astype("int64"),
            }
        )
        return out.groupby(["a", "b"], as_index=False)["w"].sum()

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = pd.Series([], dtype="int64")
            return df
        h = (
            pd.util.hash_pandas_object(df["a"], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(df["b"], index=False).to_numpy()
        )
        df["__b"] = (h % np.uint64(16)).astype("int64")
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(["a", "b"], as_index=False)[
            "w"
        ].sum()
        out["w"] = out["w"].astype("int64")
        return out

    edges = (
        j.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
    return greedy_matching(
        edges, max_rounds=12, n_buckets=16, weight_col="w"
    )


def _q_grouped_ks(sf_dir: str):
    """Per-event-type KS drift between the first and second half of
    the event stream (``ops.stats.grouped_ks``): distributed per-group
    integer CDF cross-products, no driver value table."""
    import pandas as pd

    from fastie_ray.ops.stats import grouped_ks

    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    cut = pd.Timestamp("2024-01-16").value // 1000

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        t = (
            pd.to_datetime(df["ts"]).astype("datetime64[us]")
            .astype("int64")
        )
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "m": (t >= cut).astype("int64"),
                "cents": (df["value"] * 100).round().astype("int64"),
            }
        )

    return grouped_ks(
        ev.map_batches(prep, batch_format="pandas"),
        "event_type", "m", "cents",
    )


def _q_rank_sum_drift(sf_dir: str):
    """Per-event-type Mann-Whitney rank-sum drift between the first
    and second half of the event stream
    (``ops.stats.grouped_rank_sum``): doubled tie-averaged ranks keep
    the U statistic integral; auc_e6 is the probability-of-superiority
    reading. Same distinct-value count-combiner shape as grouped_ks."""
    import pandas as pd

    from fastie_ray.ops.stats import grouped_rank_sum

    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    cut = pd.Timestamp("2024-01-16").value // 1000

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        t = (
            pd.to_datetime(df["ts"]).astype("datetime64[us]")
            .astype("int64")
        )
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "m": (t >= cut).astype("int64"),
                "cents": (df["value"] * 100).round().astype("int64"),
            }
        )

    return grouped_rank_sum(
        ev.map_batches(prep, batch_format="pandas"),
        "event_type", "m", "cents",
    )


def _q_target_encode(sf_dir: str):
    """Leakage-safe K-fold target encoding of event_type against the
    cents label (``ops.encoding.target_encode_oof``): the encoding
    table (category, fold, n_oof, te_scaled) where each fold's value
    is the mean over every OTHER fold — what a training pipeline joins
    back to rows by (category, fold) without target leakage. One
    category-keyed exchange over per-batch (cat, fold, n, sum)
    combiners."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.encoding import target_encode_oof

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "fold": (df["event_id"] % 5).astype("int64"),
                "cents": np.floor(df["value"] * 100 + 0.5).astype("int64"),
            }
        )

    return target_encode_oof(
        ev.map_batches(prep, batch_format="pandas"),
        "event_type", "fold", "cents",
    )


def _q_hashed_features(sf_dir: str):
    """Feature hashing over the documents table
    (``ops.encoding.hashed_features``): per doc, token counts folded
    into 64 md5 buckets — the vocabulary-free encoder (no vocab build
    pass, no broadcast, output width fixed at any corpus size). Pure
    map stage."""
    from fastie_ray.ops.encoding import hashed_features

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return hashed_features(ds, "doc_id", "text", n_buckets=64)


def _q_script_mix(sf_dir: str):
    """Per-document script census + code-mixing flag
    (``ops.text_analysis.script_mix``): Latin/CJK/digit char counts,
    the router signal for mixed-script web pages. Zero-exchange
    vectorized scan."""
    from fastie_ray.ops.text_analysis import script_mix

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return script_mix(ds)


def _order_tri_edges(sf_dir: str):
    """Chain+skip order graph: per customer, consecutive orders chained
    (rn → rn+1) AND second-neighbor skips (rn → rn+2), so every interior
    triple forms a triangle — the deterministic triangle-bearing source
    for ktruss. Endpoints canonicalized in STRING order (matches the
    op's internal keys and SQL least/greatest)."""
    import numpy as np
    import pandas as pd

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = (df["o_custkey"].to_numpy() % 16).astype("int64")
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderkey"]).reset_index(drop=True)
        ok = ("o" + g["o_orderkey"].astype(str)).to_numpy()
        ck = g["o_custkey"].to_numpy()
        frames = []
        for d in (1, 2):
            same = ck[:-d] == ck[d:]
            x = ok[:-d][same]
            y = ok[d:][same]
            frames.append(
                pd.DataFrame(
                    {"a": np.minimum(x, y), "b": np.maximum(x, y)}
                )
            )
        return pd.concat(frames, ignore_index=True)

    return (
        orders.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
    )


def _q_ktruss(sf_dir: str):
    """Bounded-round k-truss peeling (k=3, 2 synchronized rounds) over
    the chain+skip order graph (``ops.graph.ktruss_peel``): per round
    one edge-support computation (SV-oriented wedges → per-edge
    triangle counts) + a streaming filter; survivors carry their final
    exact support. Triangle-free components (2-order customers) peel
    in round 1; oracle is the unrolled per-round support/filter CTE
    chain."""
    from fastie_ray.ops.graph import ktruss_peel

    return ktruss_peel(_order_tri_edges(sf_dir), k=3, rounds=2, n_buckets=16)


def _ktruss_sql(k: int = 3, rounds: int = 2) -> str:
    """Unrolled k-truss oracle (adjacency + common-neighbor support +
    filter CTE triple per round, final support recount) over the
    chain+skip order graph — mirrors ``_q_ktruss`` exactly."""
    ctes = [
        """o AS (SELECT o_custkey AS c, o_orderkey AS ok,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
            FROM orders)""",
        """ch AS (SELECT 'o' || a.ok AS x, 'o' || b.ok AS y
            FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 1)""",
        """sk AS (SELECT 'o' || a.ok AS x, 'o' || b.ok AS y
            FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 2)""",
        """e0 AS MATERIALIZED (
            SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
            FROM (SELECT * FROM ch UNION ALL SELECT * FROM sk))""",
    ]
    for r in range(rounds + 1):
        ctes.append(
            f"""adj{r} AS MATERIALIZED (
                SELECT a AS x, b AS y FROM e{r}
                UNION ALL SELECT b, a FROM e{r})"""
        )
        ctes.append(
            f"""sup{r} AS MATERIALIZED (
                SELECT e.a, e.b, count(q.y) AS sup
                FROM e{r} e
                LEFT JOIN adj{r} p ON p.x = e.a
                LEFT JOIN adj{r} q ON q.x = e.b AND q.y = p.y
                GROUP BY e.a, e.b)"""
        )
        if r < rounds:
            ctes.append(
                f"""e{r + 1} AS MATERIALIZED (
                    SELECT a, b FROM sup{r} WHERE sup >= {k - 2})"""
            )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT a, b, CAST(sup AS BIGINT) AS support FROM sup{rounds}"""
    )


def _q_link_pred(sf_dir: str):
    """Top-50 missing links by common-neighbor count over the
    chain+skip order graph (``ops.graph.link_prediction``): wedge
    enumeration grouped by center with per-task pre-aggregation, one
    pair-bucketed count exchange, task anti-join against known edges,
    per-bucket top-k; deterministic (cn DESC, u, v) total order."""
    from fastie_ray.ops.graph import link_prediction

    return link_prediction(_order_tri_edges(sf_dir), k=50, n_buckets=16)


def _q_anf_reach(sf_dir: str):
    """HyperANF neighborhood-function sketch (``ops.graph.anf_reach``):
    per-node 64-register HLL state over the ≤3-hop out-reachable set
    of the order-chain graph, propagated by register-max message
    passing over pinned reversed edges. Driver-compared output is the
    integer state summary (regs_nonzero, rho_sum); the oracle replays
    bounded recursive reach + GROUP BY register MAX."""
    import pandas as pd

    from fastie_ray.ops.graph import anf_reach

    o = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])

    def chain(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderkey"])
        nxt = df.groupby("o_custkey")["o_orderkey"].shift(-1)
        ok = nxt.notna()
        return pd.DataFrame(
            {
                "src": "o" + df.loc[ok, "o_orderkey"].astype(str),
                "dst": "o" + nxt[ok].astype("int64").astype(str),
            }
        )

    # per-customer chains co-locate in one batch for the shift: tiny
    # table, one block
    edges = o.repartition(1).map_batches(chain, batch_format="pandas")
    return anf_reach(edges, max_hops=3, n_registers=64, n_buckets=16)


def _q_ra_links(sf_dir: str):
    """Resource-allocation link prediction (``ops.graph.
    link_prediction(weight="ra")``): top-50 missing links over the
    chain+skip order graph scored Σ_{z∈CN(u,v)} 1/deg(z), carried
    integer-exact as floor(1e6/deg) — the rational member of the
    common-neighbor family (Adamic-Adar's 1/log deg would not
    hash-match a SQL oracle). Same wedge pipeline as ``link_pred``
    with a per-center weight."""
    from fastie_ray.ops.graph import link_prediction

    return link_prediction(
        _order_tri_edges(sf_dir), k=50, n_buckets=16, weight="ra"
    )


def _q_tc_ancestors(sf_dir: str):
    """KG hierarchy closure (``ops.graph.transitive_closure``): all
    (node, ancestor) pairs of the planted part taxonomy
    (parent(p) = p // 2, a binary tree — depth ~log₂ |part|), closed
    by pointer-doubling composition in ⌈log₂ depth⌉ rounds of two
    exchanges each. Oracle: recursive CTE ancestor chain."""
    import pandas as pd

    from fastie_ray.ops.graph import transitive_closure

    part = _read(sf_dir, "part", columns=["p_partkey"])

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        p = df["p_partkey"].astype("int64")
        p = p[p >= 2]
        return pd.DataFrame({"node": p, "parent": p // 2})

    return transitive_closure(
        part.map_batches(edges, batch_format="pandas"),
        src_col="node", dst_col="parent", max_rounds=8, n_buckets=16,
    )


def _q_ed1_pairs(sf_dir: str):
    """FastSS deletion-neighborhood fuzzy join (``ops.blocking.
    ed1_pairs``): all customer-name pairs at Levenshtein distance
    exactly 1, complete WITHOUT an all-pairs scan — variant-bucketed
    exchange, canonical-variant single emission, in-group exact
    verification."""
    from fastie_ray.ops.blocking import ed1_pairs

    cust = _read(sf_dir, "customer", columns=["c_name"])
    return ed1_pairs(cust, "c_name", n_buckets=16)


def _q_containment(sf_dir: str):
    """Directional set-containment join (``ops.neardup.
    containment_pairs``): quote / subset-document detection. Token
    structure is PLANTED from doc_id (NOTES fact: the synth text
    vocabulary is 31 tokens — degenerate for set-similarity): docs in
    groups of 8 carry nested token prefixes {g<gid>_0 .. g<gid>_(n-1)},
    n = doc_id % 6 + 2, so containment(a→b) = 1 iff n_a ≤ n_b within a
    group. Threshold 0.99 keeps exactly the full containments."""
    import pandas as pd

    from fastie_ray.ops.neardup import containment_pairs

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        rows_id, rows_t = [], []
        for d in df["doc_id"].astype(int):
            gid = d // 8
            for k in range(d % 6 + 2):
                rows_id.append(d)
                rows_t.append(f"g{gid}_{k}")
        return pd.DataFrame({"id": pd.Series(rows_id, dtype="int64"),
                             "token": rows_t})

    return containment_pairs(
        docs.map_batches(toks, batch_format="pandas"),
        threshold=0.99, assume_distinct=True, n_buckets=16,
    )


def _q_temporal_reach(sf_dir: str):
    """Time-respecting reachability (``ops.graph.temporal_reach``):
    earliest arrival from seed users {0..4} over the event HANDOFF
    graph (user of event i → user of event i+1, usable at event i+1's
    timestamp — dense event ids make edge building an equi-join, no
    sort). Paths must have nondecreasing timestamps; 4 bounded rounds,
    monotone-sum fixpoint short-circuit."""
    import pandas as pd

    from fastie_ray.ops.graph import temporal_reach
    from fastie_ray.ops.join import hash_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def lhs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df["event_id"].astype("int64") + 1,
                "src": df["user_id"].astype("int64"),
            }
        )

    def rhs(df: pd.DataFrame) -> pd.DataFrame:
        t = (
            pd.to_datetime(df["ts"]).astype("datetime64[us]")
            .astype("int64")
        )
        return pd.DataFrame(
            {
                "k": df["event_id"].astype("int64"),
                "dst": df["user_id"].astype("int64"),
                "ts_us": t,
            }
        )

    edges = hash_join(
        ev.map_batches(lhs, batch_format="pandas"),
        ev.map_batches(rhs, batch_format="pandas"),
        on="k", left_cols=["k", "src"], right_cols=["k", "dst", "ts_us"],
        n_buckets=16,
    ).map_batches(
        lambda df: df.loc[df["src"] != df["dst"], ["src", "dst", "ts_us"]],
        batch_format="pandas",
    )
    seeds = pd.DataFrame({"node": range(5), "arrival_us": [0] * 5})
    return temporal_reach(edges, seeds, rounds=4, n_buckets=16)


def _temporal_reach_sql(rounds: int = 4) -> str:
    """Unrolled earliest-arrival oracle (one expand/min-merge CTE pair
    per round) over the event handoff graph — mirrors
    ``_q_temporal_reach`` exactly."""
    ctes = [
        """ev AS (SELECT CAST(event_id AS BIGINT) AS eid,
                 CAST(user_id AS BIGINT) AS u, epoch_us(ts) AS t
          FROM events)""",
        """e AS MATERIALIZED (
            SELECT a.u AS src, b.u AS dst, b.t AS ts
            FROM ev a JOIN ev b ON b.eid = a.eid + 1 AND a.u <> b.u)""",
        """l0 AS MATERIALIZED (
            SELECT CAST(k AS BIGINT) AS node, CAST(0 AS BIGINT) AS a
            FROM range(0, 5) r(k))""",
    ]
    for r in range(rounds):
        ctes.append(
            f"""c{r} AS MATERIALIZED (
                SELECT e.dst AS node, min(e.ts) AS a
                FROM l{r} l JOIN e ON e.src = l.node AND e.ts >= l.a
                GROUP BY 1)"""
        )
        ctes.append(
            f"""l{r + 1} AS MATERIALIZED (
                SELECT node, min(a) AS a
                FROM (SELECT * FROM l{r} UNION ALL SELECT * FROM c{r})
                GROUP BY 1)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT node, CAST(a AS BIGINT) AS arrival_us FROM l{rounds}"""
    )


def _q_grouped_auc(sf_dir: str):
    """Per-segment exact ROC-AUC (``ops.metrics.grouped_auc_exact``,
    the fairness-slice audit): three planted segments with different
    positive score shifts (+100/+250/+400), so per-segment AUCs
    differ; zero driver steps — per-group midrank scans run inside the
    group-bucketed final task."""
    import pandas as pd

    from fastie_ray.ops.metrics import grouped_auc_exact

    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        did = df["doc_id"].astype("int64")
        label = (did % 5 < 2).astype("int64")
        seg = did % 3
        return pd.DataFrame(
            {
                "seg": "seg" + seg.astype(str),
                "score": (did * 37) % 1000 + (100 + 150 * seg) * label,
                "label": label,
            }
        )

    return grouped_auc_exact(
        ds.map_batches(plant, batch_format="pandas"), "seg", "score", "label"
    )


def _q_interval_union(sf_dir: str):
    """Per-user interval union (``ops.interval.interval_coalesce``,
    the uptime/covered-time op): events become [ts, ts + 1..90 min)
    activity spans; two-phase chunk-clipped coalesce (1-day chunks),
    only boundary spans cross the second exchange."""
    import pandas as pd

    from fastie_ray.ops.interval import interval_coalesce

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        t = (
            pd.to_datetime(df["ts"]).astype("datetime64[us]")
            .astype("int64")
        )
        dur = (1 + df["event_id"].astype("int64") % 90) * 60_000_000
        return pd.DataFrame(
            {
                "k": df["user_id"].astype("int64"),
                "s_us": t,
                "e_us": t + dur,
            }
        )

    return interval_coalesce(
        ev.map_batches(prep, batch_format="pandas"),
        chunk=86_400_000_000, n_buckets=16,
    )


def _q_trending(sf_dir: str):
    """Trending leaderboard: top-3 users PER EVENT TYPE by time-decayed
    activity (grouped decayed counters — ``ops.stats.decayed_counts``
    with a composite key composed with ``sampling.grouped_topk``):
    integer power-of-two decay + combiner-first per-group top-k."""
    from fastie_ray.ops.sampling import grouped_topk
    from fastie_ray.ops.stats import decayed_counts

    ev = _read(sf_dir, "events", columns=["event_type", "user_id", "ts"])
    dec = decayed_counts(
        ev, ["event_type", "user_id"], "ts", ref_ts="2024-01-31",
        unit="1d", scale_bits=40, clamp=40,
    )
    return grouped_topk(
        dec, k=3, group_col="event_type", value_col="decayed",
        id_col="user_id",
    )


def _q_top_paths(sf_dir: str):
    """Length-3 user-journey counts (``ops.sequence.
    path_counts_scalable``): two-phase n-gram mining — in-chunk
    trigrams local, only each (user, day)'s first/last 2 events cross
    the second exchange with global-consecutiveness rank checks; hot
    users never co-locate whole."""
    from fastie_ray.ops.sequence import path_counts_scalable

    ev = _read(
        sf_dir, "events", columns=["event_id", "user_id", "event_type", "ts"]
    )
    return path_counts_scalable(ev, n=3, bucket="1d", n_buckets=16)


def _q_hopping_uniques(sf_dir: str):
    """Active users per sliding hour per event type (``ops.windows.
    hopping_window_distinct``): exact windowed COUNT DISTINCT whose
    member-hashed first exchange keeps a hot window's members spread
    across buckets (disjoint partial counts add)."""
    from fastie_ray.ops.windows import hopping_window_distinct

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "user_id"])
    return hopping_window_distinct(ds, size="1h", hop="30min")


def _q_cuped(sf_dir: str):
    """CUPED variance-reduced A/B readout (``ops.linear_train.
    cuped_adjust``): per-user pre-period (X) / experiment-period (Y)
    cents rolled up in one user-bucketed exchange, arm = user_id % 2,
    pooled θ from exact integer sufficient stats."""
    import pandas as pd

    from fastie_ray.ops.linear_train import cuped_adjust

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])
    cut = pd.Timestamp("2024-01-16")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(df["ts"])
        cents = (df["value"] * 100).round().astype("int64")
        g = pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "x": cents.where(t < cut, 0),
                "y": cents.where(t >= cut, 0),
            }
        )
        return g.groupby("user_id", as_index=False)[["x", "y"]].sum()

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = pd.Series([], dtype="int64")
            return df
        df["__b"] = (df["user_id"].to_numpy() % 16).astype("int64")
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("user_id", as_index=False)[
            ["x", "y"]
        ].sum()
        out["arm"] = (out["user_id"] % 2).astype("int64")
        return out[["arm", "x", "y"]]

    units = (
        ev.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
    return cuped_adjust(units, "arm", "x", "y")


def _q_landmarks(sf_dir: str):
    """Landmark distance sketch (``ops.graph.landmark_distances``):
    min-hop ≤ 3 from the first order of customers 2/4/6/8 over the
    undirected chain/cycle order graph — all landmarks in ONE BFS over
    (node, landmark) labels."""
    import duckdb

    from fastie_ray.ops.graph import landmark_distances

    # landmarks are tiny and deterministic: first order of 4 fixed
    # customers (driver-side lookup of 4 scalars, not a data motion)
    lms = [
        "o" + str(r[0])
        for r in duckdb.sql(
            f"""SELECT min(o_orderkey) FROM '{sf_dir}/orders.parquet'
                WHERE o_custkey IN (2, 4, 6, 8) GROUP BY o_custkey
                ORDER BY o_custkey"""
        ).fetchall()
    ]
    return landmark_distances(
        _order_chain_edges(sf_dir), lms, k=3, n_buckets=16
    )


def _landmarks_sql(k: int = 3) -> str:
    """Unrolled multi-landmark BFS oracle (one expand/min-merge CTE per
    hop over (node, lm) labels) — mirrors ``_q_landmarks``."""
    ctes = [
        """o AS (SELECT o_custkey AS c, o_orderkey AS ok,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
            count(*) OVER (PARTITION BY o_custkey) AS n FROM orders)""",
        """chain AS (SELECT 'o' || a.ok AS a, 'o' || b.ok AS b
            FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 1)""",
        """cyc AS (SELECT 'o' || l.ok AS a, 'o' || f.ok AS b
            FROM o l JOIN o f ON l.c = f.c AND l.rn = l.n AND f.rn = 1
            AND l.n >= 2 AND l.c % 2 = 0)""",
        "j AS (SELECT a, b FROM chain UNION SELECT a, b FROM cyc)",
        """adj AS MATERIALIZED (
            SELECT a AS src, b AS dst FROM j
            UNION SELECT b, a FROM j)""",
        """lmk AS (SELECT 'o' || min(ok) AS node FROM o
            WHERE c IN (2, 4, 6, 8) GROUP BY c)""",
        """v0 AS MATERIALIZED (
            SELECT node, node AS lm, CAST(0 AS BIGINT) AS hop FROM lmk)""",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"""v{i} AS MATERIALIZED (
                SELECT node, lm, hop FROM v{i - 1}
                UNION ALL
                SELECT c.node, c.lm, CAST({i} AS BIGINT)
                FROM (SELECT DISTINCT e.dst AS node, f.lm
                      FROM v{i - 1} f JOIN adj e ON e.src = f.node
                      WHERE f.hop = {i - 1}) c
                WHERE NOT EXISTS (
                    SELECT 1 FROM v{i - 1} p
                    WHERE p.node = c.node AND p.lm = c.lm))"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
        SELECT node, lm AS landmark, hop FROM v{k}"""
    )


def _q_trailing_spend(sf_dir: str):
    """Per-user 7-day trailing spend per observed day (``ops.rolling.
    trailing_window_sums``, the RANGE-frame feature next to
    rolling_avg's ROWS frame): daily combiner → one key exchange →
    encoded-position searchsorted windows, no per-key loop."""
    import pandas as pd

    from fastie_ray.ops.rolling import trailing_window_sums

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].astype("int64"),
                "ts": df["ts"],
                "cents": (df["value"] * 100).round().astype("int64"),
            }
        )

    return trailing_window_sums(
        ev.map_batches(prep, batch_format="pandas"),
        "user_id", "ts", "cents", window_days=7,
    )


def _q_theil_sen(sf_dir: str):
    """Per-event-type Theil-Sen robust trend (``ops.linear_train.
    theil_sen_slope``): median pairwise slope over daily cents totals —
    the outlier-immune companion to trend_by_type's OLS; daily
    combiner bounds per-group pair volume by the calendar."""
    import pandas as pd

    from fastie_ray.ops.linear_train import theil_sen_slope

    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def daily(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(df["ts"]).to_numpy().astype("datetime64[D]")
        return pd.DataFrame(
            {
                "g": df["event_type"],
                "x": t.astype("int64"),
                "y": (df["value"] * 100).round().astype("int64"),
            }
        )

    return theil_sen_slope(
        ev.map_batches(daily, batch_format="pandas"), "g", "x", "y"
    )


def _q_new_vs_returning(sf_dir: str):
    """Growth-analytics daily split: active users per day partitioned
    into NEW (first-ever day) vs RETURNING. Shape: distinct (user, day)
    combiner → one user-bucketed exchange computing each user's first
    day AND emitting its (day, is_new) rows in place (no join back) →
    tiny day-bucketed count final."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["user_id", "ts"])

    def days(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(df["ts"]).to_numpy().astype("datetime64[D]")
        out = pd.DataFrame(
            {"u": df["user_id"].astype("int64"), "day": t.astype("int64")}
        )
        return out.drop_duplicates()

    def add_bu(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = pd.Series([], dtype="int64")
            return df
        df["__b"] = (df["u"].to_numpy() % 16).astype("int64")
        return df

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates(["u", "day"])
        first = g.groupby("u")["day"].transform("min")
        out = pd.DataFrame(
            {
                "day": g["day"],
                "is_new": (g["day"] == first).astype("int64"),
            }
        )
        return out.groupby(["day", "is_new"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    def add_bd(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = pd.Series([], dtype="int64")
            return df
        df["__b"] = (df["day"].to_numpy() % 16).astype("int64")
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["day", "is_new"], as_index=False
        )["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    return (
        ev.map_batches(days, batch_format="pandas")
        .map_batches(add_bu, batch_format="pandas")
        .groupby("__b")
        .map_groups(per_user, batch_format="pandas")
        .map_batches(add_bd, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def _q_id_gaps(sf_dir: str):
    """Offset-continuity audit (``ops.profile.id_gaps``): missing
    event_id ranges after planting single holes (id % 97 == 0) and
    10-wide runs (id % 1000 in 500..509) — range-bucketed internal
    gaps + summary-stitched cross-range gaps."""
    import pandas as pd

    from fastie_ray.ops.profile import id_gaps

    ev = _read(sf_dir, "events", columns=["event_id"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        i = df["event_id"].astype("int64")
        keep = (i % 97 != 0) & ~((i % 1000).between(500, 509))
        return pd.DataFrame({"id": i[keep]})

    return id_gaps(
        ev.map_batches(plant, batch_format="pandas"), "id",
        range_size=1000, n_buckets=16,
    )


def _q_first_touch(sf_dir: str):
    """FIRST-touch attribution (the complement of asof_clicks' nearest/
    last-touch): for each purchase, the EARLIEST same-user click within
    the 30-min lookback — band_join pairs reduced by a per-purchase
    max-delta argmin (ties broken by click id, deterministic), one
    purchase-bucketed exchange over pair ids only."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.interval import band_join

    def ev(kind: str):
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
            filter=pc.field("event_type") == kind,
            override_num_blocks=16,
        )

    pairs = band_join(
        ev("click"), ev("purchase"), key_col="user_id", ts_col="ts",
        band="30min", direction="forward", id_col="event_id", n_buckets=16,
    )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = pd.Series([], dtype="int64")
            return df
        df["__b"] = (df["id_right"].to_numpy() % 16).astype("int64")
        return df

    def first_click(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values(
            ["id_right", "delta_us", "id_left"],
            ascending=[True, False, True],
        )
        out = g.groupby("id_right", as_index=False).first()
        return pd.DataFrame(
            {
                "purchase_id": out["id_right"].astype("int64"),
                "click_id": out["id_left"].astype("int64"),
                "delta_us": out["delta_us"].astype("int64"),
            }
        )

    return (
        pairs.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(first_click, batch_format="pandas")
    )


def _q_uptime_totals(sf_dir: str):
    """Covered-time accounting: per-user TOTAL active microseconds =
    Σ(e − s) over the coalesced span union (overlaps counted once) —
    the SLA/uptime rollup on top of ``interval_coalesce``; per-batch
    partial sums + one tiny key-bucketed final."""
    import pandas as pd

    union = _q_interval_union(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"k": df["k"], "cov": df["e"] - df["s"]}
        )
        return out.groupby("k", as_index=False)["cov"].sum()

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("k", as_index=False)["cov"].sum()
        out["covered_us"] = out["cov"].astype("int64")
        return out[["k", "covered_us"]]

    from fastie_ray.state.exchange import BlockSet

    return BlockSet.from_dataset(union).exchange(
        ["k"], final, n_buckets=16, map_fn=partial
    ).to_dataset()


def _q_rfm_segments(sf_dir: str):
    """RFM customer segmentation (the classic CRM rollup): per user
    Recency (days since last event, vs the corpus max day), Frequency
    (events), Monetary (cents), each cut at its exact quartile
    boundaries (``ops.stats.open_quantiles`` over the user table —
    streaming histogram passes, never a sort), labels assigned by a
    broadcast searchsorted map. Scores use quantile_disc semantics:
    score = #{quartile boundaries q25/q50/q75 that are < value} + 1,
    identical to the SQL CASE chain."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.stats import open_quantiles

    ev = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = pd.to_datetime(df["ts"]).to_numpy().astype("datetime64[D]")
        out = pd.DataFrame(
            {
                "u": df["user_id"].astype("int64"),
                "day": t.astype("int64"),
                "cents": (df["value"] * 100).round().astype("int64"),
            }
        )
        return out.groupby("u", as_index=False).agg(
            last_day=("day", "max"), f=("day", "count"), m=("cents", "sum")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = pd.Series([], dtype="int64")
            return df
        df["__b"] = (df["u"].to_numpy() % 16).astype("int64")
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("u", as_index=False).agg(
            last_day=("last_day", "max"), f=("f", "sum"), m=("m", "sum")
        )
        return out

    users = (
        ev.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
        .materialize()  # consumed by 4 passes (max day + 3 quantile runs)
    )
    max_day = int(
        users.map_batches(
            lambda df: pd.DataFrame({"mx": [df["last_day"].max()]})
            if len(df)
            else pd.DataFrame({"mx": []}),
            batch_format="pandas",
        )
        .to_pandas()["mx"]
        .max()
    )
    rec = users.map_batches(
        lambda df: pd.DataFrame(
            {"u": df["u"], "r": max_day - df["last_day"], "f": df["f"],
             "m": df["m"]}
        ),
        batch_format="pandas",
    ).materialize()
    qs = [0.25, 0.5, 0.75]
    cuts = {
        c: open_quantiles(rec, c, qs)["value"].to_numpy(dtype=np.int64)
        for c in ("r", "f", "m")
    }

    def label(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"u": df["u"]})
        for c in ("r", "f", "m"):
            v = df[c].to_numpy(dtype=np.int64)
            # score = #{boundaries < v} + 1 (quantile_disc CASE chain)
            out[c + "_score"] = (
                np.searchsorted(cuts[c], v, side="left") + 1
            ).astype(np.int64)
        return out

    return rec.map_batches(label, batch_format="pandas")


_PERC_RULES = {
    1: ["filter", "join"],
    2: ["spark", "stream", "query"],
    3: ["window", "vector"],
    4: ["merge"],
    5: ["customer", "agg", "hash"],
}


def _q_percolate(sf_dir: str):
    """Percolator / saved-search fan-out (``ops.retrieval.
    match_rules``): every doc matched against 5 stored conjunctive
    keyword rules — broadcast rule table, one distinct (row, token)
    membership frame per batch, one isin + match-count per rule; zero
    exchanges."""
    from fastie_ray.ops.retrieval import match_rules

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return match_rules(docs, _PERC_RULES)


def _percolate_sql() -> str:
    parts = []
    for rid, terms in _PERC_RULES.items():
        conds = " AND ".join(
            f"list_contains(string_split(text, ' '), '{t}')" for t in terms
        )
        parts.append(
            f"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       CAST({rid} AS BIGINT) AS rule_id
                FROM documents WHERE {conds}"""
        )
    return " UNION ALL ".join(parts)


def _q_itemsets3(sf_dir: str):
    """Apriori level-3 frequent itemsets (``ops.cooc.
    frequent_triples``): token triples with doc support ≥ 40 — L2
    pruning + broadcast candidates, candidate-bounded count
    exchange."""
    from fastie_ray.ops.cooc import frequent_triples

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return frequent_triples(ds, min_support=40, per_doc_cap=16)


def _q_analyze_hist(sf_dir: str):
    """ANALYZE-style equi-depth histogram (the optimizer-statistics
    artifact): 8 buckets over price cents — boundaries from
    ``open_quantiles`` (streaming histogram refinement, no sort),
    bucket assignment by broadcast searchsorted (#{boundaries < v},
    the RFM tie convention), counts + sums per bucket in one tiny
    exchange."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.stats import open_quantiles

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"cents": (df["l_extendedprice"] * 100).round().astype("int64")}
        )

    cents = li.map_batches(prep, batch_format="pandas").materialize()
    qs = [i / 8 for i in range(1, 8)]
    bounds = open_quantiles(cents, "cents", qs)["value"].to_numpy(
        dtype=np.int64
    )

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        v = df["cents"].to_numpy(dtype=np.int64)
        b = np.searchsorted(bounds, v, side="left").astype(np.int64)
        out = pd.DataFrame({"bucket": b, "cents": v})
        return out.groupby("bucket", as_index=False).agg(
            n=("cents", "count"), sum_cents=("cents", "sum")
        )

    out = (
        cents.map_batches(assign, batch_format="pandas")
        .to_pandas()
        .groupby("bucket", as_index=False)
        .sum()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return out


def _q_densest(sf_dir: str):
    """Parallel Charikar densest-subgraph peeling trajectory
    (``ops.graph.densest_rounds``, ε = 0.1) over the chain+skip order
    graph: integer cross-multiplied removal threshold, one degree
    exchange + two semi-joins per round."""
    from fastie_ray.ops.graph import densest_rounds

    return densest_rounds(
        _order_tri_edges(sf_dir), eps_e6=100_000, max_rounds=8,
        n_buckets=16,
    )


def _densest_sql(eps_e6: int = 100_000, rounds: int = 8) -> str:
    """Unrolled densest-peeling oracle (degree/stats/keep/shrink CTE
    quadruple per round) over the chain+skip order graph — mirrors
    ``_q_densest`` exactly."""
    ctes = [
        """o AS (SELECT o_custkey AS c, o_orderkey AS ok,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
            FROM orders)""",
        """ch AS (SELECT 'o' || a.ok AS x, 'o' || b.ok AS y
            FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 1)""",
        """sk AS (SELECT 'o' || a.ok AS x, 'o' || b.ok AS y
            FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 2)""",
        """e0 AS MATERIALIZED (
            SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
            FROM (SELECT * FROM ch UNION ALL SELECT * FROM sk))""",
    ]
    stats = []
    for r in range(rounds):
        ctes.append(
            f"""d{r} AS MATERIALIZED (
                SELECT node, count(*) AS deg FROM (
                    SELECT a AS node FROM e{r}
                    UNION ALL SELECT b FROM e{r})
                GROUP BY 1)"""
        )
        ctes.append(
            f"""st{r} AS MATERIALIZED (
                SELECT (SELECT count(*) FROM d{r}) AS n,
                       (SELECT count(*) FROM e{r}) AS ecnt)"""
        )
        ctes.append(
            f"""kp{r} AS MATERIALIZED (
                SELECT node FROM d{r}, st{r}
                WHERE deg * n * 1000000 > 2 * {1_000_000 + eps_e6} * ecnt)"""
        )
        ctes.append(
            f"""e{r + 1} AS MATERIALIZED (
                SELECT a, b FROM e{r}
                WHERE a IN (SELECT node FROM kp{r})
                  AND b IN (SELECT node FROM kp{r}))"""
        )
        stats.append(
            f"SELECT {r} AS round, n AS n_nodes, ecnt AS n_edges FROM st{r}"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + """
        SELECT CAST(round AS BIGINT) AS round,
               CAST(n_nodes AS BIGINT) AS n_nodes,
               CAST(n_edges AS BIGINT) AS n_edges
        FROM ("""
        + " UNION ALL ".join(stats)
        + ") WHERE n_nodes > 0"
    )


def _q_butterflies(sf_dir: str):
    """Bipartite BUTTERFLY count (``ops.graph.butterfly_count``) over
    the distinct (user, event_type) incidence graph — 2×2 bicliques,
    the motif primitive of user-item graphs where triangles cannot
    exist. Two exchanges: per-user item pairs, then per-item-pair
    common-user counts with C(cu, 2) partial sums."""
    import pandas as pd

    from fastie_ray.ops.graph import butterfly_count

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"u": df["user_id"].astype("int64"), "i": df["event_type"]}
        ).drop_duplicates()

    return butterfly_count(
        ev.map_batches(prep, batch_format="pandas"), n_buckets=16
    )


def _q_triad_census(sf_dir: str):
    """Directed triad closure census (``ops.graph.
    triad_closure_census``) over the event handoff graph: cyclic vs
    transitive (feed-forward) 2-path closures — the directed-motif
    counts the undirected triangle ops can't see."""
    import pandas as pd

    from fastie_ray.ops.graph import triad_closure_census
    from fastie_ray.ops.join import hash_join

    ev = _read(sf_dir, "events", columns=["event_id", "user_id"])

    def lhs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df["event_id"].astype("int64") + 1,
                "src": df["user_id"].astype("int64"),
            }
        )

    def rhs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": df["event_id"].astype("int64"),
                "dst": df["user_id"].astype("int64"),
            }
        )

    edges = hash_join(
        ev.map_batches(lhs, batch_format="pandas"),
        ev.map_batches(rhs, batch_format="pandas"),
        on="k", left_cols=["k", "src"], right_cols=["k", "dst"],
        n_buckets=16,
    ).map_batches(
        lambda df: df.loc[df["src"] != df["dst"], ["src", "dst"]],
        batch_format="pandas",
    )
    return triad_closure_census(edges, n_buckets=16)


def _q_bot_scores(sf_dir: str):
    """Scripted-traffic detector (``ops.sequence.gap_regularity``):
    per-user inter-event gap CV² in exact integers; a metronome bot
    (user 9999, exact 60 s cadence, synthesized from the first 200
    event ids) must flag while organic users don't."""
    import pandas as pd

    from fastie_ray.ops.sequence import gap_regularity

    ev = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        base = pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64"),
                "user_id": df["user_id"].astype("int64"),
                "ts": pd.to_datetime(df["ts"]),
            }
        )
        k = base["event_id"][base["event_id"] < 200]
        bot = pd.DataFrame(
            {
                "event_id": 10_000_000 + k,
                "user_id": pd.Series(9999, index=k.index, dtype="int64"),
                "ts": pd.Timestamp("2024-01-01")
                + pd.to_timedelta(k.to_numpy(), unit="m"),
            }
        )
        return pd.concat([base, bot], ignore_index=True)

    return gap_regularity(
        ev.map_batches(plant, batch_format="pandas"),
        min_gaps=8, cv2_thresh_e6=10_000,
    )


def _q_ed1_lookup(sf_dir: str):
    """Typo-tolerant dictionary lookup (``ops.blocking.ed1_lookup``,
    the entity-linking companion to ed1_pairs): customer names with
    planted typos (every 3rd name loses its 5th char, the rest gain a
    trailing 'X') resolved against the clean name dictionary at
    Levenshtein ≤ 1."""
    import pandas as pd

    from fastie_ray.ops.blocking import ed1_lookup

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def corrupt(df: pd.DataFrame) -> pd.DataFrame:
        n = df["c_name"].astype(str)
        typo = n.str.slice(0, 4) + n.str.slice(5)
        appended = n + "X"
        return pd.DataFrame(
            {"q": typo.where(df["c_custkey"] % 3 == 0, appended)}
        )

    return ed1_lookup(
        cust.map_batches(corrupt, batch_format="pandas"),
        cust, "q", "c_name", n_buckets=16,
    )


def _q_top_reach(sf_dir: str):
    """Top-10 items by distinct-user REACH (popularity by unique
    audience, not raw volume — the recsys/ads ranking that needs exact
    windowless count-distinct): item = props.$.k (vectorized regex
    extract); distinct (item, user) combiner → user-hashed exchange
    with per-bucket partial reach counts (disjoint member sets ADD,
    the hopping_uniques shape) → item-bucketed sum + per-bucket top-k,
    driver merges buckets × k rows; deterministic (reach DESC, item)
    order."""
    import pandas as pd

    ev = _read(sf_dir, "events", columns=["user_id", "props"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(
            r'"k":\s*(-?\d+)', expand=False
        ).astype("int64")
        out = pd.DataFrame(
            {"item": k, "u": df["user_id"].astype("int64")}
        )
        return out.drop_duplicates()

    def add_bu(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = pd.Series([], dtype="int64")
            return df
        df["__b"] = (df["u"].to_numpy() % 16).astype("int64")
        return df

    def bucket_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates(["item", "u"])
        out = g.groupby("item", as_index=False).agg(reach=("u", "count"))
        out["reach"] = out["reach"].astype("int64")
        return out

    def add_bi(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = pd.Series([], dtype="int64")
            return df
        df["__b"] = (df["item"].to_numpy() % 16).astype("int64")
        return df

    def topk_local(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("item", as_index=False)[
            "reach"
        ].sum()
        return out.sort_values(
            ["reach", "item"], ascending=[False, True]
        ).head(10)

    cand = (
        ev.map_batches(pairs, batch_format="pandas")
        .map_batches(add_bu, batch_format="pandas")
        .groupby("__b")
        .map_groups(bucket_counts, batch_format="pandas")
        .map_batches(add_bi, batch_format="pandas")
        .groupby("__b")
        .map_groups(topk_local, batch_format="pandas")
        .to_pandas()
    )
    out = cand.sort_values(
        ["reach", "item"], ascending=[False, True]
    ).head(10)
    out["reach"] = out["reach"].astype("int64")
    return out.reset_index(drop=True)


def _q_grouped_weighted_median(sf_dir: str):
    """Per-returnflag WEIGHTED price quantiles (weight = quantity) via
    ``grouped_open_quantiles(weight_col=...)`` — the grouped member of
    the weighted-quantile family; boundary ⌈q·W_g⌉ exact, oracle is a
    PARTITION BY cumulative-weight window."""
    import pandas as pd

    from fastie_ray.ops.stats import grouped_open_quantiles

    li = _read(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "g": df["l_returnflag"],
                "cents": (df["l_extendedprice"] * 100).round().astype(
                    "int64"
                ),
                "w": df["l_quantity"].round().astype("int64"),
            }
        )

    return grouped_open_quantiles(
        li.map_batches(prep, batch_format="pandas"),
        "g", "cents", [0.5, 0.9], weight_col="w",
    )


def _q_landing_exit(sf_dir: str):
    """Landing/exit analysis: counts of (first event type, last event
    type) per 30-min-gap session — the entry/exit-page product metric.
    One user-bucketed exchange: vectorized gap/cumsum sessionization
    (the session_window_agg kernel) + per-session first/last + a
    types²-bounded local count; driver merges blocks × ≤ types²
    rows."""
    import numpy as np
    import pandas as pd

    ev = _read(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"]
    )
    gap_us = 30 * 60 * 1_000_000

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = pd.Series([], dtype="int64")
            return df
        df["__b"] = (df["user_id"].to_numpy() % 16).astype("int64")
        return df

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values(
            ["user_id", "ts", "event_id"]
        )
        t = (
            pd.to_datetime(g["ts"]).to_numpy().astype("datetime64[us]")
            .astype(np.int64)
        )
        new_user = (g["user_id"] != g["user_id"].shift()).to_numpy()
        brk = new_user | (
            t - np.concatenate([[0], t[:-1]]) > gap_us
        )
        sid = np.cumsum(brk)
        s = pd.DataFrame(
            {"sid": sid, "et": g["event_type"].to_numpy()}
        )
        firsts = s.groupby("sid")["et"].first()
        lasts = s.groupby("sid")["et"].last()
        out = pd.DataFrame(
            {"landing": firsts.to_numpy(), "exit": lasts.to_numpy()}
        )
        out = out.groupby(["landing", "exit"], as_index=False).size().rename(
            columns={"size": "n_sessions"}
        )
        out["n_sessions"] = out["n_sessions"].astype("int64")
        return out

    parts = (
        ev.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby(["landing", "exit"], as_index=False)[
        "n_sessions"
    ].sum()
    out["n_sessions"] = out["n_sessions"].astype("int64")
    return out.sort_values(["landing", "exit"]).reset_index(drop=True)


def _q_conversion_daily(sf_dir: str):
    """Daily click→purchase conversion rate: clicks per day (by click
    ts), converted clicks = clicks with a same-user purchase within 30
    min (DISTINCT click ids from the band_join pair table — one
    click counts once however many purchases follow), integer
    conv_e6 = ⌊converted·10⁶ / clicks⌋. Pair ids only ever ship."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data

    from fastie_ray.ops.interval import band_join
    from fastie_ray.ops.join import hash_join

    def ev(kind: str):
        return ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "user_id", "ts", "event_type"],
            filter=pc.field("event_type") == kind,
            override_num_blocks=16,
        )

    clicks = ev("click").materialize()  # consumed by 2 branches
    pairs = band_join(
        clicks, ev("purchase"), key_col="user_id", ts_col="ts",
        band="30min", direction="forward", id_col="event_id", n_buckets=16,
    )
    converted_ids = pairs.map_batches(
        lambda df: pd.DataFrame({"cid": df["id_left"]}).drop_duplicates(),
        batch_format="pandas",
    )
    conv_clicks = hash_join(
        clicks, converted_ids, on="event_id", right_on="cid", how="semi",
        left_cols=["event_id", "ts"], n_buckets=16,
    )

    def daily(name: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            d = (
                pd.to_datetime(df["ts"]).to_numpy()
                .astype("datetime64[D]").astype("int64")
            )
            out = pd.DataFrame({"day": d})
            return out.groupby("day", as_index=False).size().rename(
                columns={"size": name}
            )

        return fn

    all_daily = (
        clicks.map_batches(daily("n_clicks"), batch_format="pandas")
        .to_pandas()
        .groupby("day", as_index=False)
        .sum()
    )
    conv_daily = (
        conv_clicks.map_batches(daily("n_conv"), batch_format="pandas")
        .to_pandas()
        .groupby("day", as_index=False)
        .sum()
    )
    out = all_daily.merge(conv_daily, on="day", how="left").fillna(0)
    out["n_clicks"] = out["n_clicks"].astype("int64")
    out["n_conv"] = out["n_conv"].astype("int64")
    out["conv_e6"] = (
        out["n_conv"] * 1_000_000 // out["n_clicks"]
    ).astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def _q_grouped_psi(sf_dir: str):
    """Per-event-type PSI drift between the month's halves
    (``ops.stats.grouped_psi_drift``): the segment drift monitor —
    a calm global PSI can hide one collapsing segment; full grid +
    Laplace terms computed inside the group exchange, no driver
    step."""
    import pandas as pd

    from fastie_ray.ops.stats import grouped_psi_drift

    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    cut = pd.Timestamp("2024-01-16").value // 1000

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        t = (
            pd.to_datetime(df["ts"]).astype("datetime64[us]")
            .astype("int64")
        )
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "m": (t >= cut).astype("int64"),
                "cents": (df["value"] * 100 + 0.5).astype("int64"),
            }
        )

    return grouped_psi_drift(
        ev.map_batches(prep, batch_format="pandas"),
        "event_type", "m", "cents", n_bins=16, bin_width=1000,
    )


def _q_grouped_open_quantiles(sf_dir: str):
    """Per-event-type EXACT quantiles over the unbounded value-cents
    domain (``ops.stats.grouped_open_quantiles``): three streaming
    histogram passes, zero exchanges — removes grouped_quantiles'
    bounded-value-domain contract."""
    import pandas as pd

    from fastie_ray.ops.stats import grouped_open_quantiles

    ev = _read(sf_dir, "events", columns=["event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": df["event_type"],
                "cents": (df["value"] * 100).round().astype("int64"),
            }
        )

    return grouped_open_quantiles(
        ev.map_batches(prep, batch_format="pandas"),
        "event_type", "cents", [0.25, 0.5, 0.9],
    )


def _q_range_lookup(sf_dir: str):
    """Point-in-range lookup join (``ops.interval.range_lookup``,
    exchange mode — the GeoIP/tier-bracket enrichment shape): price
    cents resolved against 24 gap-separated brackets via domain
    chunking, ONE exchange, single emission; per-bracket rollup. The
    broadcast (dimension-table) mode is parity-pinned in pytest."""
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.interval import range_lookup

    li = _read(sf_dir, "lineitem", columns=["l_extendedprice"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"cents": (df["l_extendedprice"] * 100).round().astype("int64")}
        )

    k = np.arange(24, dtype=np.int64)
    ranges = ray.data.from_pandas(
        pd.DataFrame(
            {"range_id": k, "lo": k * 500_000, "hi": k * 500_000 + 449_999}
        )
    )
    looked = range_lookup(
        li.map_batches(prep, batch_format="pandas"),
        ranges, "cents", mode="exchange", chunk=500_000,
    )

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("range_id", as_index=False).agg(
            n=("x", "count"), sum_cents=("x", "sum")
        )

    out = (
        looked.map_batches(agg, batch_format="pandas")
        .to_pandas()
        .groupby("range_id", as_index=False)
        .sum()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return out



def _q_char_entropy(sf_dir: str):
    """Per-doc codepoint Shannon entropy over documents
    (``ops.text_analysis.char_entropy_batch``): order-independent
    per-term e6 floors make the transcendental sum SQL-exact."""
    from fastie_ray.ops.text_analysis import char_entropy

    return char_entropy(_read(sf_dir, "documents", columns=["doc_id", "text"]))


def _q_benford(sf_dir: str):
    """Benford first-digit audit of event values per event_type
    (``ops.stats.benford_audit``): integer-cents leading digit +
    per-digit chi-square contribution, floored per term."""
    from fastie_ray.ops.stats import benford_audit

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    return benford_audit(ev, "event_type", "value")


def _q_autocorr(sf_dir: str):
    """Lag-1..3 autocorrelation components of per-type daily event
    counts (``ops.stats.lagged_autocorr``): exact int64 Pearson
    numerator/denominators over the day-ordered series."""
    from fastie_ray.ops.stats import lagged_autocorr

    ev = _read(sf_dir, "events", columns=["event_type", "ts"])
    return lagged_autocorr(ev, "event_type", "ts", max_lag=3)


def _q_priority_sample(sf_dir: str):
    """Deterministic weighted sampling without replacement
    (``ops.sampling.priority_sample``): md5-hash priorities divided by
    integer weights, k smallest win — reproducible across re-shards."""
    import pandas as pd

    from fastie_ray.ops.sampling import priority_sample

    docs = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    wd = docs.map_batches(
        lambda df: pd.DataFrame(
            {"doc_id": df["doc_id"],
             "w": (df["n_chars"] // 100 + 1).astype("int64")}
        ),
        batch_format="pandas",
    )
    return priority_sample(wd, k=50, weight_col="w")


def _q_nb_lang(sf_dir: str):
    """Multinomial naive-Bayes language classifier
    (``ops.nbayes``): count model trained on even doc_ids (one
    vocab-bounded exchange), broadcast via ray.put, argmax-scored over
    odd doc_ids with per-term e6 floors (order-independent int sums —
    the reference's classification stage as a generative model,
    `fastie/models/` A15 analogue)."""
    import ray

    from fastie_ray.ops.nbayes import nb_score, nb_train

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    train = docs.filter(lambda r: r["doc_id"] % 2 == 0)
    test = docs.filter(lambda r: r["doc_id"] % 2 == 1)
    model_ref = ray.put(nb_train(train))
    return nb_score(test, model_ref)


def _q_modularity(sf_dir: str):
    """Newman modularity of the NATION partition over the distinct
    customer↔supplier co-order graph (``ops.graph.modularity``):
    exact rational per-community q_num = 4·m·e_c − K_c² — the
    community-quality gate after KG community detection."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import modularity
    from fastie_ray.ops.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"],
        right_cols=["o_orderkey", "o_custkey"],
    )
    edges = dedup_exact(
        j.map_batches(
            lambda df: pd.DataFrame(
                {"a": "c" + df["o_custkey"].astype(str),
                 "b": "s" + df["l_suppkey"].astype(str)}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        ["a", "b"], n_buckets=16,
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).map_batches(
        lambda df: pd.DataFrame(
            {"node": "c" + df["c_custkey"].astype(str),
             "label": "n" + df["c_nationkey"].astype(str)}
        ),
        batch_format="pandas",
    )
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).map_batches(
        lambda df: pd.DataFrame(
            {"node": "s" + df["s_suppkey"].astype(str),
             "label": "n" + df["s_nationkey"].astype(str)}
        ),
        batch_format="pandas",
    )
    return modularity(edges, cust.union(supp), n_buckets=16)


def _q_edge_jaccard(sf_dir: str):
    """Neighborhood-Jaccard weight of every edge of the subsampled
    supplier co-supply graph (``ops.graph.edge_jaccard``) — the local
    graph-sparsification weight; same edge build as clustering_coeff."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import edge_jaccard
    from fastie_ray.pipelines.kg import _bucketed_groupby

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def distinct_os(df):
        return df[df["l_orderkey"] % 20 == 0].drop_duplicates()

    def pairs(g):
        g = g.drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_1", "_2"))
        m = m[m["l_suppkey_1"] < m["l_suppkey_2"]]
        out = pd.DataFrame({"a": m["l_suppkey_1"], "b": m["l_suppkey_2"]})
        return out.drop_duplicates()

    per_order = _bucketed_groupby(
        li.map_batches(distinct_os, batch_format="pandas"),
        "l_orderkey", pairs, 16,
    )
    edges = dedup_exact(per_order, ["a", "b"], n_buckets=16)
    return edge_jaccard(edges, n_buckets=16)



def _q_mutual_info(sf_dir: str):
    """Pointwise-MI decomposition of lang × source on documents
    (``ops.stats.mutual_info``): vocabulary-bounded cell table with
    per-cell e6-floored PMI contributions."""
    from fastie_ray.ops.stats import mutual_info

    docs = _read(sf_dir, "documents", columns=["lang", "source"])
    return mutual_info(docs, "lang", "source")


def _q_assortativity(sf_dir: str):
    """Degree-assortativity components of the subsampled supplier
    co-supply graph (``ops.graph.degree_assortativity``): exact int64
    Pearson moments over both edge orientations."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import degree_assortativity
    from fastie_ray.pipelines.kg import _bucketed_groupby

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def distinct_os(df):
        return df[df["l_orderkey"] % 20 == 0].drop_duplicates()

    def pairs(g):
        g = g.drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_1", "_2"))
        m = m[m["l_suppkey_1"] < m["l_suppkey_2"]]
        out = pd.DataFrame({"a": m["l_suppkey_1"], "b": m["l_suppkey_2"]})
        return out.drop_duplicates()

    per_order = _bucketed_groupby(
        li.map_batches(distinct_os, batch_format="pandas"),
        "l_orderkey", pairs, 16,
    )
    edges = dedup_exact(per_order, ["a", "b"], n_buckets=16)
    return degree_assortativity(edges, n_buckets=16)


def _q_kmv_distinct(sf_dir: str):
    """Per-event-type KMV distinct-user estimate
    (``ops.sketch.kmv_distinct_grouped``): mergeable bottom-64 hash
    sketches, deterministic integer estimate."""
    from fastie_ray.ops.sketch import kmv_distinct_grouped

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return kmv_distinct_grouped(ev, "event_type", "user_id", k=64)


def _q_user_concentration(sf_dir: str):
    """Per-event-type activity concentration
    (``ops.stats.user_concentration``): top-5 user share + exact HHI
    numerator (Σ n_u²) — the traffic-dominance audit."""
    from fastie_ray.ops.stats import user_concentration

    ev = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return user_concentration(ev, "event_type", "user_id", k=5)



def _q_rake_keyphrases(sf_dir: str):
    """Corpus-level RAKE keyphrase extraction
    (``ops.keyphrases.rake_keyphrases``): stopword-boundary candidate
    phrases, integer word deg//freq scores, vocab-bounded exchanges."""
    from fastie_ray.ops.keyphrases import rake_keyphrases

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return rake_keyphrases(docs, k=50)


def _q_seq_patterns(sf_dir: str):
    """Ordered event-type pair support (2-item PrefixSpan core,
    ``ops.sequence.ordered_pair_support``): keys whose stream has some
    x strictly before some y, via per-(key, type) extrema only."""
    from fastie_ray.ops.sequence import ordered_pair_support

    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    return ordered_pair_support(ev, "user_id", "event_type", "ts")



def _q_best_stump(sf_dir: str):
    """Distributed decision-stump split search (``ops.trees.best_stump``,
    the GBDT histogram-aggregation node primitive): best threshold +
    polarity per integer feature for the lang=='en' label, exact
    misclassification counts."""
    import pandas as pd

    from fastie_ray.ops.trees import best_stump

    docs = _read(sf_dir, "documents", columns=["text", "lang", "n_chars"])

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_chars": df["n_chars"].astype("int64"),
                "n_spaces": (
                    df["text"].str.len() -
                    df["text"].str.replace(" ", "", regex=False).str.len()
                ).astype("int64"),
                "y": (df["lang"] == "en").astype("int64"),
            }
        )

    return best_stump(
        docs.map_batches(feats, batch_format="pandas"),
        ["n_chars", "n_spaces"], "y",
    )


def _q_neighbor_sample(sf_dir: str):
    """Deterministic GraphSAGE-style neighbor fan-out sampling over
    the co-supply graph (``ops.graph.neighbor_sample``): k smallest
    md5 edge hashes per node — the degree cap for 2-hop expansion."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import neighbor_sample
    from fastie_ray.pipelines.kg import _bucketed_groupby

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def distinct_os(df):
        return df[df["l_orderkey"] % 20 == 0].drop_duplicates()

    def pairs(g):
        g = g.drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_1", "_2"))
        m = m[m["l_suppkey_1"] < m["l_suppkey_2"]]
        out = pd.DataFrame({"a": m["l_suppkey_1"], "b": m["l_suppkey_2"]})
        return out.drop_duplicates()

    per_order = _bucketed_groupby(
        li.map_batches(distinct_os, batch_format="pandas"),
        "l_orderkey", pairs, 16,
    )
    edges = dedup_exact(per_order, ["a", "b"], n_buckets=16)
    return neighbor_sample(edges, k=8)



def _q_cart_tree(sf_dir: str):
    """Greedy depth-2 CART tree (``ops.trees.greedy_tree``): one
    (leaf, feature, value) histogram exchange per level, splits
    broadcast back as a driver-sized dict — the distributed-GBDT node
    loop with exact integer counts and an unrolled per-node oracle."""
    import pandas as pd

    from fastie_ray.ops.trees import greedy_tree

    docs = _read(sf_dir, "documents", columns=["text", "lang", "n_chars"])

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_chars": df["n_chars"].astype("int64"),
                "n_spaces": (
                    df["text"].str.len() -
                    df["text"].str.replace(" ", "", regex=False).str.len()
                ).astype("int64"),
                "y": (df["lang"] == "en").astype("int64"),
            }
        )

    return greedy_tree(
        docs.map_batches(feats, batch_format="pandas"),
        ["n_chars", "n_spaces"], "y", depth=2,
    )


def _q_token_fertility(sf_dir: str):
    """Per-language tokenizer-fertility census
    (``ops.text_analysis.token_fertility``): docs / tokens / chars and
    integer chars-per-token, one partial-sum combiner + tiny exchange."""
    from fastie_ray.ops.text_analysis import token_fertility

    docs = _read(sf_dir, "documents", columns=["lang", "text"])
    return token_fertility(docs, group_col="lang")


def _q_nfc_audit(sf_dir: str):
    """Unicode NFC-normalization ingest audit
    (``ops.text_analysis.nfc_audit``): raw vs NFC codepoint length and
    an is_nfc flag per doc; DuckDB ``nfc_normalize`` is the UAX #15
    oracle. Embarrassingly parallel."""
    from fastie_ray.ops.text_analysis import nfc_audit

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return nfc_audit(docs)


def _q_token_sort_dups(sf_dir: str):
    """Token-order-insensitive duplicate groups
    (``ops.neardup.token_sort_dups``): md5 of the sorted distinct token
    set, one fingerprint-bucketed exchange."""
    from fastie_ray.ops.neardup import token_sort_dups

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return token_sort_dups(docs)


def _q_conjunctive_search(sf_dir: str):
    """Boolean AND retrieval over token membership
    (``ops.text_index.conjunctive_search``): broadcast query terms,
    pure vectorized filter, zero shuffles."""
    from fastie_ray.ops.text_index import conjunctive_search

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return conjunctive_search(docs, ["merge", "vector", "stream"])


def _q_vocab_growth(sf_dir: str):
    """Heaps'-law vocabulary-growth curve
    (``ops.text_analysis.vocab_growth``): new token types + cumulative
    vocabulary per doc-id-range slice, token-first-occurrence exchange
    only."""
    from fastie_ray.ops.text_analysis import vocab_growth

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return vocab_growth(docs, n_growth_buckets=20, ngram=2)


def _q_token_pmi(sf_dir: str):
    """PMI collocations over the broadcast top-40-df vocabulary
    (``ops.text_index.token_pmi``): doc-level pair presence, e6-floored
    log2 PMI, pair space bounded at C(40, 2)."""
    from fastie_ray.ops.text_index import token_pmi

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return token_pmi(docs, n_docs=docs.count(), k_vocab=40, min_count=5)


def _q_content_chunks(sf_dir: str):
    """Content-defined chunking census (``ops.chunking.content_chunks``,
    the LBFS/FastCDC storage-dedup primitive): rolling-hash boundaries,
    recurring-chunk (hash, len, n_occ, n_docs) rows, one hash-bucketed
    exchange of 32-byte hashes."""
    from fastie_ray.ops.chunking import content_chunks

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return content_chunks(docs, mod=16, min_occ=2)


def _q_mad_outliers(sf_dir: str):
    """Median/MAD robust outlier gate per event type
    (``ops.stats.mad_outliers``): integer-cents low medians via two
    grouped-quantile exchanges, broadcast dicts, parallel filter."""
    from fastie_ray.ops.stats import mad_outliers

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    return mad_outliers(ev, "event_type", "value", "event_id", k=3)


def _q_dict_encode(sf_dir: str):
    """Dictionary-encode the corpus to (doc_id, pos, token_id) rows
    (``ops.encoding.dict_encode``): range-keyed distributed dense-rank
    vocab + broadcast map — the tokenize-and-materialize step."""
    from fastie_ray.ops.encoding import dict_encode

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return dict_encode(docs)


def _q_hll_sliding(sf_dir: str):
    """Trailing-7-day sliding-window HLL distinct-user sketches per day
    (``ops.sketch.hll_sliding_registers``): daily register partials
    merged by rolling max — the streaming weekly-actives shape."""
    from fastie_ray.ops.sketch import hll_sliding_registers

    ev = _read(sf_dir, "events", columns=["ts", "user_id"])
    return hll_sliding_registers(ev, "user_id", window_days=7)


def _q_token_budget_select(sf_dir: str):
    """Per-source token-budget selection
    (``ops.selection.token_budget_select``): md5-shuffle order,
    distributed grouped prefix sum, take-while ≤ 800 tokens."""
    from fastie_ray.ops.selection import token_budget_select

    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return token_budget_select(docs, budget=800)


def _q_source_scorecard(sf_dir: str):
    """Per-source ingest scorecard (``ops.profile.source_scorecard``):
    volume, chars, language spread, corpus-wide exact-dup share — one
    md5-bucketed exchange plus source-bounded combiners."""
    from fastie_ray.ops.profile import source_scorecard

    docs = _read(sf_dir, "documents", columns=["source", "lang", "text"])
    return source_scorecard(docs)


def _q_mirror_overlap(sf_dir: str):
    """Pairwise source-overlap matrix on token-set fingerprints
    (``ops.profile.source_overlap``): distinct shared fingerprints per
    unordered source pair — the mirror detector."""
    from fastie_ray.ops.profile import source_overlap

    docs = _read(sf_dir, "documents", columns=["source", "text"])
    return source_overlap(docs, key="tokenset")


def _q_quantile_transform(sf_dir: str):
    """Per-type percentile-rank normalization of event values
    (``ops.encoding.quantile_transform``): strict-rank pct_e6 via a
    broadcast cumulative count table — sklearn's QuantileTransformer
    as a distributed op."""
    from fastie_ray.ops.encoding import quantile_transform

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "value"])
    return quantile_transform(ev, "event_type", "value", "event_id")


def _q_late_events(sf_dir: str):
    """Watermark-violation census over a deterministically permuted
    ingest log (``ops.windows.late_events``): distributed prefix MAX
    over md5 ingest order — per-type late counts + max lateness.
    The md5 permutation SIMULATES an unordered ingest replay (the
    synthetic events file is ts-sorted, so the identity order has
    zero lateness by construction)."""
    import hashlib as _h

    import pandas as _pd

    from fastie_ray.ops.windows import late_events

    ev = _read(sf_dir, "events", columns=["event_id", "event_type", "ts"])

    def ingest(df: _pd.DataFrame) -> _pd.DataFrame:
        df = df.copy()
        df["iseq"] = df["event_id"].map(
            lambda i: int(
                _h.md5(f"ing:{i}".encode()).hexdigest()[:15], 16
            )
        )
        return df

    return late_events(
        ev.map_batches(ingest, batch_format="pandas"),
        order_col="iseq",
        range_size=2 ** 56,
    )


def _q_doc_novelty(sf_dir: str):
    """Per-doc first-seen-bigram attribution
    (``ops.text_analysis.doc_novelty``): distinct bigrams vs bigrams
    first occurring in this doc, novelty_e6 ratio — marginal-content
    accounting at n-gram granularity."""
    from fastie_ray.ops.text_analysis import doc_novelty

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return doc_novelty(docs)


def _q_cc_incremental(sf_dir: str):
    """Incremental connected components
    (``stages.canonicalize.cc_incremental``): base labels from 90% of
    the cust↔supp co-order edges, the o_orderkey%10==0 slice folded in
    as a delta — bit-identical to the full-union recursive-CTE
    oracle because component ids are min member nodes."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.join import hash_join
    from fastie_ray.stages.canonicalize import (
        cc_incremental,
        connected_components_ds,
    )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"],
        right_cols=["o_orderkey", "o_custkey"],
    )

    def to_edges(part: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            m = (df["l_orderkey"] % 10 == 0) == (part == 1)
            sub = df[m]
            return pd.DataFrame(
                {"u": "c" + sub["o_custkey"].astype(str),
                 "v": "s" + sub["l_suppkey"].astype(str)}
            ).drop_duplicates()

        return f

    jm = j.materialize()
    base_edges = dedup_exact(
        jm.map_batches(to_edges(0), batch_format="pandas"), ["u", "v"],
        n_buckets=16,
    )
    delta_edges = dedup_exact(
        jm.map_batches(to_edges(1), batch_format="pandas"), ["u", "v"],
        n_buckets=16,
    )
    base = connected_components_ds(base_edges, n_buckets=16)
    return cc_incremental(base, delta_edges, n_buckets=16)


def _q_consistent_shards(sf_dir: str):
    """Consistent-hash resharding census
    (``ops.sharding.consistent_shards``): 8-ring vs 9-ring placement
    matrix — off-diagonal mass = what a resize copies."""
    from fastie_ray.ops.sharding import consistent_shards

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    return consistent_shards(docs, n_shards_a=8, n_shards_b=9)


def _q_seasonal_baseline(sf_dir: str):
    """Day-of-week seasonal anomaly screen
    (``ops.stats.seasonal_baseline``): per (type, day) mean vs the
    same-weekday baseline, exact cross-multiplied 2× flag."""
    from fastie_ray.ops.stats import seasonal_baseline

    ev = _read(sf_dir, "events", columns=["event_type", "ts", "value"])
    return seasonal_baseline(ev)


def _q_source_minhash(sf_dir: str):
    """Source-pair Jaccard matrix by MinHash sketch algebra
    (``ops.neardup.source_minhash_matrix``): 32 md5 min-hashes per
    source merged by MIN, pairwise match counts — group similarity
    with zero doc-pair comparisons."""
    from fastie_ray.ops.neardup import source_minhash_matrix

    docs = _read(sf_dir, "documents", columns=["source", "text"])
    return source_minhash_matrix(docs, num_perm=32)


def _q_ccnet_lang_buckets(sf_dir: str):
    """CCNet head/middle/tail assignment PER LANGUAGE — the actual
    CCNet recipe (each language buckets against its own terciles, so a
    low-resource language isn't all-tail just for being unlike the
    majority): global bigram LM score → ``grouped_quantiles`` per-lang
    thresholds (broadcast dict) → streaming CASE."""
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.join import hash_join
    from fastie_ray.ops.lm_filter import lm_familiarity_pipeline
    from fastie_ray.ops.stats import grouped_quantiles

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    langs = _read(sf_dir, "documents", columns=["doc_id", "lang"])
    scored = hash_join(
        lm_familiarity_pipeline(ds, min_count=16), langs, on="doc_id",
        left_cols=["doc_id", "familiarity"],
        right_cols=["doc_id", "lang"],
    ).materialize()
    q = grouped_quantiles(
        scored, "lang", "familiarity", [1.0 / 3.0, 2.0 / 3.0]
    ).to_pandas()
    th: dict[str, list[int]] = {}
    for _, r in q.iterrows():
        th.setdefault(r["lang"], [0, 0])[
            0 if abs(r["q"] - 1.0 / 3.0) < 1e-9 else 1
        ] = int(r["value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        f = df["familiarity"].to_numpy()
        t1 = df["lang"].map(lambda g: th[g][0]).to_numpy()
        t2 = df["lang"].map(lambda g: th[g][1]).to_numpy()
        lab = np.where(f > t2, "head", np.where(f > t1, "middle", "tail"))
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "lang": df["lang"],
             "familiarity": f, "ccnet_bucket": lab}
        )

    return scored.map_batches(bucket, batch_format="pandas")


def _q_path_load(sf_dir: str):
    """Landmark path-load centrality (``ops.graph.path_load``, the
    integer member of the Brandes betweenness family): shortest-path
    instances from landmarks c0/c1 passing through each node of the
    cust↔supp co-order graph within 3 hops — forward σ + backward
    path-continuation sweeps over the hop-leveled DAG."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.join import hash_join
    from fastie_ray.ops.graph import path_load

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"],
        right_cols=["o_orderkey", "o_custkey"],
    )
    edges = dedup_exact(
        j.map_batches(
            lambda df: pd.DataFrame(
                {"src": "c" + df["o_custkey"].astype(str),
                 "dst": "s" + df["l_suppkey"].astype(str)}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        ["src", "dst"], n_buckets=16,
    )
    return path_load(edges, ["c0", "c1"], max_hops=3, n_buckets=16)


def _q_betweenness(sf_dir: str):
    """Landmark Brandes betweenness (``ops.graph.brandes_betweenness``,
    the normalized member of the path_load family): per-(landmark,
    node) pair-dependency sums Σ_t ⌊1e6·σ_sv·P(v,t)/σ_st⌋ over the
    cust↔supp co-order graph within 3 hops of c0/c1 — forward σ plus a
    backward (node, target) pair-count sweep over the hop-leveled DAG,
    all int64 (per-term floor quantization instead of float δ
    accumulation, so the unrolled SQL oracle matches bit-for-bit)."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.join import hash_join
    from fastie_ray.ops.graph import brandes_betweenness

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"],
        right_cols=["o_orderkey", "o_custkey"],
    )
    edges = dedup_exact(
        j.map_batches(
            lambda df: pd.DataFrame(
                {"src": "c" + df["o_custkey"].astype(str),
                 "dst": "s" + df["l_suppkey"].astype(str)}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        ["src", "dst"], n_buckets=16,
    )
    return brandes_betweenness(edges, ["c0", "c1"], max_hops=3, n_buckets=16)


def _q_zorder_prune(sf_dir: str):
    """Z-order vs row-order zone-map pruning census
    (``ops.layout.zorder_layout``): how many 256-row blocks the rect
    query (part 200-800 × supp 50-250) must scan under each layout —
    the lakehouse OPTIMIZE ZORDER decision, measured."""
    import pandas as pd

    from fastie_ray.ops.layout import zorder_prune_census

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )

    def tie(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["tie"] = df["l_orderkey"] * 8 + df["l_linenumber"]
        return df

    return zorder_prune_census(
        li.map_batches(tie, batch_format="pandas"),
        x_col="l_partkey", y_col="l_suppkey", tie_col="tie",
        query=(200, 800, 50, 250), block_rows=256,
    )


def _q_grouped_gini(sf_dir: str):
    """Exact per-type Gini concentration of event values
    (``ops.stats.grouped_gini``): integer cross-multiplied numerator /
    denominator from the (group, cents)-count table — the whale-vs-
    long-tail inequality census next to HHI."""
    from fastie_ray.ops.stats import grouped_gini

    ev = _read(sf_dir, "events", columns=["event_type", "value"])
    return grouped_gini(ev, "event_type", "value")


def _q_rich_club(sf_dir: str):
    """Rich-club census over the subsampled co-supply graph
    (``ops.graph.rich_club``): per degree threshold k, hub count and
    hub-to-hub edge count — exact φ(k) components."""
    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.pipelines.kg import _bucketed_groupby

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])

    def distinct_os(df):
        return df[df["l_orderkey"] % 20 == 0].drop_duplicates()

    def pairs(g):
        g = g.drop_duplicates()
        m = g.merge(g, on="l_orderkey", suffixes=("_1", "_2"))
        m = m[m["l_suppkey_1"] < m["l_suppkey_2"]]
        out = pd.DataFrame({"a": m["l_suppkey_1"], "b": m["l_suppkey_2"]})
        return out.drop_duplicates()

    per_order = _bucketed_groupby(
        li.map_batches(distinct_os, batch_format="pandas"),
        "l_orderkey", pairs, 16,
    )
    from fastie_ray.ops.graph import rich_club

    edges = dedup_exact(per_order, ["a", "b"], n_buckets=16)
    return rich_club(edges, ks=[2, 4, 8, 16])


def _q_clean_funnel(sf_dir: str):
    """Per-doc cleaning rejection ledger
    (``pipelines.clean.clean_funnel``): first failing stage
    (too_short → repetitive → duplicate → kept) over the corpus with
    the corpus_clean dup plant (every 7th doc re-appears at id+2e6)."""
    import pandas as pd

    from fastie_ray.pipelines.clean import clean_funnel

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant_dups(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] % 7 == 0].copy()
        d["doc_id"] = d["doc_id"] + 2_000_000
        return pd.concat([df, d], ignore_index=True)

    return clean_funnel(
        ds.map_batches(plant_dups, batch_format="pandas"),
        min_chars=150, max_dup_frac_e6=650_000,
    )


def _q_pagerank_resumed(sf_dir: str):
    """Checkpoint/resume correctness as a DRIVER-ORACLED query (the
    north rule's resumability, externally checked): run 3 PageRank
    iterations with per-iteration parquet checkpoints, then a second
    invocation with ``resume=True`` continues from the durable state
    to 6 — integer fixed-point makes the resumed run bit-identical to
    the 6-iteration unrolled oracle."""
    import hashlib as _h
    import shutil

    import pandas as pd

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.graph import pagerank
    from fastie_ray.ops.join import hash_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    j = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey"],
        right_cols=["o_orderkey", "o_custkey"],
    )
    edges = dedup_exact(
        j.map_batches(
            lambda df: pd.DataFrame(
                {"src": "c" + df["o_custkey"].astype(str),
                 "dst": "s" + df["l_suppkey"].astype(str)}
            ).drop_duplicates(),
            batch_format="pandas",
        ),
        ["src", "dst"], n_buckets=16,
    ).materialize()
    ckpt = "/tmp/pr_resume_" + _h.md5(sf_dir.encode()).hexdigest()[:10]
    shutil.rmtree(ckpt, ignore_errors=True)
    # leg 1: 3 iterations, durably checkpointed per iteration
    pagerank(edges, n_iter=3, checkpoint_dir=ckpt).materialize()
    # leg 2: resume from the highest complete checkpoint, run to 6
    return pagerank(edges, n_iter=6, checkpoint_dir=ckpt, resume=True)


def _q_window_dedup(sf_dir: str):
    """Sliding-window streaming dedup (``ops.windows.window_dedup``):
    flag events repeating their (user, type) key within the trailing
    hour — halo/ghost-cell time-bucket exchange, one pass."""
    from fastie_ray.ops.windows import window_dedup

    ev = _read(sf_dir, "events", columns=["event_id", "user_id",
                                          "event_type", "ts"])
    return window_dedup(ev, ["user_id", "event_type"], window_s=3600)


def _q_seq_triples(sf_dir: str):
    """Ordered event-type TRIPLE support (3-item PrefixSpan,
    ``ops.sequence.ordered_triple_support``): keys with some x
    strictly before some y strictly before some z — the middle
    element checked inside the interval, vectorized per key."""
    from fastie_ray.ops.sequence import ordered_triple_support

    ev = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    return ordered_triple_support(ev, "user_id", "event_type", "ts")


def _q_ngram_coverage(sf_dir: str):
    """Eval-slice memorization exposure
    (``ops.decontaminate.eval_ngram_coverage``): per eval doc
    (id%37==0), fraction of its distinct 8-grams present in the
    training side — partial-overlap leakage the doc-level filter
    misses. Both sides corpus-scale: gram-bucketed exchange."""
    from fastie_ray.ops.decontaminate import eval_ngram_coverage

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return eval_ngram_coverage(docs, eval_mod=37, n=8)


def _q_langid_confusion(sf_dir: str):
    """Language-ID confusion matrix (classifier-eval staple): planted
    texts with formula-cycled TRUE labels, every (i//25)%5==0 plant
    deliberately written in the NEXT language so the off-diagonal
    cells are non-empty and formula-predictable; the LangId heuristic
    provably recovers each plant's text language, so the SQL oracle
    reproduces the matrix exactly. Returns (lang_true, lang_pred, n)."""
    import pandas as pd

    from fastie_ray.ops.text_analysis import lang_id

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def plant(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["doc_id"] % 5 == 0].copy()
        ids = d["doc_id"].astype(int)
        true_l = [_PLANT_LANGS[(i // 5) % 5] for i in ids]
        text_l = [
            _PLANT_LANGS[(i // 5 + 1) % 5]
            if (i // 25) % 5 == 0 else _PLANT_LANGS[(i // 5) % 5]
            for i in ids
        ]
        d["text"] = [_plant_lang_text(tl) for tl in text_l]
        d["lang_true"] = true_l
        d["doc_id"] = d["doc_id"] + 1_000_000
        return d[["doc_id", "text", "lang_true"]]

    planted = ds.map_batches(plant, batch_format="pandas").materialize()
    preds = lang_id(planted.select_columns(["doc_id", "text"]))

    from fastie_ray.ops.join import hash_join

    j = hash_join(
        preds, planted.select_columns(["doc_id", "lang_true"]),
        on="doc_id", left_cols=["doc_id", "lang_pred"],
        right_cols=["doc_id", "lang_true"],
    )

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["lang_true", "lang_pred"], as_index=False
        ).size().rename(columns={"size": "n"})

    out = (
        j.map_batches(cells, batch_format="pandas")
        .to_pandas()
        .groupby(["lang_true", "lang_pred"], as_index=False)["n"]
        .sum()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["lang_true", "lang_pred"]).reset_index(
        drop=True
    )


def _q_encoding_census(sf_dir: str):
    """Lightweight-compression advisor over lineitem int columns
    (``ops.layout.encoding_census``, the FastLanes/Parquet encoding
    decision): per 1024-row block, FOR vs RLE vs plain byte estimates
    + per-column winner census."""
    import pandas as pd

    from fastie_ray.ops.layout import encoding_census

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
    )

    def tie(df: pd.DataFrame) -> pd.DataFrame:
        # (orderkey, linenumber) alone is NOT unique in the synthetic
        # lineitem — fold partkey+suppkey in so the canonical order is
        # total (full tuples are distinct)
        df = df.copy()
        df["tie"] = (
            (df["l_orderkey"] * 8 + df["l_linenumber"]) * 32768
            + df["l_partkey"]
        ) * 1024 + df["l_suppkey"]
        return df

    return encoding_census(
        li.map_batches(tie, batch_format="pandas"),
        int_cols=["l_orderkey", "l_partkey", "l_suppkey"],
        tie_col="tie", block_rows=1024,
    )


def _q_join_card_est(sf_dir: str):
    """Optimizer cardinality-estimation audit
    (``ops.stats.join_cardinality_est``): 256-bucket histogram
    estimate of the many-many |orders ⋈ orders| self-join on custkey
    vs the exact size — the skew case planners get wrong."""
    from fastie_ray.ops.stats import join_cardinality_est

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    return join_cardinality_est(orders, orders, "o_custkey", "o_custkey")


def _q_bloom_fpr(sf_dir: str):
    """Measured Bloom false-positive rate (``ops.sketch.bloom_fpr``):
    8192-bit / 3-hash filter over customer keys probed with disjoint
    shifted keys — observed FPR + fill, md5-reproducible."""
    import pandas as pd

    from fastie_ray.ops.sketch import bloom_fpr

    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    probes = cust.map_batches(
        lambda df: pd.DataFrame(
            {"probe": df["c_custkey"] + 10_000_000}
        ),
        batch_format="pandas",
    )
    return bloom_fpr(cust, probes, "c_custkey", "probe",
                     m_bits=8192, k_hashes=3)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "minhash_dups": _q_minhash_dups,
        "dup_clusters": _q_dup_clusters,
        "neardup_incremental": _q_neardup_incremental,
        "simhash_dups": _q_simhash_dups,
        "jaccard_prefix": _q_jaccard_prefix,
        "embed_neardup": _q_embed_neardup,
        "semantic_dedup": _q_semantic_dedup,
        "winnow_prints": _q_winnow,
        "winnow_overlap": _q_winnow_overlap,
        "lsh_knn": _q_lsh_knn,
        "triplet_mining": _q_triplet_mining,
        "ivf_knn": _q_ivf_knn,
        "ann_recall": _q_ann_recall,
        "lang_id": _q_lang_id,
        "quality": _q_quality,
        "quantile_filter": _q_quantile_filter,
        "lm_familiarity": _q_lm_familiarity,
        "ccnet_buckets": _q_ccnet_buckets,
        "passages": _q_passages,
        "table_profile": _q_table_profile,
        "hll_users": _q_hll_users,
        "hll_by_type": _q_hll_by_type,
        "cms_tokens": _q_cms_tokens,
        "bpe_pairs": _q_bpe_pairs,
        "event_transitions": _q_event_transitions,
        "entity_comentions": _q_entity_comentions,
        "lang_heavy_tokens": _q_lang_heavy_tokens,
        "bpe_encode": _q_bpe_encode,
        "bpe_encode_apply": _q_bpe_encode_apply,
        "cdc_state": _q_cdc_state,
        "windowed_delta": _q_windowed_delta,
        "skew_join": _q_skew_join,
        "embed_moments": _q_embed_moments,
        "trend_by_type": _q_trend_by_type,
        "scd2_intervals": _q_scd2_intervals,
        "cohort_retention": _q_cohort_retention,
        "json_stats": _q_json_stats,
        "funnel": _q_funnel,
        "funnel_windowed": _q_funnel_windowed,
        "fingerprints": _q_fingerprints,
        "pii_scrub": _q_pii_scrub,
        "repetition": _q_repetition,
        "decontaminate": _q_decontaminate,
        "dup_spans": _q_dup_spans,
        "pack_docs": _q_pack_docs,
        "dedup_incremental": _q_dedup_incremental,
        "bm25_topk": _q_bm25,
        "pagerank": _q_pagerank,
        "khop_reach": _q_khop_reach,
        "kcore": _q_kcore,
        "lpa_communities": _q_lpa_communities,
        "graph_components": _q_graph_components,
        "embed_quantize": _q_embed_quantize,
        "dsir_select": _q_dsir_select,
        "resample_docs": _q_resample_docs,
        "topic_labels": _q_topic_labels,
        "kcenter": _q_kcenter,
        "perceptron": _q_perceptron,
        "classifier_preds": _q_classifier_preds,
        "infer_batches": _q_infer_batches,
        "entity_salience": _q_entity_salience,
        "kg_violations": _q_kg_violations,
        "kg_paths": _q_kg_paths,
        "source_ttr": _q_source_ttr,
        "bucketed_join": _q_bucketed_join,
        "blocking_pairs": _q_blocking_pairs,
        "er_matches": _q_er_matches,
        "leakage_split": _q_leakage_split,
        "mixture_sample": _q_mixture_sample,
        "grouped_quantiles": _q_grouped_quantiles,
        "corpus_clean": _q_corpus_clean,
        "augment_stats": _q_augment,
        "extraction_f1": _q_extraction_f1,
        "gp_train": _q_gp_train,
        "preference_pairs": _q_preference_pairs,
        "purged_folds": _q_purged_folds,
        "srm_audit": _q_srm_audit,
        "cmeee_stats": _q_cmeee_stats,
        "duee_stats": _q_duee_stats,
        "boilerplate": _q_boilerplate,
        "memorization_attrib": _q_memorization_attrib,
        "media_frames": _q_media_frames,
        "media_neardup": _q_media_neardup,
        "extract_text": _q_extract_text,
        "chunk_stats": _q_chunk_stats,
        "kg_mentions": _q_kg_mentions,
        "kg_triples": _q_kg_triples,
        "kg_triples_npnn": _q_kg_triples_npnn,
        "kg_edges": _q_kg_edges,
        "kg_nodes": _q_kg_nodes,
        "kg_events": _q_kg_events,
        "kg_events_npnn": _q_kg_events_npnn,
        "kg_edge_history": _q_kg_edge_history,
        "kg_contradictions": _q_kg_contradictions,
        "kg_type_signatures": _q_kg_type_signatures,
        "kg_provenance": _q_kg_provenance,
        "kg_degree_profile": _q_kg_degree_profile,
        "rw_corpus": _q_rw_corpus,
        "walk_skipgrams": _q_walk_skipgrams,
        "char_entropy": _q_char_entropy,
        "benford": _q_benford,
        "autocorr": _q_autocorr,
        "priority_sample": _q_priority_sample,
        "nb_lang": _q_nb_lang,
        "modularity": _q_modularity,
        "edge_jaccard": _q_edge_jaccard,
        "mutual_info": _q_mutual_info,
        "assortativity": _q_assortativity,
        "kmv_distinct": _q_kmv_distinct,
        "user_concentration": _q_user_concentration,
        "rake_keyphrases": _q_rake_keyphrases,
        "seq_patterns": _q_seq_patterns,
        "best_stump": _q_best_stump,
        "neighbor_sample": _q_neighbor_sample,
        "cart_tree": _q_cart_tree,
        "token_fertility": _q_token_fertility,
        "nfc_audit": _q_nfc_audit,
        "token_sort_dups": _q_token_sort_dups,
        "conjunctive_search": _q_conjunctive_search,
        "vocab_growth": _q_vocab_growth,
        "token_pmi": _q_token_pmi,
        "content_chunks": _q_content_chunks,
        "mad_outliers": _q_mad_outliers,
        "dict_encode": _q_dict_encode,
        "hll_sliding": _q_hll_sliding,
        "token_budget_select": _q_token_budget_select,
        "source_scorecard": _q_source_scorecard,
        "mirror_overlap": _q_mirror_overlap,
        "quantile_transform": _q_quantile_transform,
        "late_events": _q_late_events,
        "doc_novelty": _q_doc_novelty,
        "cc_incremental": _q_cc_incremental,
        "consistent_shards": _q_consistent_shards,
        "seasonal_baseline": _q_seasonal_baseline,
        "source_minhash": _q_source_minhash,
        "ccnet_lang_buckets": _q_ccnet_lang_buckets,
        "path_load": _q_path_load,
        "betweenness": _q_betweenness,
        "zorder_prune": _q_zorder_prune,
        "grouped_gini": _q_grouped_gini,
        "rich_club": _q_rich_club,
        "clean_funnel": _q_clean_funnel,
        "pagerank_resumed": _q_pagerank_resumed,
        "window_dedup": _q_window_dedup,
        "seq_triples": _q_seq_triples,
        "ngram_coverage": _q_ngram_coverage,
        "langid_confusion": _q_langid_confusion,
        "encoding_census": _q_encoding_census,
        "join_card_est": _q_join_card_est,
        "bloom_fpr": _q_bloom_fpr,
        "uie": _q_uie,
        "lang_counts": _q_lang_counts,
        "token_counts": _q_token_counts,
        "doc_stats": _q_doc_stats,
        "dedup_docs": _q_dedup_docs,
        "fuzzy_dedup_docs": _q_fuzzy_dedup,
        "stratified_sample": _q_stratified_sample,
        "grouped_topk": _q_grouped_topk,
        "kmeans_assign": _q_kmeans_assign,
        "cluster_keywords": _q_cluster_keywords,
        "kmeans_clusters": _q_kmeans_clusters,
        "kmeans_lloyd_assign": _q_kmeans_lloyd_assign,
        "doc_frequency": _q_doc_frequency,
        "tfidf_terms": _q_tfidf_terms,
        "len_quantiles": _q_len_quantiles,
        "knn": _q_knn,
        "bitext_pairs": _q_bitext_pairs,
        "rolling_avg": _q_rolling_avg,
        "interval_overlaps": _q_interval_overlaps,
        "grid_fill": _q_grid_fill,
        "events_by_type": _q_events_by_type,
        "windowed_events": _q_windowed_events,
        "hopping_events": _q_hopping_events,
        "session_stats": _q_session_stats,
        "asof_clicks": _q_asof_clicks,
        "range_clicks": _q_range_clicks,
        "top_users": _q_top_users,
        "q1_lineitem": _q_q1_lineitem,
        "orders_by_segment": _q_orders_by_segment,
        "lineitem_orders": _q_lineitem_orders,
        "cust_no_orders": _q_cust_no_orders,
        "heavy_tokens": _q_heavy_tokens,
        "doc_ranks": _q_doc_ranks,
        "url_dedup": _q_url_dedup,
        "corpus_diff": _q_corpus_diff,
        "cooc_pairs": _q_cooc_pairs,
        "host_links": _q_host_links,
        "anchor_texts": _q_anchor_texts,
        "zorder_layout": _q_zorder_layout,
        "q3_topk": _q_q3_topk,
        "region_revenue": _q_region_revenue,
        "evolved_read": _q_evolved_read,
        "kg_walks": _q_kg_walks,
        "shuffle_shards": _q_shuffle_shards,
        "bottomk_sample": _q_bottomk_sample,
        "grouped_sample": _q_grouped_sample,
        "pq_codes": _q_pq_codes,
        "golden_records": _q_golden_records,
        "dp_lang_counts": _q_dp_lang_counts,
        "winsorized_stats": _q_winsorized_stats,
        "asof_state": _q_asof_state,
        "psi_drift": _q_psi_drift,
        "host_cocitation": _q_host_cocitation,
        "uncertain_docs": _q_uncertain_docs,
        "readability": _q_readability,
        "lang_ranks": _q_lang_ranks,
        "value_mad": _q_value_mad,
        "dedup_keep_best": _q_dedup_keep_best,
        "kg_edge_spans": _q_kg_edge_spans,
        "weighted_salience": _q_weighted_salience,
        "split_leakage": _q_split_leakage,
        "related_entities": _q_related_entities,
        "hll_overlap": _q_hll_overlap,
        "entity_types": _q_entity_types,
        "curriculum": _q_curriculum,
        "burst_windows": _q_burst_windows,
        "kg_degrees": _q_kg_degrees,
        "kg_reciprocity": _q_kg_reciprocity,
        "user_activity": _q_user_activity,
        "kg_negatives": _q_kg_negatives,
        "mention_contexts": _q_mention_contexts,
        "triangles": _q_triangles,
        "sales_cube": _q_sales_cube,
        "value_moments": _q_value_moments,
        "window_uniques": _q_window_uniques,
        "kg_edges_delta": _q_kg_edges_delta,
        "clean_pack": _q_clean_pack,
        "line_dedup": _q_line_dedup,
        "hits": _q_hits,
        "assoc_rules": _q_assoc_rules,
        "event_pivot": _q_event_pivot,
        "stream_join": _q_stream_join,
        "vocab_build": _q_vocab_build,
        "scc": _q_scc,
        "running_total": _q_running_total,
        "decayed_counts": _q_decayed_counts,
        "source_overlap": _q_source_overlap,
        "mis": _q_mis,
        "dq_checks": _q_dq_checks,
        "ivm_join": _q_ivm_join,
        "csv_read": _q_csv_read,
        "dag_levels": _q_dag_levels,
        "kanon_audit": _q_kanon_audit,
        "trigram_search": _q_trigram_search,
        "auc": _q_auc,
        "calibration": _q_calibration,
        "skew_report": _q_skew_report,
        "rrf": _q_rrf,
        "sorted_export": _q_sorted_export,
        "clustering_coeff": _q_clustering_coeff,
        "coverage_picks": _q_coverage_picks,
        "price_quantiles": _q_price_quantiles,
        "weighted_median": _q_weighted_median,
        "skyline": _q_skyline,
        "kmv_overlap": _q_kmv_overlap,
        "ks_drift": _q_ks_drift,
        "fd_check": _q_fd_check,
        "sssp": _q_sssp,
        "spatial_pairs": _q_spatial_pairs,
        "join_cardinality": _q_join_cardinality,
        "ldiv_audit": _q_ldiv_audit,
        "prop_sample": _q_prop_sample,
        "abandoned_clicks": _q_abandoned_clicks,
        "term_drift": _q_term_drift,
        "markov_eval": _q_markov_eval,
        "conformal": _q_conformal,
        "perm_test": _q_perm_test,
        "bootstrap_ci": _q_bootstrap_ci,
        "grouped_perm_test": _q_grouped_perm_test,
        "grouped_calibration": _q_grouped_calibration,
        "kfold_folds": _q_kfold_folds,
        "balanced_sample": _q_balanced_sample,
        "matching": _q_matching,
        "grouped_ks": _q_grouped_ks,
        "grouped_open_quantiles": _q_grouped_open_quantiles,
        "range_lookup": _q_range_lookup,
        "ktruss": _q_ktruss,
        "link_pred": _q_link_pred,
        "ra_links": _q_ra_links,
        "anf_reach": _q_anf_reach,
        "tc_ancestors": _q_tc_ancestors,
        "ed1_pairs": _q_ed1_pairs,
        "containment": _q_containment,
        "temporal_reach": _q_temporal_reach,
        "grouped_auc": _q_grouped_auc,
        "interval_union": _q_interval_union,
        "trending": _q_trending,
        "top_paths": _q_top_paths,
        "hopping_uniques": _q_hopping_uniques,
        "cuped": _q_cuped,
        "landmarks": _q_landmarks,
        "trailing_spend": _q_trailing_spend,
        "theil_sen": _q_theil_sen,
        "new_vs_returning": _q_new_vs_returning,
        "id_gaps": _q_id_gaps,
        "first_touch": _q_first_touch,
        "uptime_totals": _q_uptime_totals,
        "rfm_segments": _q_rfm_segments,
        "weighted_matching": _q_weighted_matching,
        "percolate": _q_percolate,
        "itemsets3": _q_itemsets3,
        "analyze_hist": _q_analyze_hist,
        "densest": _q_densest,
        "triad_census": _q_triad_census,
        "butterflies": _q_butterflies,
        "bot_scores": _q_bot_scores,
        "ed1_lookup": _q_ed1_lookup,
        "top_reach": _q_top_reach,
        "grouped_weighted_median": _q_grouped_weighted_median,
        "noisy_labels": _q_noisy_labels,
        "landing_exit": _q_landing_exit,
        "conversion_daily": _q_conversion_daily,
        "grouped_psi": _q_grouped_psi,
        "rank_sum_drift": _q_rank_sum_drift,
        "target_encode": _q_target_encode,
        "hashed_features": _q_hashed_features,
        "script_mix": _q_script_mix,
    }


# ----------------------------------------------------------------- oracles


_CLEAN_CTES = r"""
            WITH raw AS (SELECT doc_id, text FROM documents),
            planted AS (
                SELECT doc_id, text FROM raw
                UNION ALL
                SELECT doc_id + 2000000 AS doc_id, text FROM raw WHERE doc_id % 7 = 0),
            red AS (
                SELECT doc_id,
                       regexp_replace(regexp_replace(regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                           '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS text
                FROM planted),
            tok AS (
                SELECT doc_id, text,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
                FROM red),
            sig AS (
                SELECT doc_id, text, toks, len(toks) AS n_tokens,
                       len(list_distinct(toks)) AS n_distinct,
                       CASE WHEN len(toks) > 1
                            THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                            ELSE CAST([] AS VARCHAR[]) END AS bigrams
                FROM tok),
            top AS (
                SELECT doc_id, max(c) AS top_c
                FROM (SELECT doc_id, g, count(*) AS c
                      FROM (SELECT doc_id, unnest(bigrams) AS g FROM sig)
                      GROUP BY doc_id, g)
                GROUP BY doc_id),
            filt AS (
                SELECT s.doc_id, s.text, s.toks, s.n_tokens
                FROM sig s LEFT JOIN top USING (doc_id)
                WHERE s.n_tokens >= 20
                  AND (s.n_tokens - s.n_distinct) * 1000000 // greatest(s.n_tokens, 1) < 650000
                  AND coalesce(top.top_c, 0) * 1000000 // greatest(s.n_tokens - 1, 1) < 100000),
            testg AS (
                SELECT DISTINCT gram FROM (
                    SELECT unnest(CASE WHEN len(toks) >= 8
                                       THEN list_transform(range(1, len(toks) - 6),
                                                           i -> array_to_string(toks[i:i+7], ' '))
                                       ELSE CAST([] AS VARCHAR[]) END) AS gram
                    FROM tok WHERE doc_id % 37 = 0 AND doc_id < 2000000)),
            docg AS (
                SELECT doc_id, unnest(CASE WHEN n_tokens >= 8
                                           THEN list_transform(range(1, n_tokens - 6),
                                                               i -> array_to_string(toks[i:i+7], ' '))
                                           ELSE CAST([] AS VARCHAR[]) END) AS gram
                FROM filt),
            contam AS (SELECT DISTINCT d.doc_id FROM docg d JOIN testg USING (gram)),
            clean AS (SELECT * FROM filt WHERE doc_id NOT IN (SELECT doc_id FROM contam))
"""



def _rake_sql() -> str:
    from fastie_ray.ops.keyphrases import rake_stopword_values_sql

    return f"""
        WITH stop(w) AS (VALUES {rake_stopword_values_sql()}),
        tok AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS token,
                   generate_subscripts(
                       regexp_extract_all(lower(text), '[a-z0-9]+'), 1)
                       AS ord
            FROM documents),
        runs AS (
            SELECT doc_id, token, ord,
                   ord - row_number() OVER (PARTITION BY doc_id
                       ORDER BY ord) AS grp
            FROM tok WHERE token NOT IN (SELECT w FROM stop)),
        phr AS (
            SELECT doc_id, grp,
                   string_agg(token, ' ' ORDER BY ord) AS phrase,
                   count(*) AS n_words
            FROM runs GROUP BY 1, 2),
        wstat AS (
            SELECT token AS word, count(*) AS freq, SUM(n_words) AS deg
            FROM runs JOIN phr USING (doc_id, grp) GROUP BY 1),
        wscore AS (SELECT word, deg * 1000000 // freq AS score_e6
                   FROM wstat),
        pcount AS (SELECT phrase, n_words, count(*) AS n
                   FROM phr GROUP BY 1, 2),
        pwords AS (SELECT phrase,
                          unnest(list_distinct(string_split(phrase, ' ')))
                              AS word
                   FROM (SELECT DISTINCT phrase FROM phr)),
        pscore AS (SELECT p.phrase, SUM(w.score_e6) AS score_e6
                   FROM pwords p JOIN wscore w USING (word) GROUP BY 1)
        SELECT pc.phrase, CAST(pc.n AS BIGINT) AS n,
               CAST(pc.n_words AS BIGINT) AS n_words,
               CAST(ps.score_e6 AS BIGINT) AS score_e6
        FROM pcount pc JOIN pscore ps USING (phrase)
        ORDER BY score_e6 DESC, phrase LIMIT 50
    """


_RAKE_SQL = _rake_sql()


def oracle_sql() -> dict[str, str]:
    from fastie_ray.ops.urlnorm import canonical_url_sql as _canon_url_sql
    from fastie_ray.sources.pages import URL_SQL, facts_cte

    w = _world()
    FACTS = facts_cte(w)
    NF = len(w.facts)
    URL = URL_SQL
    PTXT = "d.text || repeat(' ', (510 - (length(d.text) % 510)) % 510) || f.sentence"
    BASE = "CAST(ceil(length(d.text) / 510.0) * 510 AS INTEGER)"
    JOIN = f"FROM documents d JOIN facts f ON f.i = d.doc_id % {NF}"

    # entity id per fact endpoint: needed for edges/nodes oracles
    eid_rows = ", ".join(
        f"({i}, '{f.subj.entity_id}', '{f.obj.entity_id}')"
        for i, f in enumerate(w.facts)
    )
    EIDS = f"eids(i, sub_eid, obj_eid) AS (VALUES {eid_rows})"

    BPE_MLIST = (
        "[" + ", ".join(f"'{a} {b}'" for a, b in _BPE_FROZEN_MERGES) + "]"
    )

    TOKS = "regexp_split_to_array(trim(text), '\\s+')"
    TRI = (
        "list_distinct(list_transform(range(1, len(toks) - 1), "
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
    )

    return {
        "rake_keyphrases": _RAKE_SQL,
        "seq_patterns": r"""
            WITH pt AS (SELECT user_id AS k, event_type AS t,
                               min(ts) AS mn, max(ts) AS mx
                        FROM events GROUP BY 1,2)
            SELECT a.t AS first_type, b.t AS then_type,
                   CAST(count(*) AS BIGINT) AS n_keys
            FROM pt a JOIN pt b ON a.k = b.k AND a.mn < b.mx
            GROUP BY 1,2
        """,
        "cart_tree": r"""
            WITH base AS MATERIALIZED (
                SELECT n_chars,
                       length(text) - length(replace(text, ' ', ''))
                           AS n_spaces,
                       CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                FROM documents),
            l0 AS (SELECT 'n_chars' AS feature, n_chars AS v, y FROM base
                   UNION ALL SELECT 'n_spaces', n_spaces, y FROM base),
            h0 AS (SELECT feature, v, SUM(y) AS n1, count(*) - SUM(y) AS n0
                   FROM l0 GROUP BY 1, 2),
            c0 AS (SELECT feature, v,
                          SUM(n1) OVER (PARTITION BY feature ORDER BY v)
                              AS l1,
                          SUM(n0) OVER (PARTITION BY feature ORDER BY v)
                              AS l0_,
                          SUM(n1) OVER (PARTITION BY feature) AS t1,
                          SUM(n0) OVER (PARTITION BY feature) AS t0,
                          count(*) OVER (PARTITION BY feature) AS ndist
                   FROM h0),
            s0 AS (SELECT *, l0_ + (t1 - l1) AS err_a,
                          l1 + (t0 - l0_) AS err_b,
                          least(l0_ + (t1 - l1), l1 + (t0 - l0_)) AS err
                   FROM c0 WHERE ndist >= 2),
            b0 AS MATERIALIZED (SELECT * FROM s0
                   ORDER BY err, feature, v LIMIT 1),
            a1 AS MATERIALIZED (
                SELECT base.*,
                       CASE WHEN (CASE WHEN b0.feature = 'n_chars'
                                  THEN base.n_chars
                                  ELSE base.n_spaces END) <= b0.v
                       THEN 'L' ELSE 'R' END AS node
                FROM base, b0),
            lL AS (SELECT 'n_chars' AS feature, n_chars AS v, y
                       FROM a1 WHERE node = 'L'
                       UNION ALL
                       SELECT 'n_spaces', n_spaces, y
                       FROM a1 WHERE node = 'L'),
            hL AS (SELECT feature, v, SUM(y) AS n1,
                              count(*) - SUM(y) AS n0
                       FROM lL GROUP BY 1, 2),
            cL AS (SELECT feature, v,
                              SUM(n1) OVER (PARTITION BY feature
                                  ORDER BY v) AS l1,
                              SUM(n0) OVER (PARTITION BY feature
                                  ORDER BY v) AS l0_,
                              SUM(n1) OVER (PARTITION BY feature) AS t1,
                              SUM(n0) OVER (PARTITION BY feature) AS t0,
                              count(*) OVER (PARTITION BY feature) AS ndist
                       FROM hL),
            sL AS (SELECT *, l0_ + (t1 - l1) AS err_a,
                              l1 + (t0 - l0_) AS err_b,
                              least(l0_ + (t1 - l1), l1 + (t0 - l0_)) AS err
                       FROM cL WHERE ndist >= 2),
            bL AS MATERIALIZED (SELECT * FROM sL
                       ORDER BY err, feature, v LIMIT 1),
            lR AS (SELECT 'n_chars' AS feature, n_chars AS v, y
                       FROM a1 WHERE node = 'R'
                       UNION ALL
                       SELECT 'n_spaces', n_spaces, y
                       FROM a1 WHERE node = 'R'),
            hR AS (SELECT feature, v, SUM(y) AS n1,
                              count(*) - SUM(y) AS n0
                       FROM lR GROUP BY 1, 2),
            cR AS (SELECT feature, v,
                              SUM(n1) OVER (PARTITION BY feature
                                  ORDER BY v) AS l1,
                              SUM(n0) OVER (PARTITION BY feature
                                  ORDER BY v) AS l0_,
                              SUM(n1) OVER (PARTITION BY feature) AS t1,
                              SUM(n0) OVER (PARTITION BY feature) AS t0,
                              count(*) OVER (PARTITION BY feature) AS ndist
                       FROM hR),
            sR AS (SELECT *, l0_ + (t1 - l1) AS err_a,
                              l1 + (t0 - l0_) AS err_b,
                              least(l0_ + (t1 - l1), l1 + (t0 - l0_)) AS err
                       FROM cR WHERE ndist >= 2),
            bR AS MATERIALIZED (SELECT * FROM sR
                       ORDER BY err, feature, v LIMIT 1)
            SELECT '' AS node, feature, CAST(v AS BIGINT) AS threshold,
                   CASE WHEN err_a <= err_b THEN 'le_pos' ELSE 'le_neg' END
                       AS polarity,
                   CAST(err AS BIGINT) AS err,
                   CAST(t1 + t0 AS BIGINT) AS n_node,
                   CAST(l1 + l0_ AS BIGINT) AS n_left
            FROM b0
            UNION ALL
            SELECT 'L', feature, CAST(v AS BIGINT),
                   CASE WHEN err_a <= err_b THEN 'le_pos' ELSE 'le_neg' END,
                   CAST(err AS BIGINT), CAST(t1 + t0 AS BIGINT),
                   CAST(l1 + l0_ AS BIGINT)
            FROM bL
            UNION ALL
            SELECT 'R', feature, CAST(v AS BIGINT),
                   CASE WHEN err_a <= err_b THEN 'le_pos' ELSE 'le_neg' END,
                   CAST(err AS BIGINT), CAST(t1 + t0 AS BIGINT),
                   CAST(l1 + l0_ AS BIGINT)
            FROM bR
        """,
        "best_stump": r"""
            WITH f0 AS (SELECT n_chars,
                               length(text) - length(replace(text, ' ', ''))
                                   AS n_spaces,
                               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                        FROM documents),
            lng AS (SELECT 'n_chars' AS feature, n_chars AS v, y FROM f0
                    UNION ALL SELECT 'n_spaces', n_spaces, y FROM f0),
            hist AS (SELECT feature, v, SUM(y) AS n1, count(*) - SUM(y) AS n0
                     FROM lng GROUP BY 1, 2),
            cum AS (SELECT feature, v,
                           SUM(n1) OVER (PARTITION BY feature ORDER BY v)
                               AS l1,
                           SUM(n0) OVER (PARTITION BY feature ORDER BY v)
                               AS l0,
                           SUM(n1) OVER (PARTITION BY feature) AS t1,
                           SUM(n0) OVER (PARTITION BY feature) AS t0
                    FROM hist),
            sc AS (SELECT feature, v, l1, l0, t1, t0,
                          l0 + (t1 - l1) AS err_a,
                          l1 + (t0 - l0) AS err_b,
                          least(l0 + (t1 - l1), l1 + (t0 - l0)) AS err
                   FROM cum),
            best AS (SELECT *, row_number() OVER (PARTITION BY feature
                                ORDER BY err, v) AS rn
                     FROM sc)
            SELECT feature, CAST(v AS BIGINT) AS threshold,
                   CASE WHEN err_a <= err_b THEN 'le_pos' ELSE 'le_neg' END
                       AS polarity,
                   CAST(err AS BIGINT) AS err,
                   CAST(l1 + l0 AS BIGINT) AS n_left,
                   CAST(t1 + t0 AS BIGINT) AS n_total
            FROM best WHERE rn = 1
        """,
        "neighbor_sample": r"""
            WITH lo AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                        WHERE l_orderkey % 20 = 0),
            e AS (SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
                  FROM lo a JOIN lo b ON a.l_orderkey = b.l_orderkey
                  AND a.l_suppkey < b.l_suppkey),
            und AS (SELECT a AS node, b AS nbr, a AS ea, b AS eb FROM e
                    UNION ALL SELECT b, a, a, b FROM e),
            h AS (SELECT node, nbr,
                         CAST(('0x' || substr(md5('nbrs:'
                             || CAST(ea AS VARCHAR) || '|'
                             || CAST(eb AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                  FROM und),
            r AS (SELECT node, nbr,
                         row_number() OVER (PARTITION BY node
                             ORDER BY h, nbr) AS rnk
                  FROM h)
            SELECT node, nbr, CAST(rnk AS BIGINT) AS rnk
            FROM r WHERE rnk <= 8
        """,
        "token_fertility": r"""
            SELECT lang AS "group",
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(regexp_extract_all(text, '[A-Za-z0-9]+')))
                        AS BIGINT) AS n_tokens,
                   CAST(SUM(length(text)) AS BIGINT) AS n_chars,
                   CAST((SUM(length(text)) * 1000)
                        // GREATEST(SUM(len(regexp_extract_all(
                               text, '[A-Za-z0-9]+'))), 1)
                        AS BIGINT) AS chars_per_token_e3
            FROM documents GROUP BY 1
        """,
        "nfc_audit": r"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(nfc_normalize(text)) AS BIGINT) AS n_nfc,
                   CAST(CASE WHEN text = nfc_normalize(text)
                        THEN 1 ELSE 0 END AS BIGINT) AS is_nfc
            FROM documents
        """,
        "token_sort_dups": r"""
            WITH fp AS (SELECT doc_id,
                               md5(array_to_string(list_sort(list_distinct(
                                   regexp_extract_all(lower(text),
                                       '[a-z0-9]+'))), ' ')) AS fingerprint
                        FROM documents),
            g AS (SELECT doc_id, fingerprint,
                         count(*) OVER (PARTITION BY fingerprint) AS n_group
                  FROM fp)
            SELECT doc_id, fingerprint, CAST(n_group AS BIGINT) AS n_group
            FROM g WHERE n_group >= 2
        """,
        "conjunctive_search": r"""
            SELECT doc_id, CAST(3 AS BIGINT) AS n_terms_matched
            FROM documents
            WHERE regexp_matches(lower(text),
                      '(^|[^a-z0-9])merge([^a-z0-9]|$)')
              AND regexp_matches(lower(text),
                      '(^|[^a-z0-9])vector([^a-z0-9]|$)')
              AND regexp_matches(lower(text),
                      '(^|[^a-z0-9])stream([^a-z0-9]|$)')
        """,
        "vocab_growth": r"""
            WITH arrs AS (SELECT doc_id,
                                 regexp_extract_all(lower(text),
                                     '[a-z0-9]+') AS a
                          FROM documents),
            toks AS (SELECT doc_id,
                            unnest(list_transform(range(1, len(a)),
                                i -> a[i] || ' ' || a[i + 1])) AS token
                     FROM arrs),
            firsts AS (SELECT token, min(doc_id) AS first_doc
                       FROM toks GROUP BY 1),
            w AS (SELECT (max(doc_id) + 20) // 20 AS width FROM documents),
            b AS (SELECT first_doc // w.width AS bucket,
                         count(*) AS new_types
                  FROM firsts, w GROUP BY 1)
            SELECT CAST(b.bucket AS BIGINT) AS bucket,
                   CAST(b.bucket * w.width AS BIGINT) AS doc_lo,
                   CAST(b.new_types AS BIGINT) AS new_types,
                   CAST(SUM(b.new_types) OVER (ORDER BY b.bucket)
                        AS BIGINT) AS cum_types
            FROM b, w
        """,
        "token_pmi": r"""
            WITH toks AS (SELECT DISTINCT doc_id, token
                          FROM (SELECT doc_id,
                                       lower(unnest(regexp_extract_all(
                                           text, '[A-Za-z0-9]+'))) AS token
                                FROM documents)),
            dft AS (SELECT token, count(*) AS df FROM toks GROUP BY 1),
            top AS (SELECT token, df FROM dft
                    ORDER BY df DESC, token LIMIT 40),
            pres AS (SELECT t.doc_id, t.token
                     FROM toks t JOIN top USING (token)),
            prs AS (SELECT a.token AS tok_a, b.token AS tok_b,
                           count(*) AS n_ab
                    FROM pres a JOIN pres b
                        ON a.doc_id = b.doc_id AND a.token < b.token
                    GROUP BY 1, 2),
            tot AS (SELECT count(*) AS N FROM documents)
            SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab,
                   CAST(da.df AS BIGINT) AS n_a,
                   CAST(db.df AS BIGINT) AS n_b,
                   CAST(floor(1e6 * log2(t.N * CAST(n_ab AS DOUBLE)
                        / (CAST(da.df AS DOUBLE) * db.df)))
                        AS BIGINT) AS pmi_e6
            FROM prs JOIN top da ON da.token = tok_a
                     JOIN top db ON db.token = tok_b
            CROSS JOIN tot t
            WHERE n_ab >= 5
        """,
        "content_chunks": r"""
            WITH pos AS (SELECT doc_id, text,
                                unnest(generate_series(1,
                                    greatest(length(text) - 3, 0))) AS i
                         FROM documents),
            bnd AS (SELECT doc_id, text, i + 3 AS e FROM pos
                    WHERE (ascii(substr(text, i, 1)) * 29791
                         + ascii(substr(text, i + 1, 1)) * 961
                         + ascii(substr(text, i + 2, 1)) * 31
                         + ascii(substr(text, i + 3, 1))) % 16 = 0),
            w AS (SELECT doc_id, text, e,
                         lag(e, 1, 0) OVER (PARTITION BY doc_id
                             ORDER BY e) AS pe
                  FROM bnd),
            mid AS (SELECT doc_id, substr(text, pe + 1, e - pe) AS chunk
                    FROM w),
            lastb AS (SELECT doc_id, max(e) AS le FROM bnd GROUP BY 1),
            tails AS (SELECT d.doc_id,
                             substr(d.text, coalesce(l.le, 0) + 1) AS chunk
                      FROM documents d LEFT JOIN lastb l USING (doc_id)
                      WHERE coalesce(l.le, 0) < length(d.text)),
            allc AS (SELECT * FROM mid UNION ALL SELECT * FROM tails)
            SELECT md5(chunk) AS chunk_hash,
                   CAST(length(chunk) AS BIGINT) AS chunk_len,
                   CAST(count(*) AS BIGINT) AS n_occ,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM allc GROUP BY 1, 2 HAVING count(*) >= 2
        """,
        "mad_outliers": r"""
            WITH v AS (SELECT event_id, event_type,
                              CAST(floor(value * 100) AS BIGINT) AS cents
                       FROM events),
            medr AS (SELECT event_type, cents,
                            row_number() OVER (PARTITION BY event_type
                                ORDER BY cents) AS rn,
                            count(*) OVER (PARTITION BY event_type) AS n
                     FROM v),
            med AS (SELECT event_type, cents AS med FROM medr
                    WHERE rn = (n + 1) // 2),
            d AS (SELECT v.event_id, v.event_type, v.cents, m.med,
                         abs(v.cents - m.med) AS dev
                  FROM v JOIN med m USING (event_type)),
            madr AS (SELECT event_type, dev,
                            row_number() OVER (PARTITION BY event_type
                                ORDER BY dev) AS rn,
                            count(*) OVER (PARTITION BY event_type) AS n
                     FROM d),
            mad AS (SELECT event_type, dev AS mad FROM madr
                    WHERE rn = (n + 1) // 2)
            SELECT d.event_id, d.event_type, d.cents, d.med,
                   mad.mad, CAST(d.dev AS BIGINT) AS dev
            FROM d JOIN mad USING (event_type)
            WHERE d.dev > 3 * mad.mad
        """,
        "dict_encode": r"""
            WITH arrs AS (SELECT doc_id,
                                 regexp_extract_all(lower(text),
                                     '[a-z0-9]+') AS a
                          FROM documents),
            toks AS (SELECT doc_id, unnest(a) AS token,
                            unnest(range(1, len(a) + 1)) AS pos
                     FROM arrs),
            vocab AS (SELECT token,
                             row_number() OVER (ORDER BY token) - 1
                                 AS token_id
                      FROM (SELECT DISTINCT token FROM toks))
            SELECT t.doc_id, CAST(t.pos AS BIGINT) AS pos,
                   CAST(v.token_id AS BIGINT) AS token_id
            FROM toks t JOIN vocab v USING (token)
        """,
        "hll_sliding": r"""
            WITH ud AS (SELECT DISTINCT
                            CAST(datediff('day', DATE '1970-01-01',
                                 CAST(ts AS DATE)) AS BIGINT) AS day,
                            CAST(user_id AS VARCHAR) AS s
                        FROM events WHERE user_id IS NOT NULL),
            h AS (SELECT day, CAST(('0x' || substr(md5(s), 1, 15))
                             AS BIGINT) AS x
                  FROM ud),
            r AS (SELECT day, x % 256 AS register, x // 256 AS rest FROM h),
            q AS (SELECT day, register,
                         CASE WHEN rest = 0 THEN 61
                              ELSE bit_count((rest & -rest) - 1) + 1
                         END AS rho
                  FROM r),
            d AS (SELECT day, register, max(rho) AS mr FROM q GROUP BY 1, 2),
            days AS (SELECT DISTINCT day FROM d)
            SELECT days.day, CAST(d.register AS BIGINT) AS register,
                   CAST(max(d.mr) AS BIGINT) AS max_rho
            FROM days JOIN d ON d.day BETWEEN days.day - 6 AND days.day
            GROUP BY 1, 2
        """,
        "token_budget_select": r"""
            WITH t AS (SELECT doc_id, source,
                              CAST(len(regexp_extract_all(text,
                                   '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens,
                              md5('sel:' || CAST(doc_id AS VARCHAR)) AS rk
                       FROM documents),
            c AS (SELECT doc_id, source, n_tokens,
                         SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY rk, doc_id) AS cum
                  FROM t)
            SELECT doc_id, source, n_tokens, CAST(cum AS BIGINT)
                       AS cum_tokens
            FROM c WHERE cum <= 800
        """,
        "source_scorecard": r"""
            WITH base AS (SELECT source, count(*) AS n_docs,
                                 SUM(length(text)) AS sum_chars,
                                 count(DISTINCT lang) AS n_langs
                          FROM documents GROUP BY 1),
            m AS (SELECT md5(text) AS h, source, count(*) AS n
                  FROM documents GROUP BY 1, 2),
            t AS (SELECT h, SUM(n) AS tot FROM m GROUP BY 1),
            d AS (SELECT m.source, SUM(m.n) AS n_dup_docs
                  FROM m JOIN t USING (h)
                  WHERE t.tot >= 2 GROUP BY 1)
            SELECT b.source, CAST(b.n_docs AS BIGINT) AS n_docs,
                   CAST(coalesce(d.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
                   CAST(b.sum_chars AS BIGINT) AS sum_chars,
                   CAST(b.sum_chars // b.n_docs AS BIGINT) AS mean_chars,
                   CAST(b.n_langs AS BIGINT) AS n_langs
            FROM base b LEFT JOIN d USING (source)
        """,
        "mirror_overlap": r"""
            WITH m AS (SELECT DISTINCT
                           md5(array_to_string(list_sort(list_distinct(
                               regexp_extract_all(lower(text),
                                   '[a-z0-9]+'))), ' ')) AS h,
                           source
                       FROM documents)
            SELECT a.source AS src_a, b.source AS src_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM m a JOIN m b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2
        """,
        "quantile_transform": r"""
            WITH v AS (SELECT event_id, event_type,
                              CAST(floor(value * 100) AS BIGINT) AS cents
                       FROM events),
            c AS (SELECT event_type, cents, count(*) AS n
                  FROM v GROUP BY 1, 2),
            cc AS (SELECT event_type, cents,
                          SUM(n) OVER (PARTITION BY event_type
                              ORDER BY cents) - n AS n_lt,
                          SUM(n) OVER (PARTITION BY event_type) AS n_tot
                   FROM c)
            SELECT v.event_id, v.event_type, v.cents,
                   CAST((cc.n_lt * 1000000) // cc.n_tot AS BIGINT)
                       AS pct_e6
            FROM v JOIN cc USING (event_type, cents)
        """,
        "late_events": r"""
            WITH e AS (SELECT event_type, epoch_us(ts) AS us,
                              CAST(('0x' || substr(md5('ing:'
                                  || CAST(event_id AS VARCHAR)), 1, 15))
                                  AS BIGINT) AS iseq
                       FROM events),
            w AS (SELECT event_type, us,
                         max(us) OVER (ORDER BY iseq
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS prev_max
                  FROM e)
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN prev_max > us THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_late,
                   CAST(coalesce(max(CASE WHEN prev_max > us
                            THEN prev_max - us END), 0) AS BIGINT)
                       AS max_lateness_us
            FROM w GROUP BY 1
        """,
        "doc_novelty": r"""
            WITH arrs AS (SELECT doc_id,
                                 regexp_extract_all(lower(text),
                                     '[a-z0-9]+') AS a
                          FROM documents),
            bg AS (SELECT DISTINCT doc_id,
                          unnest(list_transform(range(1, len(a)),
                              i -> a[i] || ' ' || a[i + 1])) AS b
                   FROM arrs),
            f AS (SELECT b, min(doc_id) AS fd FROM bg GROUP BY 1),
            per AS (SELECT bg.doc_id, count(*) AS n_distinct,
                           SUM(CASE WHEN f.fd = bg.doc_id
                               THEN 1 ELSE 0 END) AS n_novel
                    FROM bg JOIN f USING (b) GROUP BY 1)
            SELECT doc_id, CAST(n_distinct AS BIGINT) AS n_distinct,
                   CAST(n_novel AS BIGINT) AS n_novel,
                   CAST(n_novel * 1000000 // n_distinct AS BIGINT)
                       AS novelty_e6
            FROM per
        """,
        "cc_incremental": r"""
            WITH RECURSIVE pair AS (
                SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            nodes AS (SELECT c AS node FROM pair UNION SELECT s FROM pair),
            sym AS (
                SELECT c AS a, s AS b FROM pair
                UNION ALL
                SELECT s AS a, c AS b FROM pair),
            r(node, comp) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT s.b, r.comp FROM r JOIN sym s ON s.a = r.node)
            SELECT node, MIN(comp) AS component_id FROM r GROUP BY node
        """,
        "consistent_shards": r"""
            WITH docs AS (SELECT doc_id,
                                 CAST(('0x' || substr(md5('doc:'
                                     || CAST(doc_id AS VARCHAR)), 1, 15))
                                     AS BIGINT) AS h
                          FROM documents),
            ra AS (SELECT s, CAST(('0x' || substr(md5('ring:'
                           || CAST(s AS VARCHAR) || ':'
                           || CAST(r AS VARCHAR)), 1, 15)) AS BIGINT) AS p
                   FROM (SELECT unnest(range(0, 8)) AS s),
                        (SELECT unnest(range(0, 8)) AS r)),
            rb AS (SELECT s, CAST(('0x' || substr(md5('ring:'
                           || CAST(s AS VARCHAR) || ':'
                           || CAST(r AS VARCHAR)), 1, 15)) AS BIGINT) AS p
                   FROM (SELECT unnest(range(0, 9)) AS s),
                        (SELECT unnest(range(0, 8)) AS r)),
            ca AS (SELECT d.doc_id, a.s,
                          row_number() OVER (PARTITION BY d.doc_id
                              ORDER BY (a.p >= d.h) DESC, a.p, a.s) AS rn
                   FROM docs d CROSS JOIN ra a),
            aa AS (SELECT doc_id, s AS shard_a FROM ca WHERE rn = 1),
            cb AS (SELECT d.doc_id, b.s,
                          row_number() OVER (PARTITION BY d.doc_id
                              ORDER BY (b.p >= d.h) DESC, b.p, b.s) AS rn
                   FROM docs d CROSS JOIN rb b),
            bb AS (SELECT doc_id, s AS shard_b FROM cb WHERE rn = 1)
            SELECT CAST(aa.shard_a AS BIGINT) AS shard_a,
                   CAST(bb.shard_b AS BIGINT) AS shard_b,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM aa JOIN bb USING (doc_id) GROUP BY 1, 2
        """,
        "seasonal_baseline": r"""
            WITH v AS (SELECT event_type AS g,
                              CAST(datediff('day', DATE '1970-01-01',
                                   CAST(ts AS DATE)) AS BIGINT) AS day,
                              CAST(floor(value * 100) AS BIGINT) AS cents
                       FROM events),
            perday AS (SELECT g, day, count(*) AS n,
                              SUM(cents) AS day_cents
                       FROM v GROUP BY 1, 2),
            d2 AS (SELECT *, (day + 3) % 7 AS dow FROM perday),
            b AS (SELECT g, dow, SUM(n) AS base_n,
                         SUM(day_cents) AS base_cents
                  FROM d2 GROUP BY 1, 2)
            SELECT d2.g AS event_type, d2.day, d2.dow,
                   CAST(d2.n AS BIGINT) AS n,
                   CAST(d2.day_cents AS BIGINT) AS day_cents,
                   CAST(b.base_n AS BIGINT) AS base_n,
                   CAST(b.base_cents AS BIGINT) AS base_cents,
                   CAST(CASE WHEN d2.day_cents * b.base_n
                             > 2 * b.base_cents * d2.n
                        THEN 1 ELSE 0 END AS BIGINT) AS is_high
            FROM d2 JOIN b USING (g, dow)
        """,
        "source_minhash": r"""
            WITH st AS (SELECT DISTINCT source, tok
                        FROM (SELECT source,
                                     unnest(regexp_extract_all(lower(text),
                                         '[a-z0-9]+')) AS tok
                              FROM documents)),
            p AS (SELECT unnest(range(0, 32)) AS perm),
            h AS (SELECT st.source, p.perm,
                         CAST(('0x' || substr(md5('mh:'
                             || CAST(p.perm AS VARCHAR) || ':'
                             || st.tok), 1, 15)) AS BIGINT) AS x
                  FROM st CROSS JOIN p),
            sig AS (SELECT source, perm, min(x) AS mh FROM h GROUP BY 1, 2),
            pairs AS (SELECT a.source AS src_a, b.source AS src_b,
                             SUM(CASE WHEN a.mh = b.mh
                                 THEN 1 ELSE 0 END) AS n_match
                      FROM sig a JOIN sig b
                          ON a.perm = b.perm AND a.source < b.source
                      GROUP BY 1, 2)
            SELECT src_a, src_b, CAST(n_match AS BIGINT) AS n_match,
                   CAST(n_match * 1000000 // 32 AS BIGINT)
                       AS jaccard_est_e6
            FROM pairs
        """,
        "path_load": r"""
            WITH pair AS (
                SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            sym AS (SELECT c AS a, s AS b FROM pair
                    UNION ALL SELECT s, c FROM pair),
            lm AS (SELECT 'c0' AS l UNION ALL SELECT 'c1'),
            d0 AS (SELECT l, l AS node, 0 AS hop FROM lm),
            f1 AS (SELECT DISTINCT d0.l, s.b AS node
                   FROM d0 JOIN sym s ON s.a = d0.node),
            d1 AS (SELECT l, node, 1 AS hop FROM f1
                   WHERE NOT EXISTS (SELECT 1 FROM d0
                       WHERE d0.l = f1.l AND d0.node = f1.node)),
            v1 AS (SELECT * FROM d0 UNION ALL SELECT * FROM d1),
            f2 AS (SELECT DISTINCT d1.l, s.b AS node
                   FROM d1 JOIN sym s ON s.a = d1.node),
            d2 AS (SELECT l, node, 2 AS hop FROM f2
                   WHERE NOT EXISTS (SELECT 1 FROM v1
                       WHERE v1.l = f2.l AND v1.node = f2.node)),
            v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM d2),
            f3 AS (SELECT DISTINCT d2.l, s.b AS node
                   FROM d2 JOIN sym s ON s.a = d2.node),
            d3 AS (SELECT l, node, 3 AS hop FROM f3
                   WHERE NOT EXISTS (SELECT 1 FROM v2
                       WHERE v2.l = f3.l AND v2.node = f3.node)),
            dist AS (SELECT * FROM v2 UNION ALL SELECT * FROM d3),
            dag AS (SELECT du.l, du.node AS u, s.b AS v, du.hop AS hu
                    FROM dist du JOIN sym s ON s.a = du.node
                    JOIN dist dv ON dv.l = du.l AND dv.node = s.b
                        AND dv.hop = du.hop + 1),
            s0 AS (SELECT l, node, CAST(1 AS BIGINT) AS sigma FROM d0),
            s1 AS (SELECT g.l, g.v AS node, SUM(s0.sigma) AS sigma
                   FROM dag g JOIN s0 ON s0.l = g.l AND s0.node = g.u
                   WHERE g.hu = 0 GROUP BY 1, 2),
            s2 AS (SELECT g.l, g.v AS node, SUM(s1.sigma) AS sigma
                   FROM dag g JOIN s1 ON s1.l = g.l AND s1.node = g.u
                   WHERE g.hu = 1 GROUP BY 1, 2),
            s3 AS (SELECT g.l, g.v AS node, SUM(s2.sigma) AS sigma
                   FROM dag g JOIN s2 ON s2.l = g.l AND s2.node = g.u
                   WHERE g.hu = 2 GROUP BY 1, 2),
            sig AS (SELECT * FROM s0 UNION ALL SELECT * FROM s1
                    UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3),
            b2 AS (SELECT l, u AS node, CAST(count(*) AS BIGINT) AS d
                   FROM dag WHERE hu = 2 GROUP BY 1, 2),
            b1 AS (SELECT g.l, g.u AS node,
                          CAST(SUM(1 + coalesce(b2.d, 0)) AS BIGINT) AS d
                   FROM dag g LEFT JOIN b2
                       ON b2.l = g.l AND b2.node = g.v
                   WHERE g.hu = 1 GROUP BY 1, 2),
            b0 AS (SELECT g.l, g.u AS node,
                          CAST(SUM(1 + coalesce(b1.d, 0)) AS BIGINT) AS d
                   FROM dag g LEFT JOIN b1
                       ON b1.l = g.l AND b1.node = g.v
                   WHERE g.hu = 0 GROUP BY 1, 2),
            dd AS (SELECT * FROM b0 UNION ALL SELECT * FROM b1
                   UNION ALL SELECT * FROM b2)
            SELECT sig.node,
                   CAST(SUM(sig.sigma * (1 + coalesce(dd.d, 0)))
                        AS BIGINT) AS path_load
            FROM sig LEFT JOIN dd
                ON dd.l = sig.l AND dd.node = sig.node
            GROUP BY 1
        """,
        "betweenness": r"""
            WITH pair AS (
                SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            sym AS (SELECT c AS a, s AS b FROM pair
                    UNION ALL SELECT s, c FROM pair),
            lm AS (SELECT 'c0' AS l UNION ALL SELECT 'c1'),
            d0 AS (SELECT l, l AS node, 0 AS hop FROM lm),
            f1 AS (SELECT DISTINCT d0.l, s.b AS node
                   FROM d0 JOIN sym s ON s.a = d0.node),
            d1 AS (SELECT l, node, 1 AS hop FROM f1
                   WHERE NOT EXISTS (SELECT 1 FROM d0
                       WHERE d0.l = f1.l AND d0.node = f1.node)),
            v1 AS (SELECT * FROM d0 UNION ALL SELECT * FROM d1),
            f2 AS (SELECT DISTINCT d1.l, s.b AS node
                   FROM d1 JOIN sym s ON s.a = d1.node),
            d2 AS (SELECT l, node, 2 AS hop FROM f2
                   WHERE NOT EXISTS (SELECT 1 FROM v1
                       WHERE v1.l = f2.l AND v1.node = f2.node)),
            v2 AS (SELECT * FROM v1 UNION ALL SELECT * FROM d2),
            f3 AS (SELECT DISTINCT d2.l, s.b AS node
                   FROM d2 JOIN sym s ON s.a = d2.node),
            d3 AS (SELECT l, node, 3 AS hop FROM f3
                   WHERE NOT EXISTS (SELECT 1 FROM v2
                       WHERE v2.l = f3.l AND v2.node = f3.node)),
            dist AS (SELECT * FROM v2 UNION ALL SELECT * FROM d3),
            dag AS MATERIALIZED (
                    SELECT du.l, du.node AS u, s.b AS v, du.hop AS hu
                    FROM dist du JOIN sym s ON s.a = du.node
                    JOIN dist dv ON dv.l = du.l AND dv.node = s.b
                        AND dv.hop = du.hop + 1),
            s0 AS (SELECT l, node, CAST(1 AS BIGINT) AS sigma FROM d0),
            s1 AS (SELECT g.l, g.v AS node, SUM(s0.sigma) AS sigma
                   FROM dag g JOIN s0 ON s0.l = g.l AND s0.node = g.u
                   WHERE g.hu = 0 GROUP BY 1, 2),
            s2 AS (SELECT g.l, g.v AS node, SUM(s1.sigma) AS sigma
                   FROM dag g JOIN s1 ON s1.l = g.l AND s1.node = g.u
                   WHERE g.hu = 1 GROUP BY 1, 2),
            s3 AS (SELECT g.l, g.v AS node, SUM(s2.sigma) AS sigma
                   FROM dag g JOIN s2 ON s2.l = g.l AND s2.node = g.u
                   WHERE g.hu = 2 GROUP BY 1, 2),
            sig AS (SELECT * FROM s0 UNION ALL SELECT * FROM s1
                    UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3),
            p3 AS (SELECT l, node AS u, node AS t,
                          CAST(1 AS BIGINT) AS cnt FROM d3),
            p2 AS (SELECT l, node AS u, node AS t,
                          CAST(1 AS BIGINT) AS cnt FROM d2
                   UNION ALL
                   SELECT g.l, g.u, p.t, CAST(SUM(p.cnt) AS BIGINT)
                   FROM p3 p JOIN dag g
                       ON g.l = p.l AND g.v = p.u AND g.hu = 2
                   GROUP BY 1, 2, 3),
            p1 AS (SELECT l, node AS u, node AS t,
                          CAST(1 AS BIGINT) AS cnt FROM d1
                   UNION ALL
                   SELECT g.l, g.u, p.t, CAST(SUM(p.cnt) AS BIGINT)
                   FROM p2 p JOIN dag g
                       ON g.l = p.l AND g.v = p.u AND g.hu = 1
                   GROUP BY 1, 2, 3),
            p0 AS (SELECT l, node AS u, node AS t,
                          CAST(1 AS BIGINT) AS cnt FROM d0
                   UNION ALL
                   SELECT g.l, g.u, p.t, CAST(SUM(p.cnt) AS BIGINT)
                   FROM p1 p JOIN dag g
                       ON g.l = p.l AND g.v = p.u AND g.hu = 0
                   GROUP BY 1, 2, 3),
            pp AS (SELECT * FROM p0 UNION ALL SELECT * FROM p1
                   UNION ALL SELECT * FROM p2 UNION ALL SELECT * FROM p3)
            SELECT p.l AS landmark, p.u AS node,
                   CAST(SUM((1000000 * su.sigma * p.cnt) // st.sigma)
                        AS BIGINT) AS bc_floor_e6,
                   CAST(count(*) AS BIGINT) AS n_targets
            FROM pp p
            JOIN sig su ON su.l = p.l AND su.node = p.u
            JOIN sig st ON st.l = p.l AND st.node = p.t
            WHERE p.u <> p.t AND p.u <> p.l AND p.t <> p.l
            GROUP BY 1, 2
        """,
        "zorder_prune": r"""
            WITH base AS (SELECT l_orderkey * 8 + l_linenumber AS tie,
                                 l_partkey AS x, l_suppkey AS y
                          FROM lineitem),
            bits AS (SELECT unnest(range(0, 16)) AS i),
            mz AS (SELECT tie, x, y,
                          SUM((((x >> i) & 1) << (2 * i))
                            + (((y >> i) & 1) << (2 * i + 1))) AS m
                   FROM base CROSS JOIN bits GROUP BY tie, x, y),
            rz AS (SELECT x, y,
                          row_number() OVER (ORDER BY m, tie) - 1 AS rk
                   FROM mz),
            bz AS (SELECT rk // 256 AS blk, min(x) AS mnx, max(x) AS mxx,
                          min(y) AS mny, max(y) AS mxy
                   FROM rz GROUP BY 1),
            tz AS (SELECT count(*) AS nb,
                          SUM(CASE WHEN mxx >= 200 AND mnx <= 800
                                    AND mxy >= 50 AND mny <= 250
                              THEN 1 ELSE 0 END) AS nt
                   FROM bz),
            rr AS (SELECT x, y,
                          row_number() OVER (ORDER BY tie) - 1 AS rk
                   FROM mz),
            br AS (SELECT rk // 256 AS blk, min(x) AS mnx, max(x) AS mxx,
                          min(y) AS mny, max(y) AS mxy
                   FROM rr GROUP BY 1),
            tr AS (SELECT count(*) AS nb,
                          SUM(CASE WHEN mxx >= 200 AND mnx <= 800
                                    AND mxy >= 50 AND mny <= 250
                              THEN 1 ELSE 0 END) AS nt
                   FROM br)
            SELECT 'zorder' AS layout, CAST(nb AS BIGINT) AS n_blocks,
                   CAST(nt AS BIGINT) AS n_blocks_touched FROM tz
            UNION ALL
            SELECT 'row', CAST(nb AS BIGINT), CAST(nt AS BIGINT) FROM tr
        """,
        "grouped_gini": r"""
            WITH v AS (SELECT event_type AS g,
                              CAST(floor(value * 100) AS BIGINT) AS cents
                       FROM events),
            r AS (SELECT g, cents,
                         row_number() OVER (PARTITION BY g
                             ORDER BY cents) AS i,
                         count(*) OVER (PARTITION BY g) AS n,
                         SUM(cents) OVER (PARTITION BY g) AS sx
                  FROM v),
            a AS (SELECT g, max(n) AS n, max(sx) AS sx,
                         SUM(i * cents) AS ranksum
                  FROM r GROUP BY 1)
            SELECT g AS event_type, CAST(n AS BIGINT) AS n,
                   CAST(sx AS BIGINT) AS sum_cents,
                   CAST(2 * ranksum - (n + 1) * sx AS BIGINT) AS gini_num,
                   CAST(n * sx AS BIGINT) AS gini_den
            FROM a
        """,
        "rich_club": r"""
            WITH lo AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                        WHERE l_orderkey % 20 = 0),
            e AS (SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
                  FROM lo a JOIN lo b ON a.l_orderkey = b.l_orderkey
                  AND a.l_suppkey < b.l_suppkey),
            und AS (SELECT a AS u, b AS v FROM e
                    UNION ALL SELECT b, a FROM e),
            deg AS (SELECT u AS node, count(*) AS deg FROM und GROUP BY 1),
            j AS (SELECT e.a, e.b, da.deg AS dega, db.deg AS degb
                  FROM e JOIN deg da ON da.node = e.a
                         JOIN deg db ON db.node = e.b),
            ks AS (SELECT unnest([2, 4, 8, 16]) AS k),
            nr AS (SELECT ks.k, count(*) AS n_rich
                   FROM ks JOIN deg ON deg.deg > ks.k GROUP BY 1),
            ne AS (SELECT ks.k, count(*) AS n_rich_edges
                   FROM ks JOIN j ON j.dega > ks.k AND j.degb > ks.k
                   GROUP BY 1)
            SELECT CAST(ks.k AS BIGINT) AS k,
                   CAST(coalesce(nr.n_rich, 0) AS BIGINT) AS n_rich,
                   CAST(coalesce(ne.n_rich_edges, 0) AS BIGINT)
                       AS n_rich_edges,
                   CAST(coalesce(nr.n_rich, 0)
                        * (coalesce(nr.n_rich, 0) - 1) // 2
                        AS BIGINT) AS n_pairs
            FROM ks LEFT JOIN nr ON nr.k = ks.k
                    LEFT JOIN ne ON ne.k = ks.k
        """,
        "pagerank_resumed": _pagerank_sql_over(
            """edges AS (
                SELECT DISTINCT 'c' || o_custkey AS src,
                       's' || l_suppkey AS dst
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
            n_iter=6,
        ),
        "join_card_est": r"""
            WITH pk AS (SELECT CAST(o_custkey AS VARCHAR) AS k,
                               count(*) AS n
                        FROM orders GROUP BY 1),
            b AS (SELECT k, n,
                         CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT)
                             % 256 AS b
                  FROM pk),
            g AS (SELECT b, SUM(n) AS n, count(*) AS d FROM b GROUP BY 1),
            est AS (SELECT CAST(SUM(n * n // d) AS BIGINT) AS est_size
                    FROM g),
            tru AS (SELECT CAST(SUM(n * n) AS BIGINT) AS true_size
                    FROM pk)
            SELECT est.est_size, tru.true_size,
                   CAST(abs(est.est_size - tru.true_size) * 1000000
                        // greatest(tru.true_size, 1) AS BIGINT) AS err_e6
            FROM est, tru
        """,
        "bloom_fpr": r"""
            WITH mem AS (SELECT DISTINCT c_custkey AS v FROM customer),
            ks AS (SELECT unnest(range(0, 3)) AS i),
            pos AS (SELECT DISTINCT
                        (CAST(('0x' || substr(md5('b'
                            || CAST(ks.i AS VARCHAR) || ':'
                            || CAST(mem.v AS VARCHAR)), 1, 15))
                            AS BIGINT) % 8192) AS p
                    FROM mem CROSS JOIN ks),
            pr AS (SELECT c_custkey + 10000000 AS v FROM customer),
            chk AS (SELECT pr.v,
                           SUM(CASE WHEN EXISTS (
                               SELECT 1 FROM pos WHERE pos.p =
                                   CAST(('0x' || substr(md5('b'
                                       || CAST(ks.i AS VARCHAR) || ':'
                                       || CAST(pr.v AS VARCHAR)), 1, 15))
                                       AS BIGINT) % 8192)
                               THEN 1 ELSE 0 END) AS hits
                    FROM pr CROSS JOIN ks
                    GROUP BY 1)
            SELECT CAST(count(*) AS BIGINT) AS n_probes,
                   CAST(SUM(CASE WHEN hits = 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_fp,
                   CAST(SUM(CASE WHEN hits = 3 THEN 1 ELSE 0 END)
                        * 1000000 // count(*) AS BIGINT) AS fpr_e6,
                   (SELECT CAST(count(*) AS BIGINT) FROM pos)
                       AS n_bits_set
            FROM chk
        """,
        "encoding_census": r"""
            WITH t AS (SELECT ((l_orderkey * 8 + l_linenumber) * 32768
                               + l_partkey) * 1024 + l_suppkey AS tie,
                              l_orderkey, l_partkey, l_suppkey
                       FROM lineitem),
            r AS (SELECT *, row_number() OVER (ORDER BY tie) - 1 AS rk
                  FROM t),
            b AS (SELECT *, rk // 1024 AS blk FROM r),
            long AS (SELECT blk, rk, 'l_orderkey' AS col,
                            l_orderkey AS v FROM b
                     UNION ALL
                     SELECT blk, rk, 'l_partkey', l_partkey FROM b
                     UNION ALL
                     SELECT blk, rk, 'l_suppkey', l_suppkey FROM b),
            runs AS (SELECT blk, col, v,
                            lag(v) OVER (PARTITION BY blk, col
                                ORDER BY rk) AS pv
                     FROM long),
            st AS (SELECT blk, col, count(*) AS n,
                          SUM(CASE WHEN pv IS NULL OR v != pv
                              THEN 1 ELSE 0 END) AS n_runs,
                          max(v) - min(v) AS rng
                   FROM runs GROUP BY 1, 2),
            sz AS (SELECT blk, col, 8 * n AS b_plain,
                          (CASE WHEN rng = 0 THEN 0
                                ELSE length(bin(rng)) END * n + 7) // 8
                              + 16 AS b_for,
                          10 * n_runs AS b_rle
                   FROM st),
            w AS (SELECT blk, col,
                         CASE WHEN b_for <= b_plain AND b_for <= b_rle
                              THEN 'for'
                              WHEN b_plain <= b_rle THEN 'plain'
                              ELSE 'rle' END AS best,
                         b_plain, b_for, b_rle
                  FROM sz),
            agg AS (SELECT col, s.scheme,
                           SUM(CASE WHEN w.best = s.scheme
                               THEN 1 ELSE 0 END) AS n_blocks_best,
                           SUM(CASE s.scheme WHEN 'plain' THEN b_plain
                               WHEN 'for' THEN b_for
                               ELSE b_rle END) AS est_bytes
                    FROM w CROSS JOIN (SELECT unnest(
                        ['for', 'plain', 'rle']) AS scheme) s
                    GROUP BY 1, 2)
            SELECT col AS "column", scheme,
                   CAST(n_blocks_best AS BIGINT) AS n_blocks_best,
                   CAST(est_bytes AS BIGINT) AS est_bytes
            FROM agg
        """,
        "langid_confusion": r"""
            WITH p AS (SELECT doc_id,
                              CASE ((doc_id // 5) % 5)
                                  WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                                  WHEN 2 THEN 'fr' WHEN 3 THEN 'es'
                                  ELSE 'zh' END AS lang_true,
                              CASE WHEN (doc_id // 25) % 5 = 0
                                   THEN CASE ((doc_id // 5 + 1) % 5)
                                       WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                                       WHEN 2 THEN 'fr' WHEN 3 THEN 'es'
                                       ELSE 'zh' END
                                   ELSE CASE ((doc_id // 5) % 5)
                                       WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                                       WHEN 2 THEN 'fr' WHEN 3 THEN 'es'
                                       ELSE 'zh' END
                              END AS lang_pred
                       FROM documents WHERE doc_id % 5 = 0)
            SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n
            FROM p GROUP BY 1, 2
        """,
        "ngram_coverage": r"""
            WITH d AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\s+')
                       END AS toks
                FROM documents),
            g AS (
                SELECT doc_id, unnest(
                         CASE WHEN len(toks) >= 8
                              THEN list_transform(range(1, len(toks) - 6),
                                       i -> array_to_string(
                                           toks[i:i+7], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS gram
                FROM d),
            dg AS (SELECT DISTINCT doc_id, gram FROM g),
            corpus AS (SELECT DISTINCT gram FROM dg
                       WHERE doc_id % 37 != 0),
            ev AS (SELECT doc_id, gram FROM dg WHERE doc_id % 37 = 0)
            SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(SUM(CASE WHEN corpus.gram IS NOT NULL
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
                   CAST(SUM(CASE WHEN corpus.gram IS NOT NULL
                            THEN 1 ELSE 0 END) * 1000000 // count(*)
                        AS BIGINT) AS coverage_e6
            FROM ev LEFT JOIN corpus USING (gram)
            GROUP BY 1
        """,
        "seq_triples": r"""
            WITH m AS (SELECT user_id, event_type, min(ts) AS mn,
                              max(ts) AS mx
                       FROM events GROUP BY 1, 2),
            tri AS (SELECT DISTINCT a.user_id, a.event_type AS x,
                           e.event_type AS y, c.event_type AS z
                    FROM m a
                    JOIN events e ON e.user_id = a.user_id
                        AND e.ts > a.mn
                    JOIN m c ON c.user_id = a.user_id AND c.mx > e.ts
                    WHERE a.event_type != e.event_type
                      AND e.event_type != c.event_type
                      AND a.event_type != c.event_type)
            SELECT x AS first_type, y AS mid_type, z AS then_type,
                   CAST(count(*) AS BIGINT) AS n_keys
            FROM tri GROUP BY 1, 2, 3
        """,
        "window_dedup": r"""
            SELECT e.event_id,
                   CAST(CASE WHEN EXISTS (
                        SELECT 1 FROM events p
                        WHERE p.user_id = e.user_id
                          AND p.event_type = e.event_type
                          AND p.ts < e.ts
                          AND p.ts >= e.ts - INTERVAL 1 HOUR)
                   THEN 1 ELSE 0 END AS BIGINT) AS is_dup
            FROM events e
        """,
        "clean_funnel": r"""
            WITH raw AS (SELECT doc_id, text FROM documents
                         UNION ALL
                         SELECT doc_id + 2000000, text FROM documents
                         WHERE doc_id % 7 = 0),
            d AS (SELECT doc_id, text, length(text) AS n_chars,
                         CASE WHEN trim(text) = ''
                              THEN CAST([] AS VARCHAR[])
                              ELSE regexp_split_to_array(trim(text),
                                       '\s+') END AS toks,
                         md5(text) AS h
                  FROM raw),
            f AS (SELECT h, min(doc_id) AS fd FROM d GROUP BY 1),
            v AS (SELECT d.doc_id, d.n_chars,
                         (len(toks) - len(list_distinct(toks))) * 1000000
                             // greatest(len(toks), 1) AS dupf,
                         d.doc_id > f.fd AS isdup
                  FROM d JOIN f USING (h))
            SELECT doc_id,
                   CASE WHEN n_chars < 150 THEN 'too_short'
                        WHEN dupf > 650000 THEN 'repetitive'
                        WHEN isdup THEN 'duplicate'
                        ELSE 'kept' END AS reason
            FROM v
        """,
        "mutual_info": r"""
            WITH cells AS (SELECT lang AS x, source AS y, count(*) AS n_xy
                           FROM documents GROUP BY 1,2),
            mx AS (SELECT x, SUM(n_xy) AS n_x FROM cells GROUP BY 1),
            my AS (SELECT y, SUM(n_xy) AS n_y FROM cells GROUP BY 1),
            tot AS (SELECT SUM(n_xy) AS N FROM cells)
            SELECT c.x, c.y, CAST(c.n_xy AS BIGINT) AS n_xy,
                   CAST(mx.n_x AS BIGINT) AS n_x,
                   CAST(my.n_y AS BIGINT) AS n_y,
                   CAST(floor(1e6 * (CAST(c.n_xy AS DOUBLE)/t.N)
                        * log2(t.N*CAST(c.n_xy AS DOUBLE)
                               /(CAST(mx.n_x AS DOUBLE)*my.n_y))) AS BIGINT)
                       AS mi_term_e6
            FROM cells c JOIN mx USING (x) JOIN my USING (y) CROSS JOIN tot t
        """,
        "assortativity": r"""
            WITH lo AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                        WHERE l_orderkey % 20 = 0),
            e AS (SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
                  FROM lo a JOIN lo b ON a.l_orderkey = b.l_orderkey
                  AND a.l_suppkey < b.l_suppkey),
            und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
            deg AS (SELECT u AS node, count(*) AS deg FROM und GROUP BY 1),
            pairs AS (SELECT dx.deg AS x, dy.deg AS y FROM und
                      JOIN deg dx ON dx.node = und.u
                      JOIN deg dy ON dy.node = und.v)
            SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(x*y) AS BIGINT) AS sum_xy,
                   CAST(SUM(x*x) AS BIGINT) AS sum_x2,
                   CAST(count(*)*SUM(x*y) - SUM(x)*SUM(x) AS BIGINT) AS num,
                   CAST(count(*)*SUM(x*x) - SUM(x)*SUM(x) AS BIGINT) AS den
            FROM pairs
        """,
        "kmv_distinct": r"""
            WITH dv AS (SELECT DISTINCT event_type AS g, user_id AS v
                        FROM events),
            h AS (SELECT DISTINCT g,
                         CAST(('0x' || substr(md5('kmvg:'
                             || CAST(v AS VARCHAR)),1,15)) AS BIGINT) AS h
                  FROM dv),
            r AS (SELECT g, h,
                         row_number() OVER (PARTITION BY g ORDER BY h) AS rn
                  FROM h),
            topk AS (SELECT g, h FROM r WHERE rn <= 64),
            agg AS (SELECT g, count(*) AS n_hashes, max(h) AS kth
                    FROM topk GROUP BY 1)
            SELECT g AS "group", CAST(n_hashes AS BIGINT) AS n_hashes,
                   CAST(coalesce(kth, 0) AS BIGINT) AS kth,
                   CAST(CASE WHEN n_hashes >= 64
                        THEN CAST(63 AS HUGEINT)
                             * (CAST(1 AS HUGEINT) << 60) // kth
                        ELSE n_hashes END AS BIGINT) AS distinct_est
            FROM agg
        """,
        "user_concentration": r"""
            WITH cu AS (SELECT event_type AS g, user_id AS u, count(*) AS n
                        FROM events GROUP BY 1,2),
            r AS (SELECT g, u, n,
                         row_number() OVER (PARTITION BY g
                             ORDER BY n DESC, u) AS rn
                  FROM cu)
            SELECT g AS "group", CAST(SUM(n) AS BIGINT) AS n_total,
                   CAST(count(*) AS BIGINT) AS n_users,
                   CAST(SUM(CASE WHEN rn <= 5 THEN n ELSE 0 END) AS BIGINT)
                       AS n_topk,
                   CAST(SUM(n*n) AS BIGINT) AS sum_sq
            FROM r GROUP BY g
        """,
        "char_entropy": r"""
            WITH ch AS (
                SELECT doc_id, length(text) AS n,
                       unnest(regexp_extract_all(text, '[\s\S]')) AS c
                FROM documents WHERE length(text) > 0),
            hist AS (SELECT doc_id, n, c, count(*) AS cnt FROM ch GROUP BY 1,2,3)
            SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
                   CAST(count(*) AS BIGINT) AS n_distinct,
                   CAST(SUM(CAST(floor(1e6 * (CAST(cnt AS DOUBLE)/n)
                        * log2(CAST(n AS DOUBLE)/cnt)) AS BIGINT)) AS BIGINT)
                       AS entropy_e6
            FROM hist GROUP BY doc_id, n
        """,
        "benford": r"""
            WITH c AS (
                SELECT event_type AS grp,
                       CAST(floor(value*100) AS BIGINT) AS cents
                FROM events WHERE floor(value*100) >= 1),
            d AS (SELECT grp, CAST(substr(CAST(cents AS VARCHAR),1,1) AS BIGINT)
                         AS digit FROM c),
            o AS (SELECT grp, digit, count(*) AS n FROM d GROUP BY 1,2),
            t AS (SELECT grp, SUM(n) AS n_group FROM o GROUP BY 1)
            SELECT o.grp AS "group", o.digit, CAST(o.n AS BIGINT) AS n,
                   CAST(t.n_group AS BIGINT) AS n_group,
                   CAST(floor(1e6
                        * (o.n - t.n_group*log10(1.0+1.0/o.digit))
                        * (o.n - t.n_group*log10(1.0+1.0/o.digit))
                        / (t.n_group*log10(1.0+1.0/o.digit))) AS BIGINT)
                       AS chi_e6
            FROM o JOIN t USING (grp)
        """,
        "autocorr": r"""
            WITH daily AS (
                SELECT event_type AS grp, date_trunc('day', ts) AS day,
                       count(*) AS x
                FROM events GROUP BY 1,2),
            seq AS (SELECT grp, x,
                           row_number() OVER (PARTITION BY grp ORDER BY day)
                               AS rn
                    FROM daily),
            lags AS (SELECT unnest([1,2,3]) AS lag),
            pairs AS (
                SELECT a.grp, l.lag, a.x AS xa, b.x AS xb
                FROM seq a JOIN lags l ON true
                JOIN seq b ON b.grp = a.grp AND b.rn = a.rn + l.lag)
            SELECT grp AS "group", CAST(lag AS BIGINT) AS lag,
                   CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(count(*)*SUM(xa*xb) - SUM(xa)*SUM(xb) AS BIGINT) AS num,
                   CAST(count(*)*SUM(xa*xa) - SUM(xa)*SUM(xa) AS BIGINT) AS den_a,
                   CAST(count(*)*SUM(xb*xb) - SUM(xb)*SUM(xb) AS BIGINT) AS den_b
            FROM pairs GROUP BY 1,2 HAVING count(*) >= 2
        """,
        "priority_sample": r"""
            WITH w AS (SELECT doc_id, n_chars // 100 + 1 AS w FROM documents),
            p AS (SELECT doc_id, CAST(w AS BIGINT) AS w,
                         CAST(('0x' || substr(md5('psample:'
                             || CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) // w
                             AS prio
                  FROM w)
            SELECT doc_id, w, prio FROM p ORDER BY prio, doc_id LIMIT 50
        """,
        "nb_lang": r"""
            WITH train AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
            test AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
            ttok AS (SELECT lang, unnest(regexp_extract_all(lower(text),
                            '[a-z0-9]+')) AS token FROM train),
            cnt AS (SELECT lang, token, count(*) AS c FROM ttok GROUP BY 1,2),
            nl AS (SELECT lang, SUM(c) AS n_l FROM cnt GROUP BY 1),
            dl AS (SELECT lang, count(*) AS d_l FROM train GROUP BY 1),
            stats AS (SELECT (SELECT count(*) FROM train) AS D,
                             (SELECT count(DISTINCT token) FROM ttok) AS V),
            stok AS (SELECT doc_id, lang AS true_lang,
                            unnest(regexp_extract_all(lower(text),
                                '[a-z0-9]+')) AS token FROM test),
            stf AS (SELECT doc_id, true_lang, token, count(*) AS tf
                    FROM stok GROUP BY 1,2,3),
            langs AS (SELECT lang, n_l, d_l FROM nl JOIN dl USING (lang)),
            terms AS (
                SELECT s.doc_id, s.true_lang, l.lang,
                       SUM(s.tf * CAST(floor(1e6*ln((coalesce(c.c,0)+1.0)
                           /(l.n_l+st.V))) AS BIGINT)) AS tok_score
                FROM stf s CROSS JOIN langs l CROSS JOIN stats st
                LEFT JOIN cnt c ON c.lang = l.lang AND c.token = s.token
                GROUP BY 1,2,3),
            scored AS (
                SELECT t.doc_id, t.true_lang, t.lang,
                       t.tok_score + CAST(floor(1e6*ln(CAST(l.d_l AS DOUBLE)
                           /st.D)) AS BIGINT) AS score
                FROM terms t JOIN langs l ON l.lang = t.lang
                CROSS JOIN stats st),
            ranked AS (
                SELECT doc_id, true_lang, lang, score,
                       row_number() OVER (PARTITION BY doc_id
                           ORDER BY score DESC, lang) AS rnk
                FROM scored)
            SELECT doc_id, lang AS pred, CAST(score AS BIGINT) AS score_e6,
                   CAST(CASE WHEN lang = true_lang THEN 1 ELSE 0 END AS BIGINT)
                       AS is_true
            FROM ranked WHERE rnk = 1
        """,
        "modularity": r"""
            WITH e AS (SELECT DISTINCT
                           'c' || CAST(o_custkey AS VARCHAR) AS a,
                           's' || CAST(l_suppkey AS VARCHAR) AS b
                       FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            lab AS (SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node,
                           'n' || CAST(c_nationkey AS VARCHAR) AS label
                    FROM customer
                    UNION ALL
                    SELECT 's' || CAST(s_suppkey AS VARCHAR),
                           'n' || CAST(s_nationkey AS VARCHAR) FROM supplier),
            le AS (SELECT e.a, e.b, la.label AS label_a, lb.label AS label_b
                   FROM e JOIN lab la ON la.node = e.a
                   JOIN lab lb ON lb.node = e.b),
            m AS (SELECT count(*) AS m FROM e),
            deg AS (SELECT node, label, count(*) AS deg FROM (
                        SELECT a AS node, label_a AS label FROM le
                        UNION ALL SELECT b, label_b FROM le)
                    GROUP BY 1,2),
            comm AS (SELECT label, SUM(deg) AS degree_sum,
                            count(*) AS n_nodes FROM deg GROUP BY 1),
            intra AS (SELECT label_a AS label, count(*) AS internal_edges
                      FROM le WHERE label_a = label_b GROUP BY 1)
            SELECT c.label, CAST(c.n_nodes AS BIGINT) AS n_nodes,
                   CAST(coalesce(i.internal_edges,0) AS BIGINT)
                       AS internal_edges,
                   CAST(c.degree_sum AS BIGINT) AS degree_sum,
                   CAST(4*m.m*coalesce(i.internal_edges,0)
                        - c.degree_sum*c.degree_sum AS BIGINT) AS q_num,
                   CAST(4*m.m*m.m AS BIGINT) AS four_m2
            FROM comm c LEFT JOIN intra i USING (label) CROSS JOIN m
        """,
        "edge_jaccard": r"""
            WITH lo AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                        WHERE l_orderkey % 20 = 0),
            e AS (SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
                  FROM lo a JOIN lo b ON a.l_orderkey = b.l_orderkey
                  AND a.l_suppkey < b.l_suppkey),
            und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
            deg AS (SELECT u AS node, count(*) AS deg FROM und GROUP BY 1),
            cn AS (SELECT e.a, e.b, count(*) AS cn
                   FROM e JOIN und x ON x.u = e.a
                   JOIN und y ON y.u = e.b AND y.v = x.v
                   GROUP BY 1,2)
            SELECT e.a, e.b, CAST(coalesce(cn.cn,0) AS BIGINT) AS cn,
                   CAST(da.deg AS BIGINT) AS deg_a,
                   CAST(db.deg AS BIGINT) AS deg_b,
                   CAST(coalesce(cn.cn,0)*1000000
                        // (da.deg + db.deg - coalesce(cn.cn,0)) AS BIGINT)
                       AS jac_e6
            FROM e LEFT JOIN cn ON cn.a = e.a AND cn.b = e.b
            JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b
        """,
        "minhash_dups": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            tri AS (SELECT doc_id, {TRI} AS g FROM t),
            p AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       len(list_intersect(a.g, b.g)) AS inter,
                       len(list_distinct(list_concat(a.g, b.g))) AS uni
                FROM tri a JOIN tri b ON a.doc_id < b.doc_id
            )
            SELECT doc_a, doc_b,
                   CAST(floor(inter * 1000000.0 / uni) AS BIGINT) AS jaccard_e6
            FROM p WHERE inter * 1.0 / uni >= 0.7
        """,
        "neardup_incremental": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            tri AS (SELECT doc_id, {TRI} AS g FROM t),
            inc AS (SELECT doc_id + 1000000 AS doc_id, g FROM tri
                    WHERE doc_id % 5 = 0),
            p AS (
                SELECT i.doc_id AS inc_id, b.doc_id AS base_id,
                       len(list_intersect(i.g, b.g)) AS inter,
                       len(list_distinct(list_concat(i.g, b.g))) AS uni
                FROM inc i, tri b
            )
            SELECT inc_id, base_id,
                   CAST(floor(inter * 1000000.0 / uni) AS BIGINT) AS jaccard_e6
            FROM p WHERE inter * 1.0 / uni >= 0.7
        """,
        "dup_clusters": f"""
            WITH RECURSIVE t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            tri AS (SELECT doc_id, {TRI} AS g FROM t),
            p AS (
                SELECT CAST(a.doc_id AS VARCHAR) AS a, CAST(b.doc_id AS VARCHAR) AS b
                FROM tri a JOIN tri b ON a.doc_id < b.doc_id
                WHERE len(list_intersect(a.g, b.g)) * 1.0
                      / len(list_distinct(list_concat(a.g, b.g))) >= 0.7
            ),
            sym AS (SELECT a, b FROM p UNION ALL SELECT b, a FROM p),
            nodes AS (SELECT DISTINCT a AS node FROM sym),
            r(node, comp) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT s.b, r.comp FROM r JOIN sym s ON s.a = r.node
            ),
            lab AS (SELECT node, MIN(comp) AS comp FROM r GROUP BY node),
            szs AS (SELECT comp, count(*) AS sz FROM lab GROUP BY comp),
            hist AS (
                SELECT sz AS cluster_size, count(*) AS n_clusters
                FROM szs GROUP BY sz
                UNION ALL
                SELECT 1, (SELECT count(*) FROM documents)
                          - (SELECT count(*) FROM lab)
            )
            SELECT cluster_size, CAST(sum(n_clusters) AS BIGINT) AS n_clusters
            FROM hist GROUP BY cluster_size
        """,
        "jaccard_prefix": f"""
            WITH t AS (SELECT doc_id, {TOKS} AS toks FROM documents),
            tri AS (SELECT doc_id,
                len({TRI}) AS na,
                len(list_distinct(list_transform(range(1, len(toks) - 2),
                    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS nb
            FROM t)
            SELECT doc_id,
                   CAST(floor(nb * 1000000.0 / na) AS BIGINT) AS jaccard_e6
            FROM tri
        """,
        "embed_neardup": """
            SELECT vec_id AS id_a, vec_id + 1000000 AS id_b
            FROM embeddings WHERE vec_id % 5 = 0
        """,
        "simhash_dups": """
            SELECT doc_id AS doc_a, doc_id + 1000000 AS doc_b,
                   CAST(0 AS BIGINT) AS hamming
            FROM documents WHERE doc_id % 5 = 0
        """,
        "lsh_knn": """
            SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
                   CAST(1 AS BIGINT) AS rank
            FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
        """,
        "ivf_knn": """
            SELECT vec_id AS query_id, vec_id + 1000000 AS neighbor_id,
                   CAST(1 AS BIGINT) AS rank
            FROM embeddings WHERE vec_id IN (0, 1, 2, 3)
        """,
        "ann_recall": f"""
            WITH iv AS (
                SELECT vec_id,
                       [CAST(floor(1000 * x) AS BIGINT) FOR x IN embedding] AS v
                FROM embeddings
            ), q AS (
                SELECT vec_id AS qid, v AS qv FROM iv
                WHERE vec_id IN ({", ".join(str(a) for a in _ANN_RECALL_ANCHORS)})
            ), cent AS (
                SELECT * FROM (VALUES {", ".join(
                    f"({i}, {c}::BIGINT[])"
                    for i, c in enumerate(_KMEANS_FROZEN_INT_CENTROIDS)
                )}) t(cid, cvec)
            ), pl AS (
                SELECT * FROM (VALUES {", ".join(
                    f"({i}, {p}::BIGINT[])"
                    for i, p in enumerate(_ANN_FROZEN_INT_PLANES[:_ANN_N_PLANES])
                )}) t(pid, pvec)
            ), cellr AS (
                SELECT iv.vec_id, cent.cid, row_number() OVER (
                    PARTITION BY iv.vec_id ORDER BY
                        list_inner_product(iv.v, iv.v)
                          - 2 * list_inner_product(iv.v, cent.cvec)
                          + list_inner_product(cent.cvec, cent.cvec),
                        cent.cid) AS rn
                FROM iv CROSS JOIN cent
            ), cell AS (
                SELECT vec_id, cid AS cell FROM cellr WHERE rn = 1
            ), probe AS (
                SELECT vec_id AS qid, cid FROM cellr
                WHERE rn <= 3 AND vec_id IN (SELECT qid FROM q)
            ), bucket AS (
                SELECT iv.vec_id,
                       SUM(CASE WHEN list_inner_product(iv.v, pl.pvec) > 0
                                THEN CAST(1 AS BIGINT) << pl.pid
                                ELSE 0 END) AS b
                FROM iv CROSS JOIN pl GROUP BY iv.vec_id
            ), dist AS (
                SELECT q.qid, iv.vec_id AS nid,
                       list_inner_product(iv.v, iv.v)
                         - 2 * list_inner_product(iv.v, q.qv)
                         + list_inner_product(q.qv, q.qv) AS d
                FROM iv CROSS JOIN q WHERE iv.vec_id <> q.qid
            ), exact AS (
                SELECT qid, nid FROM (
                    SELECT qid, nid, row_number() OVER (
                        PARTITION BY qid ORDER BY d, nid) AS rn FROM dist)
                WHERE rn <= 10
            ), ivfk AS (
                SELECT qid, nid FROM (
                    SELECT dd.qid, dd.nid, row_number() OVER (
                        PARTITION BY dd.qid ORDER BY dd.d, dd.nid) AS rn
                    FROM dist dd
                    JOIN cell c ON c.vec_id = dd.nid
                    JOIN probe p ON p.qid = dd.qid AND p.cid = c.cell)
                WHERE rn <= 10
            ), lshk AS (
                SELECT qid, nid FROM (
                    SELECT dd.qid, dd.nid, row_number() OVER (
                        PARTITION BY dd.qid ORDER BY dd.d, dd.nid) AS rn
                    FROM dist dd
                    JOIN bucket bn ON bn.vec_id = dd.nid
                    JOIN bucket bq ON bq.vec_id = dd.qid AND bq.b = bn.b)
                WHERE rn <= 10
            ), ex_n AS (
                SELECT qid, count(*) AS n_exact FROM exact GROUP BY qid
            ), meth AS (
                SELECT q.qid, m.method FROM q
                CROSS JOIN (SELECT 'ivf' AS method UNION ALL SELECT 'lsh') m
            ), hit AS (
                SELECT 'ivf' AS method, e.qid, count(*) AS n_hits
                FROM exact e JOIN ivfk a ON a.qid = e.qid AND a.nid = e.nid
                GROUP BY e.qid
                UNION ALL
                SELECT 'lsh' AS method, e.qid, count(*) AS n_hits
                FROM exact e JOIN lshk a ON a.qid = e.qid AND a.nid = e.nid
                GROUP BY e.qid
            )
            SELECT meth.method, meth.qid AS query_id,
                   CAST(ex_n.n_exact AS BIGINT) AS n_exact,
                   CAST(COALESCE(hit.n_hits, 0) AS BIGINT) AS n_hits,
                   (CAST(COALESCE(hit.n_hits, 0) AS BIGINT) * 1000000)
                     // CAST(ex_n.n_exact AS BIGINT) AS recall_e6
            FROM meth
            JOIN ex_n ON ex_n.qid = meth.qid
            LEFT JOIN hit ON hit.method = meth.method AND hit.qid = meth.qid
        """,
        "lang_id": """
            SELECT doc_id + 1000000 AS doc_id,
                   CASE ((doc_id // 5) % 5)
                       WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
                       WHEN 3 THEN 'es' ELSE 'zh' END AS lang_pred
            FROM documents WHERE doc_id % 5 = 0
        """,
        "fingerprints": """
            SELECT doc_id, md5(text) AS fingerprint,
                   CAST(1 AS BIGINT) AS rolling_stable
            FROM documents
        """,
        "pii_scrub": r"""
            WITH p AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 3 = 0
                            THEN text || ' contact u' || doc_id || '@ex.com from 10.0.'
                                 || (doc_id % 200) || '.7 call 555-0142'
                            ELSE text END AS text
                FROM documents),
            s AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
                       regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
                FROM p),
            s2 AS (
                SELECT doc_id, n_emails,
                       len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
                       regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
                FROM s),
            s3 AS (
                SELECT doc_id, n_emails, n_ips,
                       len(regexp_extract_all(t2, '\b\d{3}-\d{4}\b')) AS n_phones,
                       regexp_replace(t2, '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS t3
                FROM s2)
            SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
                   CAST(n_ips AS BIGINT) AS n_ips,
                   CAST(n_phones AS BIGINT) AS n_phones,
                   CAST(n_emails + n_ips + n_phones AS BIGINT) AS n_pii,
                   CAST(length(t3) AS BIGINT) AS redacted_len
            FROM s3
        """,
        "repetition": r"""
            WITH d AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
                FROM documents),
            base AS (
                SELECT doc_id, len(toks) AS n_tokens,
                       len(list_distinct(toks)) AS n_distinct_tokens,
                       CASE WHEN len(toks) > 1
                            THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
                            ELSE CAST([] AS VARCHAR[]) END AS bigrams
                FROM d),
            bc AS (
                SELECT doc_id, g, count(*) AS c
                FROM (SELECT doc_id, unnest(bigrams) AS g FROM base)
                GROUP BY doc_id, g),
            top AS (SELECT doc_id, max(c) AS top_c FROM bc GROUP BY doc_id)
            SELECT base.doc_id,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
                   CAST((n_tokens - n_distinct_tokens) * 1000000 // greatest(n_tokens, 1) AS BIGINT) AS dup_token_frac_e6,
                   CAST(coalesce(top_c, 0) AS BIGINT) AS top_bigram_count,
                   CAST(coalesce(top_c, 0) * 1000000 // greatest(n_tokens - 1, 1) AS BIGINT) AS top_bigram_frac_e6
            FROM base LEFT JOIN top USING (doc_id)
        """,
        "decontaminate": r"""
            WITH d AS (
                SELECT doc_id,
                       CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                            ELSE regexp_split_to_array(trim(text), '\s+') END AS toks
                FROM documents),
            g AS (
                SELECT doc_id, unnest(
                         CASE WHEN len(toks) >= 8
                              THEN list_transform(range(1, len(toks) - 6),
                                                  i -> array_to_string(toks[i:i+7], ' '))
                              ELSE CAST([] AS VARCHAR[]) END) AS gram
                FROM d),
            dg AS (SELECT DISTINCT doc_id, gram FROM g),
            test AS (SELECT DISTINCT gram FROM dg WHERE doc_id % 37 = 0),
            agg AS (
                SELECT dg.doc_id, count(*) AS n_grams,
                       sum(CASE WHEN test.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
                FROM dg LEFT JOIN test ON dg.gram = test.gram
                GROUP BY dg.doc_id)
            SELECT d.doc_id, CAST(coalesce(agg.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(agg.n_overlap, 0) AS BIGINT) AS n_overlap,
                   CAST(CASE WHEN coalesce(agg.n_overlap, 0) > 0 THEN 1 ELSE 0 END AS BIGINT) AS contaminated
            FROM d LEFT JOIN agg USING (doc_id)
        """,
        "dup_spans": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_transform(regexp_extract_all(text, '[A-Za-z0-9]+'),
                                      t -> lower(t)) AS ts
                FROM documents),
            grams AS (
                SELECT doc_id, i AS pos, array_to_string(ts[i:i+7], ' ') AS gram
                FROM toks, UNNEST(range(1, len(ts) - 8 + 2)) AS t(i)),
            dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
            covered AS (
                SELECT DISTINCT g.doc_id, g.pos + j AS ti
                FROM grams g JOIN dup USING (gram), UNNEST(range(0, 8)) AS t(j))
            SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
                   CAST(coalesce(c.n_dup, 0) AS BIGINT) AS n_dup_tokens
            FROM toks t LEFT JOIN (
                SELECT doc_id, count(*) AS n_dup FROM covered GROUP BY doc_id
            ) c USING (doc_id)
        """,
        "topic_labels": _topic_sql(),
        "kcenter": _kcenter_sql(k=5),
        "perceptron": _perceptron_sql(n_iter=3, n_features=64),
        "classifier_preds": _classifier_sql(n_iter=3, n_features=64),
        "uncertain_docs": _uncertain_sql(n_iter=3, n_features=64, k=50),
        "noisy_labels": _noisy_sql(n_iter=3, n_features=64, k=50),
        "infer_batches": """
            WITH c AS (
                SELECT doc_id,
                       len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens
                FROM documents
            ), b AS (
                SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                       CAST(greatest(ceil(log2(greatest(n_tokens, 1) / 8.0)), 0)
                            AS BIGINT) AS len_bucket
                FROM c
            ), r AS (
                SELECT b.*, row_number() OVER (
                    PARTITION BY len_bucket ORDER BY doc_id
                ) - 1 AS rank
                FROM b
            )
            SELECT doc_id, n_tokens, len_bucket,
                   CAST(len_bucket * 1000000 + rank // 16 AS BIGINT) AS batch_id,
                   CAST(rank % 16 AS BIGINT) AS slot
            FROM r
        """,
        "resample_docs": """
            WITH c AS (
                SELECT doc_id, n_chars AS w,
                       sum(n_chars) OVER (ORDER BY doc_id) AS cum,
                       (SELECT sum(n_chars) FROM documents) AS grand
                FROM documents
            ), k AS (
                SELECT doc_id, CAST(w AS BIGINT) AS weight,
                       CAST((cum * 1000) // grand
                            - ((cum - w) * 1000) // grand AS BIGINT) AS n_copies
                FROM c
            )
            SELECT doc_id, weight, n_copies FROM k WHERE n_copies > 0
        """,
        "dsir_select": """
            WITH docs AS (
                SELECT doc_id, lang,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                FROM documents
            ), tok AS (
                SELECT doc_id, lang, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS i
                FROM docs
            ), big AS (
                SELECT a.doc_id,
                       CAST(('0x' || substr(md5(a.tok || ' ' || b.tok), 1, 8))
                            AS BIGINT) % 256 AS bucket,
                       CASE WHEN a.lang = 'en' THEN 1 ELSE 0 END AS is_t
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
            ), cnt AS (
                SELECT bucket, count(*) AS n_raw, sum(is_t) AS n_target
                FROM big GROUP BY bucket
            ), sc AS (
                SELECT bucket, (1000000 * (n_target + 1)) // (n_raw + 1) AS score
                FROM cnt
            ), imp AS (
                SELECT b.doc_id, CAST(sum(s.score) AS BIGINT) AS importance
                FROM big b JOIN sc s USING (bucket) GROUP BY b.doc_id
            ), th AS (SELECT quantile_disc(importance, 0.8) AS t FROM imp)
            SELECT doc_id, importance FROM imp, th WHERE importance >= t
        """,
        "leakage_split": """
            WITH s AS (
                SELECT doc_id,
                       source || '/' || CAST(doc_id % 61 AS VARCHAR) AS site
                FROM documents
            ), b AS (
                SELECT doc_id, site,
                       CAST(('0x' || substr(md5('split:' || site), 1, 8)) AS BIGINT)
                           % 10000 AS split_bucket
                FROM s
            )
            SELECT doc_id, site, split_bucket,
                   CASE WHEN split_bucket < 9000 THEN 'train'
                        WHEN split_bucket < 9500 THEN 'val'
                        ELSE 'test' END AS split
            FROM b
        """,
        "mixture_sample": r"""
            WITH c AS (
                SELECT doc_id, source,
                       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
                FROM documents),
            r AS (
                SELECT doc_id, source, n_tokens,
                       CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
                            AS BIGINT) AS running
                FROM c)
            SELECT doc_id, source, n_tokens, running FROM r
            WHERE running <= CASE
                WHEN CAST(replace(source, 'src', '') AS INT) % 2 = 0 THEN 600
                ELSE 900 END
        """,
        "pagerank": r"""
            WITH edges AS (
                SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
            deg AS (SELECT node, CAST(coalesce(d.d, 0) AS BIGINT) AS outdeg
                    FROM nodes LEFT JOIN (
                        SELECT src AS node, count(*) AS d FROM edges GROUP BY 1
                    ) d USING (node)),
            params AS (SELECT count(*) AS n FROM nodes),
            r0 AS (SELECT node, outdeg, CAST(1000000000000 // p.n AS BIGINT) AS rank
                   FROM deg, params p),
            d1 AS (SELECT coalesce(sum(rank), 0) AS dang FROM r0 WHERE outdeg = 0),
            c1 AS (SELECT e.dst AS node, sum(r.rank // r.outdeg) AS contrib
                   FROM edges e JOIN r0 r ON e.src = r.node GROUP BY 1),
            r1 AS (SELECT r.node, r.outdeg,
                          CAST(((100-85) * (1000000000000 // p.n)
                              + 85 * (coalesce(c.contrib, 0) + d.dang // p.n)) // 100
                              AS BIGINT) AS rank
                   FROM r0 r LEFT JOIN c1 c USING (node), params p, d1 d),
            d2 AS (SELECT coalesce(sum(rank), 0) AS dang FROM r1 WHERE outdeg = 0),
            c2 AS (SELECT e.dst AS node, sum(r.rank // r.outdeg) AS contrib
                   FROM edges e JOIN r1 r ON e.src = r.node GROUP BY 1),
            r2 AS (SELECT r.node, r.outdeg,
                          CAST(((100-85) * (1000000000000 // p.n)
                              + 85 * (coalesce(c.contrib, 0) + d.dang // p.n)) // 100
                              AS BIGINT) AS rank
                   FROM r1 r LEFT JOIN c2 c USING (node), params p, d2 d),
            d3 AS (SELECT coalesce(sum(rank), 0) AS dang FROM r2 WHERE outdeg = 0),
            c3 AS (SELECT e.dst AS node, sum(r.rank // r.outdeg) AS contrib
                   FROM edges e JOIN r2 r ON e.src = r.node GROUP BY 1),
            r3 AS (SELECT r.node, r.outdeg,
                          CAST(((100-85) * (1000000000000 // p.n)
                              + 85 * (coalesce(c.contrib, 0) + d.dang // p.n)) // 100
                              AS BIGINT) AS rank
                   FROM r2 r LEFT JOIN c3 c USING (node), params p, d3 d)
            SELECT node, rank AS rank_scaled FROM r3
        """,
        "kcore": _kcore_sql(k=2, rounds=4),
        "ktruss": _ktruss_sql(k=3, rounds=2),
        "temporal_reach": _temporal_reach_sql(rounds=4),
        "landmarks": _landmarks_sql(k=3),
        "rfm_segments": """
            WITH u AS (
                SELECT CAST(user_id AS BIGINT) AS u,
                       max(datediff('day', DATE '1970-01-01',
                           CAST(ts AS DATE))) AS last_day,
                       CAST(count(*) AS BIGINT) AS f,
                       sum(CAST(round(value * 100) AS BIGINT)) AS m
                FROM events GROUP BY 1),
            r AS (SELECT u,
                         (SELECT max(last_day) FROM u) - last_day AS rr,
                         f, m
                  FROM u),
            q AS (SELECT quantile_disc(rr, 0.25) AS r1,
                         quantile_disc(rr, 0.50) AS r2,
                         quantile_disc(rr, 0.75) AS r3,
                         quantile_disc(f, 0.25) AS f1,
                         quantile_disc(f, 0.50) AS f2,
                         quantile_disc(f, 0.75) AS f3,
                         quantile_disc(m, 0.25) AS m1,
                         quantile_disc(m, 0.50) AS m2,
                         quantile_disc(m, 0.75) AS m3
                  FROM r)
            SELECT u,
                   CAST(CASE WHEN rr <= r1 THEN 1 WHEN rr <= r2 THEN 2
                             WHEN rr <= r3 THEN 3 ELSE 4 END AS BIGINT)
                       AS r_score,
                   CAST(CASE WHEN f <= f1 THEN 1 WHEN f <= f2 THEN 2
                             WHEN f <= f3 THEN 3 ELSE 4 END AS BIGINT)
                       AS f_score,
                   CAST(CASE WHEN m <= m1 THEN 1 WHEN m <= m2 THEN 2
                             WHEN m <= m3 THEN 3 ELSE 4 END AS BIGINT)
                       AS m_score
            FROM r, q
        """,
        "uptime_totals": """
            WITH iv AS (
                SELECT CAST(user_id AS BIGINT) AS k,
                       epoch_us(ts) AS s,
                       epoch_us(ts)
                       + (1 + event_id % 90) * 60000000 AS e
                FROM events),
            o AS (SELECT k, s, e,
                         max(e) OVER (PARTITION BY k ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS me
                  FROM iv),
            f AS (SELECT k, s, e,
                         CASE WHEN me IS NULL OR s > me THEN 1 ELSE 0 END
                             AS ng
                  FROM o),
            g AS (SELECT k, s, e,
                         sum(ng) OVER (PARTITION BY k ORDER BY s, e)
                             AS gid
                  FROM f),
            u AS (SELECT k, min(s) AS s, max(e) AS e
                  FROM g GROUP BY k, gid)
            SELECT k, CAST(sum(e - s) AS BIGINT) AS covered_us
            FROM u GROUP BY k
        """,
        "first_touch": """
            WITH c AS (SELECT event_id AS cid, user_id, ts
                       FROM events WHERE event_type = 'click'),
            p AS (SELECT event_id AS pid, user_id, ts
                  FROM events WHERE event_type = 'purchase'),
            j AS (SELECT p.pid, c.cid,
                         epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
                  FROM p JOIN c ON c.user_id = p.user_id
                   AND c.ts <= p.ts
                   AND p.ts - c.ts <= INTERVAL '30 minutes'),
            r AS (SELECT pid, cid, delta_us,
                         row_number() OVER (PARTITION BY pid
                             ORDER BY delta_us DESC, cid) AS rn
                  FROM j)
            SELECT pid AS purchase_id, cid AS click_id,
                   CAST(delta_us AS BIGINT) AS delta_us
            FROM r WHERE rn = 1
        """,
        "id_gaps": """
            WITH ids AS (
                SELECT DISTINCT CAST(event_id AS BIGINT) AS id
                FROM events
                WHERE event_id % 97 <> 0
                  AND event_id % 1000 NOT BETWEEN 500 AND 509),
            o AS (SELECT id, lead(id) OVER (ORDER BY id) AS nxt FROM ids)
            SELECT id + 1 AS gap_start, nxt - 1 AS gap_end
            FROM o WHERE nxt > id + 1
        """,
        "new_vs_returning": """
            WITH ud AS (
                SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
                       CAST(datediff('day', DATE '1970-01-01',
                            CAST(ts AS DATE)) AS BIGINT) AS day
                FROM events),
            f AS (SELECT u, min(day) AS first_day FROM ud GROUP BY 1)
            SELECT ud.day,
                   CAST(CASE WHEN ud.day = f.first_day
                        THEN 1 ELSE 0 END AS BIGINT) AS is_new,
                   CAST(count(*) AS BIGINT) AS n
            FROM ud JOIN f ON f.u = ud.u
            GROUP BY 1, 2
        """,
        "theil_sen": """
            WITH d AS (
                SELECT event_type AS g,
                       CAST(datediff('day', DATE '1970-01-01',
                            CAST(ts AS DATE)) AS BIGINT) AS x,
                       sum(CAST(round(value * 100) AS BIGINT)) AS y
                FROM events GROUP BY 1, 2),
            p AS (
                SELECT a.g,
                       (b.y - a.y) * 1000000 // (b.x - a.x) AS s
                FROM d a JOIN d b ON a.g = b.g AND a.x < b.x)
            SELECT g, CAST(count(*) AS BIGINT) AS n_pairs,
                   CAST(quantile_disc(s, 0.5) AS BIGINT) AS slope_e6
            FROM p GROUP BY 1
        """,
        "trailing_spend": """
            WITH d AS (
                SELECT CAST(user_id AS BIGINT) AS user_id,
                       CAST(datediff('day', DATE '1970-01-01',
                            CAST(ts AS DATE)) AS BIGINT) AS day,
                       sum(CAST(round(value * 100) AS BIGINT)) AS c
                FROM events GROUP BY 1, 2)
            SELECT user_id, day,
                   CAST(sum(c) OVER (PARTITION BY user_id ORDER BY day
                        RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS sum_7d
            FROM d
        """,
        "cuped": """
            WITH u AS (
                SELECT user_id,
                       CAST(user_id % 2 AS BIGINT) AS arm,
                       sum(CASE WHEN ts < TIMESTAMP '2024-01-16'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS x,
                       sum(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                           THEN CAST(round(value * 100) AS BIGINT)
                           ELSE 0 END) AS y
                FROM events GROUP BY 1),
            g AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                         CAST(sum(x) AS HUGEINT) AS sx,
                         CAST(sum(y) AS HUGEINT) AS sy,
                         CAST(sum(x * x) AS HUGEINT) AS sxx,
                         CAST(sum(x * y) AS HUGEINT) AS sxy
                  FROM u),
            gg AS (SELECT n, sx, sy,
                          n * sxy - sx * sy AS cov_num,
                          n * sxx - sx * sx AS var_num
                   FROM g),
            a AS (SELECT arm, CAST(count(*) AS HUGEINT) AS na,
                         CAST(sum(x) AS HUGEINT) AS sxa,
                         CAST(sum(y) AS HUGEINT) AS sya
                  FROM u GROUP BY 1)
            SELECT arm, CAST(na AS BIGINT) AS n,
                   CAST(sya * 1000000 // na AS BIGINT) AS mean_y_e6,
                   CAST((sya * var_num * g2.n
                         - cov_num * (sxa * g2.n - g2.sx * na))
                        * 1000000 // (na * g2.n * var_num)
                        AS BIGINT) AS adj_mean_e6,
                   CAST(cov_num * 1000000 // var_num AS BIGINT)
                       AS theta_e6
            FROM a, gg g2
        """,
        "hopping_uniques": """
            SELECT time_bucket(INTERVAL '30 minutes', ts)
                     - i * INTERVAL '30 minutes' AS window_start,
                   event_type,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events CROSS JOIN range(2) t(i)
            GROUP BY 1, 2
        """,
        "top_paths": """
            WITH o AS (
                SELECT event_type AS t0,
                       lead(event_type, 1) OVER w AS t1,
                       lead(event_type, 2) OVER w AS t2
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
            SELECT t0, t1, t2, count(*) AS n_paths
            FROM o WHERE t2 IS NOT NULL
            GROUP BY 1, 2, 3
        """,
        "trending": """
            WITH d AS (
                SELECT event_type, user_id,
                       CAST(sum((CAST(1 AS BIGINT) << 40)
                            >> least(greatest(
                                (epoch_us(TIMESTAMP '2024-01-31')
                                 - epoch_us(ts)) // 86400000000, 0), 40))
                            AS BIGINT) AS decayed
                FROM events GROUP BY 1, 2),
            r AS (SELECT event_type, user_id, decayed,
                         row_number() OVER (PARTITION BY event_type
                             ORDER BY decayed DESC, user_id) AS rank
                  FROM d)
            SELECT event_type, user_id, decayed,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 3
        """,
        "interval_union": """
            WITH iv AS (
                SELECT CAST(user_id AS BIGINT) AS k,
                       epoch_us(ts) AS s,
                       epoch_us(ts)
                       + (1 + event_id % 90) * 60000000 AS e
                FROM events),
            o AS (SELECT k, s, e,
                         max(e) OVER (PARTITION BY k ORDER BY s, e
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS me
                  FROM iv),
            f AS (SELECT k, s, e,
                         CASE WHEN me IS NULL OR s > me THEN 1 ELSE 0 END
                             AS ng
                  FROM o),
            g AS (SELECT k, s, e,
                         sum(ng) OVER (PARTITION BY k ORDER BY s, e)
                             AS gid
                  FROM f)
            SELECT k, CAST(min(s) AS BIGINT) AS s,
                   CAST(max(e) AS BIGINT) AS e
            FROM g GROUP BY k, gid
        """,
        "grouped_auc": """
            WITH s AS (
                SELECT 'seg' || CAST(doc_id % 3 AS BIGINT) AS seg,
                       (doc_id * 37) % 1000
                       + CASE WHEN doc_id % 5 < 2
                              THEN 100 + 150 * (doc_id % 3) ELSE 0 END
                           AS score,
                       CASE WHEN doc_id % 5 < 2 THEN 1 ELSE 0 END AS label
                FROM documents),
            g AS (SELECT seg, score, count(*) AS n, sum(label) AS np
                  FROM s GROUP BY 1, 2),
            o AS (SELECT seg, score, n, np,
                         coalesce(sum(n) OVER (PARTITION BY seg
                             ORDER BY score
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS rb
                  FROM g),
            t AS (SELECT seg,
                         CAST(sum(np * (2 * rb + n + 1)) AS BIGINT)
                             AS two_rpos,
                         CAST(sum(np) AS BIGINT) AS n_pos,
                         CAST(sum(n) - sum(np) AS BIGINT) AS n_neg
                  FROM o GROUP BY seg)
            SELECT seg,
                   two_rpos - n_pos * (n_pos + 1) AS u2, n_pos, n_neg,
                   CASE WHEN n_pos * n_neg = 0 THEN 0
                        ELSE CAST((two_rpos - n_pos * (n_pos + 1))
                             * 1000000 // (2 * n_pos * n_neg) AS BIGINT)
                   END AS auc_e6
            FROM t
        """,
        "containment": """
            WITH tok AS (
                SELECT CAST(doc_id AS BIGINT) AS id,
                       'g' || CAST(doc_id // 8 AS BIGINT) || '_'
                           || CAST(k AS BIGINT) AS t
                FROM documents CROSS JOIN range(0, 8) r(k)
                WHERE k < doc_id % 6 + 2),
            sz AS (SELECT id, count(*) AS n FROM tok GROUP BY 1),
            inter AS (
                SELECT a.id AS ia, b.id AS ib, count(*) AS m
                FROM tok a JOIN tok b ON a.t = b.t AND a.id <> b.id
                GROUP BY 1, 2)
            SELECT ia AS id_a, ib AS id_b,
                   CAST(m * 1000000 // sz.n AS BIGINT) AS containment_e6
            FROM inter JOIN sz ON sz.id = inter.ia
            WHERE m * 1000000 >= 990000 * sz.n
        """,
        "ed1_pairs": """
            WITH n AS (SELECT DISTINCT c_name AS s FROM customer)
            SELECT a.s AS u, b.s AS v
            FROM n a JOIN n b
              ON a.s < b.s AND levenshtein(a.s, b.s) = 1
        """,
        "link_pred": """
            WITH o AS (
                SELECT o_custkey AS c, o_orderkey AS ok,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderkey) AS rn
                FROM orders),
            ch AS (SELECT 'o' || a.ok AS x, 'o' || b.ok AS y
                   FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 1),
            sk AS (SELECT 'o' || a.ok AS x, 'o' || b.ok AS y
                   FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 2),
            e0 AS MATERIALIZED (
                SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
                FROM (SELECT * FROM ch UNION ALL SELECT * FROM sk)),
            adj AS MATERIALIZED (
                SELECT a AS x, b AS y FROM e0
                UNION ALL SELECT b, a FROM e0),
            cnt AS MATERIALIZED (
                SELECT p.y AS u, q.y AS v, count(*) AS cn
                FROM adj p JOIN adj q ON p.x = q.x AND p.y < q.y
                GROUP BY 1, 2)
            SELECT u, v, CAST(cn AS BIGINT) AS cn
            FROM cnt
            WHERE NOT EXISTS (
                SELECT 1 FROM e0 e WHERE e.a = cnt.u AND e.b = cnt.v)
            ORDER BY cn DESC, u, v
            LIMIT 50
        """,
        "ra_links": """
            WITH o AS (
                SELECT o_custkey AS c, o_orderkey AS ok,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderkey) AS rn
                FROM orders),
            ch AS (SELECT 'o' || a.ok AS x, 'o' || b.ok AS y
                   FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 1),
            sk AS (SELECT 'o' || a.ok AS x, 'o' || b.ok AS y
                   FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 2),
            e0 AS MATERIALIZED (
                SELECT DISTINCT least(x, y) AS a, greatest(x, y) AS b
                FROM (SELECT * FROM ch UNION ALL SELECT * FROM sk)),
            adj AS MATERIALIZED (
                SELECT a AS x, b AS y FROM e0
                UNION ALL SELECT b, a FROM e0),
            deg AS MATERIALIZED (
                SELECT x, 1000000 // count(*) AS w FROM adj GROUP BY x),
            cnt AS MATERIALIZED (
                SELECT p.y AS u, q.y AS v, SUM(d.w) AS ra
                FROM adj p JOIN adj q ON p.x = q.x AND p.y < q.y
                JOIN deg d ON d.x = p.x
                GROUP BY 1, 2)
            SELECT u, v, CAST(ra AS BIGINT) AS ra_e6
            FROM cnt
            WHERE NOT EXISTS (
                SELECT 1 FROM e0 e WHERE e.a = cnt.u AND e.b = cnt.v)
            ORDER BY ra DESC, u, v
            LIMIT 50
        """,
        "anf_reach": """
            WITH RECURSIVE o AS (
                SELECT o_custkey AS c, o_orderkey AS ok,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderkey) AS rn
                FROM orders),
            ch AS (SELECT 'o' || a.ok AS x, 'o' || b.ok AS y
                   FROM o a JOIN o b ON a.c = b.c AND b.rn = a.rn + 1),
            nodes AS (SELECT x AS v FROM ch UNION SELECT y FROM ch),
            reach(v, u, h) AS (
                SELECT v, v, 0 FROM nodes
                UNION
                SELECT r.v, c.y, r.h + 1
                FROM reach r JOIN ch c ON c.x = r.u WHERE r.h < 3
            ),
            p AS (SELECT DISTINCT v, u FROM reach),
            hx AS (SELECT v, CAST(('0x' || substr(md5(u), 1, 15))
                                  AS BIGINT) AS h FROM p),
            reg AS (SELECT v, h % 64 AS register,
                           CASE WHEN h // 64 = 0 THEN 61
                                ELSE bit_count(((h // 64) & -(h // 64))
                                               - 1) + 1
                           END AS rho
                    FROM hx),
            m AS (SELECT v, register, max(rho) AS mr FROM reg GROUP BY 1, 2)
            SELECT v AS node,
                   count(*) AS regs_nonzero,
                   CAST(sum(mr) AS BIGINT) AS rho_sum
            FROM m GROUP BY 1
        """,
        "butterflies": """
            WITH e AS (
                SELECT DISTINCT CAST(user_id AS VARCHAR) AS u, event_type AS i
                FROM events),
            w AS (
                SELECT a.i AS i1, b.i AS i2, count(*) AS cu
                FROM e a JOIN e b ON a.u = b.u AND a.i < b.i
                GROUP BY 1, 2)
            SELECT CAST(coalesce(sum(cu * (cu - 1) // 2), 0) AS BIGINT)
                       AS n_butterflies,
                   CAST(count(*) AS BIGINT) AS n_item_pairs,
                   CAST(coalesce(sum(cu), 0) AS BIGINT) AS n_wedges
            FROM w
        """,
        "tc_ancestors": """
            WITH RECURSIVE anc(node, ancestor) AS (
                SELECT CAST(p_partkey AS BIGINT),
                       CAST(p_partkey // 2 AS BIGINT)
                FROM part WHERE p_partkey >= 2
                UNION
                SELECT node, ancestor // 2 FROM anc WHERE ancestor >= 2
            )
            SELECT node, ancestor FROM anc
        """,
        "lpa_communities": _lpa_sql(rounds=4),
        "graph_components": r"""
            WITH RECURSIVE pair AS (
                SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            nodes AS (SELECT c AS node FROM pair UNION SELECT s FROM pair),
            sym AS (
                SELECT c AS a, s AS b FROM pair
                UNION ALL
                SELECT s AS a, c AS b FROM pair),
            r(node, comp) AS (
                SELECT node, node FROM nodes
                UNION
                SELECT s.b, r.comp FROM r JOIN sym s ON s.a = r.node)
            SELECT node, MIN(comp) AS component_id FROM r GROUP BY node
        """,
        "embed_quantize": r"""
            WITH ex AS (
                SELECT vec_id,
                       unnest(range(1, len(embedding) + 1)) AS dim,
                       embedding AS e
                FROM embeddings),
            el AS (
                SELECT vec_id, CAST(dim AS BIGINT) AS dim,
                       CAST(e[CAST(dim AS INT)] AS DOUBLE) AS x
                FROM ex),
            mm AS (
                SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM el GROUP BY dim)
            SELECT el.vec_id, el.dim,
                   CASE WHEN mm.mx = mm.mn THEN CAST(-127 AS BIGINT)
                        ELSE CAST(least(greatest(
                            floor((el.x - mm.mn) * 254.0 / (mm.mx - mm.mn)) - 127,
                            -127), 127) AS BIGINT)
                   END AS q
            FROM el JOIN mm USING (dim)
        """,
        "khop_reach": r"""
            WITH RECURSIVE pair AS (
                SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS s
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            edges AS (
                SELECT c AS src, s AS dst FROM pair
                UNION ALL
                SELECT s AS src, c AS dst FROM pair),
            seeds AS (
                SELECT 'c' || c_custkey AS node FROM customer WHERE c_nationkey = 0),
            reach(node, hop) AS (
                SELECT node, CAST(0 AS BIGINT) FROM seeds
                UNION
                SELECT e.dst, r.hop + 1
                FROM reach r JOIN edges e ON e.src = r.node
                WHERE r.hop < 3)
            SELECT node, MIN(hop) AS hop FROM reach GROUP BY node
        """,
        "bm25_topk": r"""
            WITH qterms(qid, token) AS (VALUES
                ('q1','customer'),('q1','order'),('q1','query'),('q1','plan'),
                ('q2','hash'),('q2','join'),('q2','merge'),('q2','sort'),
                ('q3','stream'),('q3','window'),('q3','filter'),('q3','batch')),
            toks AS (
                SELECT doc_id, unnest(list_transform(
                    regexp_extract_all(text,'[A-Za-z0-9]+'), t -> lower(t))) AS token
                FROM documents),
            dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
            stats AS (SELECT (SELECT count(*) FROM documents) AS n,
                             (SELECT count(*) FROM toks) AS tot),
            dft AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks
                    WHERE token IN (SELECT token FROM qterms) GROUP BY token),
            tf AS (SELECT t.doc_id, q.qid, t.token, count(*) AS tf
                   FROM toks t JOIN qterms q USING (token) GROUP BY 1,2,3),
            scored AS (
                SELECT tf.qid, tf.doc_id,
                       CAST(SUM(CAST(round(ln(1.0 + (s.n - d.df + 0.5)/(d.df + 0.5))
                           * tf.tf*(1.2+1.0)
                           / (tf.tf + 1.2*(1.0-0.75+0.75*dl.dl/(s.tot*1.0/s.n)))
                           * 1e6) AS BIGINT)) AS BIGINT) AS score_scaled
                FROM tf JOIN dft d USING (token) JOIN dl USING (doc_id), stats s
                GROUP BY 1,2),
            ranked AS (SELECT qid, doc_id, score_scaled,
                              row_number() OVER (PARTITION BY qid
                                  ORDER BY score_scaled DESC, doc_id) AS rnk
                       FROM scored)
            SELECT qid, doc_id, score_scaled, CAST(rnk AS BIGINT) AS rank
            FROM ranked WHERE rnk <= 10
        """,
        "dedup_incremental": r"""
            WITH ref AS (
                SELECT md5(text) AS fp FROM documents WHERE doc_id % 3 = 0),
            nw AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0)
            SELECT n.doc_id, md5(n.text) AS fingerprint
            FROM nw n
            WHERE NOT EXISTS (SELECT 1 FROM ref r WHERE r.fp = md5(n.text))
        """,
        "pack_docs": r"""
            WITH c AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT) AS n_tokens
                FROM documents),
            o AS (
                SELECT doc_id, n_tokens,
                       CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                           AS start_offset
                FROM c),
            w AS (
                SELECT doc_id, n_tokens, start_offset,
                       start_offset // 512 AS fw,
                       (start_offset + n_tokens - 1) // 512 AS lw
                FROM o WHERE n_tokens > 0)
            SELECT CAST(fw + j AS BIGINT) AS window_id, doc_id,
                   CAST(greatest((fw + j) * 512 - start_offset, 0) AS BIGINT) AS seg_start,
                   CAST(least((fw + j + 1) * 512, start_offset + n_tokens)
                        - start_offset
                        - greatest((fw + j) * 512 - start_offset, 0) AS BIGINT) AS seg_len
            FROM w, UNNEST(range(0, lw - fw + 1)) AS t(j)
        """,
        "corpus_clean": _CLEAN_CTES + """
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
                   CAST(min(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_copies
            FROM clean GROUP BY md5(text)
        """,
        "clean_pack": _CLEAN_CTES + """
            , survivors AS (
                SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text
                FROM clean GROUP BY text),
            c AS (
                SELECT doc_id,
                       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS BIGINT)
                           AS n_tokens
                FROM survivors),
            o AS (
                SELECT doc_id, n_tokens,
                       CAST(coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                            AS BIGINT) AS start_offset
                FROM c),
            w AS (
                SELECT doc_id, n_tokens, start_offset,
                       start_offset // 512 AS fw,
                       (start_offset + n_tokens - 1) // 512 AS lw
                FROM o WHERE n_tokens > 0)
            SELECT CAST(fw + j AS BIGINT) AS window_id, doc_id,
                   CAST(greatest((fw + j) * 512 - start_offset, 0) AS BIGINT)
                       AS seg_start,
                   CAST(least((fw + j + 1) * 512, start_offset + n_tokens)
                        - start_offset
                        - greatest((fw + j) * 512 - start_offset, 0) AS BIGINT)
                       AS seg_len
            FROM w, UNNEST(range(0, lw - fw + 1)) AS t(j)
        """,
        "augment_stats": """
            SELECT doc_id, CAST(0 AS BIGINT) AS variant_id,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
            UNION ALL
            SELECT doc_id, CAST(1 AS BIGINT),
                   CAST(length(text) - FLOOR(length(text) * 0.2) AS BIGINT)
            FROM documents WHERE length(text) > 5
            UNION ALL
            SELECT doc_id,
                   CAST(CASE WHEN length(text) > 5 THEN 2 ELSE 1 END AS BIGINT),
                   CAST(length(text) + FLOOR(length(text) * 0.32) AS BIGINT)
            FROM documents WHERE FLOOR(length(text) * 0.32) >= 1
        """,
        "media_neardup": """
            SELECT i AS id_a, i + 1000000 AS id_b
            FROM range(256) t(i) WHERE i % 4 = 0
        """,
        "media_frames": """
            WITH m AS (
                SELECT i AS media_id,
                       CASE WHEN i % 3 = 0 THEN 0
                            ELSE 1000 + (i * 7919) % 59000 END AS duration_ms
                FROM range(256) t(i)
            ), f AS (SELECT k FROM range(4) t(k))
            SELECT m.media_id, CAST(f.k AS INTEGER) AS frame_idx,
                   CAST((m.duration_ms * f.k) // 4 AS BIGINT) AS ts_ms
            FROM m CROSS JOIN f
        """,
        "quality": """
            WITH q AS (
                SELECT doc_id, length(text) AS n_chars,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                       length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
                       length(regexp_replace(text, '\\s', '', 'g')) AS non_space
                FROM documents)
            SELECT doc_id, n_chars, n_tokens,
                   CAST(floor(n_punct * 1000000.0 / greatest(n_chars, 1)) AS BIGINT) AS punct_ratio_e6,
                   CAST(floor(non_space * 1000000.0 / greatest(n_tokens, 1)) AS BIGINT) AS mean_token_len_e6
            FROM q
        """,
        "srm_audit": """
            WITH a AS (SELECT event_type, user_id % 2 AS variant,
                              count(DISTINCT user_id) AS o
                       FROM events GROUP BY 1, 2),
            t AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS n
                  FROM a GROUP BY 1),
            c AS (SELECT a.event_type, t.n,
                         CAST(sum((2 * a.o - t.n) * (2 * a.o - t.n))
                              * 1000000 // (2 * t.n) AS BIGINT) AS chi2_e6
                  FROM a JOIN t USING (event_type) GROUP BY 1, 2)
            SELECT event_type, n, chi2_e6,
                   chi2_e6 > 3841459 AS srm
            FROM c
        """,
        "cmeee_stats": f"""
            SELECT label,
                   CAST(count(*) AS BIGINT) AS n_mentions,
                   CAST(count(DISTINCT doc_idx) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT entity) AS BIGINT) AS n_surfaces,
                   CAST(sum("end" - "start") AS BIGINT) AS sum_span_chars
            FROM '{_GOLDEN_CMEEE}'
            GROUP BY 1
        """,
        "duee_stats": f"""
            SELECT event_type,
                   CAST(count(DISTINCT doc_id || chr(31) ||
                              CAST(event_idx AS VARCHAR)) AS BIGINT)
                       AS n_events,
                   CAST(count(*) AS BIGINT) AS n_args,
                   CAST(count(DISTINCT role) AS BIGINT) AS n_roles,
                   CAST(sum("end" - "start") AS BIGINT) AS sum_arg_chars
            FROM '{_GOLDEN_DUEE}'
            GROUP BY 1
        """,
        "boilerplate": """
            WITH t AS (
                SELECT doc_id, source,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents),
            w AS (
                SELECT doc_id, source,
                       substr(md5(array_to_string(
                           toks[i * 8 + 1 : i * 8 + 8], ' ')), 1, 16)
                           AS wkey
                FROM t, LATERAL (
                    SELECT unnest(range(len(toks) // 8)) AS i) r),
            f AS (
                SELECT source, wkey,
                       count(DISTINCT doc_id) AS nd
                FROM w GROUP BY 1, 2)
            SELECT w.doc_id,
                   CAST(count(*) AS BIGINT) AS n_windows,
                   CAST(sum(CASE WHEN f.nd >= 3 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_bp,
                   CAST(sum(CASE WHEN f.nd >= 3 THEN 1 ELSE 0 END)
                        * 1000000 // count(*) AS BIGINT) AS bp_e6
            FROM w JOIN f USING (source, wkey)
            GROUP BY 1
        """,
        "memorization_attrib": """
            WITH t AS (
                SELECT doc_id,
                       regexp_split_to_array(trim(text), '\\s+') AS toks
                FROM documents),
            g AS (
                SELECT DISTINCT doc_id,
                       substr(md5(array_to_string(
                           toks[i + 1 : i + 4], ' ')), 1, 16) AS gkey
                FROM t, LATERAL (
                    SELECT unnest(range(greatest(len(toks) - 3, 0))) AS i
                ) r),
            f AS (SELECT gkey FROM g GROUP BY gkey
                  HAVING count(*) <= 200),
            gc AS (SELECT g.* FROM g JOIN f USING (gkey)),
            tot AS (SELECT doc_id, count(*) AS n FROM gc
                    WHERE doc_id % 61 = 0 GROUP BY 1),
            p AS (SELECT s.doc_id AS sample_id, o.doc_id AS match_id,
                         count(*) AS shared
                  FROM gc s JOIN gc o USING (gkey)
                  WHERE s.doc_id % 61 = 0 AND o.doc_id <> s.doc_id
                  GROUP BY 1, 2),
            rnk AS (SELECT sample_id, match_id, shared,
                        row_number() OVER (PARTITION BY sample_id
                            ORDER BY shared DESC, match_id) AS rn
                    FROM p)
            SELECT rnk.sample_id, rnk.match_id,
                   CAST(rnk.shared AS BIGINT) AS shared,
                   CAST(tot.n AS BIGINT) AS sample_grams,
                   CAST(rnk.shared * 1000000 // tot.n AS BIGINT)
                       AS containment_e6
            FROM rnk JOIN tot ON tot.doc_id = rnk.sample_id
            WHERE rn = 1
        """,
        "purged_folds": """
            WITH e AS (SELECT event_id, ts,
                    row_number() OVER (ORDER BY ts, event_id) AS rn,
                    count(*) OVER () AS n
                FROM events),
            f AS (SELECT event_id, ts,
                    CAST((rn - 1) * 4 // n AS BIGINT) AS fold FROM e),
            b AS (SELECT fold, max(ts) AS hi FROM f GROUP BY fold),
            r AS (SELECT bf.fold AS test_fold, f.ts,
                    f.fold = bf.fold AS in_f,
                    bf.fold > 0 AND f.fold <> bf.fold
                        AND f.ts <= lp.hi
                        AND f.ts + INTERVAL 3 HOUR > lp.hi AS purged,
                    f.ts >= bf.hi
                        AND f.ts <= bf.hi + INTERVAL 6 HOUR AS in_win
                  FROM f CROSS JOIN b bf
                  LEFT JOIN b lp ON lp.fold = bf.fold - 1)
            SELECT test_fold,
                   CAST(count(*) FILTER (WHERE in_f) AS BIGINT) AS n_test,
                   CAST(count(*) FILTER (WHERE NOT in_f AND purged)
                        AS BIGINT) AS n_purged,
                   CAST(count(*) FILTER (WHERE NOT in_f AND NOT purged
                        AND in_win) AS BIGINT) AS n_embargo,
                   CAST(count(*) FILTER (WHERE NOT in_f AND NOT purged
                        AND NOT in_win) AS BIGINT) AS n_train
            FROM r
            GROUP BY 1
        """,
        "preference_pairs": """
            WITH q AS (
                SELECT doc_id, lang,
                       length(text) AS n_chars,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                       length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
                       length(regexp_replace(text, '\\s', '', 'g')) AS non_space
                FROM documents),
            s AS (
                SELECT doc_id, lang, n_tokens // 64 AS len_bucket,
                       CAST(floor(non_space * 1000000.0 / greatest(n_tokens, 1)) AS BIGINT)
                       - 2 * CAST(floor(n_punct * 1000000.0 / greatest(n_chars, 1)) AS BIGINT) AS score
                FROM q),
            r AS (
                SELECT lang, len_bucket, doc_id, score,
                       row_number() OVER (PARTITION BY lang, len_bucket
                           ORDER BY score DESC, doc_id) AS rb,
                       row_number() OVER (PARTITION BY lang, len_bucket
                           ORDER BY score ASC, doc_id) AS rw
                FROM s)
            SELECT b.lang, b.len_bucket,
                   b.doc_id AS chosen_id, w.doc_id AS rejected_id,
                   b.score - w.score AS gap_e6
            FROM r b JOIN r w
                ON b.lang = w.lang AND b.len_bucket = w.len_bucket
            WHERE b.rb = 1 AND w.rw = 1
              AND b.doc_id <> w.doc_id AND b.score > w.score
        """,
        "winnow_overlap": """
            WITH grams AS (
                SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       md5(substr(text, CAST(i AS INT), 8)) AS h
                FROM (SELECT doc_id, text,
                             unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i
                      FROM documents)),
            win AS (
                SELECT doc_id, pos AS s,
                       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
                FROM grams),
            fps AS (
                SELECT DISTINCT w.doc_id, w.wmin AS fp
                FROM win w),
            ok AS (
                SELECT fp FROM fps GROUP BY fp HAVING count(*) BETWEEN 2 AND 8),
            pairs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       CAST(count(*) AS BIGINT) AS shared
                FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
                WHERE a.fp IN (SELECT fp FROM ok)
                GROUP BY 1, 2)
            SELECT doc_a, doc_b, shared FROM pairs WHERE shared >= 3
        """,
        "winnow_prints": """
            WITH grams AS (
                SELECT doc_id, CAST(i AS BIGINT) AS pos,
                       md5(substr(text, CAST(i AS INT), 8)) AS h
                FROM (SELECT doc_id, text,
                             unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i
                      FROM documents)),
            win AS (
                SELECT doc_id, pos AS s,
                       MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
                FROM grams)
            SELECT DISTINCT g.doc_id, max(g.pos) AS pos, w.wmin AS fp
            FROM win w
            JOIN grams g ON g.doc_id = w.doc_id
                        AND g.pos BETWEEN w.s AND w.s + 3
                        AND g.h = w.wmin
            GROUP BY g.doc_id, w.doc_id, w.s, w.wmin
        """,
        "semantic_dedup": """
            WITH base AS (
                SELECT vec_id, label, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 100000, label,
                       list_transform(embedding, x -> x * 1.001)
                FROM embeddings WHERE vec_id % 50 = 0
                UNION ALL
                SELECT -(vec_id + 1), label,
                       list_transform(embedding, x -> x * 1.001)
                FROM embeddings WHERE vec_id % 70 = 0),
            q AS (
                SELECT vec_id, label,
                       list_transform(embedding, x -> CAST(floor(x * 100) AS BIGINT)) AS qe
                FROM base),
            n AS (
                SELECT vec_id, label, qe,
                       CAST(list_sum(list_transform(qe, x -> x * x)) AS BIGINT) AS nn
                FROM q),
            p AS (
                SELECT b.vec_id AS drop_id
                FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
                WHERE list_dot_product(a.qe, b.qe) > 0
                  AND 10000 * list_dot_product(a.qe, b.qe) ** 2 >= 9025 * a.nn * b.nn)
            SELECT vec_id, label FROM n WHERE vec_id NOT IN (SELECT drop_id FROM p)
        """,
        "quantile_filter": """
            WITH q AS (
                SELECT doc_id, length(text) AS n_chars,
                       CASE WHEN trim(text) = '' THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                       length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct,
                       length(regexp_replace(text, '\\s', '', 'g')) AS non_space
                FROM documents),
            scored AS (
                SELECT doc_id, n_chars, n_tokens,
                       CAST(floor(n_punct * 1000000.0 / greatest(n_chars, 1)) AS BIGINT) AS punct_ratio_e6,
                       CAST(floor(non_space * 1000000.0 / greatest(n_tokens, 1)) AS BIGINT) AS mean_token_len_e6
                FROM q),
            t AS (SELECT quantile_disc(mean_token_len_e6, 0.10) AS th FROM scored)
            SELECT scored.* FROM scored, t WHERE mean_token_len_e6 >= t.th
        """,
        "table_profile": _profile_sql(),
        "json_stats": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                   CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
                   CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
            FROM events GROUP BY event_type
        """,
        "funnel_windowed": """
            WITH v AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ), c AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN v USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > v.t1
                  AND e.ts <= v.t1 + INTERVAL 7 DAY
                GROUP BY e.user_id
            ), p AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN c USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > c.t2
                  AND e.ts <= c.t2 + INTERVAL 7 DAY
                GROUP BY e.user_id
            )
            SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
                   CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
            UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
            UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)
        """,
        "funnel": """
            WITH v AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ), c AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN v USING (user_id)
                WHERE e.event_type = 'click' AND e.ts > v.t1
                GROUP BY e.user_id
            ), p AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN c USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts > c.t2
                GROUP BY e.user_id
            )
            SELECT CAST(1 AS BIGINT) AS step, 'view' AS event_type,
                   CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
            UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
            UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)
        """,
        "hll_by_type": """
            WITH v AS (
                SELECT DISTINCT event_type AS grp,
                       CAST(user_id AS VARCHAR) AS s
                FROM events WHERE user_id IS NOT NULL
            ), h AS (
                SELECT grp,
                       CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS x
                FROM v
            ), r AS (
                SELECT grp, x % 64 AS register, x // 64 AS rest FROM h
            ), q AS (
                SELECT grp, register,
                       CASE WHEN rest = 0 THEN 61
                            ELSE bit_count((rest & -rest) - 1) + 1 END AS rho
                FROM r
            )
            SELECT grp AS "group", CAST(register AS BIGINT) AS register,
                   CAST(max(rho) AS BIGINT) AS max_rho
            FROM q GROUP BY grp, register
        """,
        "cohort_retention": """
            WITH w AS (
                SELECT user_id,
                       date_diff('day', TIMESTAMP '1970-01-01', ts) // 7 AS week
                FROM events
            ), c AS (
                SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id
            )
            SELECT c.cohort_week, w.week - c.cohort_week AS weeks_since,
                   CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
            FROM w JOIN c USING (user_id)
            GROUP BY 1, 2
        """,
        "trend_by_type": """
            SELECT event_type,
                   round(regr_slope(value,
                       epoch(ts - TIMESTAMP '2024-01-01') / 86400.0), 4) AS slope,
                   round(regr_intercept(value,
                       epoch(ts - TIMESTAMP '2024-01-01') / 86400.0), 4) AS intercept
            FROM events GROUP BY event_type
        """,
        "embed_moments": """
            WITH x AS (
                SELECT vec_id, CAST(i AS INT) AS i,
                       CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS xi
                FROM embeddings,
                     LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i) r
            )
            SELECT CAST(a.i - 1 AS BIGINT) AS i, CAST(b.i - 1 AS BIGINT) AS j,
                   round(sum(a.xi * b.xi), 4) AS sum_xy
            FROM x a JOIN x b USING (vec_id)
            GROUP BY 1, 2
        """,
        "skew_join": """
            WITH l AS (
                SELECT CASE WHEN l_linenumber > 1 THEN 1
                            ELSE l_partkey END AS k,
                       l_orderkey AS orderkey,
                       l_linenumber AS linenumber,
                       l_quantity AS qty
                FROM lineitem
            )
            SELECT l.k, l.orderkey, l.linenumber, l.qty, p.p_brand
            FROM l LEFT JOIN part p ON p.p_partkey = l.k
        """,
        "windowed_delta": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "cdc_state": """
            WITH chg AS (
                SELECT o_custkey AS k, o_totalprice AS val,
                       CASE WHEN o_orderstatus = 'F' THEN 'delete'
                            ELSE 'upsert' END AS op,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC
                       ) AS rn
                FROM orders
            ), last AS (SELECT k, val, op FROM chg WHERE rn = 1)
            SELECT c.c_custkey AS custkey, c.c_acctbal AS acctbal
            FROM customer c LEFT JOIN last l ON l.k = c.c_custkey
            WHERE l.k IS NULL
            UNION ALL
            SELECT l.k AS custkey, l.val AS acctbal
            FROM last l WHERE l.op = 'upsert'
        """,
        "psi_drift": """
            WITH c AS (
                SELECT ts,
                       least(CAST(floor(value * 100 + 0.5) AS BIGINT) // 1000,
                             15) AS bin
                FROM events
            ),
            bins AS (SELECT unnest(range(16)) AS bin),
            ca AS (
                SELECT bin, count(*) AS n FROM c
                WHERE ts < TIMESTAMP '2024-01-16' GROUP BY bin
            ),
            cb AS (
                SELECT bin, count(*) AS n FROM c
                WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY bin
            ),
            tot AS (
                SELECT (SELECT count(*) FROM c WHERE ts < TIMESTAMP '2024-01-16')
                           AS ta,
                       (SELECT count(*) FROM c WHERE ts >= TIMESTAMP '2024-01-16')
                           AS tb
            ),
            j AS (
                SELECT b.bin,
                       CAST(coalesce(ca.n, 0) AS BIGINT) AS n_a,
                       CAST(coalesce(cb.n, 0) AS BIGINT) AS n_b,
                       (coalesce(ca.n, 0) + 1) / (t.ta + 16.0) AS pa,
                       (coalesce(cb.n, 0) + 1) / (t.tb + 16.0) AS pb
                FROM bins b LEFT JOIN ca USING (bin) LEFT JOIN cb USING (bin),
                     tot t
            )
            SELECT CAST(bin AS BIGINT) AS bin, n_a, n_b,
                   round((pa - pb) * ln(pa / pb), 6) AS psi_term
            FROM j ORDER BY bin
        """,
        "asof_state": """
            WITH chg AS (
                SELECT o_custkey AS k, o_totalprice AS val,
                       CASE WHEN o_orderstatus = 'F' THEN 'delete'
                            ELSE 'upsert' END AS op,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY o_orderdate DESC, o_orderkey DESC
                       ) AS rn
                FROM orders
                WHERE o_orderdate <= TIMESTAMP '1998-01-01'
            ), last AS (SELECT k, val, op FROM chg WHERE rn = 1)
            SELECT c.c_custkey AS custkey, c.c_acctbal AS acctbal
            FROM customer c LEFT JOIN last l ON l.k = c.c_custkey
            WHERE l.k IS NULL
            UNION ALL
            SELECT l.k AS custkey, l.val AS acctbal
            FROM last l WHERE l.op = 'upsert'
        """,
        "scd2_intervals": """
            SELECT user_id, event_type, ts AS valid_from,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS valid_to
            FROM events
        """,
        "lang_heavy_tokens": """
            WITH tok AS (
                SELECT lang,
                       lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS token
                FROM documents
            ), tot AS (
                SELECT lang, count(*) AS n FROM tok GROUP BY lang
            ), c AS (
                SELECT lang, token, count(*) AS n_occ
                FROM tok GROUP BY lang, token
            )
            SELECT c.lang, c.token, c.n_occ
            FROM c JOIN tot USING (lang)
            WHERE 500 * c.n_occ >= tot.n
        """,
        "event_transitions": """
            WITH s AS (
                SELECT event_type,
                       lag(event_type) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                       ) AS prev
                FROM events
            )
            SELECT prev AS prev_type, event_type AS next_type,
                   count(*) AS n_trans
            FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type
        """,
        "cms_tokens": """
            WITH tok AS (
                SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS token
                FROM documents
            ), cnt AS (
                SELECT token, count(*) AS n FROM tok GROUP BY token
            ), cells AS (
                SELECT CAST(d AS BIGINT) AS d,
                       CAST(('0x' || substr(md5(d || ':' || token), 1, 15)) AS BIGINT)
                           % 512 AS cell,
                       n
                FROM cnt, (SELECT unnest(range(4)) AS d) ds
            )
            SELECT d, cell, CAST(sum(n) AS BIGINT) AS count
            FROM cells GROUP BY d, cell
        """,
        "bpe_pairs": """
            WITH tok AS (
                SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS token
                FROM documents
            ), pairs AS (
                SELECT substr(token, CAST(i AS INT), 2) AS pair
                FROM tok, LATERAL (SELECT unnest(range(1, length(token))) AS i) r
                WHERE length(token) >= 2
            )
            SELECT pair, count(*) AS n_occ FROM pairs GROUP BY pair
        """,
        # Recursive-CTE replay of apply_bpe's min-(rank, leftmost-i)
        # merge loop over DISTINCT tokens (vocab-bounded, ≤ len(token)
        # rounds each); list_position gives the 1-based merge rank
        # (0 = absent in this DuckDB — nullif'd to the 999999 sentinel).
        "bpe_encode_apply": f"""
            WITH RECURSIVE
            tok AS (
                SELECT doc_id,
                       lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS token
                FROM documents
            ),
            tokn AS (SELECT doc_id, token, count(*) AS n FROM tok GROUP BY 1, 2),
            dtok AS (SELECT DISTINCT token FROM tokn),
            seg(token, syms, it) AS (
                SELECT token, regexp_extract_all(token, '.'), 0 FROM dtok
                UNION ALL
                SELECT token,
                       list_slice(syms, 1, best[2] - 1)
                         || [syms[best[2]] || syms[best[2] + 1]]
                         || list_slice(syms, best[2] + 2, len(syms)),
                       it + 1
                FROM (
                    SELECT token, syms, it,
                           list_aggregate(
                               list_transform(range(1, len(syms)),
                                   i -> [coalesce(nullif(list_position(
                                             {BPE_MLIST},
                                             syms[i] || ' ' || syms[i + 1]), 0),
                                         999999), i]),
                               'min') AS best
                    FROM seg
                ) WHERE best IS NOT NULL AND best[1] < 999999
            ),
            sub AS (
                SELECT token, CAST(len(arg_max(syms, it)) AS BIGINT) AS n_sub
                FROM seg GROUP BY token
            ),
            per AS (
                SELECT t.doc_id, SUM(t.n) AS n_tokens,
                       SUM(t.n * s.n_sub) AS n_subwords
                FROM tokn t JOIN sub s USING (token) GROUP BY 1
            )
            SELECT d.doc_id AS id,
                   CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
                   CAST(coalesce(p.n_subwords, 0) AS BIGINT) AS n_subwords
            FROM documents d LEFT JOIN per p USING (doc_id)
        """,
        "hll_overlap": """
            WITH reg AS (
                SELECT event_type, x % 256 AS register,
                       CASE WHEN x // 256 = 0 THEN 61
                            ELSE bit_count(((x // 256) & -(x // 256)) - 1) + 1
                       END AS rho
                FROM (
                    SELECT event_type,
                           CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                1, 15)) AS BIGINT) AS x
                    FROM (SELECT DISTINCT event_type, user_id FROM events
                          WHERE event_type IN ('click', 'view'))
                )
            ), m AS (
                SELECT event_type, register, max(rho) AS max_rho
                FROM reg GROUP BY 1, 2
            ), c AS (SELECT register, max_rho FROM m WHERE event_type = 'click'),
            v AS (SELECT register, max_rho FROM m WHERE event_type = 'view')
            SELECT CAST(coalesce(c.register, v.register) AS BIGINT) AS register,
                   CAST(coalesce(c.max_rho, 0) AS BIGINT) AS r_click,
                   CAST(coalesce(v.max_rho, 0) AS BIGINT) AS r_view,
                   CAST(greatest(coalesce(c.max_rho, 0), coalesce(v.max_rho, 0))
                        AS BIGINT) AS r_union
            FROM c FULL OUTER JOIN v ON c.register = v.register
        """,
        "hll_users": """
            WITH v AS (
                SELECT DISTINCT CAST(user_id AS VARCHAR) AS s FROM events
                WHERE user_id IS NOT NULL
            ), h AS (
                SELECT CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS x FROM v
            ), r AS (
                SELECT x % 256 AS register, x // 256 AS rest FROM h
            ), q AS (
                SELECT register,
                       CASE WHEN rest = 0 THEN 61
                            ELSE bit_count((rest & -rest) - 1) + 1 END AS rho
                FROM r
            )
            SELECT CAST(register AS BIGINT) AS register,
                   CAST(max(rho) AS BIGINT) AS max_rho
            FROM q GROUP BY register
        """,
        "passages": """
            WITH w AS (
                SELECT doc_id, text,
                       greatest(CAST(ceil(length(text) / 128.0) AS BIGINT), 1) AS nw
                FROM documents
            ), e AS (
                SELECT doc_id, unnest(range(0, nw)) AS win_id, text FROM w
            )
            SELECT doc_id, CAST(win_id AS BIGINT) AS win_id,
                   CAST(win_id * 128 AS BIGINT) AS start,
                   CAST(length(substr(text, CAST(win_id * 128 + 1 AS INT), 256))
                        AS BIGINT) AS n_chars,
                   md5(substr(text, CAST(win_id * 128 + 1 AS INT), 256)) AS passage_md5
            FROM e
        """,
        "ccnet_lang_buckets": """
            WITH docs AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS i
                FROM docs
            ), big AS (
                SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
            ), model AS (
                SELECT bigram, count(*) AS c FROM big
                GROUP BY bigram HAVING count(*) >= 16
            ), fam AS (
                SELECT b.doc_id,
                       CAST(coalesce(sum(m.c), 0) AS BIGINT) AS familiarity
                FROM big b LEFT JOIN model m USING (bigram)
                GROUP BY b.doc_id
            ), j AS (
                SELECT f.doc_id, d.lang, f.familiarity
                FROM fam f JOIN documents d USING (doc_id)
            ), th AS (
                SELECT doc_id, lang, familiarity,
                       quantile_disc(familiarity, 1.0/3.0)
                           OVER (PARTITION BY lang) AS t1,
                       quantile_disc(familiarity, 2.0/3.0)
                           OVER (PARTITION BY lang) AS t2
                FROM j
            )
            SELECT doc_id, lang, familiarity,
                   CASE WHEN familiarity > t2 THEN 'head'
                        WHEN familiarity > t1 THEN 'middle'
                        ELSE 'tail' END AS ccnet_bucket
            FROM th
        """,
        "ccnet_buckets": """
            WITH docs AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS i
                FROM docs
            ), big AS (
                SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
            ), model AS (
                SELECT bigram, count(*) AS c FROM big
                GROUP BY bigram HAVING count(*) >= 16
            ), fam AS (
                SELECT b.doc_id,
                       CAST(coalesce(sum(m.c), 0) AS BIGINT) AS familiarity
                FROM big b LEFT JOIN model m USING (bigram)
                GROUP BY b.doc_id
            ), th AS (
                SELECT quantile_disc(familiarity, 1.0/3.0) AS t1,
                       quantile_disc(familiarity, 2.0/3.0) AS t2
                FROM fam
            )
            SELECT doc_id, familiarity,
                   CASE WHEN familiarity > t2 THEN 'head'
                        WHEN familiarity > t1 THEN 'middle'
                        ELSE 'tail' END AS ccnet_bucket
            FROM fam, th
        """,
        "lm_familiarity": """
            WITH docs AS (
                SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                FROM documents
            ), tok AS (
                SELECT doc_id, unnest(toks) AS tok,
                       generate_subscripts(toks, 1) AS i
                FROM docs
            ), big AS (
                SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram
                FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
            ), model AS (
                SELECT bigram, count(*) AS c FROM big
                GROUP BY bigram HAVING count(*) >= 16
            ), scored AS (
                SELECT b.doc_id, count(*) AS n_bigrams, count(m.bigram) AS covered,
                       CAST(coalesce(sum(m.c), 0) AS BIGINT) AS familiarity
                FROM big b LEFT JOIN model m USING (bigram)
                GROUP BY b.doc_id
            )
            SELECT doc_id, n_bigrams, covered, familiarity,
                   CAST(floor(1000000.0 * covered / n_bigrams) AS BIGINT) AS coverage_e6
            FROM scored
        """,
        "extraction_f1": """
            SELECT CAST(1000000 AS BIGINT) AS precision_e6,
                   CAST(1000000 AS BIGINT) AS recall_e6,
                   (SELECT count(*) FROM documents) AS tp
        """,
        "extract_text": f"""
            WITH {FACTS}
            SELECT {URL} AS url, {PTXT} AS text {JOIN}
        """,
        "chunk_stats": f"""
            WITH {FACTS}
            SELECT {URL} AS url,
                   CAST(ceil(length(d.text) / 510.0) AS BIGINT) + 1 AS n_chunks
            {JOIN}
        """,
        "kg_mentions": f"""
            WITH {FACTS}
            SELECT {URL} AS url, f.sub_label AS label,
                   {BASE} AS start, {BASE} + f.sub_len AS "end",
                   f.subject AS mention
            {JOIN}
            UNION ALL
            SELECT {URL} AS url, f.obj_label AS label,
                   {BASE} + f.sub_len + f.pre_len AS start,
                   {BASE} + f.sub_len + f.pre_len + f.obj_len AS "end",
                   f.object AS mention
            {JOIN}
        """,
        "kg_triples": f"""
            WITH {FACTS}
            SELECT {URL} AS url, f.predicate AS predicate,
                   f.subject AS subject, f.object AS object
            {JOIN}
        """,
        "kg_triples_npnn": f"""
            WITH {FACTS}
            SELECT {URL} AS url, f.predicate AS predicate,
                   f.subject AS subject, f.object AS object
            {JOIN}
            WHERE d.doc_id % 10 = 0
        """,
        "entity_comentions": f"""
            WITH {FACTS}, {EIDS}
            SELECT least(e.sub_eid, e.obj_eid) AS eid_a,
                   greatest(e.sub_eid, e.obj_eid) AS eid_b,
                   count(*) AS n_docs
            FROM documents d
            JOIN facts f ON f.i = d.doc_id % {NF}
            JOIN eids e ON e.i = f.i
            WHERE e.sub_eid <> e.obj_eid
            GROUP BY 1, 2
        """,
        "kg_edges": f"""
            WITH {FACTS}, {EIDS}
            SELECT e.sub_eid AS subject_id, f.predicate AS predicate,
                   e.obj_eid AS object_id, count(*) AS n_support
            FROM documents d
            JOIN facts f ON f.i = d.doc_id % {NF}
            JOIN eids e ON e.i = f.i
            GROUP BY 1, 2, 3
        """,
        "kg_edge_history": f"""
            WITH {FACTS}
            SELECT f.subject AS subject, f.predicate AS predicate,
                   f.object AS object,
                   CAST(min(d.doc_id) AS BIGINT) AS first_seen_s,
                   CAST(max(d.doc_id) AS BIGINT) AS last_seen_s,
                   count(*) AS n_seen
            {JOIN}
            GROUP BY 1, 2, 3
        """,
        "kg_contradictions": f"""
            WITH {FACTS},
            h AS (
                SELECT f.subject AS subject, f.predicate AS predicate,
                       f.object AS object,
                       CAST(min(d.doc_id) AS BIGINT) AS first_seen_s,
                       CAST(max(d.doc_id) AS BIGINT) AS last_seen_s
                {JOIN}
                GROUP BY 1, 2, 3
            )
            SELECT a.subject AS subject, a.predicate AS predicate,
                   a.object AS object_a, b.object AS object_b,
                   greatest(a.first_seen_s, b.first_seen_s) AS overlap_start_s,
                   least(a.last_seen_s, b.last_seen_s) AS overlap_end_s
            FROM h a JOIN h b
              ON a.subject = b.subject AND a.predicate = b.predicate
             AND a.object < b.object
            WHERE greatest(a.first_seen_s, b.first_seen_s)
               <= least(a.last_seen_s, b.last_seen_s)
        """,
        "kg_type_signatures": f"""
            WITH {FACTS}
            SELECT f.predicate AS predicate, f.sub_label AS sub_label,
                   f.obj_label AS obj_label, count(*) AS n
            {JOIN}
            GROUP BY 1, 2, 3
        """,
        "kg_provenance": f"""
            WITH {FACTS}
            SELECT f.subject AS subject, f.predicate AS predicate,
                   f.object AS object, count(*) AS n_docs,
                   CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs
            {JOIN}
            GROUP BY 1, 2, 3
        """,
        "rw_corpus": f"""
            WITH {FACTS}, {EIDS},
            ed AS (
                SELECT DISTINCT e.sub_eid AS cur, e.obj_eid AS dst
                FROM documents d
                JOIN facts f ON f.i = d.doc_id % {NF}
                JOIN eids e ON e.i = f.i
            ),
            adj AS (
                SELECT cur, dst,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY cur ORDER BY dst) - 1
                           AS BIGINT) AS rnk,
                       CAST(count(*) OVER (PARTITION BY cur)
                           AS BIGINT) AS outdeg
                FROM ed
            ),
            nodes AS (SELECT cur AS n FROM ed UNION SELECT dst FROM ed),
            f0 AS (SELECT n AS start, n AS node FROM nodes),
            s1 AS (
                SELECT f.start, a.dst AS node
                FROM f0 f JOIN adj a ON a.cur = f.node
                 AND a.rnk = CAST(('0x' || substr(md5(
                         f.start || '|0|' || f.node), 1, 15)) AS BIGINT)
                     % a.outdeg
            ),
            s2 AS (
                SELECT f.start, a.dst AS node
                FROM s1 f JOIN adj a ON a.cur = f.node
                 AND a.rnk = CAST(('0x' || substr(md5(
                         f.start || '|1|' || f.node), 1, 15)) AS BIGINT)
                     % a.outdeg
            ),
            s3 AS (
                SELECT f.start, a.dst AS node
                FROM s2 f JOIN adj a ON a.cur = f.node
                 AND a.rnk = CAST(('0x' || substr(md5(
                         f.start || '|2|' || f.node), 1, 15)) AS BIGINT)
                     % a.outdeg
            )
            SELECT start, CAST(0 AS BIGINT) AS step, node FROM f0
            UNION ALL SELECT start, CAST(1 AS BIGINT), node FROM s1
            UNION ALL SELECT start, CAST(2 AS BIGINT), node FROM s2
            UNION ALL SELECT start, CAST(3 AS BIGINT), node FROM s3
        """,
        "walk_skipgrams": f"""
            WITH {FACTS}, {EIDS},
            ed AS (
                SELECT DISTINCT e.sub_eid AS cur, e.obj_eid AS dst
                FROM documents d
                JOIN facts f ON f.i = d.doc_id % {NF}
                JOIN eids e ON e.i = f.i
            ),
            adj AS (
                SELECT cur, dst,
                       CAST(ROW_NUMBER() OVER (
                           PARTITION BY cur ORDER BY dst) - 1
                           AS BIGINT) AS rnk,
                       CAST(count(*) OVER (PARTITION BY cur)
                           AS BIGINT) AS outdeg
                FROM ed
            ),
            nodes AS (SELECT cur AS n FROM ed UNION SELECT dst FROM ed),
            f0 AS (SELECT n AS start, n AS node FROM nodes),
            s1 AS (
                SELECT f.start, a.dst AS node
                FROM f0 f JOIN adj a ON a.cur = f.node
                 AND a.rnk = CAST(('0x' || substr(md5(
                         f.start || '|0|' || f.node), 1, 15)) AS BIGINT)
                     % a.outdeg
            ),
            s2 AS (
                SELECT f.start, a.dst AS node
                FROM s1 f JOIN adj a ON a.cur = f.node
                 AND a.rnk = CAST(('0x' || substr(md5(
                         f.start || '|1|' || f.node), 1, 15)) AS BIGINT)
                     % a.outdeg
            ),
            s3 AS (
                SELECT f.start, a.dst AS node
                FROM s2 f JOIN adj a ON a.cur = f.node
                 AND a.rnk = CAST(('0x' || substr(md5(
                         f.start || '|2|' || f.node), 1, 15)) AS BIGINT)
                     % a.outdeg
            ),
            w AS (
                SELECT start, CAST(0 AS BIGINT) AS step, node FROM f0
                UNION ALL SELECT start, CAST(1 AS BIGINT), node FROM s1
                UNION ALL SELECT start, CAST(2 AS BIGINT), node FROM s2
                UNION ALL SELECT start, CAST(3 AS BIGINT), node FROM s3
            ),
            vocab AS (
                SELECT node,
                       CAST(ROW_NUMBER() OVER (ORDER BY node) - 1
                           AS BIGINT) AS rnk
                FROM (SELECT DISTINCT node FROM w)
            ),
            vs AS (SELECT CAST(count(*) AS BIGINT) AS v FROM vocab),
            p AS (
                SELECT a.start, a.step AS i, b.step AS j,
                       a.node AS center, b.node AS context
                FROM w a JOIN w b ON a.start = b.start
                WHERE abs(a.step - b.step) BETWEEN 1 AND 2
            ),
            neg AS (
                SELECT p.center, vb.node AS context
                FROM p CROSS JOIN vs
                JOIN vocab vb ON vb.rnk =
                    CAST(('0x' || substr(md5(
                        'neg:' || p.start || ':'
                        || CAST(p.i AS VARCHAR) || ':'
                        || CAST(p.j AS VARCHAR) || ':0'), 1, 15))
                        AS BIGINT) % vs.v
            )
            SELECT center, context, CAST(1 AS BIGINT) AS label,
                   count(*) AS n
            FROM p GROUP BY 1, 2
            UNION ALL
            SELECT center, context, CAST(0 AS BIGINT), count(*)
            FROM neg GROUP BY 1, 2
        """,
        "kg_degree_profile": f"""
            WITH {FACTS}, {EIDS},
            ed AS (
                SELECT DISTINCT e.sub_eid, f.predicate, e.obj_eid
                FROM documents d
                JOIN facts f ON f.i = d.doc_id % {NF}
                JOIN eids e ON e.i = f.i
            ),
            t AS (
                SELECT sub_eid AS entity_id, 1 AS o, 0 AS i2, predicate
                FROM ed
                UNION ALL
                SELECT obj_eid, 0, 1, NULL FROM ed
            )
            SELECT entity_id,
                   CAST(sum(o) AS BIGINT) AS out_deg,
                   CAST(sum(i2) AS BIGINT) AS in_deg,
                   CAST(count(DISTINCT predicate) AS BIGINT)
                       AS n_out_predicates
            FROM t GROUP BY 1
        """,
        "blocking_pairs": f"""
            WITH u AS (
                SELECT DISTINCT
                       source || '/' || CAST(doc_id % 61 AS VARCHAR) AS v
                FROM documents
            ), s AS (
                SELECT v, lead(v) OVER (ORDER BY v) AS nxt FROM u
            ), p AS (
                SELECT v AS a, nxt AS b,
                       CAST({" + ".join(
                           f"CASE WHEN substr(v, 1, {i}) = substr(nxt, 1, {i}) "
                           f"AND length(v) >= {i} AND length(nxt) >= {i} "
                           f"THEN 1 ELSE 0 END"
                           for i in range(1, 33)
                       )} AS BIGINT) AS prefix_len
                FROM s WHERE nxt IS NOT NULL
            )
            SELECT a, b, prefix_len FROM p WHERE prefix_len >= 4
        """,
        "er_matches": """
            WITH u AS (
                SELECT DISTINCT
                       source || '/' || CAST(doc_id % 61 AS VARCHAR) AS v
                FROM documents
            ), s AS (
                SELECT v, lead(v) OVER (ORDER BY v) AS nxt FROM u
            ), p AS (
                SELECT v AS a, nxt AS b,
                       CAST(""" + " + ".join(
                           f"CASE WHEN substr(v, 1, {i}) = substr(nxt, 1, {i}) "
                           f"AND length(v) >= {i} AND length(nxt) >= {i} "
                           f"THEN 1 ELSE 0 END"
                           for i in range(1, 33)
                       ) + """ AS BIGINT) AS prefix_len
                FROM s WHERE nxt IS NOT NULL
            )
            SELECT a, b, CAST(levenshtein(a, b) AS BIGINT) AS edit_dist
            FROM p WHERE prefix_len >= 4 AND levenshtein(a, b) <= 2
        """,
        # match edges are sort-successor pairs, so clusters are
        # gaps-and-islands runs over the sorted distinct vocabulary
        "golden_records": """
            WITH u AS (
                SELECT DISTINCT
                       source || '/' || CAST(doc_id % 61 AS VARCHAR) AS v
                FROM documents
            ), s AS (
                SELECT v, lag(v) OVER (ORDER BY v) AS prv FROM u
            ), e AS (
                SELECT v,
                       CASE WHEN prv IS NOT NULL
                            AND (""" + " + ".join(
                                f"CASE WHEN substr(prv, 1, {i}) = substr(v, 1, {i}) "
                                f"AND length(prv) >= {i} AND length(v) >= {i} "
                                f"THEN 1 ELSE 0 END"
                                for i in range(1, 33)
                            ) + """) >= 4
                            AND levenshtein(prv, v) <= 2
                       THEN 0 ELSE 1 END AS brk
                FROM s
            ), g AS (
                SELECT v,
                       sum(brk) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                           AS grp
                FROM e
            ), c AS (
                SELECT grp, min(v) AS cluster_id,
                       CAST(count(*) AS BIGINT) AS n_members
                FROM g GROUP BY grp HAVING count(*) >= 2
            ), can AS (
                SELECT grp, v,
                       row_number() OVER (
                           PARTITION BY grp ORDER BY length(v) DESC, v
                       ) AS rn
                FROM g
            )
            SELECT c.cluster_id, c.n_members, can.v AS canonical
            FROM c JOIN can ON can.grp = c.grp AND can.rn = 1
        """,
        "bucketed_join": """
            SELECT o.o_custkey,
                   CAST(count(*) AS BIGINT) AS n_items,
                   CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_custkey
        """,
        "source_ttr": """
            WITH tok AS (
                SELECT source,
                       lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS token
                FROM documents
            ), t AS (
                SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
                       CAST(count(DISTINCT token) AS BIGINT) AS n_types
                FROM tok GROUP BY source
            )
            SELECT source, n_tokens, n_types,
                   CAST(1000000 * n_types // n_tokens AS BIGINT) AS ttr_e6
            FROM t
        """,
        "kg_violations": f"""
            WITH {FACTS}, {EIDS},
            edges AS (
                SELECT e.sub_eid AS s, f.predicate AS p, e.obj_eid AS o,
                       count(*) AS n
                FROM documents d
                JOIN facts f ON f.i = d.doc_id % {NF}
                JOIN eids e ON e.i = f.i
                GROUP BY 1, 2, 3
            ),
            v AS (
                SELECT s AS subject_id, p AS predicate,
                       CAST(count(*) AS BIGINT) AS n_objects,
                       CAST(sum(n) AS BIGINT) AS total_support
                FROM edges GROUP BY 1, 2
            )
            SELECT * FROM v WHERE n_objects > 1
        """,
        "kg_paths": f"""
            WITH {FACTS}, {EIDS},
            edges AS (
                SELECT DISTINCT e.sub_eid AS s, f.predicate AS p, e.obj_eid AS o
                FROM documents d
                JOIN facts f ON f.i = d.doc_id % {NF}
                JOIN eids e ON e.i = f.i
            )
            SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS n_paths
            FROM edges a JOIN edges b ON a.o = b.s
            GROUP BY 1, 2
        """,
        "kg_walks": _walks_sql_over(
            f"""{FACTS}, {EIDS},
            edges AS (SELECT DISTINCT e.sub_eid AS src, e.obj_eid AS dst
                      FROM documents d
                      JOIN facts f ON f.i = d.doc_id % {NF}
                      JOIN eids e ON e.i = f.i)""",
            walk_len=4,
            walks_per_node=2,
        ),
        "weighted_salience": _pagerank_sql_over(
            f"""{FACTS}, {EIDS},
            edges AS (SELECT e.sub_eid AS src, e.obj_eid AS dst,
                             CAST(count(*) AS BIGINT) AS w
                      FROM documents d
                      JOIN facts f ON f.i = d.doc_id % {NF}
                      JOIN eids e ON e.i = f.i
                      GROUP BY 1, 2)""",
            n_iter=3,
            weighted=True,
        ),
        "related_entities": _pagerank_sql_over(
            f"""{FACTS}, {EIDS},
            edges AS (SELECT DISTINCT e.sub_eid AS src, e.obj_eid AS dst
                      FROM documents d
                      JOIN facts f ON f.i = d.doc_id % {NF}
                      JOIN eids e ON e.i = f.i)""",
            n_iter=3,
            seeds=_ppr_seeds(),
        ),
        "entity_salience": _pagerank_sql_over(
            f"""{FACTS}, {EIDS},
            edges AS (SELECT DISTINCT e.sub_eid AS src, e.obj_eid AS dst
                      FROM documents d
                      JOIN facts f ON f.i = d.doc_id % {NF}
                      JOIN eids e ON e.i = f.i)""",
            n_iter=3,
        ),
        "user_activity": """
            WITH c AS (
                SELECT user_id, count(*) AS n_clicks FROM events
                WHERE event_type = 'click' GROUP BY user_id
            ), e AS (
                SELECT user_id, count(*) AS n_errors FROM events
                WHERE event_type = 'error' GROUP BY user_id
            )
            SELECT CAST(coalesce(c.user_id, e.user_id) AS BIGINT) AS user_id,
                   CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks,
                   CAST(coalesce(e.n_errors, 0) AS BIGINT) AS n_errors
            FROM c FULL OUTER JOIN e ON c.user_id = e.user_id
        """,
        "kg_reciprocity": f"""
            WITH {FACTS}, {EIDS},
            edges AS (SELECT DISTINCT e.sub_eid AS src, e.obj_eid AS dst
                      FROM documents d
                      JOIN facts f ON f.i = d.doc_id % {NF}
                      JOIN eids e ON e.i = f.i)
            SELECT (SELECT count(*) FROM edges) AS n_edges,
                   (SELECT count(*) FROM edges e
                    WHERE e.src = e.dst OR EXISTS (
                        SELECT 1 FROM edges r
                        WHERE r.src = e.dst AND r.dst = e.src
                    )) AS n_reciprocal
        """,
        "kg_degrees": f"""
            WITH {FACTS}, {EIDS},
            edges AS (SELECT DISTINCT e.sub_eid AS src, e.obj_eid AS dst
                      FROM documents d
                      JOIN facts f ON f.i = d.doc_id % {NF}
                      JOIN eids e ON e.i = f.i),
            nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
            deg AS (
                SELECT n.node, CAST(coalesce(d.d, 0) AS BIGINT) AS outdeg
                FROM nodes n LEFT JOIN (
                    SELECT src AS node, count(*) AS d FROM edges GROUP BY 1
                ) d USING (node)
            )
            SELECT outdeg, count(*) AS n_nodes
            FROM deg GROUP BY outdeg ORDER BY outdeg
        """,
        "entity_types": f"""
            WITH {FACTS}, {EIDS},
            m AS (
                SELECT e.sub_eid AS entity_id, f.sub_label AS label
                FROM documents d
                JOIN facts f ON f.i = d.doc_id % {NF}
                JOIN eids e ON e.i = f.i
                UNION ALL
                SELECT e.obj_eid AS entity_id, f.obj_label AS label
                FROM documents d
                JOIN facts f ON f.i = d.doc_id % {NF}
                JOIN eids e ON e.i = f.i
            ), c AS (
                SELECT entity_id, label, count(*) AS n
                FROM m GROUP BY 1, 2
            ), r AS (
                SELECT entity_id, label, n,
                       row_number() OVER (
                           PARTITION BY entity_id ORDER BY n DESC, label
                       ) AS rn
                FROM c
            )
            SELECT entity_id, label, CAST(n AS BIGINT) AS n_mentions
            FROM r WHERE rn = 1
        """,
        "kg_edge_spans": f"""
            WITH {FACTS}
            SELECT f.subject, f.predicate, f.object,
                   count(*) AS n_docs,
                   CAST(1700000000000000 + min(d.doc_id) * 1000000 AS BIGINT)
                       AS first_us,
                   CAST(1700000000000000 + max(d.doc_id) * 1000000 AS BIGINT)
                       AS last_us
            FROM documents d JOIN facts f ON f.i = d.doc_id % {NF}
            GROUP BY 1, 2, 3
        """,
        "kg_edges_delta": f"""
            WITH {FACTS}, {EIDS}
            SELECT e.sub_eid AS subject_id, f.predicate AS predicate,
                   e.obj_eid AS object_id, count(*) * 2 AS n_support
            FROM documents d
            JOIN facts f ON f.i = d.doc_id % {NF}
            JOIN eids e ON e.i = f.i
            GROUP BY 1, 2, 3
        """,
        "kg_nodes": f"""
            WITH {FACTS}, {EIDS},
            ment AS (
                SELECT e.sub_eid AS entity_id, f.subject AS name FROM documents d
                JOIN facts f ON f.i = d.doc_id % {NF} JOIN eids e ON e.i = f.i
                UNION ALL
                SELECT e.obj_eid AS entity_id, f.object AS name FROM documents d
                JOIN facts f ON f.i = d.doc_id % {NF} JOIN eids e ON e.i = f.i
            )
            SELECT entity_id, min(name) AS canonical_name,
                   entity_id AS component_id, count(*) AS n_mentions
            FROM ment GROUP BY entity_id
        """,
        "kg_events": f"""
            WITH {FACTS}
            SELECT {URL} AS url, f.predicate AS event_type,
                   '触发词' AS role,
                   substr(f.sentence, f.sub_len + 1, f.pre_len) AS argument,
                   {BASE} + f.sub_len AS start,
                   {BASE} + f.sub_len + f.pre_len AS "end"
            {JOIN}
            UNION ALL
            SELECT {URL} AS url, f.predicate AS event_type,
                   'subject' AS role, f.subject AS argument,
                   {BASE} AS start, {BASE} + f.sub_len AS "end"
            {JOIN}
            UNION ALL
            SELECT {URL} AS url, f.predicate AS event_type,
                   'object' AS role, f.object AS argument,
                   {BASE} + f.sub_len + f.pre_len AS start,
                   {BASE} + f.sub_len + f.pre_len + f.obj_len AS "end"
            {JOIN}
        """,
        "kg_events_npnn": f"""
            WITH {FACTS}
            SELECT {URL} AS url, f.predicate AS event_type,
                   '触发词' AS role,
                   substr(f.sentence, f.sub_len + 1, f.pre_len) AS argument,
                   {BASE} + f.sub_len AS start,
                   {BASE} + f.sub_len + f.pre_len AS "end"
            {JOIN} WHERE d.doc_id % 10 = 0
            UNION ALL
            SELECT {URL} AS url, f.predicate AS event_type,
                   'subject' AS role, f.subject AS argument,
                   {BASE} AS start, {BASE} + f.sub_len AS "end"
            {JOIN} WHERE d.doc_id % 10 = 0
            UNION ALL
            SELECT {URL} AS url, f.predicate AS event_type,
                   'object' AS role, f.object AS argument,
                   {BASE} + f.sub_len + f.pre_len AS start,
                   {BASE} + f.sub_len + f.pre_len + f.obj_len AS "end"
            {JOIN} WHERE d.doc_id % 10 = 0
        """,
        "uie": f"""
            WITH {FACTS}
            SELECT {URL} AS url, 1 AS level, f.sub_label AS prompt,
                   f.subject AS argument,
                   {BASE} AS start, {BASE} + f.sub_len AS "end"
            {JOIN}
            UNION ALL
            SELECT {URL} AS url, 1 AS level, f.obj_label AS prompt,
                   f.object AS argument,
                   {BASE} + f.sub_len + f.pre_len AS start,
                   {BASE} + f.sub_len + f.pre_len + f.obj_len AS "end"
            {JOIN} WHERE f.obj_label IN ('ORG', 'PER')
            UNION ALL
            SELECT {URL} AS url, 2 AS level,
                   f.subject || '的' || f.predicate AS prompt,
                   f.object AS argument,
                   {BASE} + f.sub_len + f.pre_len AS start,
                   {BASE} + f.sub_len + f.pre_len + f.obj_len AS "end"
            {JOIN}
        """,
        "lang_counts": "SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang",
        "token_counts": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
            FROM documents
        """,
        "doc_stats": """
            SELECT doc_id, length(text) AS n_chars,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
                   length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')) AS n_punct
            FROM documents
        """,
        "fuzzy_dedup_docs": """
            WITH planted AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
                UNION ALL
                SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
            )
            SELECT min(doc_id) AS doc_id, count(*) AS cluster_size
            FROM planted GROUP BY text
        """,
        "split_leakage": """
            WITH planted AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
                UNION ALL
                SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
            ), g AS (
                SELECT doc_id,
                       min(doc_id) OVER (PARTITION BY text) AS hub
                FROM planted
            ), p AS (
                SELECT hub AS a, doc_id AS b FROM g WHERE doc_id <> hub
            ), sp AS (
                SELECT a, b,
                       CASE WHEN CAST(('0x' || substr(md5('split:'
                                || CAST(a AS VARCHAR)), 1, 8)) AS BIGINT)
                                % 10000 < 9000 THEN 'train'
                            WHEN CAST(('0x' || substr(md5('split:'
                                || CAST(a AS VARCHAR)), 1, 8)) AS BIGINT)
                                % 10000 < 9500 THEN 'val'
                            ELSE 'test' END AS sa,
                       CASE WHEN CAST(('0x' || substr(md5('split:'
                                || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT)
                                % 10000 < 9000 THEN 'train'
                            WHEN CAST(('0x' || substr(md5('split:'
                                || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT)
                                % 10000 < 9500 THEN 'val'
                            ELSE 'test' END AS sb
                FROM p
            )
            SELECT least(sa, sb) AS split_a, greatest(sa, sb) AS split_b,
                   count(*) AS n_pairs
            FROM sp GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "dedup_keep_best": """
            WITH planted AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
                UNION ALL
                SELECT doc_id + 2000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
            )
            SELECT max(doc_id) AS doc_id, count(*) AS cluster_size
            FROM planted GROUP BY text
        """,
        "stratified_sample": _stratified_sample_sql(),
        "lineitem_orders": """
            SELECT o_orderpriority, count(*) AS n_items,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority
        """,
        "cust_no_orders": """
            SELECT c_mktsegment, count(*) AS n_customers,
                   round(sum(c_acctbal), 2) AS sum_acctbal
            FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
            )
            GROUP BY c_mktsegment
        """,
        "heavy_tokens": """
            WITH tok AS (
                SELECT lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS token
                FROM documents
            )
            SELECT token, count(*) AS n_occ FROM tok GROUP BY token
            HAVING count(*) >= ceil(0.002 * (SELECT count(*) FROM tok))
        """,
        "len_quantiles": " UNION ALL ".join(
            f"SELECT CAST({q} AS DOUBLE) AS q, "
            f"quantile_disc(n_chars, {q}) AS value FROM documents"
            for q in _QUANTILE_QS
        ),
        "grouped_quantiles": " UNION ALL ".join(
            f"SELECT event_type, CAST({q} AS DOUBLE) AS q, "
            f"quantile_disc(CAST(floor(value * 100 + 0.5) AS BIGINT), {q}) AS value "
            f"FROM events GROUP BY event_type"
            for q in _QUANTILE_QS
        ),
        "grouped_topk": """
            SELECT doc_id, lang, n_chars, rank FROM (
                SELECT doc_id, lang, n_chars,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY n_chars DESC, doc_id
                       ) AS rank
                FROM documents
            ) WHERE rank <= 5
        """,
        "cluster_keywords": """
            WITH cent AS (
                SELECT vec_id AS cid, embedding AS cvec
                FROM embeddings ORDER BY vec_id LIMIT 10
            ), d AS (
                SELECT e.vec_id, c.cid,
                       list_distance(e.embedding, c.cvec) AS dist
                FROM embeddings e CROSS JOIN cent c
            ), a AS (
                SELECT vec_id, cid AS cluster_id FROM (
                    SELECT vec_id, cid,
                           row_number() OVER (PARTITION BY vec_id
                               ORDER BY dist, cid) AS rn
                    FROM d) WHERE rn = 1
            ), tok AS (
                SELECT doc_id,
                       lower(unnest(regexp_extract_all(text,
                           '[A-Za-z0-9]+'))) AS token
                FROM documents
            ), cnt AS (
                SELECT a.cluster_id, t.token, count(*) AS n
                FROM tok t JOIN a ON a.vec_id = t.doc_id
                GROUP BY 1, 2
            ), r AS (
                SELECT cluster_id, token, n,
                       row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n DESC, token) AS rn
                FROM cnt)
            SELECT CAST(cluster_id AS BIGINT) AS cluster_id, token,
                   CAST(n AS BIGINT) AS n_occ
            FROM r WHERE rn <= 5
        """,
        "kmeans_lloyd_assign": f"""
            WITH cent AS (
                SELECT * FROM (VALUES {", ".join(
                    f"({i}, {c}::BIGINT[])"
                    for i, c in enumerate(_KMEANS_FROZEN_INT_CENTROIDS)
                )}) t(cid, cvec)
            ), iv AS (
                SELECT vec_id,
                       [CAST(floor(1000 * x) AS BIGINT) FOR x IN embedding] AS v
                FROM embeddings
            ), d AS (
                SELECT iv.vec_id, cent.cid,
                       list_inner_product(iv.v, iv.v)
                         - 2 * list_inner_product(iv.v, cent.cvec)
                         + list_inner_product(cent.cvec, cent.cvec) AS dist
                FROM iv CROSS JOIN cent
            ), r AS (
                SELECT vec_id, cid, row_number() OVER (
                    PARTITION BY vec_id ORDER BY dist, cid) AS rn
                FROM d
            )
            SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id FROM r WHERE rn = 1
        """,
        "kmeans_assign": """
            WITH cent AS (
                SELECT vec_id AS cid, embedding AS cvec
                FROM embeddings ORDER BY vec_id LIMIT 10
            ), d AS (
                SELECT e.vec_id, c.cid, list_distance(e.embedding, c.cvec) AS dist
                FROM embeddings e CROSS JOIN cent c
            ), r AS (
                SELECT vec_id, cid,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                FROM d
            )
            SELECT vec_id, cid AS cluster_id FROM r WHERE rn = 1
        """,
        "doc_frequency": """
            SELECT token, count(DISTINCT doc_id) AS df FROM (
                SELECT doc_id,
                       lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS token
                FROM documents
            ) GROUP BY token
        """,
        "tfidf_terms": """
            WITH tok AS (
                SELECT doc_id,
                       lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS token
                FROM documents
            ), dfq AS (
                SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
            ), nd AS (
                SELECT count(*) AS n FROM documents
            ), tf AS (
                SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
            ), s AS (
                SELECT tf.doc_id, tf.token, tf.tf,
                       round(tf.tf * (ln((nd.n + 1.0) / (dfq.df + 1.0)) + 1.0), 6) AS score
                FROM tf JOIN dfq USING (token) CROSS JOIN nd
                WHERE dfq.df >= 2
            ), r AS (
                SELECT s.*, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, token
                ) AS rank FROM s
            )
            SELECT doc_id, token, tf, score, rank FROM r WHERE rank <= 3
        """,
        "dedup_docs": """
            WITH corpus AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
            )
            SELECT md5(text) AS fingerprint, min(doc_id) AS first_doc_id,
                   count(*) AS n_copies
            FROM corpus GROUP BY md5(text)
        """,
        "triplet_mining": f"""
            WITH q AS (SELECT vec_id AS anchor_id, embedding AS qe
                       FROM embeddings
                       WHERE vec_id IN ({", ".join(str(i) for i in range(0, 500, 50))})),
            scored AS (
                SELECT q.anchor_id, e.vec_id AS pair_id,
                       list_cosine_similarity(q.qe, e.embedding) AS score
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id != q.anchor_id
            ),
            ranked AS (
                SELECT anchor_id, pair_id,
                       row_number() OVER (PARTITION BY anchor_id
                                          ORDER BY score DESC, pair_id ASC) AS rank
                FROM scored
            )
            SELECT anchor_id, pair_id,
                   CASE WHEN rank = 1 THEN 'pos' ELSE 'neg' END AS role, rank
            FROM ranked WHERE rank <= 4
        """,
        "knn": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0,1,2,3)),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_cosine_similarity(q.qe, e.embedding) AS score
                FROM q CROSS JOIN embeddings e
                WHERE e.vec_id != q.query_id
            ),
            ranked AS (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, neighbor_id ASC) AS rank
                FROM scored
            )
            SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 5
        """,
        "bitext_pairs": """
            WITH e AS (
                SELECT vec_id,
                       CASE WHEN vec_id % 2 = 0 THEN 'a' ELSE 'b' END AS side,
                       embedding::DOUBLE[] AS emb
                FROM embeddings
            ),
            sab AS (
                SELECT a.vec_id AS x, b.vec_id AS y,
                       list_cosine_similarity(a.emb, b.emb) AS c
                FROM e a JOIN e b ON a.side = 'a' AND b.side = 'b'
            ),
            fwd AS (SELECT x, y, c,
                           row_number() OVER (PARTITION BY x ORDER BY c DESC, y) AS r
                    FROM sab),
            bwd AS (SELECT x, y, c,
                           row_number() OVER (PARTITION BY y ORDER BY c DESC, x) AS r
                    FROM sab),
            ax AS (SELECT x, avg(c) AS avg_x FROM fwd WHERE r <= 4 GROUP BY x),
            ay AS (SELECT y, avg(c) AS avg_y FROM bwd WHERE r <= 4 GROUP BY y),
            mm AS (
                SELECT f.x, f.y, f.c / ((ax.avg_x + ay.avg_y) / 2) AS margin
                FROM fwd f
                JOIN ax ON ax.x = f.x
                JOIN ay ON ay.y = f.y
                WHERE f.r <= 4
            ),
            best AS (
                SELECT x, y, margin,
                       row_number() OVER (PARTITION BY x
                                          ORDER BY margin DESC, y) AS br
                FROM mm WHERE margin > 1.0
            )
            SELECT x AS src_id, y AS tgt_id, round(margin, 4) AS margin
            FROM best WHERE br = 1
        """,
        "events_by_type": """
            SELECT event_type, count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events GROUP BY event_type
        """,
        "windowed_events": """
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "grid_fill": """
            WITH b AS (
                SELECT date_trunc('day', min(ts)) AS t0, max(ts) AS t1
                FROM events
            ),
            g AS (
                SELECT unnest(generate_series(t0, t1, INTERVAL 1 DAY)) AS ts
                FROM b
            ),
            grid AS (
                SELECT u.user_id, g.ts
                FROM (SELECT DISTINCT user_id FROM events) u CROSS JOIN g
            )
            SELECT grid.user_id, grid.ts AS slot_ts, e.value AS value
            FROM grid ASOF LEFT JOIN events e
              ON grid.user_id = e.user_id AND e.ts <= grid.ts
        """,
        "interval_overlaps": """
            WITH iv AS (
                SELECT l_suppkey AS k,
                       l_orderkey * 10 + l_linenumber AS iid,
                       l_shipdate AS s,
                       l_shipdate
                         + INTERVAL ((l_quantity::INT % 5) + 1) DAY AS e
                FROM lineitem
            )
            SELECT a.k AS k, a.iid AS id_a, b.iid AS id_b
            FROM iv a JOIN iv b
              ON a.k = b.k AND a.iid < b.iid
             AND a.s <= b.e AND b.s <= a.e
        """,
        "rolling_avg": """
            SELECT event_id AS id,
                   count(*) OVER w AS n_window,
                   round(sum(value) OVER w, 4) AS roll_sum,
                   round(avg(value) OVER w, 4) AS roll_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """,
        "hopping_events": """
            SELECT time_bucket(INTERVAL '30 minutes', ts)
                     - i * INTERVAL '30 minutes' AS window_start,
                   event_type, count(*) AS n_events,
                   round(sum(value), 4) AS sum_value
            FROM events CROSS JOIN range(2) t(i)
            GROUP BY 1, 2
        """,
        "session_stats": """
            WITH x AS (
                SELECT user_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), y AS (
                SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sess
                FROM x
            )
            SELECT user_id, min(ts) AS session_start,
                   count(*) AS n_events, round(sum(value), 4) AS sum_value
            FROM y GROUP BY user_id, sess
        """,
        "asof_clicks": """
            SELECT c.event_id, c.user_id,
                   coalesce((
                       SELECT v.event_id FROM events v
                       WHERE v.user_id = c.user_id AND v.event_type = 'view'
                             AND v.ts <= c.ts
                       ORDER BY v.ts DESC, v.event_id DESC LIMIT 1
                   ), -1) AS view_event_id
            FROM events c WHERE c.event_type = 'click'
        """,
        "range_clicks": """
            SELECT c.event_id, c.user_id, v.event_id AS view_event_id
            FROM events c JOIN events v
              ON v.user_id = c.user_id AND v.event_type = 'view'
             AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL '1 hour'
            WHERE c.event_type = 'click'
        """,
        "top_users": """
            SELECT user_id, round(sum(value), 4) AS sum_value,
                   row_number() OVER (ORDER BY sum(value) DESC, user_id ASC) AS rank
            FROM events GROUP BY user_id
            ORDER BY rank LIMIT 10
        """,
        "q1_lineitem": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_revenue,
                   count(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "orders_by_segment": """
            SELECT c.c_mktsegment, count(*) AS n_orders,
                   round(sum(o.o_totalprice), 4) AS sum_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "doc_ranks": """
            SELECT doc_id, n_chars,
                   row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
            FROM documents
        """,
        "url_dedup": f"""
            WITH b AS (
                SELECT doc_id,
                       'example-' || CAST(doc_id % 50 AS VARCHAR) || '.com/p/'
                       || CAST(doc_id AS VARCHAR) AS base
                FROM documents
            ), pages AS (
                SELECT 'https://www.' || base || '/' AS url,
                       (doc_id * 7) % 101 AS warc_ts FROM b
                UNION ALL
                SELECT 'http://' || base, (doc_id * 7 + 13) % 101 FROM b
                UNION ALL
                SELECT 'https://' || base || '?utm_source=feed',
                       (doc_id * 7 + 26) % 101 FROM b
            ), norm AS (
                SELECT {_canon_url_sql('url')} AS canon_url, url,
                       CAST(warc_ts AS BIGINT) AS warc_ts
                FROM pages
            ), ranked AS (
                SELECT canon_url, url, warc_ts,
                       row_number() OVER (
                           PARTITION BY canon_url ORDER BY warc_ts, url
                       ) AS rn,
                       count(*) OVER (PARTITION BY canon_url) AS n_captures
                FROM norm
            )
            SELECT canon_url, url, warc_ts,
                   CAST(n_captures AS BIGINT) AS n_captures
            FROM ranked WHERE rn = 1
        """,
        "corpus_diff": """
            WITH v2 AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 13 = 0 THEN text || ' [rev2]'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 17 <> 0
                UNION ALL
                SELECT doc_id + 1000000,
                       'new ' || CAST(doc_id + 1000000 AS VARCHAR)
                FROM documents WHERE doc_id % 19 = 0
            )
            SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM documents a FULL OUTER JOIN v2 b ON a.doc_id = b.doc_id
            WHERE a.doc_id IS NULL OR b.doc_id IS NULL OR a.text <> b.text
        """,
        "window_uniques": """
            SELECT date_trunc('hour', ts) AS window_start,
                   count(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1
        """,
        "sales_cube": """
            SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
                   COALESCE(l_linestatus, 'ALL') AS l_linestatus,
                   count(*) AS n_rows,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_cents
            FROM lineitem
            GROUP BY GROUPING SETS (
                (l_returnflag, l_linestatus), (l_returnflag), ()
            )
        """,
        "value_moments": """
            WITH c AS (
                SELECT event_type,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events
            )
            SELECT event_type, count(*) AS n,
                   CAST(sum(cents) AS BIGINT) AS sum_cents,
                   CAST(sum(cents * cents) AS BIGINT) AS sumsq_cents
            FROM c GROUP BY event_type
        """,
        "triangles": """
            WITH os AS (
                SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
                WHERE l_orderkey % 20 = 0
            ), e AS (
                SELECT DISTINCT x.s AS a, y.s AS b
                FROM os x JOIN os y ON x.o = y.o AND x.s < y.s
            )
            SELECT count(*) AS n_triangles
            FROM e e1
            JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
        """,
        "mention_contexts": f"""
            WITH {FACTS},
            m AS (
                SELECT {URL} AS url, f.sub_label AS label,
                       {BASE} AS start, {BASE} + f.sub_len AS "end",
                       f.subject AS mention, {BASE} AS cstart,
                       {PTXT} AS ptxt
                {JOIN}
                UNION ALL
                SELECT {URL} AS url, f.obj_label AS label,
                       {BASE} + f.sub_len + f.pre_len AS start,
                       {BASE} + f.sub_len + f.pre_len + f.obj_len AS "end",
                       f.object AS mention, {BASE} AS cstart,
                       {PTXT} AS ptxt
                {JOIN}
            )
            SELECT url, label, start, "end", mention,
                   substr(ptxt, greatest(start - 40, cstart) + 1,
                          start - greatest(start - 40, cstart)) AS left_ctx,
                   substr(ptxt, "end" + 1,
                          least(40, cstart + 510 - "end")) AS right_ctx
            FROM m
        """,
        "kg_negatives": f"""
            WITH {FACTS},
            d AS (
                SELECT DISTINCT f.predicate AS predicate,
                       f.subject AS subject, f.object AS object
                FROM documents doc JOIN facts f ON f.i = doc.doc_id % {NF}
            ),
            vocab AS (
                SELECT DISTINCT predicate, object FROM d
            ),
            succ AS (
                SELECT predicate, object,
                       COALESCE(
                           lead(object) OVER (
                               PARTITION BY predicate ORDER BY object
                           ),
                           min(object) OVER (PARTITION BY predicate)
                       ) AS neg_object
                FROM vocab
            )
            SELECT d.subject, d.predicate, d.object, s.neg_object
            FROM d JOIN succ s
              ON s.predicate = d.predicate AND s.object = d.object
            WHERE s.neg_object <> d.object
        """,
        "cooc_pairs": """
            WITH tok AS (
                SELECT DISTINCT doc_id, tok FROM (
                    SELECT doc_id,
                           lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS tok
                    FROM documents
                )
            ), kept AS (
                SELECT doc_id, tok FROM (
                    SELECT doc_id, tok,
                           row_number() OVER (
                               PARTITION BY doc_id ORDER BY tok
                           ) AS rn
                    FROM tok
                ) WHERE rn <= 16
            ), pairs AS (
                SELECT a.tok AS tok_a, b.tok AS tok_b
                FROM kept a JOIN kept b
                  ON a.doc_id = b.doc_id AND a.tok < b.tok
            )
            SELECT tok_a, tok_b, count(*) AS n_docs FROM pairs
            GROUP BY tok_a, tok_b
            ORDER BY n_docs DESC, tok_a, tok_b LIMIT 100
        """,
        # Link plan (synth.planted_links): html-only pages (doc_id%7=3)
        # carry 2 + doc_id%3 anchors; link j targets host
        # h{(doc_id*31 + (j//2)*17) % 97}.example.net with anchor
        # ('ref '|'see ') || host tag.
        "host_links": """
            WITH j(j) AS (VALUES (0), (1), (2), (3)),
            links AS (
                SELECT d.doc_id,
                       (d.doc_id * 31 + (j.j // 2) * 17) % 97 AS h
                FROM documents d CROSS JOIN j
                WHERE d.doc_id % 7 = 3 AND j.j < 2 + d.doc_id % 3
            )
            SELECT 'h' || lpad(CAST(h AS VARCHAR), 2, '0') || '.example.net'
                       AS dst_host,
                   count(*) AS n_links,
                   count(DISTINCT doc_id) AS n_pages
            FROM links GROUP BY 1 ORDER BY 1
        """,
        "anchor_texts": """
            WITH j(j) AS (VALUES (0), (1), (2), (3)),
            links AS (
                SELECT d.doc_id, j.j,
                       (d.doc_id * 31 + (j.j // 2) * 17) % 97 AS h
                FROM documents d CROSS JOIN j
                WHERE d.doc_id % 7 = 3 AND j.j < 2 + d.doc_id % 3
            )
            SELECT 'h' || lpad(CAST(h AS VARCHAR), 2, '0') || '.example.net'
                       AS dst_host,
                   (CASE WHEN j % 2 = 0 THEN 'ref' ELSE 'see' END)
                       || ' h' || lpad(CAST(h AS VARCHAR), 2, '0') AS anchor,
                   count(*) AS n
            FROM links GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "value_mad": """
            WITH c AS (
                SELECT event_type,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events
            ), m AS (
                SELECT event_type,
                       CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median
                FROM c GROUP BY event_type
            )
            SELECT c.event_type, m.median,
                   CAST(quantile_disc(abs(c.cents - m.median), 0.5) AS BIGINT)
                       AS mad
            FROM c JOIN m USING (event_type)
            GROUP BY c.event_type, m.median ORDER BY 1
        """,
        "burst_windows": """
            WITH planted AS (
                SELECT event_type, ts FROM events
                UNION ALL
                SELECT event_type, TIMESTAMP '2024-01-05 00:30:00' AS ts
                FROM events WHERE event_id % 50 = 0
            ), w AS (
                SELECT event_type,
                       epoch_us(ts) // 3600000000 * 3600000000 AS window_start_us,
                       count(*) AS n
                FROM planted GROUP BY 1, 2
            ), t AS (
                SELECT event_type,
                       sum(n) AS total,
                       count(*) AS n_windows
                FROM w GROUP BY 1
            )
            SELECT w.event_type,
                   CAST(w.window_start_us AS BIGINT) AS window_start_us,
                   CAST(w.n AS BIGINT) AS n,
                   CAST(t.total AS BIGINT) AS total,
                   CAST(t.n_windows AS BIGINT) AS n_windows
            FROM w JOIN t USING (event_type)
            WHERE w.n * t.n_windows * 1 > 3 * t.total
            ORDER BY 1, 2
        """,
        "curriculum": """
            WITH r AS (
                SELECT lang, doc_id, n_chars,
                       row_number() OVER (
                           PARTITION BY lang ORDER BY n_chars, doc_id
                       ) AS rank,
                       count(*) OVER (PARTITION BY lang) AS n_g
                FROM documents
            )
            SELECT lang, doc_id, n_chars, CAST(rank AS BIGINT) AS rank,
                   CAST((rank - 1) * 4 // n_g AS BIGINT) AS bucket
            FROM r
        """,
        "lang_ranks": """
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n_chars DESC, doc_id
                   ) AS rank
            FROM documents
        """,
        "readability": """
            WITH c AS (
                SELECT doc_id,
                       greatest(CAST(len(regexp_extract_all(text,
                           '[A-Za-z0-9]+')) AS BIGINT), 1) AS n_words,
                       greatest(CAST(len(regexp_extract_all(text,
                           '[.!?]+')) AS BIGINT), 1) AS n_sents,
                       CAST(len(regexp_extract_all(text,
                           '[aeiouyAEIOUY]+')) AS BIGINT) AS n_sylls
                FROM documents
            )
            SELECT doc_id, n_words, n_sents, n_sylls,
                   round(206.835 - 1.015 * (n_words / CAST(n_sents AS DOUBLE))
                         - 84.6 * (n_sylls / CAST(n_words AS DOUBLE)), 4)
                       AS flesch
            FROM c
        """,
        "host_cocitation": """
            WITH j(j) AS (VALUES (0), (1), (2), (3)),
            links AS (
                SELECT DISTINCT d.doc_id,
                       'h' || lpad(CAST((d.doc_id * 31 + (j.j // 2) * 17) % 97
                           AS VARCHAR), 2, '0') || '.example.net' AS host
                FROM documents d CROSS JOIN j
                WHERE d.doc_id % 7 = 3 AND j.j < 2 + d.doc_id % 3
            )
            SELECT a.host AS host_a, b.host AS host_b,
                   count(*) AS n_pages
            FROM links a JOIN links b
              ON a.doc_id = b.doc_id AND a.host < b.host
            GROUP BY 1, 2
            ORDER BY n_pages DESC, host_a, host_b LIMIT 100
        """,
        # Morton code: x takes even bit positions, y odd (8 bits each);
        # block = ROW_NUMBER() OVER (ORDER BY z, event_id) cut at 512.
        "zorder_layout": """
            WITH j(j) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7)),
            base AS (
                SELECT event_id,
                       user_id % 256 AS x,
                       (epoch_us(ts) // 3600000000) % 256 AS y
                FROM events
            ),
            z AS (
                SELECT event_id, x, y,
                       CAST(SUM((((x >> j) & 1) << (2 * j))
                              + (((y >> j) & 1) << (2 * j + 1))) AS BIGINT) AS zv
                FROM base CROSS JOIN j GROUP BY event_id, x, y
            ),
            r AS (
                SELECT event_id, x, y, zv,
                       row_number() OVER (ORDER BY zv, event_id) AS rn
                FROM z
            )
            SELECT CAST((rn - 1) // 512 AS BIGINT) AS block,
                   count(*) AS n,
                   min(x) AS min_x, max(x) AS max_x,
                   min(y) AS min_y, max(y) AS max_y,
                   min(zv) AS min_z, max(zv) AS max_z
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "q3_topk": """
            SELECT l.l_orderkey,
                   o.o_orderdate,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                       AS revenue
            FROM customer c
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
              AND l.l_shipdate > TIMESTAMP '1997-01-01'
            GROUP BY 1, 2
            ORDER BY revenue DESC, l.l_orderkey LIMIT 10
        """,
        "region_revenue": """
            SELECT n.n_name,
                   count(*) AS n_items,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                       AS revenue
            FROM region r
            JOIN nation n ON n.n_regionkey = r.r_regionkey
            JOIN customer c ON c.c_nationkey = n.n_nationkey
            JOIN orders o ON o.o_custkey = c.c_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1 ORDER BY 1
        """,
        "shuffle_shards": """
            WITH r AS (
                SELECT doc_id,
                       row_number() OVER (ORDER BY
                           CAST(('0x' || substr(md5('shard:'
                               || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                           doc_id) AS rn
                FROM documents
            )
            SELECT doc_id,
                   CAST((rn - 1) // 64 AS BIGINT) AS shard,
                   CAST((rn - 1) % 64 AS BIGINT) AS pos
            FROM r
        """,
        "winsorized_stats": """
            WITH c AS (
                SELECT event_type,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
                FROM events
            ), q AS (
                SELECT event_type,
                       CAST(quantile_disc(cents, 0.05) AS BIGINT) AS lo,
                       CAST(quantile_disc(cents, 0.95) AS BIGINT) AS hi
                FROM c GROUP BY event_type
            )
            SELECT c.event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(LEAST(GREATEST(c.cents, q.lo), q.hi)) AS BIGINT)
                       AS sum_w,
                   q.lo, q.hi
            FROM c JOIN q USING (event_type)
            GROUP BY c.event_type, q.lo, q.hi ORDER BY 1
        """,
        "dp_lang_counts": """
            WITH c AS (
                SELECT lang, CAST(count(*) AS BIGINT) AS n
                FROM documents GROUP BY lang
            ), u AS (
                SELECT lang, n,
                       (CAST(('0x' || substr(md5('dp:' || lang), 1, 8))
                            AS BIGINT) + 0.5) / 4294967296.0 - 0.5 AS uu
                FROM c
            )
            SELECT lang, n,
                   round(n - sign(uu) * ln(1 - 2 * abs(uu)), 4) AS n_noisy
            FROM u ORDER BY lang
        """,
        "bottomk_sample": """
            SELECT doc_id, lang FROM documents
            ORDER BY CAST(('0x' || substr(md5('bk:'
                || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT), doc_id
            LIMIT 100
        """,
        "pq_codes": """
            WITH e AS (
                SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            cb AS (
                SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS code, v
                FROM (
                    SELECT vec_id, v,
                           CAST(('0x' || substr(md5('pq:'
                               || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT)
                               AS h
                    FROM e)
                ORDER BY h, vec_id LIMIT 16
            ),
            d AS (
                SELECT e.vec_id, m.m AS sub, cb.code,
                       list_distance(e.v[m.m * 16 + 1 : (m.m + 1) * 16],
                                     cb.v[m.m * 16 + 1 : (m.m + 1) * 16])
                           AS dist
                FROM e CROSS JOIN range(4) m(m) CROSS JOIN cb
            )
            SELECT vec_id, sub, code FROM (
                SELECT vec_id, sub, code,
                       row_number() OVER (PARTITION BY vec_id, sub
                                          ORDER BY dist, code) AS rk
                FROM d) WHERE rk = 1
        """,
        "prop_sample": """
            WITH s AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
            t AS (SELECT sum(n) AS nt FROM s),
            a AS (SELECT lang, n, (n * 100) // t.nt AS base,
                         n * 100 - ((n * 100) // t.nt) * t.nt AS rem
                  FROM s, t),
            lo AS (SELECT 100 - sum(base) AS leftover FROM a),
            r AS (SELECT lang, n, base, rem,
                         row_number() OVER (ORDER BY rem DESC, n DESC,
                                            lang) AS pr
                  FROM a),
            k AS (SELECT lang,
                         least(base + CASE WHEN pr <=
                             (SELECT leftover FROM lo) THEN 1 ELSE 0 END,
                             n) AS kg
                  FROM r),
            h AS (SELECT lang, doc_id,
                         row_number() OVER (PARTITION BY lang
                             ORDER BY CAST(('0x' || substr(md5('prop:'
                                 || CAST(doc_id AS VARCHAR)), 1, 8))
                                 AS BIGINT), doc_id) AS rank
                  FROM documents)
            SELECT h.lang, h.doc_id, CAST(h.rank AS BIGINT) AS rank
            FROM h JOIN k USING (lang) WHERE h.rank <= k.kg
        """,
        "grouped_sample": """
            SELECT lang, doc_id, rank FROM (
                SELECT lang, doc_id,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY CAST(('0x' || substr(md5('gbk:'
                               || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT),
                               doc_id) AS rank
                FROM documents)
            WHERE rank <= 25
        """,
        # even doc_ids come from the old generation that lacked `lang`
        "evolved_read": """
            SELECT CASE WHEN doc_id % 2 = 0 THEN 'unknown' ELSE lang END
                       AS lang,
                   count(*) AS n_docs,
                   CAST(sum(length(text)) AS BIGINT) AS sum_chars
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "line_dedup": """
            WITH lines AS (
                SELECT doc_id, 0 AS idx,
                       'cookie notice please accept cookies' AS line
                FROM documents
                UNION ALL
                SELECT doc_id, 1, 'promo code ' || CAST(doc_id % 7 AS VARCHAR)
                FROM documents WHERE doc_id % 3 = 0
                UNION ALL
                SELECT doc_id, 2,
                       'body ' || CAST(doc_id AS VARCHAR) || ' ' || text
                FROM documents
                UNION ALL
                SELECT doc_id, 3, 'ref ' || CAST(doc_id % 97 AS VARCHAR)
                FROM documents
            ),
            cnt AS (SELECT line, count(*) AS n FROM lines GROUP BY 1),
            kept AS (
                SELECT l.doc_id, l.idx, l.line
                FROM lines l JOIN cnt c USING (line) WHERE c.n <= 16
            ),
            agg AS (
                SELECT doc_id, count(*) AS n_kept,
                       md5(string_agg(line, chr(10) ORDER BY idx)) AS clean_md5
                FROM kept GROUP BY doc_id
            ),
            tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY 1)
            SELECT t.doc_id, CAST(t.n_lines AS BIGINT) AS n_lines,
                   CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
                   coalesce(a.clean_md5, md5('')) AS clean_md5
            FROM tot t LEFT JOIN agg a USING (doc_id)
        """,
        "hits": _hits_sql(
            """edges AS (
                SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
                FROM orders JOIN lineitem ON o_orderkey = l_orderkey)""",
            n_iter=3,
        ),
        "assoc_rules": """
            WITH tk AS (
                SELECT doc_id, tok FROM (
                    SELECT doc_id, tok,
                           row_number() OVER (PARTITION BY doc_id
                                              ORDER BY tok) AS rk
                    FROM (SELECT DISTINCT doc_id, tok FROM (
                        SELECT doc_id,
                               unnest(regexp_extract_all(lower(text),
                                                         '[a-z0-9]+')) AS tok
                        FROM documents))
                ) WHERE rk <= 16
            ),
            n AS (SELECT count(*) AS c FROM documents),
            tc AS (SELECT tok, count(*) AS n_docs FROM tk GROUP BY 1),
            pc AS (
                SELECT a.tok AS ta, b.tok AS tb, count(*) AS support
                FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND a.tok < b.tok
                GROUP BY 1, 2 HAVING count(*) >= 5
            ),
            dir AS (
                SELECT ta AS antecedent, tb AS consequent, support FROM pc
                UNION ALL
                SELECT tb, ta, support FROM pc
            ),
            r AS (
                SELECT d.antecedent, d.consequent,
                       CAST(d.support AS BIGINT) AS support,
                       CAST(d.support * 1000000 // ta.n_docs AS BIGINT)
                           AS conf_e6,
                       CAST(d.support * n.c * 1000000
                            // (ta.n_docs * tb.n_docs) AS BIGINT) AS lift_e6
                FROM dir d JOIN tc ta ON ta.tok = d.antecedent
                           JOIN tc tb ON tb.tok = d.consequent, n
            )
            SELECT * FROM r WHERE conf_e6 >= 200000
        """,
        "event_pivot": """
            SELECT user_id,
                   count(*) FILTER (WHERE event_type = 'click') AS n_click,
                   coalesce(sum(CAST(round(value * 100) AS BIGINT))
                            FILTER (WHERE event_type = 'click'), 0)
                       AS sum_click_e2,
                   count(*) FILTER (WHERE event_type = 'view') AS n_view,
                   coalesce(sum(CAST(round(value * 100) AS BIGINT))
                            FILTER (WHERE event_type = 'view'), 0)
                       AS sum_view_e2,
                   count(*) FILTER (WHERE event_type = 'purchase')
                       AS n_purchase,
                   coalesce(sum(CAST(round(value * 100) AS BIGINT))
                            FILTER (WHERE event_type = 'purchase'), 0)
                       AS sum_purchase_e2
            FROM events GROUP BY user_id
        """,
        "abandoned_clicks": """
            SELECT c.event_id, c.user_id
            FROM events c
            WHERE c.event_type = 'click'
              AND NOT EXISTS (
                SELECT 1 FROM events p
                WHERE p.event_type = 'purchase'
                  AND p.user_id = c.user_id
                  AND p.ts >= c.ts
                  AND p.ts <= c.ts + INTERVAL 30 MINUTE)
        """,
        "stream_join": """
            SELECT c.user_id, c.event_id AS click_id,
                   p.event_id AS purchase_id,
                   CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT)
                       AS delta_us
            FROM events c JOIN events p ON p.user_id = c.user_id
            WHERE c.event_type = 'click' AND p.event_type = 'purchase'
              AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
        """,
        "vocab_build": """
            WITH planted AS (
                SELECT text || ' tk' || CAST(doc_id % 211 AS VARCHAR) AS text
                FROM documents),
            tok AS (
                SELECT unnest(regexp_extract_all(lower(text),
                                                 '[a-z0-9]+')) AS token
                FROM planted),
            tc AS (
                SELECT token, count(*) AS n FROM tok GROUP BY 1
                HAVING count(*) >= 5)
            SELECT token, CAST(n AS BIGINT) AS n,
                   CAST(row_number() OVER (ORDER BY n DESC, token) - 1
                        AS BIGINT) AS token_id
            FROM tc
        """,
        "scc": """
            WITH RECURSIVE mx AS (SELECT max(c_custkey) AS m FROM customer),
            edges AS (
                SELECT c_custkey AS src,
                       (c_custkey // 10) * 10
                           + ((c_custkey % 10) * 3 + 1) % 10 AS dst
                FROM customer
                UNION
                SELECT c_custkey, c_custkey + 10
                FROM customer, mx
                WHERE (c_custkey // 10) % 2 = 0 AND c_custkey + 10 <= mx.m
            ),
            nodes AS (SELECT src AS node FROM edges
                      UNION SELECT dst FROM edges),
            reach(a, b) AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
            ),
            mutual AS (
                SELECT r1.a AS v, r1.b AS u
                FROM reach r1 JOIN reach r2
                     ON r1.a = r2.b AND r1.b = r2.a
            )
            SELECT n.node,
                   CAST(least(n.node, coalesce(min(m.u), n.node)) AS BIGINT)
                       AS scc_id
            FROM nodes n LEFT JOIN mutual m ON m.v = n.node
            GROUP BY n.node
        """,
        "running_total": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        AS BIGINT) AS running_e2
            FROM events
        """,
        "decayed_counts": """
            SELECT event_type,
                   CAST(sum((CAST(1 AS BIGINT) << 40) >> least(greatest(
                       (epoch_us(TIMESTAMP '2024-01-31')
                        - epoch_us(ts)) // 86400000000, 0), 40))
                       AS BIGINT) AS decayed
            FROM events GROUP BY event_type
        """,
        "source_overlap": """
            WITH planted AS (
                SELECT source,
                       CASE WHEN doc_id % 4 = 0
                            THEN 'shared page '
                                 || CAST(doc_id % 13 AS VARCHAR)
                            ELSE text || ' #' || CAST(doc_id AS VARCHAR)
                       END AS text
                FROM documents),
            f AS (SELECT DISTINCT md5(text) AS h, source FROM planted)
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS n_shared
            FROM f a JOIN f b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2
        """,
        "mis": _mis_sql(n_rounds=6),
        "coverage_picks": _coverage_sql(k=5),
        "price_quantiles": """
            WITH src AS (
                SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                FROM lineitem)
            SELECT CAST(0.25 AS DOUBLE) AS q,
                   CAST(quantile_disc(c, 0.25) AS BIGINT) AS value FROM src
            UNION ALL
            SELECT 0.5, CAST(quantile_disc(c, 0.5) AS BIGINT) FROM src
            UNION ALL
            SELECT 0.75, CAST(quantile_disc(c, 0.75) AS BIGINT) FROM src
            UNION ALL
            SELECT 0.95, CAST(quantile_disc(c, 0.95) AS BIGINT) FROM src
        """,
        "weighted_median": """
            WITH src AS (
                SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
                       CAST(round(l_quantity) AS BIGINT) AS w
                FROM lineitem),
            cw AS (SELECT c, sum(w) AS w FROM src GROUP BY 1),
            o AS (SELECT c, sum(w) OVER (ORDER BY c) AS cum,
                         (SELECT sum(w) FROM src) AS tw
                  FROM cw)
            SELECT CAST(0.5 AS DOUBLE) AS q,
                   CAST(min(c) AS BIGINT) AS value
            FROM o WHERE cum >= (tw + 1) // 2
            UNION ALL
            SELECT 0.9, CAST(min(c) AS BIGINT)
            FROM o WHERE cum >= (9 * tw + 9) // 10
        """,
        "skyline": """
            WITH p AS (
                SELECT DISTINCT
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
                       CAST(round(l_quantity) AS BIGINT) AS qty
                FROM lineitem)
            SELECT cents, qty FROM p a
            WHERE NOT EXISTS (
                SELECT 1 FROM p b
                WHERE b.cents <= a.cents AND b.qty >= a.qty
                  AND (b.cents < a.cents OR b.qty > a.qty))
        """,
        "term_drift": """
            WITH planted AS (
                SELECT doc_id % 2 AS m,
                       text || ' tk' || CAST(doc_id % 211 AS VARCHAR)
                           AS text
                FROM documents),
            tok AS (
                SELECT m, unnest(regexp_extract_all(lower(text),
                                                    '[a-z0-9]+')) AS token
                FROM planted),
            c AS (
                SELECT token,
                       sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS n_a,
                       sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS n_b
                FROM tok GROUP BY 1),
            t AS (SELECT sum(n_a) AS na, sum(n_b) AS nb FROM c),
            s AS (SELECT token, n_a, n_b,
                         n_b * t.na - n_a * t.nb AS score
                  FROM c, t),
            up AS (SELECT token, n_a, n_b, score,
                          row_number() OVER (ORDER BY score DESC, token)
                              AS r
                   FROM s),
            dn AS (SELECT token, n_a, n_b, score,
                          row_number() OVER (ORDER BY score ASC, token)
                              AS r
                   FROM s)
            SELECT token, CAST(n_a AS BIGINT) AS n_a,
                   CAST(n_b AS BIGINT) AS n_b,
                   CAST(score AS BIGINT) AS score, 'up' AS direction
            FROM up WHERE r <= 30
            UNION ALL
            SELECT token, CAST(n_a AS BIGINT), CAST(n_b AS BIGINT),
                   CAST(score AS BIGINT), 'down'
            FROM dn WHERE r <= 30
        """,
        "markov_eval": """
            WITH seq AS (
                SELECT user_id, event_type, ts, event_id,
                       lead(event_type) OVER w AS nxt,
                       lead(ts) OVER w AS t_next
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            pairs AS (
                SELECT event_type AS prev, nxt, t_next FROM seq
                WHERE nxt IS NOT NULL),
            train AS (
                SELECT prev, nxt, count(*) AS n FROM pairs
                WHERE t_next < TIMESTAMP '2024-01-20' GROUP BY 1, 2),
            model AS (
                SELECT prev, nxt AS pred FROM (
                    SELECT prev, nxt,
                           row_number() OVER (PARTITION BY prev
                               ORDER BY n DESC, nxt) AS r
                    FROM train) WHERE r = 1),
            test AS (
                SELECT prev, nxt FROM pairs
                WHERE t_next >= TIMESTAMP '2024-01-20')
            SELECT t.prev AS prev_type, count(*) AS n_test,
                   CAST(sum(CASE WHEN m.pred = t.nxt THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_correct
            FROM test t LEFT JOIN model m ON m.prev = t.prev
            GROUP BY 1
        """,
        "conformal": """
            WITH s AS (
                SELECT doc_id,
                       (doc_id * 37) % 1000
                       + CASE WHEN doc_id % 5 < 2 THEN 300 ELSE 0 END
                           AS score
                FROM documents),
            tau AS (
                SELECT CAST(quantile_disc(score, 0.9) AS BIGINT) AS t
                FROM s WHERE doc_id % 3 = 0)
            SELECT tau.t AS tau,
                   count(*) AS n_eval,
                   CAST(sum(CASE WHEN s.score <= tau.t THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_covered
            FROM s, tau WHERE s.doc_id % 3 != 0 GROUP BY tau.t
        """,
        "perm_test": """
            WITH src AS (
                SELECT user_id % 2 AS grp,
                       CAST(round(value * 100) AS BIGINT) AS c,
                       CAST(('0x' || substr(md5('perm:'
                           || CAST(event_id AS VARCHAR)), 1, 15))
                           AS BIGINT) AS h
                FROM events),
            t AS (SELECT sum(c) AS s, count(*) AS n FROM src),
            obs AS (
                SELECT sum(c) FILTER (WHERE grp = 1) AS s1,
                       count(*) FILTER (WHERE grp = 1) AS n1
                FROM src),
            p AS (
                SELECT r.j,
                       sum(c) FILTER (WHERE (h >> r.j) & 1 = 1) AS s1,
                       count(*) FILTER (WHERE (h >> r.j) & 1 = 1) AS n1
                FROM src, range(48) r(j) GROUP BY r.j),
            os AS (
                SELECT abs(obs.s1 * (t.n - obs.n1)
                           - (t.s - obs.s1) * obs.n1) AS v
                FROM obs, t),
            ps AS (
                SELECT abs(p.s1 * (t.n - p.n1)
                           - (t.s - p.s1) * p.n1) AS v
                FROM p, t)
            SELECT CAST((SELECT v FROM os) AS BIGINT) AS obs_stat,
                   CAST((SELECT count(*) FROM ps
                         WHERE v >= (SELECT v FROM os)) AS BIGINT)
                       AS n_extreme,
                   CAST(48 AS BIGINT) AS n_perms
        """,
        "bootstrap_ci": """
            WITH src AS (
                SELECT o_orderkey AS id,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS c
                FROM orders),
            reps AS (
                SELECT r.j AS b, c,
                       CAST(('0x' || substr(md5('boot:' || r.j || ':'
                           || CAST(id AS VARCHAR)), 1, 15)) AS BIGINT) AS u
                FROM src, range(16) r(j)),
            w AS (SELECT b, c, CASE WHEN u >= 424136118829305344 THEN 1 ELSE 0 END + CASE WHEN u >= 848272237658610688 THEN 1 ELSE 0 END + CASE WHEN u >= 1060340297073263360 THEN 1 ELSE 0 END + CASE WHEN u >= 1131029650211480960 THEN 1 ELSE 0 END + CASE WHEN u >= 1148701988496035328 THEN 1 ELSE 0 END + CASE WHEN u >= 1152236456152946176 THEN 1 ELSE 0 END + CASE WHEN u >= 1152825534095764608 THEN 1 ELSE 0 END + CASE WHEN u >= 1152909688087595776 THEN 1 ELSE 0 END + CASE WHEN u >= 1152920207336574720 THEN 1 ELSE 0 END AS w FROM reps),
            agg AS (SELECT b, sum(c * w) AS s, sum(w) AS n
                    FROM w GROUP BY b),
            ranked AS (
                SELECT s, n,
                       row_number() OVER (ORDER BY s * 1.0 / n, b) AS rn
                FROM agg),
            obs AS (SELECT sum(c) AS s, count(*) AS n FROM src)
            SELECT CAST(obs.s AS BIGINT) AS obs_num,
                   CAST(obs.n AS BIGINT) AS obs_den,
                   CAST((SELECT s FROM ranked WHERE rn = 2) AS BIGINT)
                       AS lo_num,
                   CAST((SELECT n FROM ranked WHERE rn = 2) AS BIGINT)
                       AS lo_den,
                   CAST((SELECT s FROM ranked WHERE rn = 15) AS BIGINT)
                       AS hi_num,
                   CAST((SELECT n FROM ranked WHERE rn = 15) AS BIGINT)
                       AS hi_den
            FROM obs
        """,
        "grouped_perm_test": """
            WITH src AS (
                SELECT event_type AS segment, user_id % 2 AS grp,
                       CAST(round(value * 100) AS BIGINT) AS c,
                       CAST(('0x' || substr(md5('perm:'
                           || CAST(event_id AS VARCHAR)), 1, 15))
                           AS BIGINT) AS h
                FROM events),
            t AS (SELECT segment, sum(c) AS s, count(*) AS n
                  FROM src GROUP BY 1),
            obs AS (
                SELECT segment,
                       coalesce(sum(c) FILTER (WHERE grp = 1), 0) AS s1,
                       count(*) FILTER (WHERE grp = 1) AS n1
                FROM src GROUP BY 1),
            p AS (
                SELECT segment, r.j,
                       coalesce(sum(c) FILTER (WHERE (h >> r.j) & 1 = 1),
                                0) AS s1,
                       count(*) FILTER (WHERE (h >> r.j) & 1 = 1) AS n1
                FROM src, range(48) r(j) GROUP BY 1, 2),
            os AS (
                SELECT obs.segment,
                       abs(obs.s1 * (t.n - obs.n1)
                           - (t.s - obs.s1) * obs.n1) AS v
                FROM obs JOIN t USING (segment)),
            ps AS (
                SELECT p.segment,
                       abs(p.s1 * (t.n - p.n1)
                           - (t.s - p.s1) * p.n1) AS v
                FROM p JOIN t USING (segment))
            SELECT os.segment AS segment,
                   CAST(os.v AS BIGINT) AS obs_stat,
                   CAST((SELECT count(*) FROM ps
                         WHERE ps.segment = os.segment
                           AND ps.v >= os.v) AS BIGINT) AS n_extreme,
                   CAST(48 AS BIGINT) AS n_perms
            FROM os
        """,
        "grouped_calibration": """
            SELECT lang,
                   ((doc_id * 37) % 1000
                    + CASE WHEN doc_id % 5 < 2 THEN 300 ELSE 0 END) // 100
                       AS bin,
                   count(*) AS n,
                   CAST(sum(CASE WHEN doc_id % 5 < 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos
            FROM documents GROUP BY 1, 2
        """,
        "kfold_folds": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                   CAST(('0x' || substr(md5('fold:' || source), 1, 8))
                        AS BIGINT) % 5 AS fold
            FROM documents
        """,
        "balanced_sample": """
            SELECT lang AS label, CAST(doc_id AS BIGINT) AS id
            FROM (
                SELECT lang, doc_id,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY md5('bal:' || CAST(doc_id AS VARCHAR)),
                                    doc_id) AS rn
                FROM documents)
            WHERE rn <= 50
        """,
        "kmv_overlap": """
            WITH ha AS (
                SELECT CAST(('0x' || substr(md5('kmv:'
                    || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM (SELECT DISTINCT user_id FROM events
                      WHERE event_type = 'click')
                ORDER BY h LIMIT 64),
            hb AS (
                SELECT CAST(('0x' || substr(md5('kmv:'
                    || CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
                FROM (SELECT DISTINCT user_id FROM events
                      WHERE event_type = 'view')
                ORDER BY h LIMIT 64),
            m AS (SELECT h FROM (SELECT h FROM ha UNION
                                 SELECT h FROM hb)
                  ORDER BY h LIMIT 64),
            s AS (SELECT count(*) AS mk, max(h) AS kth FROM m),
            c AS (SELECT count(*) AS nc FROM m
                  WHERE h IN (SELECT h FROM ha)
                    AND h IN (SELECT h FROM hb)),
            -- 63·2^60 overflows INT64; do the division in HUGEINT
            ue AS (SELECT CASE WHEN mk >= 64
                          THEN CAST(63 * CAST(1152921504606846976 AS HUGEINT)
                               // greatest(kth, 1) AS BIGINT)
                          ELSE mk END AS u, mk FROM s)
            SELECT CAST(c.nc AS BIGINT) AS n_common,
                   CAST(ue.u AS BIGINT) AS union_est,
                   CAST(c.nc * ue.u // greatest(ue.mk, 1) AS BIGINT)
                       AS inter_est
            FROM c, ue
        """,
        "rank_sum_drift": """
            WITH src AS (
                SELECT event_type,
                       CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN 1 ELSE 0 END AS m,
                       CAST(round(value * 100) AS BIGINT) AS v
                FROM events),
            c AS (
                SELECT event_type, v,
                       sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS na,
                       sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS nb
                FROM src GROUP BY 1, 2),
            w AS (
                SELECT event_type, v, na, nb, na + nb AS t,
                       coalesce(sum(na + nb) OVER (
                           PARTITION BY event_type ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS c_prev
                FROM c),
            r AS (
                SELECT event_type, sum(na) AS n_a, sum(nb) AS n_b,
                       sum(nb * (2 * c_prev + t + 1)) AS r2_b
                FROM w GROUP BY 1)
            SELECT event_type, CAST(n_a AS BIGINT) AS n_a,
                   CAST(n_b AS BIGINT) AS n_b,
                   CAST(r2_b - n_b * (n_b + 1) AS BIGINT) AS u2_b,
                   CAST(CASE WHEN n_a > 0 AND n_b > 0
                        THEN (1000000 * (r2_b - n_b * (n_b + 1)))
                             // (2 * n_a * n_b)
                        ELSE 0 END AS BIGINT) AS auc_e6
            FROM r
        """,
        "target_encode": """
            WITH e AS (
                SELECT event_type,
                       CAST(event_id % 5 AS BIGINT) AS fold,
                       CAST(round(value * 100) AS BIGINT) AS cents
                FROM events),
            g AS (
                SELECT event_type, fold, count(*) AS n, sum(cents) AS s
                FROM e GROUP BY 1, 2),
            t AS (
                SELECT event_type, sum(n) AS n_all, sum(s) AS s_all
                FROM g GROUP BY 1)
            SELECT g.event_type, g.fold,
                   CAST(t.n_all - g.n AS BIGINT) AS n_oof,
                   CAST((1000000 * (t.s_all - g.s)) // (t.n_all - g.n)
                        AS BIGINT) AS te_scaled
            FROM g JOIN t USING (event_type)
            WHERE t.n_all - g.n > 0
        """,
        "hashed_features": """
            WITH docs AS (
                SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
                FROM documents),
            tok AS (SELECT doc_id, unnest(toks) AS tok FROM docs),
            h AS (
                SELECT doc_id,
                       CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT)
                           % 64 AS bucket
                FROM tok)
            SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
                   count(*) AS n
            FROM h GROUP BY 1, 2
        """,
        "script_mix": r"""
            WITH c AS (
                SELECT doc_id,
                       length(text) - length(regexp_replace(
                           text, '[A-Za-z]', '', 'g')) AS n_latin,
                       length(text) - length(regexp_replace(
                           text, '[\x{4e00}-\x{9fff}]', '', 'g')) AS n_cjk,
                       length(text) - length(regexp_replace(
                           text, '[0-9]', '', 'g')) AS n_digit
                FROM documents)
            SELECT doc_id, CAST(n_latin AS BIGINT) AS n_latin,
                   CAST(n_cjk AS BIGINT) AS n_cjk,
                   CAST(n_digit AS BIGINT) AS n_digit,
                   CAST(CASE WHEN n_latin > 0 AND n_cjk > 0
                        THEN 1 ELSE 0 END AS BIGINT) AS is_mixed
            FROM c
        """,
        "grouped_ks": """
            WITH src AS (
                SELECT event_type,
                       CASE WHEN ts >= TIMESTAMP '2024-01-16'
                            THEN 1 ELSE 0 END AS m,
                       CAST(round(value * 100) AS BIGINT) AS v
                FROM events),
            c AS (
                SELECT event_type, v,
                       sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS na,
                       sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS nb
                FROM src GROUP BY 1, 2),
            t AS (
                SELECT event_type, sum(na) AS ta, sum(nb) AS tb
                FROM c GROUP BY 1),
            w AS (
                SELECT c.event_type, c.v,
                       sum(c.na) OVER (PARTITION BY c.event_type
                                       ORDER BY c.v) AS ca,
                       sum(c.nb) OVER (PARTITION BY c.event_type
                                       ORDER BY c.v) AS cb,
                       t.ta, t.tb
                FROM c JOIN t USING (event_type))
            SELECT event_type,
                   CAST(max(abs(ca * tb - cb * ta)) AS BIGINT) AS d_num,
                   CAST(max(ta) AS BIGINT) AS n_a,
                   CAST(max(tb) AS BIGINT) AS n_b,
                   CAST(max(abs(ca * tb - cb * ta)) * 1000000
                        // (max(ta) * max(tb)) AS BIGINT) AS ks_e6
            FROM w GROUP BY 1
        """,
        "grouped_open_quantiles": """
            WITH src AS (
                SELECT event_type,
                       CAST(round(value * 100) AS BIGINT) AS c
                FROM events)
            SELECT event_type, CAST(0.25 AS DOUBLE) AS q,
                   CAST(quantile_disc(c, 0.25) AS BIGINT) AS value
            FROM src GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.5,
                   CAST(quantile_disc(c, 0.5) AS BIGINT)
            FROM src GROUP BY event_type
            UNION ALL
            SELECT event_type, 0.9,
                   CAST(quantile_disc(c, 0.9) AS BIGINT)
            FROM src GROUP BY event_type
        """,
        "range_lookup": """
            WITH r AS (
                SELECT CAST(k AS BIGINT) AS range_id,
                       CAST(k * 500000 AS BIGINT) AS lo,
                       CAST(k * 500000 + 449999 AS BIGINT) AS hi
                FROM range(0, 24) t(k)),
            p AS (
                SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                FROM lineitem)
            SELECT range_id,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(c) AS BIGINT) AS sum_cents
            FROM p JOIN r ON p.c BETWEEN r.lo AND r.hi
            GROUP BY 1
        """,
        "ks_drift": """
            WITH a AS (
                SELECT CAST(round(value * 100) AS BIGINT) AS v,
                       count(*) AS n
                FROM events WHERE event_type = 'click' GROUP BY 1),
            b AS (
                SELECT CAST(round(value * 100) AS BIGINT) AS v,
                       count(*) AS n
                FROM events WHERE event_type = 'purchase' GROUP BY 1),
            u AS (
                SELECT coalesce(a.v, b.v) AS v,
                       coalesce(a.n, 0) AS na, coalesce(b.n, 0) AS nb
                FROM a FULL JOIN b ON a.v = b.v),
            c AS (
                SELECT v, sum(na) OVER (ORDER BY v) AS ca,
                       sum(nb) OVER (ORDER BY v) AS cb,
                       (SELECT sum(na) FROM u) AS ta,
                       (SELECT sum(nb) FROM u) AS tb
                FROM u)
            SELECT CAST(max(abs(ca * tb - cb * ta)) AS BIGINT) AS d_num,
                   CAST(max(ta) AS BIGINT) AS n_a,
                   CAST(max(tb) AS BIGINT) AS n_b,
                   CAST(max(abs(ca * tb - cb * ta)) * 1000000
                        // (max(ta) * max(tb)) AS BIGINT) AS ks_e6
            FROM c
        """,
        "fd_check": """
            SELECT source, CAST(count(DISTINCT lang) AS BIGINT) AS n_values
            FROM documents GROUP BY source
            HAVING count(DISTINCT lang) > 1
        """,
        "sssp": _sssp_sql(rounds=12),
        "matching": _matching_sql(rounds=12),
        "weighted_matching": _matching_sql(rounds=12, weighted=True),
        "percolate": _percolate_sql(),
        "densest": _densest_sql(eps_e6=100_000, rounds=8),
        "grouped_psi": """
            WITH c AS (
                SELECT event_type AS g, ts,
                       least(CAST(floor(value * 100 + 0.5) AS BIGINT)
                             // 1000, 15) AS bin
                FROM events),
            gs AS (SELECT DISTINCT g FROM c),
            bins AS (SELECT unnest(range(16)) AS bin),
            grid AS (SELECT g, bin FROM gs CROSS JOIN bins),
            ca AS (SELECT g, bin, count(*) AS n FROM c
                   WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1, 2),
            cb AS (SELECT g, bin, count(*) AS n FROM c
                   WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1, 2),
            ta AS (SELECT g, count(*) AS t FROM c
                   WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1),
            tb AS (SELECT g, count(*) AS t FROM c
                   WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1),
            j AS (
                SELECT grid.g, grid.bin,
                       CAST(coalesce(ca.n, 0) AS BIGINT) AS n_a,
                       CAST(coalesce(cb.n, 0) AS BIGINT) AS n_b,
                       (coalesce(ca.n, 0) + 1)
                           / (coalesce(ta.t, 0) + 16.0) AS pa,
                       (coalesce(cb.n, 0) + 1)
                           / (coalesce(tb.t, 0) + 16.0) AS pb
                FROM grid
                LEFT JOIN ca USING (g, bin)
                LEFT JOIN cb USING (g, bin)
                LEFT JOIN ta USING (g)
                LEFT JOIN tb USING (g))
            SELECT g AS event_type, CAST(bin AS BIGINT) AS bin,
                   n_a, n_b,
                   round((pa - pb) * ln(pa / pb), 6) AS psi_term
            FROM j
        """,
        "conversion_daily": """
            WITH c AS (SELECT event_id AS cid, user_id, ts
                       FROM events WHERE event_type = 'click'),
            p AS (SELECT user_id, ts FROM events
                  WHERE event_type = 'purchase'),
            conv AS (
                SELECT DISTINCT c.cid
                FROM c JOIN p ON p.user_id = c.user_id
                 AND c.ts <= p.ts
                 AND p.ts - c.ts <= INTERVAL '30 minutes'),
            d AS (
                SELECT CAST(datediff('day', DATE '1970-01-01',
                            CAST(c.ts AS DATE)) AS BIGINT) AS day,
                       count(*) AS n_clicks,
                       sum(CASE WHEN conv.cid IS NOT NULL
                           THEN 1 ELSE 0 END) AS n_conv
                FROM c LEFT JOIN conv ON conv.cid = c.cid
                GROUP BY 1)
            SELECT day, CAST(n_clicks AS BIGINT) AS n_clicks,
                   CAST(n_conv AS BIGINT) AS n_conv,
                   CAST(n_conv * 1000000 // n_clicks AS BIGINT)
                       AS conv_e6
            FROM d
        """,
        "landing_exit": """
            WITH x AS (
                SELECT user_id, ts, event_id, event_type,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w
                                    > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), y AS (
                SELECT *, sum(brk) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS sess
                FROM x
            ), z AS (
                SELECT user_id, sess,
                       first(event_type ORDER BY ts, event_id) AS landing,
                       last(event_type ORDER BY ts, event_id) AS exit
                FROM y GROUP BY 1, 2)
            SELECT landing, exit,
                   CAST(count(*) AS BIGINT) AS n_sessions
            FROM z GROUP BY 1, 2
        """,
        "grouped_weighted_median": """
            WITH src AS (
                SELECT l_returnflag AS g,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
                       CAST(round(l_quantity) AS BIGINT) AS w
                FROM lineitem),
            cw AS (SELECT g, c, sum(w) AS w FROM src GROUP BY 1, 2),
            o AS (SELECT g, c,
                         sum(w) OVER (PARTITION BY g ORDER BY c) AS cum,
                         sum(w) OVER (PARTITION BY g) AS tw
                  FROM cw)
            SELECT g, CAST(0.5 AS DOUBLE) AS q,
                   CAST(min(c) AS BIGINT) AS value
            FROM o WHERE cum >= (tw + 1) // 2 GROUP BY g
            UNION ALL
            SELECT g, 0.9, CAST(min(c) AS BIGINT)
            FROM o WHERE cum >= (9 * tw + 9) // 10 GROUP BY g
        """,
        "top_reach": """
            WITH x AS (
                SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS item,
                       CAST(user_id AS BIGINT) AS u
                FROM events)
            SELECT item, CAST(count(DISTINCT u) AS BIGINT) AS reach
            FROM x GROUP BY 1
            ORDER BY reach DESC, item
            LIMIT 10
        """,
        "ed1_lookup": """
            WITH d AS (SELECT DISTINCT c_name AS e FROM customer),
            q AS (SELECT DISTINCT
                     CASE WHEN c_custkey % 3 = 0
                          THEN substr(c_name, 1, 4) || substr(c_name, 6)
                          ELSE c_name || 'X' END AS q
                  FROM customer)
            SELECT q.q AS query, d.e AS entry,
                   CAST(levenshtein(q.q, d.e) AS BIGINT) AS edit_dist
            FROM q, d WHERE levenshtein(q.q, d.e) <= 1
        """,
        "bot_scores": """
            WITH base AS (
                SELECT CAST(event_id AS BIGINT) AS eid,
                       CAST(user_id AS BIGINT) AS u, ts
                FROM events
                UNION ALL
                SELECT 10000000 + k, 9999,
                       TIMESTAMP '2024-01-01' + k * INTERVAL '1 minute'
                FROM range(0, 200) r(k)),
            g AS (
                SELECT u,
                       (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                            PARTITION BY u ORDER BY ts, eid))
                       // 1000000 AS gp
                FROM base),
            s AS (
                SELECT u, CAST(count(gp) AS HUGEINT) AS n,
                       CAST(sum(gp) AS HUGEINT) AS sm,
                       CAST(sum(gp * gp) AS HUGEINT) AS ss
                FROM g WHERE gp IS NOT NULL GROUP BY 1)
            SELECT u AS user_id,
                   CAST(n AS BIGINT) AS n_gaps,
                   CAST(sm AS BIGINT) AS gap_sum_s,
                   CAST(n * ss - sm * sm AS BIGINT) AS var_num,
                   CAST(CASE WHEN sm = 0 THEN 0
                        ELSE (n * ss - sm * sm) * 1000000 // (sm * sm)
                        END AS BIGINT) AS cv2_e6,
                   CAST(CASE WHEN n >= 8
                             AND (CASE WHEN sm = 0 THEN 0
                                  ELSE (n * ss - sm * sm) * 1000000
                                       // (sm * sm) END) < 10000
                        THEN 1 ELSE 0 END AS BIGINT) AS flagged
            FROM s
        """,
        "triad_census": """
            WITH ev AS (SELECT CAST(event_id AS BIGINT) AS eid,
                               'u' || CAST(user_id AS BIGINT) AS u
                        FROM events),
            e AS MATERIALIZED (
                SELECT DISTINCT a.u AS src, b.u AS dst
                FROM ev a JOIN ev b ON b.eid = a.eid + 1 AND a.u <> b.u),
            p AS MATERIALIZED (
                SELECT x.src AS a, x.dst AS b, y.dst AS c
                FROM e x JOIN e y ON y.src = x.dst AND y.dst <> x.src),
            cyc AS (SELECT count(*) AS n FROM p
                    JOIN e z ON z.src = p.c AND z.dst = p.a),
            tr AS (SELECT count(*) AS n FROM p
                   JOIN e z ON z.src = p.a AND z.dst = p.c)
            SELECT CAST(cyc.n AS BIGINT) AS cyclic_paths,
                   CAST(tr.n AS BIGINT) AS transitive_paths,
                   CAST(cyc.n // 3 AS BIGINT) AS n_cycles
            FROM cyc, tr
        """,
        "analyze_hist": """
            WITH src AS (
                SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c
                FROM lineitem),
            q AS (SELECT quantile_disc(c, 0.125) AS b1,
                         quantile_disc(c, 0.25) AS b2,
                         quantile_disc(c, 0.375) AS b3,
                         quantile_disc(c, 0.5) AS b4,
                         quantile_disc(c, 0.625) AS b5,
                         quantile_disc(c, 0.75) AS b6,
                         quantile_disc(c, 0.875) AS b7
                  FROM src)
            SELECT CAST(CASE WHEN c <= b1 THEN 0 WHEN c <= b2 THEN 1
                             WHEN c <= b3 THEN 2 WHEN c <= b4 THEN 3
                             WHEN c <= b5 THEN 4 WHEN c <= b6 THEN 5
                             WHEN c <= b7 THEN 6 ELSE 7 END AS BIGINT)
                       AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(c) AS BIGINT) AS sum_cents
            FROM src, q GROUP BY 1
        """,
        "itemsets3": """
            WITH tk AS (
                SELECT doc_id, tok FROM (
                    SELECT doc_id, tok,
                           row_number() OVER (PARTITION BY doc_id
                                              ORDER BY tok) AS rk
                    FROM (SELECT DISTINCT doc_id, tok FROM (
                        SELECT doc_id,
                               unnest(regexp_extract_all(lower(text),
                                                         '[a-z0-9]+')) AS tok
                        FROM documents))
                ) WHERE rk <= 16
            )
            SELECT a.tok AS item_a, b.tok AS item_b, c.tok AS item_c,
                   CAST(count(*) AS BIGINT) AS support
            FROM tk a
            JOIN tk b ON a.doc_id = b.doc_id AND a.tok < b.tok
            JOIN tk c ON a.doc_id = c.doc_id AND b.tok < c.tok
            GROUP BY 1, 2, 3 HAVING count(*) >= 40
        """,
        "join_cardinality": """
            WITH cl AS (SELECT l_orderkey AS k, count(*) AS n
                        FROM lineitem GROUP BY 1),
            cr AS (SELECT o_orderkey AS k, count(*) AS n
                   FROM orders GROUP BY 1),
            j AS (SELECT cl.n AS nl, cr.n AS nr
                  FROM cl JOIN cr USING (k))
            SELECT CAST(sum(nl * nr) AS BIGINT) AS join_rows,
                   (SELECT count(*) FROM lineitem) AS n_left,
                   (SELECT count(*) FROM orders) AS n_right,
                   count(*) AS n_match_keys,
                   CAST(max(nl * nr) AS BIGINT) AS max_key_product
            FROM j
        """,
        "spatial_pairs": """
            WITH p AS (
                SELECT event_id AS id,
                       CAST(('0x' || substr(md5('sx:'
                           || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
                           % 10000 AS x,
                       CAST(('0x' || substr(md5('sy:'
                           || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
                           % 10000 AS y
                FROM events)
            SELECT a.id AS id_a, b.id AS id_b,
                   CAST(b.x - a.x AS BIGINT) AS dx,
                   CAST(b.y - a.y AS BIGINT) AS dy
            FROM p a JOIN p b
                 ON a.id < b.id AND abs(a.x - b.x) <= 16
                AND abs(a.y - b.y) <= 16
        """,
        "ivm_join": """
            SELECT l_orderkey, o_custkey,
                   count(*) AS n_items,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                        AS BIGINT) AS rev_e2
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY 1, 2
        """,
        "csv_read": """
            SELECT user_id, count(*) AS n,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS sum_e2
            FROM events GROUP BY user_id
        """,
        "dag_levels": """
            WITH RECURSIVE mx AS (SELECT max(c_custkey) AS m FROM customer),
            edges AS (
                SELECT c_custkey AS src,
                       (c_custkey // 10) * 10
                           + ((c_custkey % 10) * 3 + 1) % 10 AS dst
                FROM customer
                UNION
                SELECT c_custkey, c_custkey + 10
                FROM customer, mx
                WHERE (c_custkey // 10) % 2 = 0 AND c_custkey + 10 <= mx.m
            ),
            nodes AS (SELECT src AS node FROM edges
                      UNION SELECT dst FROM edges),
            reach(a, b) AS (
                SELECT src, dst FROM edges
                UNION
                SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
            ),
            mutual AS (
                SELECT r1.a AS v, r1.b AS u
                FROM reach r1 JOIN reach r2
                     ON r1.a = r2.b AND r1.b = r2.a
            ),
            lab AS (
                SELECT n.node,
                       least(n.node, coalesce(min(m.u), n.node)) AS comp
                FROM nodes n LEFT JOIN mutual m ON m.v = n.node
                GROUP BY n.node
            ),
            ce AS (
                SELECT DISTINCT ls.comp AS src, ld.comp AS dst
                FROM edges e JOIN lab ls ON ls.node = e.src
                             JOIN lab ld ON ld.node = e.dst
                WHERE ls.comp != ld.comp
            ),
            cn AS (SELECT DISTINCT comp FROM lab),
            r(comp, lvl) AS (
                SELECT comp, 0 FROM cn
                UNION
                SELECT ce.dst, r.lvl + 1 FROM r JOIN ce ON ce.src = r.comp
            )
            SELECT comp, CAST(max(lvl) AS BIGINT) AS level
            FROM r GROUP BY comp
        """,
        "kanon_audit": """
            SELECT c_nationkey, c_mktsegment, count(*) AS n_rows
            FROM customer GROUP BY 1, 2 HAVING count(*) < 8
        """,
        "ldiv_audit": """
            SELECT c_nationkey, c_custkey % 10 AS kb,
                   count(*) AS n_rows,
                   CAST(count(DISTINCT c_mktsegment) AS BIGINT)
                       AS n_sensitive
            FROM customer GROUP BY 1, 2
            HAVING count(DISTINCT c_mktsegment) < 4
        """,
        "trigram_search": """
            SELECT 'window vector' AS pattern, doc_id FROM documents
            WHERE contains(text, 'window vector')
            UNION ALL
            SELECT 'slow small data', doc_id FROM documents
            WHERE contains(text, 'slow small data')
            UNION ALL
            SELECT 'zzz nothing', doc_id FROM documents
            WHERE contains(text, 'zzz nothing')
        """,
        "auc": """
            WITH s AS (
                SELECT (doc_id * 37) % 1000
                       + CASE WHEN doc_id % 5 < 2 THEN 300 ELSE 0 END
                           AS score,
                       CASE WHEN doc_id % 5 < 2 THEN 1 ELSE 0 END AS label
                FROM documents),
            g AS (SELECT score, count(*) AS n, sum(label) AS np
                  FROM s GROUP BY 1),
            o AS (SELECT score, n, np,
                         coalesce(sum(n) OVER (ORDER BY score
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS rb
                  FROM g),
            t AS (SELECT CAST(sum(np * (2 * rb + n + 1)) AS BIGINT)
                             AS two_rpos,
                         CAST(sum(np) AS BIGINT) AS n_pos,
                         CAST(sum(n) - sum(np) AS BIGINT) AS n_neg
                  FROM o)
            SELECT two_rpos - n_pos * (n_pos + 1) AS u2, n_pos, n_neg,
                   CAST((two_rpos - n_pos * (n_pos + 1)) * 1000000
                        // (2 * n_pos * n_neg) AS BIGINT) AS auc_e6
            FROM t
        """,
        "calibration": """
            SELECT ((doc_id * 37) % 1000
                    + CASE WHEN doc_id % 5 < 2 THEN 300 ELSE 0 END) // 100
                       AS bin,
                   count(*) AS n,
                   CAST(sum(CASE WHEN doc_id % 5 < 2 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_pos
            FROM documents GROUP BY 1
        """,
        "skew_report": """
            WITH c AS (
                SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY 1),
            o AS (SELECT n, row_number() OVER (ORDER BY n) AS i FROM c),
            t AS (SELECT count(*) AS nk, sum(n) AS tot, sum(i * n) AS win
                  FROM o),
            tk AS (SELECT sum(n) AS v FROM
                       (SELECT n FROM c ORDER BY n DESC LIMIT 16))
            SELECT CAST(t.nk AS BIGINT) AS n_keys,
                   CAST(t.tot AS BIGINT) AS n_rows,
                   CAST((SELECT max(n) FROM c) * 1000000 // t.tot AS BIGINT)
                       AS top1_share_e6,
                   CAST(tk.v * 1000000 // t.tot AS BIGINT) AS topk_share_e6,
                   CAST((2 * t.win - (t.nk + 1) * t.tot) * 1000000
                        // (t.nk * t.tot) AS BIGINT) AS gini_e6
            FROM t, tk
        """,
        "rrf": """
            WITH d AS (SELECT doc_id FROM documents),
            qa AS (
                SELECT t.q, doc_id,
                       row_number() OVER (PARTITION BY t.q
                           ORDER BY (doc_id * 31 + t.q * 7) % 101, doc_id)
                           AS rank
                FROM d, range(4) t(q)),
            qb AS (
                SELECT t.q, doc_id,
                       row_number() OVER (PARTITION BY t.q
                           ORDER BY (doc_id * 17 + t.q * 13) % 89, doc_id)
                           AS rank
                FROM d, range(4) t(q)),
            u AS (
                SELECT q, doc_id, 1000000 // (60 + rank) AS s
                FROM qa WHERE rank <= 10
                UNION ALL
                SELECT q, doc_id, 1000000 // (60 + rank)
                FROM qb WHERE rank <= 10),
            f AS (SELECT q, doc_id, CAST(sum(s) AS BIGINT) AS score_e6
                  FROM u GROUP BY 1, 2),
            r AS (SELECT q, doc_id, score_e6,
                         row_number() OVER (PARTITION BY q
                             ORDER BY score_e6 DESC, doc_id) AS fused_rank
                  FROM f)
            SELECT CAST(q AS BIGINT) AS q, doc_id, score_e6,
                   CAST(fused_rank AS BIGINT) AS fused_rank
            FROM r WHERE fused_rank <= 5
        """,
        # sample positions hardcode m=256 (valid whenever the table has
        # >= 256 rows; events has >= 1000 at every sf)
        "sorted_export": """
            WITH src AS (
                SELECT event_id,
                       CAST(round(value * 100) AS BIGINT) AS k
                FROM events),
            samp AS (
                SELECT k FROM (
                    SELECT k, md5('srt:' || CAST(event_id AS VARCHAR)) AS h,
                           event_id
                    FROM src ORDER BY h, event_id LIMIT 256)),
            sk AS (SELECT k, row_number() OVER (ORDER BY k) - 1 AS pos
                   FROM samp),
            b AS (SELECT k AS bound FROM sk
                  WHERE pos IN (32, 64, 96, 128, 160, 192, 224)),
            p AS (SELECT s.k,
                         (SELECT count(*) FROM b WHERE b.bound <= s.k)
                             AS part
                  FROM src s)
            SELECT CAST(part AS BIGINT) AS part_id, count(*) AS n_rows,
                   CAST(min(k) AS BIGINT) AS min_key,
                   CAST(max(k) AS BIGINT) AS max_key
            FROM p GROUP BY 1
        """,
        "clustering_coeff": """
            WITH os AS (
                SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
                WHERE l_orderkey % 20 = 0
            ), e AS (
                SELECT DISTINCT x.s AS a, y.s AS b
                FROM os x JOIN os y ON x.o = y.o AND x.s < y.s
            ),
            tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM e e1
                JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
            ),
            tn AS (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            ),
            tc AS (SELECT node, count(*) AS t FROM tn GROUP BY 1),
            d AS (
                SELECT node, count(*) AS deg FROM (
                    SELECT a AS node FROM e UNION ALL SELECT b FROM e
                ) GROUP BY 1
            )
            SELECT d.node,
                   CAST(coalesce(tc.t, 0) AS BIGINT) AS n_triangles,
                   CAST(d.deg AS BIGINT) AS degree,
                   CAST(CASE WHEN d.deg >= 2
                        THEN 2 * coalesce(tc.t, 0) * 1000000
                             // (d.deg * (d.deg - 1))
                        ELSE 0 END AS BIGINT) AS coeff_e6
            FROM d LEFT JOIN tc USING (node)
        """,
        "dq_checks": """
            SELECT 'qty_range' AS check_name,
                   count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 30)
                       AS n_violations,
                   count(*) AS n_rows
            FROM lineitem
            UNION ALL
            SELECT 'orderkey_unique',
                   count(*) - count(DISTINCT o_orderkey), count(*)
            FROM orders
            UNION ALL
            SELECT 'li_orphans',
                   (SELECT count(*) FROM lineitem l
                    WHERE NOT EXISTS (
                        SELECT 1 FROM orders o
                        WHERE o.o_orderkey = l.l_orderkey
                          AND o.o_orderkey % 7 != 0)),
                   (SELECT count(*) FROM lineitem)
            UNION ALL
            SELECT 'event_type_domain',
                   count(*) FILTER (WHERE event_type NOT IN
                       ('click', 'view', 'error', 'signup', 'purchase')),
                   count(*)
            FROM events
            UNION ALL
            SELECT 'price_nonneg',
                   count(*) FILTER (WHERE o_totalprice < 0), count(*)
            FROM orders
            ORDER BY check_name
        """,
    }
