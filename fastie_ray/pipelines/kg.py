"""The flagship end-to-end KG-construction pipeline (SURVEY §3.3
"Ray Data restatement"):

    read pages → extract_text → chunk → joint score (actor pool)
    → rejoin/dedup → entity-link (actor pool) → canonicalize (CC)
    → aggregate + materialize sorted partitioned nodes/edges
      with per-partition manifests (resumable)

Callers own the Ray session; this module never calls ray.init.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

import numpy as np
import pandas as pd

from fastie_ray.stages.canonicalize import (
    _cached_linker,
    entity_components_from_surfaces,
    relabel_column,
    relabel_columns_replicated,
)
from fastie_ray.stages.chunk import chunk_pages
from fastie_ray.stages.extract import extract_text
from fastie_ray.stages.materialize import write_partitioned
from fastie_ray.stages.rejoin import (
    rejoin_mentions,
    rejoin_mentions_local,
    rejoin_triples,
    rejoin_triples_local,
)
from fastie_ray.stages.scorers import score_joint, split_scored
from fastie_ray.synth import World, alias_table, build_world

if TYPE_CHECKING:
    import ray.data


def doc_triples(
    pages: "ray.data.Dataset",
    world_ref=None,
    concurrency: int = 8,
    batch_size: int | None = None,
    n_buckets: int = 64,
    **scorer_kw: Any,
) -> "ray.data.Dataset":
    """pages → deduplicated document triples, ONE streaming pass.

    The headline KG path. With the default ``batch_size=None`` the
    whole pipeline is ONE fused streaming operator with NO exchange:
    the reference's chunk→doc set union is document-local and chunks
    stay co-located through the fused pass, so the dedup is a per-batch
    ``drop_duplicates`` (``rejoin_triples_local``; contract in
    ``stages/rejoin.py``). An explicit ``batch_size`` re-slices the
    chunk stream mid-document, so that path keeps the hash-bucketed
    dedup exchange. Use ``extract_triples`` when BOTH mentions and
    triples are consumed."""
    from fastie_ray.stages.scorers import score_relations

    chunks = chunk_pages(extract_text(pages))
    if batch_size is None:
        # union folded into the scorer call: the WHOLE pipeline is one
        # actor-pool operator — no downstream task op, no exchange
        return score_relations(
            chunks, world_ref=world_ref, concurrency=concurrency,
            emit="doc_triples", **scorer_kw,
        )
    scored = score_relations(
        chunks, world_ref=world_ref, concurrency=concurrency,
        batch_size=batch_size, **scorer_kw,
    )
    return rejoin_triples(scored, n_buckets)


def extract_triples(
    pages: "ray.data.Dataset",
    world_ref=None,
    concurrency: int = 8,
    batch_size: int | None = None,
    n_buckets: int = 64,
    **scorer_kw: Any,
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """pages → (doc mentions, doc triples), both deduplicated.

    The scored union table is materialized ONCE (it is ~1-2 orders of
    magnitude smaller than the page stream) so the mention and triple
    branches don't re-execute the scan. Materialized blocks are the
    scorer tasks' outputs, so url co-location survives and the default
    path uses the exchange-free local rejoins."""
    chunks = chunk_pages(extract_text(pages))
    scored = score_joint(
        chunks, world_ref=world_ref, concurrency=concurrency, batch_size=batch_size, **scorer_kw
    ).materialize()
    m, t = split_scored(scored)
    if batch_size is None:
        return rejoin_mentions_local(m), rejoin_triples_local(t)
    return rejoin_mentions(m, n_buckets), rejoin_triples(t, n_buckets)


def _link_mentions_post(alias_ref):
    """Per-partition entity linking fused into the rejoin-dedup exchange:
    link each DISTINCT surface once via the worker-cached alias index
    (``_cached_linker``) and map back — ``EntityLinker.link_surface``
    verbatim, so output matches the pooled ``link_mentions`` stage."""

    def post(df: pd.DataFrame) -> pd.DataFrame:
        linker = _cached_linker(alias_ref)
        uniq = {m: linker.link_surface(m) for m in pd.unique(df["mention"])}
        df = df.copy()
        df["entity_id"] = df["mention"].map(lambda m: uniq[m][0])
        df["link_score"] = (
            df["mention"].map(lambda m: uniq[m][1]).astype(np.float32)
        )
        return df

    return post


def _link_triples_post(alias_ref):
    """Same fused shape for triple endpoints (pooled ``link_triples``
    semantics: subject/object surfaces → entity ids, no score column)."""

    def post(df: pd.DataFrame) -> pd.DataFrame:
        linker = _cached_linker(alias_ref)
        surfaces = pd.unique(
            pd.concat([df["subject"], df["object"]], ignore_index=True)
        )
        uniq = {s: linker.link_surface(s)[0] for s in surfaces}
        df = df.copy()
        df["subject_id"] = df["subject"].map(uniq)
        df["object_id"] = df["object"].map(uniq)
        return df

    return post


def graph_tables(
    pages: "ray.data.Dataset",
    world: World | None = None,
    concurrency: int = 8,
    n_buckets: int = 64,
    want: tuple[str, ...] = ("nodes", "edges", "linked"),
    **scorer_kw: Any,
) -> dict[str, Any]:
    """pages → {nodes, edges, linked, triples, mentions} datasets (no
    writes). ``want`` names the tables the caller will actually consume
    more than once: ``linked`` is materialized only when the nodes
    branch (or the caller) re-reads it — an edges-only caller streams
    the link pool straight into the CC dedup and saves one execution."""
    import ray

    world = world or build_world()
    world_ref = ray.put(world)
    alias_ref = ray.put(alias_table(world))

    chunks = chunk_pages(extract_text(pages))
    scored = score_joint(
        chunks, world_ref=world_ref, concurrency=concurrency, **scorer_kw
    ).materialize()
    m_raw, t_raw = split_scored(scored)
    # document-local rejoins (no exchange; co-location contract in
    # stages/rejoin.py — the materialized blocks are scorer outputs,
    # which never split a url). Falls back to the exchange when an
    # explicit scorer batch_size re-slices the chunk stream.
    local = scorer_kw.get("batch_size") is None
    _rj_m = rejoin_mentions_local if local else (
        lambda d, post=None: rejoin_mentions(d, n_buckets, post=post)
    )
    _rj_t = rejoin_triples_local if local else (
        lambda d, post=None: rejoin_triples(d, n_buckets, post=post)
    )
    mentions, triples = _rj_m(m_raw), _rj_t(t_raw)

    # linking rides INSIDE the rejoin-dedup stage (post hook, linker
    # index cached once per worker): per batch/partition the distinct
    # surfaces are linked once and mapped back — no separate
    # EntityLinker/TripleLinker actor pool to spawn, one fewer pipeline
    # stage on both graph branches. Semantics are the pooled linkers'
    # link_surface verbatim.
    linked = _rj_m(m_raw, post=_link_mentions_post(alias_ref))
    if "linked" in want:
        # the caller re-reads it — pin once (the nodes branch alone
        # consumes it a single time and can stream)
        linked = linked.materialize()

    # canonicalization: CC over the surface↔entity graph →
    # (entity_id, component_id), with the edge set built from DISTINCT
    # mention surfaces off the RAW chunk-mention stream — one small
    # exchange with in-task linking; no rejoin-dedup shuffle and no
    # corpus-sized link pool on this lineage (linking is bounded by
    # surface vocabulary, not corpus). The label table stays off the
    # driver on the at-scale path (VERDICT r1 #8).
    ent_comp = entity_components_from_surfaces(m_raw, alias_ref, n_buckets=n_buckets)

    # canonical display names ARE vocab-bounded (world entity list), so
    # a ray.put broadcast is the right call for them.
    id2name = {e.entity_id: e.name for e in world.entities}
    name_ref = ray.put(id2name)

    # nodes: per-batch combiner on entity_id, then ONE task-based
    # exchange that (a) finishes the count aggregate (rows sharing
    # entity_id are co-partitioned — the relabel buckets on the
    # pre-relabel component_id, which is initialized to entity_id) and
    # (b) maps component_id via ent_comp, unmatched entities keeping
    # their own id. Replaces the old bucketed-groupby shuffle + Acero
    # left-outer join (two operators, one of them actor-based).
    def to_nodes(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("entity_id", as_index=False).agg(n_mentions=("url", "count"))
        g["component_id"] = g["entity_id"]
        return g

    node_partials = linked.map_batches(to_nodes, batch_format="pandas")

    def node_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["entity_id", "component_id"], as_index=False)["n_mentions"].sum()
        out["n_mentions"] = out["n_mentions"].astype("int64")
        return out

    node_cols = ["entity_id", "component_id", "n_mentions"]
    nodes_rel = relabel_column(
        node_partials, "component_id", ent_comp, n_buckets,
        left_cols=node_cols, pre=node_final,
    )

    def node_decorate(df: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(name_ref)
        return pd.DataFrame(
            {
                "entity_id": df["entity_id"],
                "canonical_name": df["entity_id"].map(lambda e: names.get(e, "")),
                "component_id": df["component_id"],
                "n_mentions": df["n_mentions"].astype("int64"),
            }
        )

    nodes = nodes_rel.map_batches(node_decorate, batch_format="pandas")

    # edges: endpoints linked inside the triple rejoin exchange (same
    # fused-post shape as the mentions branch), AGGREGATE FIRST on the original
    # entity ids (per-batch combiner; corpus-sized rows never cross more
    # than one exchange), THEN relabel BOTH endpoints in one replicated
    # exchange and merge rows whose endpoints collapsed. The replicated
    # relabel buckets on the pre-relabel subject_id, which determines
    # the (s,p,o) group, so pre=edge_final completes the support
    # aggregate there; the follow-up merge buckets on the POST-relabel
    # subject_id, so edges whose keys only collide after relabeling
    # still co-locate — a COMPLETE collapse-merge, unlike the previous
    # chained relabel whose object-bucketed post-merge silently missed
    # rows when two distinct pre-object ids collapsed to one component.
    # Two exchanges total, same as before; the label table (vocab-
    # bounded) is replicated to every bucket instead of shuffled twice.
    ltriples = _rj_t(t_raw, post=_link_triples_post(alias_ref))

    def edge_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["subject_id", "predicate", "object_id"], as_index=False
        ).agg(n_support=("url", "count"), urls=("url", lambda s: list(s)[:8]))

    def edge_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["subject_id", "predicate", "object_id"], as_index=False).agg(
            n_support=("n_support", "sum"),
            urls=("urls", lambda s: sorted({u for lst in s for u in lst})[:8]),
        )
        # blocks that crossed a relabel exchange carry NA-padded right
        # rows, which degrade n_support to object dtype — restore int64
        out["n_support"] = out["n_support"].astype("int64")
        return out

    edge_partials = ltriples.map_batches(edge_partial, batch_format="pandas")
    # left_cols passed explicitly: schema inference would execute the
    # scorer lineage just to read column names
    pre_cols = ["subject_id", "predicate", "object_id", "n_support", "urls"]
    edges_rel = relabel_columns_replicated(
        edge_partials, ["subject_id", "object_id"], ent_comp, n_buckets,
        left_cols=pre_cols, bucket_col="subject_id", pre=edge_final,
    )
    edges = _bucketed_groupby(edges_rel, "subject_id", edge_final, n_buckets)

    return {
        "nodes": nodes,
        "edges": edges,
        "linked": linked,
        "triples": triples,
        "mentions": mentions,
    }


def merge_edge_aggregates(
    base: "ray.data.Dataset", delta: "ray.data.Dataset", n_buckets: int = 32
) -> "ray.data.Dataset":
    """Incremental KG maintenance: fold a new crawl increment's edge
    aggregate into checkpointed edge state WITHOUT recomputing the base
    corpus. The edge table is an ADDITIVE aggregate keyed
    (subject_id, predicate, object_id): ``n_support`` sums, and the
    sorted-8 url sample merges EXACTLY — the lexicographically smallest
    8 of A∪B is always contained in smallest8(A) ∪ smallest8(B) — so
    incremental == full-batch bit-for-bit (oracle-checked via
    kg_edges_delta). One bucketed exchange over (base ∪ delta) rows,
    which are graph-sized, never corpus-sized. Canonicalization state
    (component ids) is surface-vocab-bounded and recomputed per
    increment by design — the per-page extraction is the 100-TB cost,
    and that is what this merge avoids re-running."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(
            ["subject_id", "predicate", "object_id"], as_index=False
        ).agg(
            n_support=("n_support", "sum"),
            urls=("urls", lambda s: sorted({u for lst in s for u in lst})[:8]),
        )
        out["n_support"] = out["n_support"].astype("int64")
        return out

    return _bucketed_groupby(base.union(delta), "subject_id", merge, n_buckets)


def build_graph(
    pages: "ray.data.Dataset",
    out_dir: str,
    world: World | None = None,
    concurrency: int = 8,
    n_buckets: int = 64,
    n_partitions: int = 16,
    resume: bool = False,
    **scorer_kw: Any,
) -> dict[str, Any]:
    """Full pipeline incl. partitioned, manifest-tracked writes."""
    t = graph_tables(
        pages, world=world, concurrency=concurrency, n_buckets=n_buckets, **scorer_kw
    )
    edges, nodes = t["edges"], t["nodes"]

    edge_manifest = write_partitioned(
        edges, out_dir, "edges", part_key="subject_id",
        sort_keys=["subject_id", "predicate", "object_id"],
        n_partitions=n_partitions, resume=resume,
    )
    node_manifest = write_partitioned(
        nodes, out_dir, "nodes", part_key="entity_id",
        sort_keys=["entity_id"], n_partitions=n_partitions, resume=resume,
    )
    return {
        "out_dir": out_dir,
        "edge_manifest": edge_manifest,
        "node_manifest": node_manifest,
        "n_edges": int(edge_manifest["row_count"].sum()),
        "n_nodes": int(node_manifest["row_count"].sum()),
    }


def _bucketed_groupby(partials, key, final_fn, n_buckets: int):
    """Partial-aggregate → hash-bucket shuffle → vectorized final agg.
    The combiner ran inside map_batches upstream; the shuffle key is a
    coarse bucket so hot keys (head entities) don't serialize into one
    tiny group (SURVEY §4 skew)."""

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[key], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return final_fn(g.drop(columns="__b"))

    return (
        partials.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def doc_events(
    pages: "ray.data.Dataset",
    world_ref=None,
    concurrency: int = 8,
    n_buckets: int = 64,
    **scorer_kw: Any,
) -> "ray.data.Dataset":
    """pages → document event-argument rows (GPLinker-EE semantics A13),
    one streaming pass — same shape as doc_triples (exchange-free
    document-local union on the default fused path)."""
    from fastie_ray.stages.rejoin import rejoin_events
    from fastie_ray.stages.scorers import score_events

    chunks = chunk_pages(extract_text(pages))
    if scorer_kw.get("batch_size") is None:
        # rejoin folded into the scorer call — one actor-pool operator
        return score_events(
            chunks, world_ref=world_ref, concurrency=concurrency,
            emit="doc_events", **scorer_kw,
        )
    scored = score_events(
        chunks, world_ref=world_ref, concurrency=concurrency, **scorer_kw
    )
    return rejoin_events(scored, n_buckets)


def comention_counts(
    pages: "ray.data.Dataset",
    world_ref=None,
    concurrency: int = 8,
    link_buckets: int = 16,
    final: str = "driver",
    **scorer_kw: Any,
) -> pd.DataFrame:
    """Entity co-mention graph: (eid_a, eid_b, n_docs) counting, per
    unordered entity pair, the documents in which both entities are
    mentioned — the co-occurrence edge layer of a KG (relatedness
    priors, link-prediction features; no reference counterpart — the
    reference emits per-document sets only).

    Scale shape: the mention stream shrinks to DISTINCT (url, mention)
    per batch (combiner), ONE url-bucketed exchange co-locates each
    document's mention set, and the final task links each distinct
    surface once via the worker-cached alias index, takes the per-url
    distinct entity set, and enumerates its C(n, 2) lexicographic
    pairs. Per-bucket pair counts are bounded by the entity vocabulary
    squared — ``final="driver"`` merges them on the driver (the
    bounded-small-side pattern); ``final="exchange"`` is the
    open-vocabulary path that finishes in one more pair-bucketed
    exchange (parity-pinned by test)."""
    import pyarrow as pa

    from fastie_ray.stages.scorers import score_mentions

    chunks = chunk_pages(extract_text(pages))
    scored = score_mentions(
        chunks, world_ref=world_ref, concurrency=concurrency, **scorer_kw
    )
    import ray

    world = ray.get(world_ref) if world_ref is not None else build_world()
    alias_ref = ray.put(alias_table(world))

    def distinct_um(batch: pa.Table) -> pa.Table:
        df = batch.select(["url", "mention"]).to_pandas().drop_duplicates()
        return pa.table(
            {"url": pa.array(df["url"], pa.string()),
             "mention": pa.array(df["mention"], pa.string())}
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["url"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(link_buckets)).astype(np.int64)
        return df

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates()
        linker = _cached_linker(alias_ref)
        uniq = {m: linker.link_surface(m)[0] for m in pd.unique(g["mention"])}
        g = g.assign(eid=g["mention"].map(uniq)).drop_duplicates(
            subset=["url", "eid"]
        )
        p = g.merge(g, on="url", suffixes=("_a", "_b"))
        p = p[p["eid_a"] < p["eid_b"]]
        out = p.groupby(["eid_a", "eid_b"], as_index=False).agg(
            n_docs=("url", "nunique")
        )
        out["n_docs"] = out["n_docs"].astype("int64")
        return out[["eid_a", "eid_b", "n_docs"]]

    pair_parts = (
        scored.map_batches(distinct_um, batch_format="pyarrow")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    if final == "exchange":
        # open-vocabulary path: finish the pair sum in one more
        # pair-bucketed exchange instead of the driver merge
        def add_pb(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            if len(df) == 0:
                df["__b"] = np.array([], dtype=np.int64)
                return df
            h = pd.util.hash_pandas_object(
                df["eid_a"] + "\x00" + df["eid_b"], index=False
            ).to_numpy()
            df["__b"] = (h % np.uint64(link_buckets)).astype(np.int64)
            return df

        def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
            return g.drop(columns="__b").groupby(
                ["eid_a", "eid_b"], as_index=False
            )["n_docs"].sum()

        parts = (
            pair_parts.map_batches(add_pb, batch_format="pandas")
            .groupby("__b")
            .map_groups(sum_pairs, batch_format="pandas")
            .to_pandas()
        )
    else:
        parts = pair_parts.to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"eid_a": pd.Series([], dtype=object),
             "eid_b": pd.Series([], dtype=object),
             "n_docs": pd.Series([], dtype="int64")}
        )
    out = parts.groupby(["eid_a", "eid_b"], as_index=False)["n_docs"].sum()
    out["n_docs"] = out["n_docs"].astype("int64")
    return out.sort_values(["eid_a", "eid_b"]).reset_index(drop=True)


def entity_type_consensus(
    pages: "ray.data.Dataset",
    world_ref=None,
    concurrency: int = 8,
    link_buckets: int = 16,
    final: str = "driver",
    **scorer_kw: Any,
) -> pd.DataFrame:
    """Type consensus per canonical entity: the majority mention label
    over every linked occurrence (ties → lexicographically smallest
    label) — the KG-quality pass that reconciles conflicting NER types
    before schema validation (no reference counterpart; the reference
    types mentions independently per document).

    Scale shape: per-batch (mention, label) occurrence-count combiner,
    ONE mention-bucketed exchange that sums counts and links each
    distinct surface once via the worker-cached alias index, then a
    vocabulary-bounded driver merge + argmax (``final="driver"``, the
    bounded-small-side pattern) or one more eid-bucketed exchange with
    the argmax in-task (``final="exchange"``, the open-vocabulary path;
    parity-pinned by test). Returns (entity_id, label, n_mentions)
    winners."""
    import pyarrow as pa

    from fastie_ray.stages.scorers import score_mentions

    chunks = chunk_pages(extract_text(pages))
    scored = score_mentions(
        chunks, world_ref=world_ref, concurrency=concurrency, **scorer_kw
    )
    import ray

    world = ray.get(world_ref) if world_ref is not None else build_world()
    alias_ref = ray.put(alias_table(world))

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["mention", "label"]).to_pandas()
        return df.groupby(["mention", "label"], as_index=False).agg(
            n=("label", "count")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["mention"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(link_buckets)).astype(np.int64)
        return df

    def link_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        g = g.groupby(["mention", "label"], as_index=False)["n"].sum()
        linker = _cached_linker(alias_ref)
        uniq = {m: linker.link_surface(m)[0] for m in pd.unique(g["mention"])}
        g = g.assign(entity_id=g["mention"].map(uniq))
        out = g.groupby(["entity_id", "label"], as_index=False)["n"].sum()
        return out

    counted = (
        scored.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(link_bucket, batch_format="pandas")
    )
    if final == "exchange":
        # open-vocabulary path: co-locate each entity's labels in one
        # more eid-bucketed exchange and take the argmax in-task
        def add_eb(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            if len(df) == 0:
                df["__b"] = np.array([], dtype=np.int64)
                return df
            h = pd.util.hash_pandas_object(df["entity_id"], index=False).to_numpy()
            df["__b"] = (h % np.uint64(link_buckets)).astype(np.int64)
            return df

        def win_bucket(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns="__b").groupby(
                ["entity_id", "label"], as_index=False
            )["n"].sum()
            g = g.sort_values(
                ["entity_id", "n", "label"], ascending=[True, False, True]
            )
            return g[~g["entity_id"].duplicated()]

        parts = (
            counted.map_batches(add_eb, batch_format="pandas")
            .groupby("__b")
            .map_groups(win_bucket, batch_format="pandas")
            .to_pandas()
        )
    else:
        parts = counted.to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "entity_id": pd.Series([], dtype=str),
                "label": pd.Series([], dtype=str),
                "n_mentions": pd.Series([], dtype="int64"),
            }
        )
    full = parts.groupby(["entity_id", "label"], as_index=False)["n"].sum()
    full = full.sort_values(
        ["entity_id", "n", "label"], ascending=[True, False, True]
    )
    win = full[~full["entity_id"].duplicated()].rename(columns={"n": "n_mentions"})
    win["n_mentions"] = win["n_mentions"].astype("int64")
    return win.sort_values("entity_id").reset_index(drop=True)
