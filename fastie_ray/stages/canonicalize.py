"""Entity canonicalization — connected components over the
surface↔entity graph (SURVEY §2.7 D6; north_rule explicit stage).

Graph: one node per normalized mention surface (``s:...``) and per
linked entity id (``e:...``); an edge for every (surface, entity) pair
observed by the linker. Components merge entities that share alias
surfaces and attach NIL surfaces to their own clusters.

Scale design:
- the input edge stream is corpus-sized (billions of mention rows) and
  Zipf-skewed on head entities — the FIRST step is a skew-safe exact
  dedup (per-batch combiner, then hash-bucketed shuffle; see
  ``ops.dedup``), which is morally the "salted groupby": hot keys are
  spread across batches and pre-shrunk before any shuffle key exists;
- the deduped edge set is VOCABULARY-bounded (≪ corpus), so components
  finish either on the driver (streamed union-find, default for ≤
  ``driver_threshold`` edges) or via distributed min-label-propagation
  rounds (``ds.join`` relabel per round, diameter-bounded) — both
  implemented, selected by measured edge count.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.dedup import dedup_exact

# per-block row cap for CC label-table compaction (~100 MB of two short
# string columns); keeps k_blocks growing with label volume at scale
_LABEL_ROWS_PER_BLOCK = 1_000_000

if TYPE_CHECKING:
    import ray.data


def surface_key(mention: str) -> str:
    return "s:" + mention.lower()


def mention_edges(linked: "ray.data.Dataset") -> "ray.data.Dataset":
    """linked mentions → (u=surface_key, v=entity node) edge rows."""

    def to_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "u": df["mention"].str.lower().radd("s:"),
                "v": df["entity_id"].radd("e:"),
            }
        )

    return linked.map_batches(to_edges, batch_format="pandas")


# ------------------------------------------------------------------ CC


class _UnionFind:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        parent = self.parent
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins as root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def _driver_cc(edges: "ray.data.Dataset") -> pd.DataFrame:
    """Streamed union-find on the driver; edges must be dedup'd/small."""
    uf = _UnionFind()
    for batch in edges.iter_batches(batch_size=65536, batch_format="pandas"):
        for u, v in zip(batch["u"], batch["v"]):
            uf.union(u, v)
    nodes = list(uf.parent)
    return pd.DataFrame({"node": nodes, "component_id": [uf.find(n) for n in nodes]})


def _distributed_cc(
    edges: "ray.data.Dataset", n_buckets: int, max_rounds: int
) -> pd.DataFrame:
    """Min-label propagation with ds.join relabels; returns the final
    (node, component_id) frame (vocabulary-bounded, collected at the end)."""
    out = _distributed_cc_ds(edges, n_buckets, max_rounds).to_pandas()
    return out


def _distributed_cc_ds(
    edges: "ray.data.Dataset", n_buckets: int, max_rounds: int
) -> "ray.data.Dataset":
    """Min-label propagation + pointer doubling on raw-task exchanges
    (r3 rewrite of the ds.join version): the symmetric adjacency is
    hash-partitioned by node ONCE and PINNED (``BlockSet.partition``);
    each round is exactly three exchanges —

      1. labels keyed node, adjacency riding as the pinned side:
         per-bucket merge emits min-candidate messages to each
         neighbor (combiner) plus the bucket's own labels;
      2. keyed node: final min per node, old comp carried for the
         convergence test;
      3. keyed comp (tag-union): pointer doubling comp ← comp(comp)
         — every comp value is itself a node id, so the lookup is
         total — with the changed count read off the output by a
         per-block scalar probe (no extra exchange).

    vs the previous shape (two Acero ds.join + one Ray Data sort +
    two materializes + a join-based changed count per round): same
    data movement, no aggregator actors (NOTES facts 1-2), no sort
    barriers, and edges never re-ship. Labels never become a driver
    structure. Node ids are strings by contract."""
    import ray.data  # noqa: F401

    from fastie_ray.state.exchange import BlockSet

    nb = join_partitions(n_buckets)

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=object),
                 "nbr": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {
                "node": pd.concat(
                    [df["u"].astype(str), df["v"].astype(str)],
                    ignore_index=True,
                ),
                "nbr": pd.concat(
                    [df["v"].astype(str), df["u"].astype(str)],
                    ignore_index=True,
                ),
            }
        )

    sym_parts = BlockSet.from_dataset(edges).partition(
        ["node"], nb, map_fn=both_dirs
    )

    # init: comp = node, per pinned bucket (already node-partitioned —
    # no exchange, bucket-aligned with sym_parts by construction)
    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df["node"].unique() if len(df) else []
        return pd.DataFrame(
            {"node": pd.Series(nodes, dtype=object),
             "comp": pd.Series(nodes, dtype=object)}
        )

    labels = BlockSet(sym_parts).map(init_labels)

    _EMPTY_NC = pd.DataFrame(
        {"node": pd.Series([], dtype=object),
         "comp": pd.Series([], dtype=object),
         "t": pd.Series([], dtype=object)}
    )

    def msgs(g: pd.DataFrame, sym_b: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "node" not in g.columns:
            return _EMPTY_NC.copy()
        own = pd.DataFrame(
            {"node": g["node"], "comp": g["comp"], "t": "o"}
        )
        if len(sym_b) == 0:
            return own
        m = sym_b.merge(g[["node", "comp"]], on="node", sort=False)
        cand = (
            m.groupby("nbr", as_index=False)["comp"].min()
            .rename(columns={"nbr": "node"})
        )
        cand["t"] = "c"
        return pd.concat([own, cand], ignore_index=True)

    def new_min(g: pd.DataFrame) -> pd.DataFrame:
        mn = g.groupby("node", as_index=False)["comp"].min()
        old = g.loc[g["t"] == "o", ["node", "comp"]].rename(
            columns={"comp": "comp_old"}
        )
        return mn.merge(old, on="node", how="left")

    def ptr_rows(df: pd.DataFrame) -> pd.DataFrame:
        q = pd.DataFrame(
            {"key": df["comp"], "node": df["node"],
             "comp_old": df["comp_old"], "t": "q"}
        )
        s = pd.DataFrame(
            {"key": df["node"], "node": df["node"],
             "comp_old": df["comp"], "t": "s"}
        )
        # for serve rows, comp_old carries the VALUE to serve (comp)
        return pd.concat([q, s], ignore_index=True)

    def jump(g: pd.DataFrame) -> pd.DataFrame:
        serve = g.loc[g["t"] == "s", ["key", "comp_old"]].rename(
            columns={"comp_old": "comp"}
        ).drop_duplicates("key")
        q = g.loc[g["t"] == "q", ["key", "node", "comp_old"]]
        m = q.merge(serve, on="key", how="left", sort=False)
        m["comp"] = m["comp"].fillna(m["key"])
        return m[["node", "comp", "comp_old"]]

    for _ in range(max_rounds):
        cand = labels.exchange(["node"], msgs, n_buckets=nb, side=sym_parts)
        nl = cand.exchange(["node"], new_min, n_buckets=nb)
        jumped = nl.exchange(["key"], jump, n_buckets=nb, map_fn=ptr_rows)
        changed = sum(
            jumped.scalar(
                lambda df: int((df["comp"] != df["comp_old"]).sum())
                if len(df) and "comp" in df.columns else 0
            )
        )
        labels = jumped.map(lambda df: df[["node", "comp"]])
        if not changed:
            break
    return labels.map(
        lambda df: df.rename(columns={"comp": "component_id"})
    ).to_dataset()


def _bucketize(col: str, n_buckets: int):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
        else:
            df["__b"] = (
                pd.util.hash_pandas_object(df[col], index=False).to_numpy()
                % np.uint64(n_buckets)
            ).astype(np.int64)
        return df

    return fn


def partial_min_grouped(g: pd.DataFrame):
    import pyarrow as pa

    out = g.groupby("node", as_index=False)["comp"].min()
    # typed Arrow out: map_groups runs one task per post-sort BLOCK
    # (NOTES fact 10) and empty range blocks yield zero-row pandas
    # frames whose schema is lost — the downstream comp-key joins crash
    # on the schema-less sentinels (observed flakily under load)
    return pa.Table.from_pandas(
        out[["node", "comp"]],
        schema=pa.schema([("node", pa.string()), ("comp", pa.string())]),
        preserve_index=False,
    )


def connected_components(
    edges: "ray.data.Dataset",
    n_buckets: int = 64,
    driver_threshold: int = 500_000,
    max_rounds: int = 6,
) -> pd.DataFrame:
    """(u, v) edges → (node, component_id). Dedups first (skew-safe),
    then picks driver union-find vs distributed label propagation by
    measured unique-edge count."""
    uniq = dedup_exact(edges, ["u", "v"], n_buckets).materialize()
    if uniq.count() <= driver_threshold:
        return _driver_cc(uniq)
    return _distributed_cc(uniq, n_buckets, max_rounds)


def join_partitions(n_buckets: int) -> int:
    """ds.join spawns ``num_partitions`` hash-shuffle aggregator actors
    that must ALL schedule before the join makes progress — asking for
    more than the cluster's CPUs deadlocks (measured in this sandbox:
    64 partitions on 16 CPUs hangs; ≤32 runs). Cap at half the cluster
    CPUs so two pipelined joins can coexist; on a real multi-node
    cluster this scales up automatically with total CPUs."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(2, min(n_buckets, cpus // 2))


def connected_components_ds(
    edges: "ray.data.Dataset",
    n_buckets: int = 64,
    driver_threshold: int = 500_000,
    max_rounds: int = 6,
) -> "ray.data.Dataset":
    """(u, v) edges → (node, component_id) as a DATASET. Same algorithm
    selection as ``connected_components``, but the label table is never
    collected into a driver structure (VERDICT r1 #8: NIL surface nodes
    grow with distinct unlinked surfaces, which at web scale is not
    vocabulary-bounded; driver dicts must not hold them)."""
    import ray.data

    uniq = dedup_exact(edges, ["u", "v"], n_buckets).materialize()
    if uniq.count() <= driver_threshold:
        return ray.data.from_pandas(_driver_cc(uniq))
    return _distributed_cc_ds(uniq, n_buckets, max_rounds)


def entity_component_labels(
    labels: "ray.data.Dataset", n_buckets: int = 64
) -> "ray.data.Dataset":
    """Distributed entity-label projection: (node, component_id) labels →
    (entity_id, component_id) rows for ENTITY nodes, with component ids
    re-keyed to the smallest member entity id — all as dataset ops
    (filter → partial-min combiner → bucketed final → hash join), no
    driver dict."""

    def ents_only(df: pd.DataFrame) -> pd.DataFrame:
        m = df["node"].str.startswith("e:")
        return df[m].reset_index(drop=True)

    ents = labels.map_batches(ents_only, batch_format="pandas")

    def partial_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("component_id", as_index=False)["node"].min()

    partials = ents.map_batches(partial_min, batch_format="pandas")

    def final_min(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("component_id", as_index=False)["node"].min()
        return out.rename(columns={"node": "min_ent"})

    min_ent = (
        partials.map_batches(_bucketize("component_id", n_buckets), batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: final_min(g.drop(columns="__b")), batch_format="pandas"
        )
    )

    j = ents.join(
        min_ent,
        join_type="inner",
        num_partitions=join_partitions(n_buckets),
        on=("component_id",),
        right_on=("component_id",),
        right_suffix="_r",
    )

    def strip(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "entity_id": df["node"].str[2:],
                "component_id": df["min_ent"].str[2:],
            }
        )

    return j.map_batches(strip, batch_format="pandas")


def _project_entity_labels_driver(labels: pd.DataFrame) -> pd.DataFrame:
    """Driver-side entity-label projection (labels already resident)."""
    ents = labels[labels["node"].str.startswith("e:")]
    min_ent = ents.groupby("component_id")["node"].min()
    return pd.DataFrame(
        {
            "entity_id": ents["node"].str[2:].to_numpy(),
            "component_id": ents["component_id"].map(min_ent).str[2:].to_numpy(),
        }
    )


def entity_components_from_edges(
    edges: "ray.data.Dataset",
    n_buckets: int = 64,
    driver_threshold: int = 500_000,
    max_rounds: int = 6,
) -> "ray.data.Dataset":
    """(u, v) mention edges → (entity_id, component_id) directly, with
    the same size-based algorithm selection as ``connected_components``.

    When the deduped edge set fits the driver threshold, the CC labels
    are ALREADY driver-resident (``_driver_cc``'s union-find dict), so
    projecting entity labels in pandas adds no new driver-side exposure
    and skips the three distributed exchanges (combiner shuffle + Acero
    join) that ``entity_component_labels`` pays — measured ~2-4 s of
    fixed operator cost per query on this box. Above the threshold the
    fully-distributed path runs unchanged."""
    import ray.data

    uniq = dedup_exact(edges, ["u", "v"], n_buckets).materialize()
    if uniq.count() <= driver_threshold:
        return ray.data.from_pandas(_project_entity_labels_driver(_driver_cc(uniq)))
    labels_ds = _distributed_cc_ds(uniq, n_buckets, max_rounds)
    return entity_component_labels(labels_ds, n_buckets).materialize()


_LINKER_CACHE: dict = {}


def _cached_linker(alias_ref):
    """One EntityLinker index per (worker process, alias table) — bucket
    tasks reuse it instead of rebuilding per task."""
    from fastie_ray.stages.link import EntityLinker

    key = alias_ref.hex() if hasattr(alias_ref, "hex") else id(alias_ref)
    linker = _LINKER_CACHE.get(key)
    if linker is None:
        linker = EntityLinker(alias_ref=alias_ref)
        _LINKER_CACHE.clear()  # one alias table per job; don't pin old ones
        _LINKER_CACHE[key] = linker
    return linker


def entity_components_from_surfaces(
    mentions: "ray.data.Dataset",
    alias_ref,
    n_buckets: int = 64,
    driver_threshold: int = 500_000,
    max_rounds: int = 6,
    link_buckets: int = 16,
) -> "ray.data.Dataset":
    """Mention stream (pre- or post-rejoin; only the ``mention`` column
    is read) → (entity_id, component_id), building the CC edge set from
    DISTINCT mention surfaces.

    Per-batch distinct surfaces (combiner) → ONE hash-bucketed exchange
    whose final task finishes the distinct AND links each surface
    (alias index cached once per worker from the broadcast table) →
    (u, v) edge rows, one per distinct surface. Replaces the CC
    lineage's rejoin-dedup shuffle → corpus-sized link actor pool →
    edge-dedup shuffle with one small exchange: the linker only ever
    sees vocabulary-sized input (Zipf: distinct surfaces ≪ mention
    occurrences), which is also the 100-TB-correct shape — linking work
    is bounded by vocabulary, not corpus. Linking semantics are
    EntityLinker.link_surface verbatim, so results match the pooled
    path bit-for-bit."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data

    def distinct_surf(batch: pa.Table) -> pa.Table:
        return pa.table({"mention": pc.unique(batch["mention"])})

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["mention"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(link_buckets)).astype(np.int64)
        return df

    def link_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["mention"])
        linker = _cached_linker(alias_ref)
        surfaces = g["mention"].tolist()
        us = ["s:" + s.lower() for s in surfaces]
        vs = ["e:" + linker.link_surface(s)[0] for s in surfaces]
        # case variants of one surface may collapse to the same (u, v)
        return pd.DataFrame({"u": us, "v": vs}).drop_duplicates()

    uniq = (
        mentions.map_batches(distinct_surf, batch_format="pyarrow")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(lambda g: link_bucket(g.drop(columns="__b")), batch_format="pandas")
        .materialize()
    )
    if uniq.count() <= driver_threshold:
        return ray.data.from_pandas(_project_entity_labels_driver(_driver_cc(uniq)))
    # duplicate-free by construction (per-bucket drop_duplicates over a
    # surface-partitioned key) — label propagation runs directly
    labels_ds = _distributed_cc_ds(uniq, n_buckets, max_rounds)
    return entity_component_labels(labels_ds, n_buckets).materialize()


def relabel_column(
    ds: "ray.data.Dataset",
    col: str,
    ent_labels: "ray.data.Dataset",
    n_buckets: int = 64,
    left_cols: list[str] | None = None,
    post=None,
    pre=None,
) -> "ray.data.Dataset":
    """Replace ``col`` values by their component id via a BUCKETED hash
    join against (entity_id, component_id); unmatched rows keep their
    value (the ``comp_m.get(e, e)`` semantics of the old broadcast
    dict). Implemented as tag-union → one coarse groupby shuffle →
    per-partition pandas map: same exchange volume as ``ds.join`` but
    task-based — no per-partition aggregator ACTORS to spawn (measured
    ~1-2 s fixed cost per join operator on this box).

    Pass ``left_cols`` when the left lineage is expensive —
    ``ds.schema()`` EXECUTES part of the upstream pipeline to infer it
    (measured: two schema probes re-ran the scorer chain).

    ``post``, if given, runs on each relabeled partition frame before it
    is emitted — use it to fold a follow-up merge/aggregate into this
    exchange when the merge key's rows are guaranteed co-partitioned by
    ``col`` (e.g. merging edges after their LAST endpoint is relabeled),
    saving a whole extra shuffle.

    ``pre``, if given, runs on the assembled left partition frame BEFORE
    the mapping is applied — use it to fold the FINAL aggregate of an
    upstream partial-combine into this exchange: rows sharing the
    grouping key are co-partitioned here whenever the key determines
    ``col`` (e.g. grouping on (s,p,o) while relabeling subject_id),
    which makes a separate ``_bucketed_groupby`` shuffle redundant."""
    left_cols = list(left_cols) if left_cols is not None else list(ds.schema().names)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__cmp"] = pd.NA
        out["__side"] = "l"
        out["__b"] = (
            (pd.util.hash_pandas_object(out[col], index=False).to_numpy()
             % np.uint64(n_buckets)).astype(np.int64)
            if len(out) else np.array([], dtype=np.int64)
        )
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({col: df["entity_id"], "__cmp": df["component_id"]})
        for c in left_cols:
            if c not in out.columns:
                out[c] = pd.NA
        out["__side"] = "r"
        out["__b"] = (
            (pd.util.hash_pandas_object(out[col], index=False).to_numpy()
             % np.uint64(n_buckets)).astype(np.int64)
            if len(out) else np.array([], dtype=np.int64)
        )
        return out[left_cols + ["__cmp", "__side", "__b"]]

    def apply_map(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        lg = g[g["__side"] == "l"][left_cols + ["__cmp"]].drop(columns="__cmp")
        rg = g[g["__side"] == "r"][[col, "__cmp"]]
        mapping = dict(zip(rg[col], rg["__cmp"]))
        if pre is not None:
            lg = pre(lg)
        lg = lg.copy()
        lg[col] = lg[col].map(lambda v: mapping.get(v, v))
        return post(lg) if post is not None else lg

    both = ds.map_batches(tag_left, batch_format="pandas").union(
        ent_labels.map_batches(tag_right, batch_format="pandas")
    )
    return both.groupby("__b").map_groups(apply_map, batch_format="pandas")


def relabel_columns_replicated(
    ds: "ray.data.Dataset",
    cols: list[str],
    ent_labels: "ray.data.Dataset",
    n_buckets: int = 64,
    left_cols: list[str] | None = None,
    bucket_col: str | None = None,
    pre=None,
) -> "ray.data.Dataset":
    """Relabel SEVERAL columns to their component ids in ONE exchange by
    REPLICATING the (entity_id, component_id) label table to every
    bucket, instead of one ``relabel_column`` exchange per column.

    Payload math: one exchange ships E + B·L rows (E = left rows,
    L = label rows, B = n_buckets) vs k·(E + L) for k chained
    ``relabel_column`` calls — a win whenever the label table is small
    relative to the left side (it is: labels are surface-vocab-bounded,
    edges are graph-sized). More importantly it removes the chained
    path's completeness caveat: after BOTH endpoints are relabeled
    map-side, a follow-up merge exchange can bucket on the POST-relabel
    key, so rows whose keys only collide after relabeling still
    co-locate. (The chained path's ``post=`` merge buckets on the
    PRE-relabel value and silently misses merges when two distinct
    pre-ids collapse to one component — see
    ``pipelines/kg.py`` edge path, which pairs this with a
    ``_bucketed_groupby`` on the post-relabel subject.)

    ``bucket_col`` picks which left column distributes rows (default
    ``cols[0]``); ``pre`` runs on the assembled left partition BEFORE
    the mapping, to finish an upstream partial-aggregate whose grouping
    key determines ``bucket_col`` (same contract as ``relabel_column``'s
    ``pre``). Unmatched values keep themselves, as everywhere."""
    cols = list(cols)
    bucket_col = bucket_col or cols[0]
    left_cols = list(left_cols) if left_cols is not None else list(ds.schema().names)

    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["__eid"] = pd.NA
        out["__cmp"] = pd.NA
        out["__side"] = "l"
        out["__b"] = (
            (pd.util.hash_pandas_object(out[bucket_col], index=False).to_numpy()
             % np.uint64(n_buckets)).astype(np.int64)
            if len(out) else np.array([], dtype=np.int64)
        )
        return out[left_cols + ["__eid", "__cmp", "__side", "__b"]]

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            out = pd.DataFrame({"__eid": [], "__cmp": []})
            out["__side"] = pd.Series([], dtype=object)
            out["__b"] = np.array([], dtype=np.int64)
        else:
            # replicate every label row to every bucket (vocab-bounded)
            out = pd.DataFrame(
                {
                    "__eid": np.tile(df["entity_id"].to_numpy(), n_buckets),
                    "__cmp": np.tile(df["component_id"].to_numpy(), n_buckets),
                    "__b": np.repeat(np.arange(n_buckets, dtype=np.int64), n),
                }
            )
            out["__side"] = "r"
        for c in left_cols:
            out[c] = pd.NA
        return out[left_cols + ["__eid", "__cmp", "__side", "__b"]]

    def apply_map(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        lg = g[g["__side"] == "l"][left_cols]
        rg = g[g["__side"] == "r"][["__eid", "__cmp"]]
        mapping = dict(zip(rg["__eid"], rg["__cmp"]))
        if pre is not None:
            lg = pre(lg)
        lg = lg.copy()
        for c in cols:
            lg[c] = lg[c].map(lambda v: mapping.get(v, v))
        return lg

    both = ds.map_batches(tag_left, batch_format="pandas").union(
        ent_labels.map_batches(tag_right, batch_format="pandas")
    )
    return both.groupby("__b").map_groups(apply_map, batch_format="pandas")


def cc_incremental(
    base_labels: "ray.data.Dataset",
    new_edges: "ray.data.Dataset",
    n_buckets: int = 32,
) -> "ray.data.Dataset":
    """Incremental connected components: fold a batch of NEW edges
    (u, v) into an existing (node, component_id) labelling WITHOUT
    re-reading the base graph — the nightly-crawl shape where the KG
    grows by a delta and full CC recompute would re-shuffle every
    historical edge. Because component ids are the MIN member node
    (here and in ``connected_components``), the incremental result is
    bit-identical to a full recompute over base ∪ delta — the driver
    oracle replays exactly that.

    Exchanges: two label-lookup joins (delta-sized; unseen endpoints
    label themselves), CC over the CONTRACTED label graph (bounded by
    labels the delta touches, not by the base), and one delta-map join
    to relabel — untouched components pass through the left join
    unchanged."""
    import ray.data

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.join import hash_join

    # endpoint → current label; unseen endpoints label themselves
    eu = hash_join(
        new_edges, base_labels, on="u", right_on="node", how="left",
        left_cols=["u", "v"], right_cols=["node", "component_id"],
        n_buckets=n_buckets,
    )
    ev = hash_join(
        eu, base_labels, on="v", right_on="node", how="left",
        right_cols=["node", "component_id"],
        n_buckets=n_buckets, suffix="_v",
    )

    def contract(df: pd.DataFrame) -> pd.DataFrame:
        lu = df["component_id"].fillna(df["u"])
        lv = df["component_id_v"].fillna(df["v"])
        out = pd.DataFrame({"u": lu, "v": lv})
        return out[out["u"] != out["v"]].drop_duplicates()

    contracted = ev.map_batches(contract, batch_format="pandas")
    delta = connected_components_ds(contracted, n_buckets)

    def as_map(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"node": "old_label", "component_id": "root"})

    delta_map = delta.map_batches(as_map, batch_format="pandas").materialize()

    relabeled = hash_join(
        base_labels, delta_map, on="component_id", right_on="old_label",
        how="left", left_cols=["node", "component_id"],
        right_cols=["old_label", "root"], n_buckets=n_buckets,
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["node"],
                "component_id": df["root"].fillna(df["component_id"]),
            }
        )

    # endpoints the base has never seen need their own output rows
    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat([df["u"], df["v"]], ignore_index=True)}
        ).drop_duplicates()

    new_nodes = dedup_exact(
        new_edges.map_batches(endpoints, batch_format="pandas"),
        ["node"], n_buckets=n_buckets,
    )
    unseen = hash_join(
        new_nodes, base_labels, on="node", how="anti",
        left_cols=["node"], right_cols=["node"], n_buckets=n_buckets,
    )
    unseen_lab = hash_join(
        unseen, delta_map, on="node", right_on="old_label", how="left",
        left_cols=["node"], right_cols=["old_label", "root"],
        n_buckets=n_buckets,
    )

    def fold_unseen(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": df["node"],
             "component_id": df["root"].fillna(df["node"])}
        )

    return relabeled.map_batches(fold, batch_format="pandas").union(
        unseen_lab.map_batches(fold_unseen, batch_format="pandas")
    )
