"""Distributed PageRank over an edge table — the engine's iterative
graph-algorithm family (the brief's "iterative algorithms" custom-op
category; the KG pipeline produces exactly this node/edge shape).

Semantics are FIXED-POINT (integer) PageRank so every step is
order-independent and reproducible bit-for-bit in SQL:

    rank₀(v)   = scale // N
    contrib(e) = rank(src) // outdeg(src)           (integer division)
    dang       = Σ rank(v) over outdeg(v) = 0
    rankᵢ₊₁(v) = ((dden−dnum)·(scale//N)
                  + dnum·(Σ contrib + dang//N)) // dden

with d = dnum/dden (default 85/100). Float PageRank's cross-partition
sums have unspecified addition order; integer sums don't — that is
what makes a driver-level SQL oracle possible (unrolled one CTE pair
per iteration).

Scale shape per iteration (edges never leave their partitioning):
- ONE task-based ``hash_join`` of edges against the node-sized rank
  table on src (all rows of a src co-locate — the hash-join contract);
- contrib partials combine per batch by dst, then ONE bucketed
  exchange merges them with the zero-tagged node table (tag-union —
  carrying outdeg forward costs no extra join) and applies the rank
  update in place.
- the dangling mass and N are driver SCALARS (one tiny aggregate per
  iteration over the node-sized table), never a broadcast of rows.

The rank table is materialized once per iteration — it is node-sized
(two ints per node), orders of magnitude below the edge stream.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from fastie_ray.ops.join import hash_join

if TYPE_CHECKING:
    import ray.data


def _bucket(keys: pd.Series, n_buckets: int) -> np.ndarray:
    if len(keys) == 0:
        return np.array([], dtype=np.int64)
    h = pd.util.hash_pandas_object(keys, index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int64)


def node_table(
    edges: "ray.data.Dataset", n_buckets: int = 32, weight_col: str | None = None
) -> "ray.data.Dataset":
    """(node, outdeg) over distinct src ∪ dst — per-batch combiner
    (distinct nodes + src counts per batch) then one bucketed final.
    With ``weight_col``, ``outdeg`` is the total OUT-WEIGHT instead of
    the edge count (weighted-PageRank denominator)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if weight_col is None:
            deg = df.groupby("src", as_index=False).agg(outdeg=("dst", "count"))
        else:
            deg = df.groupby("src", as_index=False).agg(
                outdeg=(weight_col, "sum")
            )
        deg = deg.rename(columns={"src": "node"})
        sinks = pd.DataFrame(
            {"node": df["dst"].drop_duplicates(), "outdeg": np.int64(0)}
        )
        return pd.concat([deg, sinks], ignore_index=True)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket(df["node"], n_buckets)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("node", as_index=False)["outdeg"].sum()
        out["outdeg"] = out["outdeg"].astype("int64")
        return out

    return (
        edges.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def _pagerank_ckpt_latest(checkpoint_dir: str, n_iter: int) -> int:
    """Highest iteration with a _COMPLETE marker, 0 if none."""
    import os

    done = 0
    for t in range(1, n_iter + 1):
        if os.path.exists(os.path.join(checkpoint_dir, f"iter_{t:04d}", "_COMPLETE")):
            done = t
    return done


def pagerank(
    edges: "ray.data.Dataset",
    n_iter: int = 3,
    d_num: int = 85,
    d_den: int = 100,
    scale: int = 10**12,
    n_buckets: int = 32,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    weight_col: str | None = None,
    seeds: list | None = None,
) -> "ray.data.Dataset":
    """(node, rank_scaled) after ``n_iter`` fixed-point iterations.
    ``edges`` must be DISTINCT (src, dst) rows — multi-edges would
    count double (dedup upstream with ``dedup_exact`` if needed).

    ``seeds`` switches to PERSONALIZED PageRank: the teleport
    distribution (and the dangling redistribution) concentrates on the
    seed set instead of all nodes — ranks measure relatedness TO the
    seeds (KG entity-relatedness queries). Seed sets are small by
    definition and ship in the closure.

    ``weight_col`` switches to WEIGHTED PageRank: each edge carries an
    integer weight (e.g. KG edge support) and a node's rank flows to
    its successors proportionally (``rank · w // out_weight``). Weights
    must keep ``rank · w`` inside int64 (rank ≤ scale = 10^12, so
    weights up to ~10^6 are safe).

    With ``checkpoint_dir`` the node-sized rank table is written to
    parquet after every iteration (``iter_NNNN/`` + a ``_COMPLETE``
    marker committed only after the write, so a mid-write crash leaves
    an ignorable partial). ``resume=True`` restarts from the highest
    complete iteration — integer fixed-point arithmetic makes a
    resumed run bit-identical to a straight one (pinned by test). This
    is the long-iterative-job shape of the north rule's
    checkpoint/resume requirement: state durably on disk per round,
    never only in the object store."""
    import os

    import ray.data

    start_iter = 0
    if checkpoint_dir and resume:
        start_iter = _pagerank_ckpt_latest(checkpoint_dir, n_iter)
    # pin the edge table once: it is consumed by node_table AND by the
    # per-iteration hash_join — unmaterialized, every iteration re-runs
    # the whole upstream edge-building lineage (its joins and dedup
    # exchanges included; measured 39 s → 9 s at sf0.01 on a
    # lineitem⋈orders-derived graph). Graph-sized, never corpus-sized.
    edges = edges.repartition(n_buckets).materialize()

    if start_iter > 0:
        path = os.path.join(checkpoint_dir, f"iter_{start_iter:04d}")
        ranks = ray.data.read_parquet(
            path, columns=["node", "outdeg", "rank"], override_num_blocks=n_buckets
        ).materialize()
        n = ranks.count()
        base = scale // n
    else:
        ranks = node_table(edges, n_buckets, weight_col=weight_col).materialize()
        n = ranks.count()
        base = scale // n

        if seeds is None:
            def init(df: pd.DataFrame) -> pd.DataFrame:
                return df.assign(rank=np.int64(base))
        else:
            seed_set = set(seeds)
            seed_base = scale // len(seed_set)

            def init(df: pd.DataFrame) -> pd.DataFrame:
                r = np.where(df["node"].isin(seed_set), seed_base, 0)
                return df.assign(rank=r.astype(np.int64))

        ranks = ranks.map_batches(init, batch_format="pandas").materialize()

    for _it in range(start_iter, n_iter):
        dang = int(
            ranks.map_batches(
                lambda df: pd.DataFrame(
                    {"s": [np.int64(df.loc[df["outdeg"] == 0, "rank"].sum())]}
                ),
                batch_format="pandas",
            )
            .to_pandas()["s"]
            .sum()
        )
        joined = hash_join(
            edges, ranks, on="src", right_on="node",
            left_cols=["src", "dst"] + ([weight_col] if weight_col else []),
            right_cols=["node", "rank", "outdeg"],
            n_buckets=n_buckets,
        )

        def contrib_partial(df: pd.DataFrame) -> pd.DataFrame:
            if weight_col is None:
                flow = df["rank"].astype("int64") // df["outdeg"].astype("int64")
            else:
                flow = (
                    df["rank"].astype("int64") * df[weight_col].astype("int64")
                ) // df["outdeg"].astype("int64")
            c = pd.DataFrame(
                {
                    "node": df["dst"],
                    "contrib": flow,
                }
            )
            out = c.groupby("node", as_index=False)["contrib"].sum()
            out["outdeg"] = np.int64(0)
            return out[["node", "contrib", "outdeg"]]

        def node_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "contrib": np.int64(0),
                    "outdeg": df["outdeg"].astype("int64"),
                }
            )

        def add_b(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__b"] = _bucket(df["node"], n_buckets)
            return df

        def update(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns="__b").groupby("node", as_index=False).agg(
                contrib=("contrib", "sum"), outdeg=("outdeg", "max")
            )
            if seeds is None:
                g["rank"] = (
                    (d_den - d_num) * base
                    + d_num * (g["contrib"].astype("int64") + dang // n)
                ) // d_den
            else:
                seed_set = set(seeds)
                is_seed = g["node"].isin(seed_set).to_numpy()
                tele = np.where(is_seed, scale // len(seed_set), 0)
                dshare = np.where(is_seed, dang // len(seed_set), 0)
                g["rank"] = (
                    (d_den - d_num) * tele
                    + d_num * (g["contrib"].astype("int64") + dshare)
                ) // d_den
            g["rank"] = g["rank"].astype("int64")
            g["outdeg"] = g["outdeg"].astype("int64")
            return g[["node", "outdeg", "rank"]]

        both = joined.map_batches(contrib_partial, batch_format="pandas").union(
            ranks.map_batches(node_rows, batch_format="pandas")
        )
        ranks = (
            both.map_batches(add_b, batch_format="pandas")
            .groupby("__b")
            .map_groups(update, batch_format="pandas")
            # block discipline (NOTES fact 15): the union + sort emits
            # blocks(joined) + blocks(ranks) blocks, compounding per
            # iteration (measured 42.8 s for 3 iterations at sf0.01);
            # re-coalesce the node-sized rank table every round
            .repartition(n_buckets)
            .materialize()
        )
        if checkpoint_dir:
            path = os.path.join(checkpoint_dir, f"iter_{_it + 1:04d}")
            ranks.write_parquet(path)
            # marker committed AFTER the data — partial writes are
            # invisible to resume
            with open(os.path.join(path, "_COMPLETE"), "w") as fh:
                fh.write("ok\n")

    return ranks.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"], "rank_scaled": df["rank"].astype("int64")}
        ),
        batch_format="pandas",
    )


def triangle_count(
    edges: "ray.data.Dataset", n_buckets: int = 32
) -> pd.DataFrame:
    """EXACT triangle count of an undirected simple graph given as
    DISTINCT (a, b) rows with ``a < b`` (dedup/orient upstream).

    The MapReduce algorithm of Suri & Vassilvitskii ("Counting
    triangles and the curse of the last reducer", WWW'11): orient every
    edge from its LOWER-(degree, id) endpoint to the higher one, so
    each node's out-neighborhood is O(sqrt(m)) and total wedge volume
    is O(m^1.5) even under power-law skew — id-only orientation would
    put a hub's whole neighborhood in one task. Wedges (pairs of
    out-neighbors of one center) are then matched against the oriented
    edge set: each match is exactly one triangle.

    Exchanges: degree aggregate (1), two degree relabels onto edges
    via ``hash_join`` (2), wedge generation grouped by center (1),
    wedge⋈edge match join (1) — all task-based, payload is edge/wedge
    rows only. Returns a one-row DataFrame (n_triangles)."""
    from fastie_ray.ops.join import hash_join

    # pin once: consumed by the degree pass, the orientation relabels
    # and the wedge-match join — unmaterialized, each consumer re-runs
    # the upstream edge-building lineage (NOTES fact: same disease as
    # pagerank's 39 s). Edge-sized.
    edges = edges.repartition(n_buckets).materialize()

    # degrees: per-batch combiner over both endpoints -> one exchange
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([df["a"], df["b"]], ignore_index=True)
        return both.value_counts().rename_axis("node").reset_index(name="deg")

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket(df["node"], n_buckets)
        return df

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("node", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    degrees = (
        edges.map_batches(deg_partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(deg_final, batch_format="pandas")
    )

    # orient by (deg, id): lo = endpoint with smaller (deg, id)
    with_da = hash_join(
        edges, degrees, on="a", right_on="node",
        left_cols=["a", "b"], right_cols=["node", "deg"], n_buckets=n_buckets,
    )
    with_db = hash_join(
        with_da, degrees, on="b", right_on="node",
        left_cols=["a", "b", "deg"], right_cols=["node", "deg"],
        n_buckets=n_buckets, suffix="_b",
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        # input contract a < b, so the (deg, id) tie-break reduces to
        # deg_a <= deg_b → a is the low endpoint (vectorized)
        a_lo = df["deg"] <= df["deg_b"]
        lo = df["a"].where(a_lo, df["b"])
        hi = df["b"].where(a_lo, df["a"])
        return pd.DataFrame({"lo": lo, "hi": hi})

    oriented = with_db.map_batches(orient, batch_format="pandas").materialize()

    # wedges: out-neighbor pairs per center, grouped by center
    def add_blo(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket(df["lo"], n_buckets)
        return df

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        m = g.merge(g, on="lo", suffixes=("_1", "_2"))
        m = m[m["hi_1"] < m["hi_2"]]
        return pd.DataFrame({"u": m["hi_1"], "v": m["hi_2"]})

    wedge_ds = (
        oriented.map_batches(add_blo, batch_format="pandas")
        .groupby("__b")
        .map_groups(wedges, batch_format="pandas")
    )

    # a wedge (u, v) closes iff {u, v} is an edge; the oriented table
    # holds each undirected edge once under unknown orientation, so
    # match on the unordered key
    def ukey(df: pd.DataFrame, x: str, y: str) -> pd.Series:
        lo = df[x].where(df[x] < df[y], df[y])
        hi = df[y].where(df[x] < df[y], df[x])
        return lo.astype(str) + "|" + hi.astype(str)

    def wkey(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": ukey(df, "u", "v")})

    def ekey(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": ukey(df, "lo", "hi")})

    closed = hash_join(
        wedge_ds.map_batches(wkey, batch_format="pandas"),
        oriented.map_batches(ekey, batch_format="pandas"),
        on="k", how="semi", left_cols=["k"], n_buckets=n_buckets,
    )
    n = closed.count()
    return pd.DataFrame({"n_triangles": pd.array([n], dtype="int64")})


def khop_reachability(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    k: int,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    n_buckets: int = 32,
    broadcast_limit: int = 4_000_000,
) -> "ray.data.Dataset":
    """BFS levels: ``(node, hop)`` for every node within ``k`` hops of
    the seed set — the engine's seeded-neighborhood primitive (KG
    entity expansion: "everything within 3 hops of these entities").

    Per hop, a Pregel superstep without a vertex-program framework.
    Neighbor generation picks its join strategy by frontier size (the
    count is already on the driver for the early-exit check):

    - frontier ≤ ``broadcast_limit`` rows (the common seeded-BFS case,
      bounded by ONE level of the neighborhood): ``ray.put`` the node
      id array once and filter the adjacency table IN PLACE with a
      vectorized ``isin`` — the edge table never leaves its
      partitioning and the hop costs NO edge-sized exchange;
    - larger frontiers fall back to a task-based ``hash_join`` SEMI
      join on ``src`` (only node ids ship, never edge payload) — the
      component-sized-frontier shape, at the price of re-bucketing
      the edge table for that hop.

    Either way the hop then runs ONE bucketed tag-union exchange on
    ``node`` that merges candidate neighbors with the visited
    accumulator: per bucket ``new = distinct(candidates) − visited``
    is stamped ``hop=i`` and the bucket emits ``visited ∪ new`` — the
    accumulator update and the next frontier come out of the same
    exchange (the frontier is a block-local ``hop == i`` filter).

    The visited table is node-sized and materialized once per hop; the
    adjacency table is materialized once. The visited set is never a
    driver structure (component-sized at web scale); only the per-hop
    frontier — one BFS level — may be, and only under the explicit
    ``broadcast_limit``. First-visit level == min-hop, so the result
    matches the SQL ``WITH RECURSIVE … GROUP BY node → MIN(hop)``
    oracle exactly.

    ``seeds`` is a dataset with a ``node`` column; seeds missing from
    the edge table still appear with ``hop = 0``.
    """
    import ray
    if not directed:
        rev = edges.map_batches(
            lambda df, s=src, d=dst: pd.DataFrame({s: df[d], d: df[s]}),
            batch_format="pandas",
        )
        adj = edges.select_columns([src, dst]).union(rev)
    else:
        adj = edges.select_columns([src, dst])
    adj = adj.materialize()

    def seed_init(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["node"]].drop_duplicates().copy()
        out["hop"] = np.int64(0)
        return out

    visited = seeds.map_batches(seed_init, batch_format="pandas").materialize()

    for i in range(1, k + 1):
        prev = i - 1
        frontier = visited.map_batches(
            lambda df, h=prev: df[df["hop"] == h][["node"]],
            batch_format="pandas",
        )
        fcount = frontier.count()
        if fcount == 0:
            break
        if fcount <= broadcast_limit:
            fref = ray.put(frontier.to_pandas()["node"].to_numpy())

            def nbr_filter(df: pd.DataFrame, s=src, d=dst, r=fref) -> pd.DataFrame:
                keep = df[d][df[s].isin(ray.get(r))]
                return pd.DataFrame({"node": keep.drop_duplicates()})

            nbrs = adj.map_batches(nbr_filter, batch_format="pandas")
        else:
            nbrs = hash_join(
                adj, frontier, on=src, right_on="node", how="semi",
                left_cols=[src, dst], n_buckets=n_buckets,
            ).map_batches(
                lambda df, d=dst: pd.DataFrame({"node": df[d].drop_duplicates()}),
                batch_format="pandas",
            )

        def tag(new: bool, hop_val: int):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame({"node": df["node"]})
                out["hop"] = (
                    np.full(len(df), hop_val, dtype=np.int64)
                    if new
                    else df["hop"].to_numpy(dtype=np.int64)
                )
                out["_new"] = new
                out["__b"] = _bucket(out["node"], n_buckets)
                return out

            return fn

        def merge(g: pd.DataFrame) -> "pa.Table":
            vis = g[~g["_new"]]
            cand = g[g["_new"]].drop_duplicates(subset=["node"])
            new = cand[~cand["node"].isin(vis["node"])]
            out = pd.concat([vis, new], ignore_index=True)[["node", "hop"]]
            # typed Arrow out: zero-row pandas blocks lose their schema
            # (NOTES fact 3) and the next hop's semi-join consumes this
            return pa.Table.from_pandas(
                out, schema=pa.schema([("node", pa.string()), ("hop", pa.int64())]),
                preserve_index=False,
            )

        visited = (
            nbrs.map_batches(tag(True, i), batch_format="pandas")
            .union(visited.map_batches(tag(False, i), batch_format="pandas"))
            .groupby("__b")
            .map_groups(merge, batch_format="pandas")
            .materialize()
        )
    return visited


def kcore_peel(
    edges: "ray.data.Dataset",
    k: int = 2,
    rounds: int = 4,
    n_buckets: int = 16,
    symmetrize: bool = True,
    broadcast_threshold: int = 1_000_000,
) -> "ray.data.Dataset":
    """``rounds`` synchronized rounds of k-core peeling over an
    undirected edge table → (node, deg) of the survivors.

    Removal hybrid (the khop frontier pattern): the per-round removal
    set is usually tiny after round 1, so when it is ≤
    ``broadcast_threshold`` nodes the round is ONE degree exchange +
    a streaming broadcast filter; larger removal sets fall back to
    task-based semi-joins against the keep set. An empty removal set
    short-circuits (identity rounds — bit-identical to running them).

    Per round (fallback path): degree table (ONE bucketed node-sized exchange via
    ``node_table`` — on a symmetrized edge set outdeg IS degree), keep
    set = nodes with ``deg >= k``, then the edge set shrinks by two
    task-based SEMI-joins (src then dst against the keep set — semi
    ships only distinct keys, never a broadcast of a possibly
    graph-sized survivor set). The edge set is materialized per round
    so lineage doesn't re-execute; it is graph-sized (the KG node/edge
    tables are vocabulary-bounded, orders of magnitude below the page
    corpus), never corpus-sized.

    Bounded-round semantics (like ``pagerank``'s fixed n_iter) keep the
    op reproducible in an unrolled SQL oracle: the result after R
    rounds is deterministic whether or not the peel has converged; run
    with ``rounds >= max cascade depth`` for the true k-core (the
    fixpoint case is pinned by test). Degenerate inputs (everything
    peels) yield an empty dataset."""
    if symmetrize:

        def both(df: pd.DataFrame) -> pd.DataFrame:
            fwd = df[["src", "dst"]]
            rev = df.rename(columns={"src": "dst", "dst": "src"})[["src", "dst"]]
            return pd.concat([fwd, rev], ignore_index=True)

        from fastie_ray.ops.dedup import dedup_exact

        edges = dedup_exact(
            edges.map_batches(both, batch_format="pandas"),
            ["src", "dst"],
            n_buckets=n_buckets,
        )
    import ray

    # block discipline: every exchange emits ≈ as many blocks as it
    # consumes, and per round the edge set passes up to three exchanges
    # — left unchecked the block count triples per round (measured
    # 48→1296 at sf0.01, turning round 3's sorts into minutes of
    # tiny-task dispatch). Re-coalescing to ``n_buckets`` blocks at each
    # round's materialize keeps every sort O(n_buckets) tasks.
    e = edges.repartition(n_buckets).materialize()
    for _ in range(rounds):
        deg = node_table(e, n_buckets=n_buckets).materialize()
        removed = deg.map_batches(
            lambda df: df.loc[df["outdeg"] < k, ["node"]],
            batch_format="pandas",
        ).materialize()
        n_removed = removed.count()
        if n_removed == 0:
            break  # fixpoint: further rounds are identity
        if n_removed <= broadcast_threshold:
            # khop-style hybrid: the per-round removal set is usually
            # tiny after round 1 — broadcast it once and the whole
            # round is ONE degree exchange + a streaming filter (no
            # edge re-shuffle at all)
            rm_ref = ray.put(set(removed.to_pandas()["node"]))

            def drop(df: pd.DataFrame, rm_ref=rm_ref) -> pd.DataFrame:
                rm = ray.get(rm_ref)
                m = ~(df["src"].isin(rm) | df["dst"].isin(rm))
                return df[m]

            e = e.map_batches(drop, batch_format="pandas").materialize()
        else:
            # scale fallback: removal set unbounded → task-based
            # semi-joins against the keep set (ships only distinct keys)
            keep = (
                deg.map_batches(
                    lambda df: df.loc[df["outdeg"] >= k, ["node"]],
                    batch_format="pandas",
                )
                .repartition(n_buckets)
                .materialize()
            )
            e = hash_join(
                e, keep, on="src", right_on="node", how="semi",
                left_cols=["src", "dst"], n_buckets=n_buckets,
            )
            e = hash_join(
                e, keep, on="dst", right_on="node", how="semi",
                left_cols=["src", "dst"], n_buckets=n_buckets,
            ).repartition(n_buckets).materialize()
    deg = node_table(e, n_buckets=n_buckets)
    return deg.map_batches(
        lambda df: df.rename(columns={"outdeg": "deg"}), batch_format="pandas"
    )


def _support_pass(oriented, thresh: int | None, n_buckets: int):
    """One k-truss support round over ORIENTED edges (lo, hi) held in a
    :class:`fastie_ray.state.exchange.BlockSet` — THREE raw-task
    exchanges total:

    1. key=lo: in-group self-merge enumerates wedges (c; u, v) with
       u < v (string canonical — the wedge key IS the closing edge's
       canonical key), and the same group re-emits its edge rows keyed
       canonically;
    2. key=(x, y): wedges meet the edge set — matched wedges credit
       the closing edge IN PLACE (its edge row is in this group) and
       emit (c,u)/(c,v) support partials; edges pass through;
    3. key=(x, y): partial sums land on their edge row. With
       ``thresh`` set, emit surviving ORIENTED edges (the peel step,
       fused into the exchange); with ``thresh=None`` emit the final
       (a, b, support) table.

    vs the previous Dataset form (degree agg + 2 joins + wedge groupby
    + semi join + count exchange + left join = 7 sort barriers per
    round): same row movement, 3 task-level exchanges, no sorts."""

    def wedge_and_edges(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="lo", suffixes=("_1", "_2"))
        m = m[m["hi_1"] < m["hi_2"]]
        w = pd.DataFrame(
            {"x": m["hi_1"], "y": m["hi_2"], "c": m["lo"],
             "n": np.full(len(m), -2, dtype=np.int64)}
        )
        elo = g["lo"].where(g["lo"] < g["hi"], g["hi"])
        ehi = g["hi"].where(g["lo"] < g["hi"], g["lo"])
        ed = pd.DataFrame(
            {"x": elo, "y": ehi, "c": g["lo"],
             "n": np.full(len(g), -1, dtype=np.int64)}
        )
        return pd.concat([w, ed], ignore_index=True)

    def verify_credit(g: pd.DataFrame) -> pd.DataFrame:
        ed = g[g["n"] == -1]
        wd = g[g["n"] == -2]
        # matched wedges: closing pair (x, y) present as an edge
        hit = wd.merge(ed[["x", "y"]].drop_duplicates(), on=["x", "y"])
        # in-place closing-edge credits: per (x, y) wedge count
        close = hit.groupby(["x", "y"], as_index=False).size()
        close = pd.DataFrame(
            {"x": close["x"], "y": close["y"], "c": close["x"],
             "n": close["size"].astype("int64")}
        )
        # (c, u) and (c, v) credits, canonical keys, pre-aggregated
        def ck(p: pd.Series, q: pd.Series) -> pd.DataFrame:
            return pd.DataFrame(
                {"x": p.where(p < q, q), "y": q.where(p < q, p)}
            )
        cred = pd.concat(
            [ck(hit["c"], hit["x"]), ck(hit["c"], hit["y"])],
            ignore_index=True,
        )
        cred = cred.groupby(["x", "y"], as_index=False).size()
        cred = pd.DataFrame(
            {"x": cred["x"], "y": cred["y"], "c": cred["x"],
             "n": cred["size"].astype("int64")}
        )
        return pd.concat([ed, close, cred], ignore_index=True)

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        ed = g[g["n"] == -1]
        sup = (
            g[g["n"] > 0]
            .groupby(["x", "y"], as_index=False)["n"].sum()
            .rename(columns={"n": "support"})
        )
        m = ed.merge(sup, on=["x", "y"], how="left")
        m["support"] = m["support"].fillna(0).astype("int64")
        if thresh is None:
            return pd.DataFrame(
                {"a": m["x"], "b": m["y"], "support": m["support"]}
            )
        m = m[m["support"] >= thresh]
        # rebuild orientation: c recorded lo
        return pd.DataFrame(
            {"lo": m["c"], "hi": m["y"].where(m["c"] == m["x"], m["x"])}
        )

    tagged = oriented.exchange(["lo"], wedge_and_edges, n_buckets)
    credited = tagged.exchange(["x", "y"], verify_credit, n_buckets)
    return credited.exchange(["x", "y"], finish, n_buckets)


def ktruss_peel(
    edges: "ray.data.Dataset",
    k: int = 3,
    rounds: int = 3,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """``rounds`` synchronized rounds of k-TRUSS peeling (drop every
    edge in fewer than k−2 triangles, recount, repeat) over an
    undirected simple graph given as DISTINCT canonical (a, b) rows
    with a < b → surviving edges with their FINAL support
    (a, b, support) — the edge-cohesion analogue of ``kcore_peel``
    (community cores, spam-link pruning on the KG edge layer).

    Runs on the raw-task :class:`~fastie_ray.state.exchange.BlockSet`
    exchange (the iterative-loop latency primitive — sort barriers,
    not payload, dominated the Dataset form at small scale): edges are
    ORIENTED ONCE by round-0 (degree, id) order — any consistent total
    order enumerates each triangle exactly once, and round-0 degrees
    upper-bound every later round's, so the Suri-Vassilvitskii
    Σ outdeg² wedge bound keeps holding as edges peel — then each
    round is ONE 3-exchange ``_support_pass`` with the peel filter
    fused into its last exchange. Short-circuits when a round removes
    nothing (fixpoint: further rounds are identity, bit-identical to
    running them). Bounded-round semantics like ``kcore_peel`` keep
    the result reproducible in an unrolled SQL oracle; run with
    rounds ≥ cascade depth for the true k-truss. Support recounts are
    edge-set-sized, never corpus-sized.

    Input contract: DISTINCT undirected edges, no self loops (each
    unordered pair appears once, either orientation). Endpoints are
    re-canonicalized to STRING order a < b here — every internal edge
    key is a string comparison, so the caller's ordering convention
    (e.g. numeric) must not leak through."""
    from fastie_ray.state.exchange import BlockSet

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].astype(str)
        b = df["b"].astype(str)
        return pd.DataFrame(
            {"a": a.where(a < b, b), "b": b.where(a < b, a)}
        )

    e = BlockSet.from_dataset(edges).exchange(
        ["a", "b"], lambda g: g.drop_duplicates(), n_buckets, map_fn=canon
    )

    # orient once: X1 (key=node) computes full degrees in-group and
    # attaches them to each incident edge half; X2 (key=edge) merges
    # the two halves into (lo, hi) by (deg, id) order — 2 exchanges
    # for what was a degree aggregate + two hash joins.
    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([df["a"], df["b"]], ignore_index=True),
                "other": pd.concat([df["b"], df["a"]], ignore_index=True),
            }
        )

    def attach_deg(g: pd.DataFrame) -> pd.DataFrame:
        deg = (
            g.groupby("node")["other"].transform("size")
            if len(g)
            else pd.Series([], dtype="int64")
        )
        return pd.DataFrame(
            {"node": g["node"], "other": g["other"],
             "deg": deg.astype("int64")}
        )

    half = e.exchange(["node"], attach_deg, n_buckets, map_fn=endpoints)

    def canon_half(df: pd.DataFrame) -> pd.DataFrame:
        a = df["node"].where(df["node"] < df["other"], df["other"])
        b = df["other"].where(df["node"] < df["other"], df["node"])
        return pd.DataFrame(
            {"a": a, "b": b, "node": df["node"], "deg": df["deg"]}
        )

    def orient(g: pd.DataFrame) -> pd.DataFrame:
        da = g.loc[g["node"] == g["a"], ["a", "b", "deg"]]
        db = g.loc[g["node"] == g["b"], ["a", "b", "deg"]].rename(
            columns={"deg": "deg_b"}
        )
        m = da.merge(db, on=["a", "b"])
        a_lo = m["deg"] <= m["deg_b"]  # a < b input → ties keep a low
        return pd.DataFrame(
            {"lo": m["a"].where(a_lo, m["b"]),
             "hi": m["b"].where(a_lo, m["a"])}
        )

    oriented = half.exchange(["a", "b"], orient, n_buckets, map_fn=canon_half)

    thresh = k - 2
    n_edges = oriented.count()
    for _ in range(rounds):
        survivors = _support_pass(oriented, thresh, n_buckets)
        n_surv = survivors.count()
        if n_surv == n_edges:
            break
        oriented, n_edges = survivors, n_surv
    return _support_pass(oriented, None, n_buckets).to_dataset()


def link_prediction(
    edges: "ray.data.Dataset",
    k: int = 50,
    max_degree: int | None = None,
    n_buckets: int = 16,
    weight: str = "cn",
) -> pd.DataFrame:
    """Common-neighbor link prediction over an undirected simple graph
    (DISTINCT canonical string-ordered (a, b) rows): the top-``k``
    NON-edge pairs ranked by common-neighbor count (the classic
    missing-link / KG-completion baseline). ``weight="ra"`` switches
    the per-center contribution from 1 to the RESOURCE-ALLOCATION
    index 1/deg(center), carried integer-exact as
    ``floor(1e6 / deg)`` in column ``ra_e6`` (Adamic-Adar's 1/log deg
    is transcendental and would not hash-match a SQL oracle; RA is the
    rational member of the family and empirically the stronger
    predictor — Zhou et al. 2009).
    Deterministic total order (cn DESC, u, v) so boundary ties are
    reproducible.

    Scale shape: candidate pairs are WEDGES — pairs of neighbors of a
    shared center — so enumeration is grouped by center with per-task
    (u, v) count pre-aggregation, then ONE pair-bucketed count
    exchange, a task anti-join against the edge set (drops known
    edges; ships pair keys only), and per-bucket top-k → driver merges
    ``n_buckets × k`` rows. Wedge volume is Σ deg(c)² — inherently
    quadratic in hub degree; pass ``max_degree`` to skip hub centers
    (the standard production cap — scores lose those centers'
    contributions, documented trade), or pre-sample the adjacency.

    Edge-set-sized exchanges only; the driver never sees more than
    ``n_buckets × k`` candidate rows. Raw-task shape (r3): wedge
    enumeration is one center-keyed exchange (symmetrization fused
    into the split); the final count, the known-edge ANTI-join (the
    canonical edge set rides PINNED on the same (u, v) hash) and the
    per-bucket top-k all happen in the second exchange."""
    from fastie_ray.state.exchange import BlockSet

    ebs = BlockSet.from_dataset(edges)

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c": pd.concat([df["a"], df["b"]], ignore_index=True),
                "n": pd.concat([df["b"], df["a"]], ignore_index=True),
            }
        )

    def edge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"u": df["a"], "v": df["b"]}
        ).drop_duplicates()

    edge_parts = ebs.partition(["u", "v"], n_buckets, map_fn=edge_pairs)

    score = "cn" if weight == "cn" else "ra_e6"

    def wedge_counts(g: pd.DataFrame) -> pd.DataFrame:
        if max_degree is not None:
            deg = g.groupby("c")["n"].transform("size")
            g = g[deg <= max_degree]
        if len(g) == 0:
            return pd.DataFrame(
                {"u": pd.Series([], dtype=object),
                 "v": pd.Series([], dtype=object),
                 score: pd.Series([], dtype="int64")}
            )
        if weight == "ra":
            # full adjacency of each center co-locates in its bucket,
            # so deg is exact here; integer weight keeps the SQL oracle
            # hash-exact
            g = g.copy()
            g["w"] = (
                1_000_000 // g.groupby("c")["n"].transform("size")
            ).astype("int64")
        m = g.merge(g, on="c", suffixes=("_1", "_2"))
        m = m[m["n_1"] < m["n_2"]]
        if weight == "ra":
            out = (
                m.groupby(["n_1", "n_2"], as_index=False)["w_1"].sum()
                .rename(columns={"n_1": "u", "n_2": "v", "w_1": score})
            )
        else:
            out = (
                m.groupby(["n_1", "n_2"], as_index=False)
                .size()
                .rename(columns={"n_1": "u", "n_2": "v", "size": score})
            )
        out[score] = out[score].astype("int64")
        return out

    def cn_final(g: pd.DataFrame, eb: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "u" not in g.columns:
            return pd.DataFrame(
                {"u": pd.Series([], dtype=object),
                 "v": pd.Series([], dtype=object),
                 score: pd.Series([], dtype="int64")}
            )
        out = g.groupby(["u", "v"], as_index=False)[score].sum()
        out[score] = out[score].astype("int64")
        if len(eb):
            out = out.merge(
                eb, on=["u", "v"], how="left", indicator=True, sort=False
            )
            out = out.loc[out["_merge"] == "left_only",
                          ["u", "v", score]]
        return out.sort_values(
            [score, "u", "v"], ascending=[False, True, True]
        ).head(k)

    wedges = ebs.exchange(["c"], wedge_counts, n_buckets=n_buckets,
                          map_fn=sym)
    cand = wedges.exchange(
        ["u", "v"], cn_final, n_buckets=n_buckets, side=edge_parts,
    ).to_pandas()
    out = cand.sort_values(
        [score, "u", "v"], ascending=[False, True, True]
    ).head(k)
    if len(out) == 0:
        return pd.DataFrame(
            {"u": pd.Series([], dtype=object),
             "v": pd.Series([], dtype=object),
             score: pd.Series([], dtype="int64")}
        )
    out[score] = out[score].astype("int64")
    return out.reset_index(drop=True)


def landmark_distances(
    edges: "ray.data.Dataset",
    landmarks: list[str],
    k: int = 4,
    src: str = "src",
    dst: str = "dst",
    directed: bool = False,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Multi-landmark BFS distance table — ``(node, landmark, hop)``
    with hop = min distance ≤ ``k`` from each landmark: the landmark
    distance-sketch primitive (shortest-path estimation d(u,v) ≤
    d(u,l)+d(l,v), graph embeddings, centrality screening). All
    landmarks advance in ONE BFS over (node, landmark) labels — L
    landmarks cost one traversal, not L.

    Per hop (``khop_reachability``'s Pregel superstep lifted to keyed
    labels): frontier ⋈ edges via a task hash_join on node=src (node
    ids + landmark tags ship, never payload), then one
    (node, landmark)-bucketed tag-union exchange computes
    new = distinct(candidates) − visited, stamps hop, and emits
    visited ∪ new; the next frontier is the block-local hop == i
    filter. Early-exits when a hop adds nothing. Labels are
    L × reachable-set sized, never driver-collected; the adjacency is
    materialized once."""
    import ray.data

    from fastie_ray.ops.join import hash_join

    if not directed:
        rev = edges.map_batches(
            lambda df, s=src, d=dst: pd.DataFrame({s: df[d], d: df[s]}),
            batch_format="pandas",
        )
        adj = edges.select_columns([src, dst]).union(rev)
    else:
        adj = edges.select_columns([src, dst])
    adj = adj.repartition(n_buckets).materialize()

    seed = pd.DataFrame(
        {"node": list(landmarks), "lm": list(landmarks)}
    ).drop_duplicates()
    seed["hop"] = np.int64(0)
    visited = ray.data.from_pandas(seed).materialize()
    frontier = visited

    def add_bnl(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = (
            pd.util.hash_pandas_object(df["node"], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(df["lm"], index=False).to_numpy()
        )
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    for i in range(1, k + 1):
        cand = hash_join(
            frontier, adj, on="node", right_on=src,
            left_cols=["node", "lm"], right_cols=[src, dst],
            n_buckets=n_buckets,
        ).map_batches(
            lambda df: pd.DataFrame(
                {"node": df[dst], "lm": df["lm"]}
            ).drop_duplicates(),
            batch_format="pandas",
        )

        def merge(g: pd.DataFrame, hop=i) -> pd.DataFrame:
            g = g.drop(columns="__b")
            old = g[g["hop"] >= 0]
            new = g[g["hop"] < 0][["node", "lm"]].drop_duplicates()
            new = new.merge(
                old[["node", "lm"]], on=["node", "lm"],
                how="left", indicator=True,
            )
            new = new[new["_merge"] == "left_only"][["node", "lm"]].copy()
            new["hop"] = np.int64(hop)
            out = pd.concat(
                [old[["node", "lm", "hop"]], new], ignore_index=True
            )
            out["hop"] = out["hop"].astype("int64")
            return out

        tagged_new = cand.map_batches(
            lambda df: df.assign(hop=np.int64(-1)), batch_format="pandas"
        )
        visited = (
            visited.union(tagged_new)
            .map_batches(add_bnl, batch_format="pandas")
            .groupby("__b")
            .map_groups(merge, batch_format="pandas")
            .repartition(n_buckets)
            .materialize()
        )
        frontier = visited.map_batches(
            lambda df, hop=i: df.loc[df["hop"] == hop, ["node", "lm"]],
            batch_format="pandas",
        ).materialize()
        if frontier.count() == 0:
            break
    return visited.map_batches(
        lambda df: df.rename(columns={"lm": "landmark"}),
        batch_format="pandas",
    )


def densest_rounds(
    edges: "ray.data.Dataset",
    eps_e6: int = 100_000,
    max_rounds: int = 8,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Parallel Charikar densest-subgraph PEELING (Bahmani et al.,
    VLDB'12): each round removes EVERY node whose degree ≤
    2·(1+ε)·density — O(log n) rounds, and the densest round-prefix is
    a 2(1+ε)-approximation of the densest subgraph (dense-community /
    spam-cluster mining on the KG edge layer). ε = eps_e6/10⁶; the
    removal test is the exact integer cross-multiplication
    deg·N·10⁶ ≤ 2·(10⁶+eps_e6)·E, so rounds are bit-reproducible in
    an unrolled SQL oracle.

    Runs on the raw-task :class:`~fastie_ray.state.exchange.BlockSet`:
    per round ONE degree exchange (per-block partials fused into the
    split task), one per-block scalar probe that yields BOTH driver
    scalars (N from the row count, E from Σdeg/2 — no separate edge
    count), then two edge exchanges that semi-filter against the
    surviving-node table pinned block-for-block from the degree
    exchange's own node-bucketed output. Node state, not the edge
    stream, is what the filter side holds; edges cross the wire once
    per endpoint pass, the same movement the Dataset semi-joins paid
    plus ~6 sort barriers per round (NOTES fact 11). Returns the
    density TRAJECTORY (round, n_nodes, n_edges) for rounds with nodes
    remaining — the argmax prefix is the approximate densest subgraph
    (pytest-pinned); stops early on an empty graph."""
    from fastie_ray.state.exchange import BlockSet

    empty_e = pd.DataFrame(
        {"a": pd.Series([], dtype="int64"),
         "b": pd.Series([], dtype="int64")}
    )

    e = (
        BlockSet.from_dataset(edges)
        .map(lambda df: df[["a", "b"]])
        .compact(n_buckets)
    )

    # node ids keep their input dtype (string or integer) — only the
    # counts are typed
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([df["a"], df["b"]], ignore_index=True)
        out = both.value_counts().rename_axis("node").reset_index(name="deg")
        out["deg"] = out["deg"].astype("int64")
        return out

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    def semi(col):
        def f(g: pd.DataFrame, keep: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0 or len(keep) == 0:
                return empty_e
            return g.loc[
                g[col].isin(keep["node"].to_numpy()), ["a", "b"]
            ]
        return f

    rows = []
    for rnd in range(max_rounds):
        degrees = e.exchange(
            ["node"], deg_final, n_buckets, map_fn=deg_partial
        )
        stats = degrees.scalar(
            lambda df: (len(df), int(df["deg"].sum()) if len(df) else 0)
        )
        n_nodes = sum(s[0] for s in stats)
        if n_nodes == 0:
            break
        n_edges = sum(s[1] for s in stats) // 2
        rows.append((rnd, n_nodes, n_edges))
        thresh_rhs = 2 * (1_000_000 + eps_e6) * n_edges

        keep = degrees.map(
            lambda df, n=n_nodes, rhs=thresh_rhs: df.loc[
                df["deg"].to_numpy() * n * 1_000_000 > rhs, ["node"]
            ]
        )
        # keep.refs are node-bucketed (degree exchange key) — pinned
        # side for both endpoint filters
        e = e.exchange(["a"], semi("a"), n_buckets, side=keep.refs)
        e = e.exchange(["b"], semi("b"), n_buckets, side=keep.refs)
    out = pd.DataFrame(rows, columns=["round", "n_nodes", "n_edges"])
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


def triad_closure_census(
    edges: "ray.data.Dataset",
    max_degree: int | None = None,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Directed TRIAD closure census — the social-network-analysis
    counts the undirected triangle ops can't see: over DISTINCT
    directed edges (src, dst), count 2-paths a→b→c closed CYCLICALLY
    (edge c→a; each 3-cycle contributes 3 such paths, so
    n_cycles = cyclic_paths / 3) vs TRANSITIVELY (edge a→c — the
    hierarchy/feed-forward motif). Reciprocal edge pairs make a path
    count in both columns, as the path-closure definition says.

    Scale shape: in- and out-edges co-locate per CENTER b via one
    bucketed exchange; in-group a×c pair enumeration pre-aggregates to
    (a, c, n_paths) — volume Σ indeg(b)·outdeg(b), the directed wedge
    bound (cap hubs with ``max_degree``, the ``link_prediction``
    trade) — then BOTH closure checks ride ONE (s, d)-bucketed
    exchange: each path row is emitted twice ((c,a) tagged cyclic,
    (a,c) tagged transitive), edges once, and the in-group two-column
    merge sums per tag; blocks×1 partial sums reach the driver. Node
    ids stay int64 when both endpoints are integers (no string
    round-trip); otherwise they are compared as strings. THREE
    exchanges total for the whole census.
    Returns one row (cyclic_paths, transitive_paths, n_cycles)."""
    from fastie_ray.state.exchange import BlockSet

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        s, d = df["src"], df["dst"]
        if pd.api.types.is_integer_dtype(s) and pd.api.types.is_integer_dtype(d):
            s, d = s.astype("int64"), d.astype("int64")
        else:
            s, d = s.astype(str), d.astype(str)
        return pd.DataFrame({"src": s, "dst": d}).drop_duplicates()

    # Exchange 1 — distinct edges, keyed (src, dst). The resulting
    # buckets double as the PINNED closure side of exchange 3: the
    # closure exchange keys path rows on (s, d) with the same
    # _hash_bucket mix over the same canon'd values, so edge bucket i
    # holds exactly the edges whose (s, d) paths land in bucket i.
    e = BlockSet.from_dataset(edges).exchange(
        ["src", "dst"],
        lambda g: g.drop_duplicates(),
        n_buckets=n_buckets,
        map_fn=canon,
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        outs = pd.DataFrame(
            {"center": df["src"], "other": df["dst"], "side": "o"}
        )
        ins = pd.DataFrame(
            {"center": df["dst"], "other": df["src"], "side": "i"}
        )
        return pd.concat([ins, outs], ignore_index=True)

    def wedge_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if max_degree is not None:
            deg = g.groupby("center")["other"].transform("size")
            g = g[deg <= max_degree]
        i = g[g["side"] == "i"][["center", "other"]].rename(
            columns={"other": "a"}
        )
        o = g[g["side"] == "o"][["center", "other"]].rename(
            columns={"other": "c"}
        )
        m = i.merge(o, on="center")
        m = m[m["a"] != m["c"]]
        if len(m) == 0:
            return pd.DataFrame(
                {"a": m["a"], "c": m["c"],
                 "n_paths": pd.Series([], dtype="int64")}
            )
        out = m.groupby(["a", "c"], as_index=False).size().rename(
            columns={"size": "n_paths"}
        )
        out["n_paths"] = out["n_paths"].astype("int64")
        return out

    # Exchange 2 — wedge pairs, keyed center (tag fused into the split)
    paths = e.exchange(["center"], wedge_pairs, n_buckets=n_buckets, map_fn=tag)

    # Exchange 3 — ONE closure exchange: each path row enters twice —
    # as (s,d)=(c,a) tagged cyclic (n>0) and (s,d)=(a,c) tagged
    # transitive (n<0, sign-encoding the tag so the exchange carries
    # one int column) — while the distinct-edge buckets from exchange 1
    # ride along PINNED as the side table (same (s,d) hash, zero
    # re-shipping); the in-group merge keeps tagged rows whose (s,d)
    # hits an edge row and partial-sums by sign.
    def path_rows(df: pd.DataFrame) -> pd.DataFrame:
        cyc = pd.DataFrame(
            {"s": df["c"], "d": df["a"], "n": df["n_paths"].astype("int64")}
        )
        tr = pd.DataFrame(
            {"s": df["a"], "d": df["c"], "n": -df["n_paths"].astype("int64")}
        )
        return pd.concat([cyc, tr], ignore_index=True)

    def closed_partial(g: pd.DataFrame, edges_b: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or len(edges_b) == 0:
            return pd.DataFrame({"cyc": [np.int64(0)], "tr": [np.int64(0)]})
        ek = edges_b.rename(columns={"src": "s", "dst": "d"})
        hit = g.merge(ek, on=["s", "d"], how="inner", sort=False)["n"]
        return pd.DataFrame(
            {
                "cyc": [np.int64(hit[hit > 0].sum())],
                "tr": [np.int64(-hit[hit < 0].sum())],
            }
        )

    parts = paths.exchange(
        ["s", "d"], closed_partial, n_buckets=n_buckets,
        map_fn=path_rows, side=e.refs,
    ).to_pandas()
    cyc = int(parts["cyc"].sum()) if len(parts) else 0
    tr = int(parts["tr"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "cyclic_paths": [np.int64(cyc)],
            "transitive_paths": [np.int64(tr)],
            "n_cycles": [np.int64(cyc // 3)],
        }
    )


def temporal_reach(
    edges: "ray.data.Dataset",
    seeds: pd.DataFrame,
    rounds: int = 4,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Time-respecting reachability (contact tracing / influence
    propagation / taint tracking): EARLIEST ARRIVAL time at every node
    reachable from the seed set along paths whose edge timestamps are
    nondecreasing — the temporal-graph op a static k-hop can't express
    (an edge is usable only at its own timestamp, so reachability
    depends on WHEN you arrive).

    Input: temporal edges (src, dst, ts_us) — traversing src→dst is
    possible iff current arrival ≤ ts_us, arriving at ts_us; ``seeds``
    is a small (node, arrival_us) frame. ``rounds`` bounds hops
    (bounded-round semantics like ``kcore_peel`` — reproducible in an
    unrolled SQL oracle); converged earlier rounds short-circuit via
    the exact integer fixpoint test (label count equal AND arrival sum
    equal: min-merge is monotone, so any change strictly lowers the
    sum or adds a node — the ``scc`` monotone-sum trick).

    Raw-task shape (the sssp skeleton): the temporal edge table is
    hash-partitioned by src ONCE and PINNED; each round is one relax
    exchange of the node-sized arrival table against the pinned
    buckets (time-filtered candidates + own pass-through, min-combined
    in the bucket) plus one node-keyed min exchange and a per-block
    scalar probe. Returns (node, arrival_us)."""
    from fastie_ray.state.exchange import BlockSet

    def edge_canon(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "dst": pd.Series([], dtype="int64"),
                 "ts": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                "node": df["src"].astype("int64"),
                "dst": df["dst"].astype("int64"),
                "ts": df["ts_us"].astype("int64"),
            }
        )

    edge_parts = BlockSet.from_dataset(edges).partition(
        ["node"], n_buckets, map_fn=edge_canon
    )

    labels = BlockSet.from_pandas(
        pd.DataFrame(
            {
                "node": seeds["node"].astype("int64"),
                "a": seeds["arrival_us"].astype("int64"),
            }
        ).groupby("node", as_index=False)["a"].min(),
        n_blocks=1,
    ).exchange(
        ["node"],
        lambda g: g.groupby("node", as_index=False)["a"].min(),
        n_buckets=n_buckets,
    )

    _EMPTY_NA = pd.DataFrame(
        {"node": pd.Series([], dtype="int64"),
         "a": pd.Series([], dtype="int64")}
    )

    def relax(g: pd.DataFrame, eb: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "node" not in g.columns:
            return _EMPTY_NA.copy()
        own = g[["node", "a"]]
        if len(eb) == 0:
            return own
        m = eb.merge(own, on="node", sort=False)
        ok = m["ts"].to_numpy() >= m["a"].to_numpy()
        cand = pd.DataFrame(
            {"node": m["dst"].to_numpy()[ok], "a": m["ts"].to_numpy()[ok]}
        ).groupby("node", as_index=False)["a"].min()
        return pd.concat([own, cand], ignore_index=True)

    def min_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["a"].min()
        return out.astype({"node": "int64", "a": "int64"})

    prev = None
    for _ in range(rounds):
        cand = labels.exchange(
            ["node"], relax, n_buckets=n_buckets, side=edge_parts
        )
        labels = cand.exchange(["node"], min_final, n_buckets=n_buckets)
        parts = labels.scalar(
            lambda df: (len(df), int(df["a"].sum()))
            if len(df) and "a" in df.columns else (0, 0)
        )
        s = (sum(p[0] for p in parts), sum(p[1] for p in parts))
        if s == prev:
            break
        prev = s
    return labels.map(
        lambda df: df.rename(columns={"a": "arrival_us"})
    ).to_dataset()


def random_walks(
    edges: "ray.data.Dataset",
    walk_len: int = 4,
    walks_per_node: int = 2,
    salt: str = "walk",
    src_col: str = "src",
    dst_col: str = "dst",
) -> "ray.data.Dataset":
    """DeepWalk-style deterministic random-walk corpus over a directed
    graph: ``walks_per_node`` walks of up to ``walk_len`` nodes from
    every distinct source node, emitted as ``(start, walk, step, node)``
    rows — the skip-gram training stream for graph embeddings.

    Step choice is the md5-grid convention (``ops/splits``): at step t
    on node u of walk w from s, the neighbor index is
    ``int(md5(f"{salt}:{s}:{w}:{t}:{u}")[:8], 16) % outdeg(u)`` over
    u's dst-sorted neighbors — deterministic, seedless, and
    SQL-reproducible. Walks stop early at sink nodes.

    Partitioning assumption: the DISTINCT edge set is broadcast to the
    walkers (``ray.put`` once, read per task) — right for entity graphs
    whose node set is vocabulary-bounded (this engine's KG: alias
    vocabulary + NIL surfaces). ``random_walks_join`` is the
    open-web-scale variant (per-step hash-join extension, no broadcast,
    bit-identical output — parity-pinned by test).
    """
    import hashlib

    import ray
    import ray.data

    from fastie_ray.ops.dedup import dedup_exact

    def to_sd(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df[src_col].astype(str), "dst": df[dst_col].astype(str)}
        )

    dedup = dedup_exact(
        edges.map_batches(to_sd, batch_format="pandas"), ["src", "dst"]
    ).to_pandas()
    adj = {
        s: sorted(g["dst"].tolist())
        for s, g in dedup.groupby("src", sort=False)
    }
    adj_ref = ray.put(adj)
    seeds = ray.data.from_items(
        [{"start": s} for s in sorted(adj)],
        override_num_blocks=max(1, min(len(adj), 16)),
    )

    def walk_batch(df: pd.DataFrame) -> pd.DataFrame:
        a = ray.get(adj_ref)
        starts, walks, steps, nodes = [], [], [], []
        for s in df["start"]:
            for w in range(walks_per_node):
                node = s
                for t in range(walk_len):
                    starts.append(s)
                    walks.append(w)
                    steps.append(t)
                    nodes.append(node)
                    nbrs = a.get(node)
                    if not nbrs or t == walk_len - 1:
                        break
                    key = f"{salt}:{s}:{w}:{t + 1}:{node}"
                    idx = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
                    node = nbrs[idx % len(nbrs)]
        return pd.DataFrame(
            {
                "start": pd.Series(starts, dtype=str),
                "walk": pd.Series(walks, dtype="int64"),
                "step": pd.Series(steps, dtype="int64"),
                "node": pd.Series(nodes, dtype=str),
            }
        )

    return seeds.map_batches(walk_batch, batch_format="pandas")


def random_walks_join(
    edges: "ray.data.Dataset",
    walk_len: int = 4,
    walks_per_node: int = 2,
    salt: str = "walk",
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Open-web-scale variant of ``random_walks``: NO adjacency
    broadcast — each step extends the walk frontier with one
    ``hash_join`` against the (node, rank)-indexed neighbor table
    (walk_len−1 join exchanges total). Same md5-grid choice function,
    bit-identical output (parity-pinned by test); use when the node set
    is not vocabulary-bounded.

    The neighbor index (src, dst, rn) and degree table build with one
    src-bucketed exchange each (all of a source's neighbors co-locate);
    the per-step join key is the composite ``node + '\\x00' + rn`` so a
    single-key hash_join selects exactly the chosen neighbor."""
    import hashlib

    import ray.data

    from fastie_ray.ops.dedup import dedup_exact
    from fastie_ray.ops.join import hash_join

    def to_sd(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df[src_col].astype(str), "dst": df[dst_col].astype(str)}
        )

    adj = dedup_exact(
        edges.map_batches(to_sd, batch_format="pandas"), ["src", "dst"],
        n_buckets,
    ).materialize()  # consumed per step (NOTES fact 19)

    def add_sb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = _bucket(df["src"], n_buckets)
        return df

    # the degree table and neighbor index share ONE exchange pass
    def index_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").sort_values(["src", "dst"])
        g["rn"] = g.groupby("src", sort=False).cumcount() + 1
        g["node_rn"] = g["src"] + "\x00" + g["rn"].astype(str)
        g["deg"] = g.groupby("src", sort=False)["dst"].transform("size").astype("int64")
        return g[["src", "dst", "rn", "node_rn", "deg"]]

    nbr = (
        adj.map_batches(add_sb, batch_format="pandas")
        .groupby("__b")
        .map_groups(index_bucket, batch_format="pandas")
        .materialize()
    )
    deg = nbr.map_batches(
        lambda df: df[["src", "deg"]].drop_duplicates(), batch_format="pandas"
    )

    front = deg.map_batches(
        lambda df: pd.DataFrame(
            {
                "start": np.repeat(df["src"].to_numpy(), walks_per_node),
                "walk": np.tile(
                    np.arange(walks_per_node, dtype=np.int64), len(df)
                ),
                "node": np.repeat(df["src"].to_numpy(), walks_per_node),
            }
        ),
        batch_format="pandas",
    )

    outs = []

    def emit(step: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["start", "walk", "node"]].copy()
            out["step"] = np.int64(step)
            return out[["start", "walk", "step", "node"]]

        return f

    outs.append(front.map_batches(emit(0), batch_format="pandas"))
    for t in range(1, walk_len):
        with_deg = hash_join(
            front, deg, on="node", right_on="src",
            left_cols=["start", "walk", "node"],
            right_cols=["src", "deg"],
            n_buckets=n_buckets,
        )

        def pick(df: pd.DataFrame, _t=t) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame(
                    {
                        "start": pd.Series([], dtype=str),
                        "walk": pd.Series([], dtype="int64"),
                        "node_rn": pd.Series([], dtype=str),
                    }
                )
            keys = [
                f"{salt}:{s}:{w}:{_t}:{u}"
                for s, w, u in zip(df["start"], df["walk"], df["node"])
            ]
            h = np.array(
                [int(hashlib.md5(k.encode()).hexdigest()[:8], 16) for k in keys],
                dtype=np.int64,
            )
            rn = 1 + (h % df["deg"].to_numpy())
            return pd.DataFrame(
                {
                    "start": df["start"],
                    "walk": df["walk"].astype("int64"),
                    "node_rn": df["node"] + "\x00" + pd.Series(rn).astype(str).to_numpy(),
                }
            )

        chosen = with_deg.map_batches(pick, batch_format="pandas")
        stepped = hash_join(
            chosen, nbr, on="node_rn",
            left_cols=["start", "walk", "node_rn"],
            right_cols=["node_rn", "dst"],
            n_buckets=n_buckets,
        )
        front = stepped.map_batches(
            lambda df: pd.DataFrame(
                {
                    "start": df["start"],
                    "walk": df["walk"].astype("int64"),
                    "node": df["dst"],
                }
            ),
            batch_format="pandas",
        ).materialize()
        outs.append(front.map_batches(emit(t), batch_format="pandas"))

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def reciprocity(
    edges: "ray.data.Dataset", n_buckets: int = 16
) -> pd.DataFrame:
    """Edge reciprocity of a directed graph: how many edges have their
    reverse present (KG sanity — symmetric predicates should reciprocate,
    functional ones should not). One exchange bucketed on the CANONICAL
    unordered pair key (both directions of a pair co-locate), counted
    in-task; returns one row (n_edges, n_reciprocal)."""

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({"src": df["src"].astype(str), "dst": df["dst"].astype(str)})
        lo = df[["src", "dst"]].min(axis=1)
        hi = df[["src", "dst"]].max(axis=1)
        df["pair"] = lo + "\x00" + hi
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = _bucket(df["pair"], n_buckets)
        return df

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates(subset=["src", "dst"])
        per_pair = g.groupby("pair")["src"].transform("size")
        # self-loops are their own reverse
        recip = ((per_pair == 2) | (g["src"] == g["dst"])).sum()
        return pd.DataFrame(
            {"n_edges": [np.int64(len(g))], "n_reciprocal": [np.int64(recip)]}
        )

    parts = (
        edges.map_batches(tag, batch_format="pandas")
        .groupby("__b")
        .map_groups(count_bucket, batch_format="pandas")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_edges": [int(parts["n_edges"].sum()) if len(parts) else 0],
            "n_reciprocal": [
                int(parts["n_reciprocal"].sum()) if len(parts) else 0
            ],
        }
    ).astype("int64")


def lpa_communities(
    edges: "ray.data.Dataset",
    rounds: int = 4,
    n_buckets: int = 16,
    src_col: str = "src",
    dst_col: str = "dst",
) -> "ray.data.Dataset":
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over a directed edge table, treated as undirected: every
    node starts in its own community; each round, every node adopts
    the most frequent label among its neighbours (ties → smallest
    label).  Deterministic by construction — the argmax order
    (count DESC, label ASC) is total — so an unrolled per-round SQL
    CTE chain reproduces it exactly.

    Runs on the raw-task :class:`~fastie_ray.state.exchange.BlockSet`:
    symmetrization + dedup happen in ONE src-keyed exchange whose
    output buckets double as the PINNED edge side for every round (and
    as the label initializer — after symmetrization every node appears
    as a src, already in its own hash bucket). Each round is then TWO
    node-table exchanges: labels meet the pinned edges (join on src →
    per-(dst, label) count partials), then partials fold and take the
    deterministic argmax. Only the node-sized label table re-ships per
    round; the Dataset form paid a hash join + sort aggregate +
    repartition + materialize per round (NOTES fact 11).

    Returns a Dataset (node, community_id) — corpus-sized, never
    collected on the driver.
    """
    from fastie_ray.state.exchange import BlockSet

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        a = df[[src_col, dst_col]].rename(
            columns={src_col: "src", dst_col: "dst"}
        )
        b = df[[dst_col, src_col]].rename(
            columns={dst_col: "src", src_col: "dst"}
        )
        return pd.concat([a, b], ignore_index=True)

    ebs = BlockSet.from_dataset(edges).exchange(
        ["src"],
        lambda g: g.drop_duplicates(["src", "dst"]),
        n_buckets,
        map_fn=sym,
    )

    labels = ebs.map(
        lambda df: pd.DataFrame({"node": df["src"], "lab": df["src"]})
        .drop_duplicates("node")
        .reset_index(drop=True)
    )

    def count_nbr_labels(g: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or len(e) == 0:
            return pd.DataFrame()
        m = e.merge(g, left_on="src", right_on="node")
        out = m.groupby(["dst", "lab"], as_index=False).size()
        out = out.rename(columns={"size": "cnt", "dst": "node"})
        out["cnt"] = out["cnt"].astype("int64")
        return out[["node", "lab", "cnt"]]

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["node", "lab"], as_index=False)["cnt"].sum()
        g = g.sort_values(
            ["node", "cnt", "lab"],
            ascending=[True, False, True],
            kind="mergesort",
        ).drop_duplicates("node")
        return g[["node", "lab"]]

    for _ in range(rounds):
        labels = labels.exchange(
            ["node"], count_nbr_labels, n_buckets, side=ebs.refs
        ).exchange(["node"], argmax, n_buckets)

    return labels.map(
        lambda df: df.rename(columns={"lab": "community_id"})
    ).to_dataset()


def hits(
    edges: "ray.data.Dataset",
    n_iter: int = 3,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """HITS hubs & authorities (Kleinberg 1999) over a DISTINCT
    (src, dst) edge table, UNNORMALIZED INTEGER form so every iterate
    is an exact path count and the unrolled SQL oracle matches
    bit-for-bit:

        hub₀(u)  = 1
        authᵢ(v) = Σ_{(u,v)∈E} hubᵢ₋₁(u)      (in-link sum)
        hubᵢ(u)  = Σ_{(u,v)∈E} authᵢ(v)       (out-link sum)

    After i rounds ``auth(v)`` counts alternating back-forward paths of
    length 2i−1 ending at v — the quantity HITS' power iteration
    normalizes. Callers keep ``n_iter`` small (values grow ~(d²)ⁱ; at
    d≈5000 three rounds stay far inside int64), exactly as production
    HITS runs a handful of power steps.

    Runs on the raw-task :class:`~fastie_ray.state.exchange.BlockSet`:
    the edge table is pinned ONCE by src and once by dst; each power
    half-step is then ONE node-keyed exchange that FOLDS the incoming
    score partials and joins the pinned edge bucket to emit the next
    side's partials — 2 exchanges per iteration plus one final
    assembly exchange (the Dataset form paid 2 hash joins + 2 sort
    aggregates + materializes per iteration). Only node-sized score
    partials ever re-ship; the edge stream crosses the wire exactly
    twice, at pin time. Returns ``(node, hub, auth)`` over src ∪ dst
    nodes, missing side = 0."""
    from fastie_ray.state.exchange import BlockSet

    ebs = BlockSet.from_dataset(edges).map(
        lambda df: df[["src", "dst"]]
    ).compact(n_buckets)
    e_by_src = ebs.partition(["src"], n_buckets)
    e_by_dst = ebs.partition(["dst"], n_buckets)

    def nodes_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat(
                [df["src"], df["dst"]], ignore_index=True
            ).drop_duplicates()}
        )

    nodes = ebs.exchange(
        ["node"], lambda g: g.drop_duplicates("node"),
        n_buckets, map_fn=nodes_partial,
    )

    # row tags through the power chain: 0 = node row, 1 = current
    # score partials (fold-by-sum pending), 2 = finished auth
    def fold_join(src_col: str, dst_col: str, emit_fold: bool):
        def f(g: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0:
                return pd.DataFrame()
            s = g.groupby("node", as_index=False)["score"].sum()
            out = []
            if emit_fold:
                out.append(
                    pd.DataFrame(
                        {"node": s["node"],
                         "score": s["score"].astype("int64"),
                         "t": np.int8(2)}
                    )
                )
            if len(e):
                m = e.merge(s, left_on=src_col, right_on="node")
                p = m.groupby(dst_col, as_index=False)["score"].sum()
                out.append(
                    pd.DataFrame(
                        {"node": p[dst_col],
                         "score": p["score"].astype("int64"),
                         "t": np.int8(1)}
                    )
                )
            if not out:
                return pd.DataFrame()
            return pd.concat(out, ignore_index=True)
        return f

    cur = nodes.map(
        lambda df: df.assign(score=np.int64(1), t=np.int8(1))
    )
    for i in range(n_iter):
        last = i == n_iter - 1
        # fold hub partials → hub_i, emit auth partials (keyed dst)
        cur = cur.exchange(
            ["node"], fold_join("src", "dst", emit_fold=False),
            n_buckets, side=e_by_src,
        )
        # fold auth partials → auth_{i+1} (kept on the last step),
        # emit hub partials (keyed src)
        cur = cur.exchange(
            ["node"], fold_join("dst", "src", emit_fold=last),
            n_buckets, side=e_by_dst,
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        nd = g[g["t"] == 0]
        hub = g[g["t"] == 1].groupby("node")["score"].sum()
        auth = g[g["t"] == 2].groupby("node")["score"].sum()
        return pd.DataFrame(
            {
                "node": nd["node"],
                "hub": nd["node"].map(hub).fillna(0).astype("int64"),
                "auth": nd["node"].map(auth).fillna(0).astype("int64"),
            }
        )

    out = cur.union(
        nodes.map(lambda df: df.assign(score=np.int64(0), t=np.int8(0)))
    ).exchange(["node"], assemble, n_buckets)
    return out.to_dataset()


def scc(
    edges: "ray.data.Dataset",
    n_phases: int = 4,
    max_rounds: int = 16,
    n_buckets: int = 16,
    rows_per_block: int = 100_000,
) -> "ray.data.Dataset":
    """Strongly connected components of a DIRECTED graph via the
    coloring / FW-BW min-label algorithm (Orzan 2004; Slota et al.
    2014), the standard distributed SCC scheme. INTEGER node ids.
    Per phase over the remaining graph:

    1. **Forward colors** — fixed-point min-label propagation along
       edge direction: color(v) = min u with u →* v (u ∈ {v} ∪
       ancestors). Monotone-decreasing integer labels make the exact
       fixed-point test a driver SCALAR (total color sum unchanged).
    2. **Backward marks** — from every color root r (color(r)=r),
       propagate reachability BACKWARD along same-color edges; marked
       nodes are exactly {v: color(v)=r and v →* r} = SCC(r), with
       r = min(SCC) at extraction time (any smaller remaining ancestor
       would have colored r). Mark count is monotone — fixed point is
       again a driver scalar.
    3. Marked nodes are assigned ``scc_id = color`` and removed
       (node extraction + both-endpoint edge filters).

    Phases bound the color-DAG depth (each phase extracts every
    root-colored SCC layer); ``max_rounds`` bounds propagation within
    a phase, same bounded-round convention as ``kcore_peel`` /
    ``lpa_communities``. If the graph is not exhausted the op RAISES
    rather than returning silently-wrong singletons.

    Runs on the raw-task :class:`~fastie_ray.state.exchange.BlockSet`
    (the Dataset form paid ~6 sort barriers per propagation round —
    NOTES fact 11): the phase's edge table is hash-partitioned ONCE by
    src into pinned plasma buckets; each forward round then moves only
    the node-sized color table through TWO exchanges (join vs pinned
    edges → per-dst min partials; fold partials) with a per-block
    scalar probe as the fixed-point test. The same-color edge set
    lands bucketed by dst, so each backward round is again two
    node-table exchanges against pinned edges. Block count is fixed at
    ``n_buckets`` throughout — no per-round repartition discipline
    needed (the Dataset version's NOTES-15 hazard). ``rows_per_block``
    is retained for signature compatibility (block sizing is
    ``n_buckets``-fixed here)."""
    from fastie_ray.state.exchange import BlockSet

    empty_edges = pd.DataFrame(
        {"src": pd.Series([], dtype="int64"),
         "dst": pd.Series([], dtype="int64")}
    )
    empty_colors = pd.DataFrame(
        {"node": pd.Series([], dtype="int64"),
         "color": pd.Series([], dtype="int64")}
    )

    ebs = (
        BlockSet.from_dataset(edges)
        .map(lambda df: df[["src", "dst"]].astype("int64"))
        .compact(n_buckets)
    )

    def nodes_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": pd.concat(
                [df["src"], df["dst"]], ignore_index=True
            ).drop_duplicates().astype("int64")}
        )

    nodes = ebs.exchange(
        ["node"], lambda g: g.drop_duplicates("node"),
        n_buckets, map_fn=nodes_partial,
    )
    parts: list[BlockSet] = []

    for _phase in range(n_phases):
        n_rem = nodes.count()
        if n_rem == 0:
            break
        e_by_src = ebs.partition(["src"], n_buckets)

        # ---- 1. forward min colors to fixed point (2 exchanges/round)
        colors = nodes.map(
            lambda df: pd.DataFrame(
                {"node": df["node"], "color": df["node"]}
            ).astype("int64")
        )

        def fwd_join(g: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0:
                return empty_colors
            out = [g[["node", "color"]]]
            if len(e):
                m = e.merge(g, left_on="src", right_on="node")
                if len(m):
                    nm = m.groupby("dst", as_index=False)["color"].min()
                    out.append(
                        pd.DataFrame(
                            {"node": nm["dst"], "color": nm["color"]}
                        ).astype("int64")
                    )
            return pd.concat(out, ignore_index=True)

        def fwd_fold(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", as_index=False)["color"].min()

        prev_sum = None
        for _r in range(max_rounds):
            colors = colors.exchange(
                ["node"], fwd_join, n_buckets, side=e_by_src
            ).exchange(["node"], fwd_fold, n_buckets)
            csum = sum(
                colors.scalar(
                    lambda df: int(df["color"].sum()) if len(df) else 0
                )
            )
            if csum == prev_sum:
                break
            prev_sum = csum

        # ---- 2. same-color edge set, landing bucketed by dst
        def ce_join(g: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0:
                return pd.DataFrame(
                    {"k": pd.Series([], dtype="int64"),
                     "src": pd.Series([], dtype="int64"),
                     "dst": pd.Series([], dtype="int64"),
                     "csrc": pd.Series([], dtype="int64"),
                     "t": pd.Series([], dtype="int8")}
                )
            cp = pd.DataFrame(
                {"k": g["node"], "src": g["node"], "dst": g["node"],
                 "csrc": g["color"], "t": np.int8(0)}
            )
            if len(e) == 0:
                return cp
            m = e.merge(g, left_on="src", right_on="node")
            ed = pd.DataFrame(
                {"k": m["dst"], "src": m["src"], "dst": m["dst"],
                 "csrc": m["color"], "t": np.int8(1)}
            )
            return pd.concat([cp, ed], ignore_index=True)

        def ce_filter(g: pd.DataFrame) -> pd.DataFrame:
            cmap = g.loc[g["t"] == 0].set_index("k")["csrc"]
            ed = g[g["t"] == 1]
            if len(ed) == 0:
                return empty_edges
            cdst = ed["k"].map(cmap)
            keep = ed[(ed["csrc"] == cdst).to_numpy()]
            return pd.DataFrame(
                {"src": keep["src"], "dst": keep["dst"]}
            ).astype("int64")

        ce = colors.exchange(
            ["node"], ce_join, n_buckets, side=e_by_src
        ).exchange(["k"], ce_filter, n_buckets)
        # ce.refs are bucketed by hash(dst) — usable directly as a side

        # ---- 3. backward marks from color roots (2 exchanges/round)
        marked = colors.map(
            lambda df: df.loc[df["node"] == df["color"], ["node"]]
        ).exchange(["node"], lambda g: g.drop_duplicates("node"), n_buckets)

        def bk_join(g: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0:
                return pd.DataFrame(
                    {"node": pd.Series([], dtype="int64")}
                )
            out = [g[["node"]]]
            if len(e):
                cand = e.loc[
                    e["dst"].isin(g["node"].to_numpy()), "src"
                ].drop_duplicates()
                out.append(pd.DataFrame({"node": cand.astype("int64")}))
            return pd.concat(out, ignore_index=True)

        prev_n = marked.count()
        for _r in range(max_rounds):
            marked = marked.exchange(
                ["node"], bk_join, n_buckets, side=ce.refs
            ).exchange(["node"], lambda g: g.drop_duplicates("node"), n_buckets)
            n_marked = marked.count()
            if n_marked == prev_n:
                break
            prev_n = n_marked

        # ---- extract SCCs + shrink nodes (one exchange)
        def extract(g: pd.DataFrame) -> pd.DataFrame:
            cm = g[g["t"] == 0]
            mk = g.loc[g["t"] == 1, "node"].to_numpy()
            hit = cm["node"].isin(mk).to_numpy()
            part = cm.loc[hit]
            rem = cm.loc[~hit]
            return pd.concat(
                [
                    pd.DataFrame(
                        {"node": part["node"], "color": part["color"],
                         "t": np.int8(1)}
                    ),
                    pd.DataFrame(
                        {"node": rem["node"], "color": rem["color"],
                         "t": np.int8(0)}
                    ),
                ],
                ignore_index=True,
            )

        tagged = colors.map(lambda df: df.assign(t=np.int8(0))).union(
            marked.map(
                lambda df: df.assign(color=np.int64(0), t=np.int8(1))[
                    ["node", "color", "t"]
                ]
            )
        ).exchange(["node"], extract, n_buckets)
        parts.append(
            tagged.map(
                lambda df: pd.DataFrame(
                    {"node": df.loc[df["t"] == 1, "node"],
                     "scc_id": df.loc[df["t"] == 1, "color"]}
                ).astype("int64")
            )
        )
        nodes = tagged.map(lambda df: df.loc[df["t"] == 0, ["node"]])

        # ---- shrink edges on both endpoints: marked is already
        # bucketed by node, so it serves as the pinned side for the
        # dst pass; the src pass filters against the pinned e_by_src
        def drop_src(g: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
            if len(e) == 0:
                return empty_edges
            if len(g) == 0:
                return e[["src", "dst"]]
            return e.loc[
                ~e["src"].isin(g["node"].to_numpy()), ["src", "dst"]
            ]

        def drop_dst(g: pd.DataFrame, m: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0:
                return empty_edges
            if len(m) == 0:
                return g[["src", "dst"]]
            return g.loc[
                ~g["dst"].isin(m["node"].to_numpy()), ["src", "dst"]
            ]

        survivors = marked.exchange(
            ["node"], drop_src, n_buckets, side=e_by_src
        )
        ebs = survivors.exchange(
            ["dst"], drop_dst, n_buckets, side=marked.refs
        )

    if nodes.count() > 0:
        raise RuntimeError(
            "scc: graph not exhausted after "
            f"{n_phases} phases — raise n_phases/max_rounds"
        )
    out = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    return out.to_dataset()


def mis(
    edges: "ray.data.Dataset",
    max_rounds: int = 8,
    n_buckets: int = 16,
    node_cap: int = 10_000_000,
    salt: str = "mis",
) -> "ray.data.Dataset":
    """Deterministic MAXIMAL INDEPENDENT SET via Luby's algorithm
    (Luby 1986), the standard parallel MIS: each round every remaining
    node whose priority is a strict local minimum among remaining
    neighbors joins the set; it and its neighbors leave the graph.
    Priorities are md5-derived (``salt:node`` → first 8 hex chars) with
    the node id folded in (``p·node_cap + node``, ids must be
    < ``node_cap``), so they are UNIQUE and the whole run — including
    the SQL oracle's unrolled rounds — is reproducible bit-for-bit.
    Expected O(log n) rounds; RAISES if ``max_rounds`` doesn't exhaust
    the graph (never a silently-partial result).

    INTEGER node ids; edges are symmetrized and self-loops dropped
    internally (a self-loop could never win against itself and would
    deadlock the round structure).

    Runs on the raw-task :class:`~fastie_ray.state.exchange.BlockSet`
    (sort barriers, not payload, dominated the Dataset form — NOTES
    fact 11): the symmetrized edge table is hash-partitioned ONCE by
    dst and once by src into pinned plasma buckets; each round then
    moves only the (shrinking) node-priority table through THREE
    exchanges — (1) key=node vs edges-by-dst: per-src neighbor-min
    partials; (2) key=node vs edges-by-src: fold partials, pick
    strict-local-min winners, fan out their neighbors as removals;
    (3) key=node: apply removals. Unique priorities make adjacent
    same-round winners impossible, so the removal pass is exact. At
    10⁹⁺ edges the pinned partitions are the win that matters: rounds
    re-ship node state (two ints per node), never the edge stream.
    Returns (node, in_mis ∈ {0,1})."""
    import hashlib

    from fastie_ray.state.exchange import BlockSet

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["src"] != df["dst"]]
        return pd.concat(
            [e[["src", "dst"]],
             e.rename(columns={"src": "dst", "dst": "src"})[["src", "dst"]]],
            ignore_index=True,
        ).drop_duplicates().astype("int64")

    ebs = BlockSet.from_dataset(edges)
    # duplicates across blocks are harmless (min / set-membership are
    # idempotent) — per-block dedup inside sym() bounds the payload
    e_by_dst = ebs.partition(["dst"], n_buckets, map_fn=sym)
    e_by_src = ebs.partition(["src"], n_buckets, map_fn=sym)

    def prio_of(nodes: pd.Series) -> np.ndarray:
        p = np.array(
            [int(hashlib.md5(f"{salt}:{n}".encode()).hexdigest()[:8], 16)
             for n in nodes.astype("int64")],
            dtype=np.int64,
        )
        return p * np.int64(node_cap) + nodes.to_numpy(dtype=np.int64)

    def node_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = sym(df)
        return pd.DataFrame({"node": pd.unique(s["src"])}).astype("int64")

    def node_prio(g: pd.DataFrame) -> pd.DataFrame:
        n = g.drop_duplicates("node").reset_index(drop=True)
        return pd.DataFrame(
            {"node": n["node"].astype("int64"), "c": prio_of(n["node"])}
        )

    all_nodes = ebs.exchange(["node"], node_prio, n_buckets, map_fn=node_partial)
    rem = all_nodes
    n_rem = rem.count()
    winners_parts: list[BlockSet] = []

    # round-local row tags: 0 = live (node, c=priority),
    # 1 = winner, 2 = neighbor-min partial (c=partial min), 3 = removal
    empty_tagged = pd.DataFrame(
        {"node": pd.Series([], dtype="int64"),
         "c": pd.Series([], dtype="int64"),
         "t": pd.Series([], dtype="int8")}
    )

    def x1(g: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
        # side-exchange buckets can have edges but no moving rows —
        # nothing to join, nothing to pass through
        if len(g) == 0:
            return empty_tagged
        out = [g.assign(t=np.int8(0))]
        if len(g) and len(e):
            m = e.merge(g[["node", "c"]], left_on="dst", right_on="node")
            nm = m.groupby("src", as_index=False)["c"].min()
            out.append(
                pd.DataFrame(
                    {"node": nm["src"].astype("int64"),
                     "c": nm["c"].astype("int64"), "t": np.int8(2)}
                )
            )
        return pd.concat(out, ignore_index=True)

    def x2(g: pd.DataFrame, e: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return empty_tagged
        live = g[g["t"] == 0]
        nm = g[g["t"] == 2].groupby("node")["c"].min()
        nmv = live["node"].map(nm)
        win = nmv.isna() | (live["c"] < nmv)
        winners = live.loc[win.to_numpy()]
        out = [live.loc[~win.to_numpy()], winners.assign(t=np.int8(1))]
        if len(winners) and len(e):
            nbr = e.loc[
                e["src"].isin(winners["node"].to_numpy()), "dst"
            ].drop_duplicates()
            out.append(
                pd.DataFrame(
                    {"node": nbr.astype("int64"),
                     "c": np.int64(0), "t": np.int8(3)}
                )
            )
        return pd.concat(out, ignore_index=True)

    def x3(g: pd.DataFrame) -> pd.DataFrame:
        removed = g.loc[g["t"] == 3, "node"].to_numpy()
        live = g[g["t"] == 0]
        if len(removed):
            live = live[~live["node"].isin(removed)]
        return pd.concat([live, g[g["t"] == 1]], ignore_index=True)

    for _r in range(max_rounds):
        if n_rem == 0:
            break
        tagged = rem.exchange(["node"], x1, n_buckets, side=e_by_dst)
        tagged = tagged.exchange(["node"], x2, n_buckets, side=e_by_src)
        out = tagged.exchange(["node"], x3, n_buckets)
        winners_parts.append(
            out.map(lambda df: df.loc[df["t"] == 1, ["node"]])
        )
        rem = out.map(lambda df: df.loc[df["t"] == 0, ["node", "c"]])
        n_rem = rem.count()

    if n_rem > 0:
        raise RuntimeError(
            f"mis: graph not exhausted after {max_rounds} rounds"
        )

    win_all = winners_parts[0].union(*winners_parts[1:])

    def label(g: pd.DataFrame) -> pd.DataFrame:
        hit = g.loc[g["t"] == 1, "node"].to_numpy()
        nodes = g.loc[g["t"] == 0, ["node"]]
        return pd.DataFrame(
            {"node": nodes["node"].astype("int64"),
             "in_mis": nodes["node"].isin(hit).astype("int64")}
        )

    result = all_nodes.map(
        lambda df: df[["node"]].assign(t=np.int8(0))
    ).union(
        win_all.map(lambda df: df.assign(t=np.int8(1)))
    ).exchange(["node"], label, n_buckets)
    return result.to_dataset()


def condensation_levels(
    edges: "ray.data.Dataset",
    n_phases: int = 4,
    max_rounds: int = 16,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Topological LEVELS of the condensation DAG: contract every SCC
    (via ``scc``) to one node, then level(c) = length of the longest
    path from any source component — the scheduling depth of a
    dependency graph (build systems, pipeline DAG analytics, stratified
    KG closure). Returns (comp, level).

    Level propagation is max-label: monotone non-decreasing bounded
    integers, so the exact fixed point is again one driver scalar (sum
    unchanged). Per round: one comp-edge⋈level hash join + one
    bucketed max exchange; comp tables are SCC-count-sized."""
    import pyarrow as pa
    import ray.data

    lvl_schema = pa.schema([("comp", pa.int64()), ("lvl", pa.int64())])

    labels = scc(
        edges, n_phases=n_phases, max_rounds=max_rounds, n_buckets=n_buckets
    ).materialize()

    e1 = hash_join(
        edges, labels, on="src", right_on="node",
        left_cols=["src", "dst"], right_cols=["node", "scc_id"],
        n_buckets=n_buckets,
    )
    e2 = hash_join(
        e1, labels, on="dst", right_on="node",
        left_cols=["src", "dst", "scc_id"], right_cols=["node", "scc_id"],
        n_buckets=n_buckets, suffix="_d",
    )

    def contract(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"src": df["scc_id"], "dst": df["scc_id_d"]}
        ).astype("int64")
        return out[out["src"] != out["dst"]].drop_duplicates()

    def add_eb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = (
            pd.util.hash_pandas_object(df["src"], index=False).to_numpy()
            ^ pd.util.hash_pandas_object(df["dst"], index=False).to_numpy()
        )
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    ce = (
        e2.map_batches(contract, batch_format="pandas")
        .map_batches(add_eb, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: g.drop(columns="__b").drop_duplicates(),
            batch_format="pandas",
        )
        .repartition(max(1, n_buckets // 4))
        .materialize()
    )

    def add_cb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["comp"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    levels = labels.map_batches(
        lambda df: pa.Table.from_pandas(
            pd.DataFrame(
                {"comp": df["scc_id"].astype("int64")}
            ).drop_duplicates().assign(lvl=np.int64(0)),
            preserve_index=False, schema=lvl_schema,
        ),
        batch_format="pandas",
    )
    levels = (
        levels.map_batches(add_cb, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: pa.Table.from_pandas(
                g.drop(columns="__b").drop_duplicates("comp"),
                preserve_index=False, schema=lvl_schema,
            ),
            batch_format="pandas",
        )
        .materialize()
    )

    prev_sum = None
    for _r in range(max_rounds):
        j = hash_join(
            ce, levels, on="src", right_on="comp",
            left_cols=["src", "dst"], right_cols=["comp", "lvl"],
            n_buckets=n_buckets,
        )

        def bump(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {"comp": df["dst"], "lvl": df["lvl"].astype("int64") + 1}
            )
            return out.groupby("comp", as_index=False)["lvl"].max()

        def max_final(g: pd.DataFrame) -> pa.Table:
            out = g.drop(columns="__b").groupby("comp", as_index=False)[
                "lvl"
            ].max()
            return pa.Table.from_pandas(
                out.astype({"comp": "int64", "lvl": "int64"}),
                preserve_index=False, schema=lvl_schema,
            )

        levels = (
            j.map_batches(bump, batch_format="pandas")
            .union(levels)
            .map_batches(add_cb, batch_format="pandas")
            .groupby("__b")
            .map_groups(max_final, batch_format="pandas")
            .repartition(max(1, n_buckets // 4))
            .materialize()
        )
        s = int(
            levels.map_batches(
                lambda df: pd.DataFrame({"s": [np.int64(df["lvl"].sum())]}),
                batch_format="pandas",
            )
            .to_pandas()["s"]
            .sum()
        )
        if s == prev_sum:
            break
        prev_sum = s

    return levels.map_batches(
        lambda df: pd.DataFrame(
            {"comp": df["comp"].astype("int64"),
             "level": df["lvl"].astype("int64")}
        ),
        batch_format="pandas",
    )


def local_clustering(
    edges: "ray.data.Dataset", n_buckets: int = 32
) -> "ray.data.Dataset":
    """Per-node triangle counts and LOCAL CLUSTERING COEFFICIENT of an
    undirected simple graph given as DISTINCT (a, b), a < b rows — the
    node-level companion of ``triangle_count`` (same Suri-
    Vassilvitskii degree orientation, but each closed wedge emits its
    THREE corners instead of a global 1):

        coeff(v) = 2·T(v) / (deg(v)·(deg(v)−1)),  floor-scaled 1e6

    Returns (node, n_triangles, degree, coeff_e6) for EVERY node;
    integer arithmetic end-to-end. Exchanges: degrees (1), two degree
    relabels (2), wedge generation (1), wedge⋈edge semi match (1),
    corner-count aggregate (1), count⋈degree join (1)."""
    from fastie_ray.ops.join import hash_join

    edges = edges.repartition(n_buckets).materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([df["a"], df["b"]], ignore_index=True)
        return both.value_counts().rename_axis("node").reset_index(name="deg")

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket(df["node"], n_buckets)
        return df

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("node", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    degrees = (
        edges.map_batches(deg_partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(deg_final, batch_format="pandas")
        .materialize()  # consumed by the orientation AND the final join
    )

    with_da = hash_join(
        edges, degrees, on="a", right_on="node",
        left_cols=["a", "b"], right_cols=["node", "deg"], n_buckets=n_buckets,
    )
    with_db = hash_join(
        with_da, degrees, on="b", right_on="node",
        left_cols=["a", "b", "deg"], right_cols=["node", "deg"],
        n_buckets=n_buckets, suffix="_b",
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a_lo = df["deg"] <= df["deg_b"]
        lo = df["a"].where(a_lo, df["b"])
        hi = df["b"].where(a_lo, df["a"])
        return pd.DataFrame({"lo": lo, "hi": hi})

    oriented = with_db.map_batches(orient, batch_format="pandas").materialize()

    def add_blo(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket(df["lo"], n_buckets)
        return df

    def ukey(df: pd.DataFrame, x: str, y: str) -> pd.Series:
        lo = df[x].where(df[x] < df[y], df[y])
        hi = df[y].where(df[x] < df[y], df[x])
        return lo.astype(str) + "|" + hi.astype(str)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        m = g.merge(g, on="lo", suffixes=("_1", "_2"))
        m = m[m["hi_1"] < m["hi_2"]]
        out = pd.DataFrame({"c": m["lo"], "u": m["hi_1"], "v": m["hi_2"]})
        out["k"] = ukey(out, "u", "v")
        return out

    wedge_ds = (
        oriented.map_batches(add_blo, batch_format="pandas")
        .groupby("__b")
        .map_groups(wedges, batch_format="pandas")
    )

    def ekey(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": ukey(df, "lo", "hi")})

    closed = hash_join(
        wedge_ds, oriented.map_batches(ekey, batch_format="pandas"),
        on="k", how="semi", left_cols=["k", "c", "u", "v"],
        n_buckets=n_buckets,
    )

    def corners(df: pd.DataFrame) -> pd.DataFrame:
        n = pd.concat([df["c"], df["u"], df["v"]], ignore_index=True)
        out = n.value_counts().rename_axis("node").reset_index(name="t")
        return out

    def t_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("node", as_index=False)["t"].sum()
        out["t"] = out["t"].astype("int64")
        return out

    tcounts = (
        closed.map_batches(corners, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(t_final, batch_format="pandas")
    )

    joined = hash_join(
        degrees, tcounts, on="node", how="left",
        left_cols=["node", "deg"], right_cols=["node", "t"],
        n_buckets=n_buckets,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        t = df["t"].fillna(0).astype("int64")
        d = df["deg"].astype("int64")
        denom = d * (d - 1)
        coeff = np.where(
            denom > 0, (2 * t * 1_000_000) // np.maximum(denom, 1), 0
        )
        return pd.DataFrame(
            {
                "node": df["node"],
                "n_triangles": t,
                "degree": d,
                "coeff_e6": coeff.astype("int64"),
            }
        )

    return joined.map_batches(finish, batch_format="pandas")


def sssp(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    weight_col: str = "w",
    max_rounds: int = 12,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Weighted single-source(-set) shortest paths — distributed
    Bellman-Ford (the weighted generalization of ``khop_reachability``
    's BFS): INTEGER edge weights ≥ 0, seeds start at distance 0,
    per round every edge relaxes ``dist(dst) ← min(dist(dst),
    dist(src) + w)``. Distances only DECREASE and are bounded below,
    so the (count, sum) pair of the dist table is a monotone exact
    fixed-point test. RAISES if ``max_rounds`` rounds don't converge
    (rounds needed = shortest-path hop diameter). Unreached nodes are
    absent from the output (∞ has no integer encoding worth shipping).

    Raw-task shape (r3): the edge table is hash-partitioned by src
    ONCE and PINNED; each round is ONE exchange of the (node-sized,
    shrinking-churn) dist table against the pinned edge buckets
    (relax candidates + own-dist pass-through, min-combined) plus ONE
    node-keyed min exchange and a per-block scalar probe — no Acero
    join, no sort barrier, no per-round materialize. Returns
    (node, dist)."""
    from fastie_ray.state.exchange import BlockSet

    def edge_canon(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype="int64"),
                 "dst": pd.Series([], dtype="int64"),
                 "w": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {
                "node": df["src"].astype("int64"),
                "dst": df["dst"].astype("int64"),
                "w": df[weight_col].astype("int64"),
            }
        )

    edge_parts = BlockSet.from_dataset(edges).partition(
        ["node"], n_buckets, map_fn=edge_canon
    )

    def seed_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": df["node"].astype("int64")})
        out = out.drop_duplicates()
        out["dist"] = np.int64(0)
        return out

    dist = BlockSet.from_dataset(seeds).exchange(
        ["node"],
        lambda g: g.groupby("node", as_index=False)["dist"].min(),
        n_buckets=n_buckets, map_fn=seed_rows,
    )

    _EMPTY_ND = pd.DataFrame(
        {"node": pd.Series([], dtype="int64"),
         "dist": pd.Series([], dtype="int64")}
    )

    def relax(g: pd.DataFrame, eb: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "node" not in g.columns:
            return _EMPTY_ND.copy()
        own = g[["node", "dist"]]
        if len(eb) == 0:
            return own
        m = eb.merge(own, on="node", sort=False)
        cand = pd.DataFrame(
            {"node": m["dst"],
             "dist": m["dist"].astype("int64") + m["w"]}
        ).groupby("node", as_index=False)["dist"].min()
        return pd.concat([own, cand], ignore_index=True)

    def min_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["dist"].min()
        return out.astype({"node": "int64", "dist": "int64"})

    prev = None
    converged = False
    for _r in range(max_rounds):
        cand = dist.exchange(
            ["node"], relax, n_buckets=n_buckets, side=edge_parts
        )
        dist = cand.exchange(["node"], min_final, n_buckets=n_buckets)
        parts = dist.scalar(
            lambda df: (int(df["dist"].sum()), len(df))
            if len(df) and "dist" in df.columns else (0, 0)
        )
        # (count, sum) pair: any relaxation strictly decreases a dist
        # (sum drops) or adds a node (count grows) — equality of BOTH
        # is the exact fixed point
        s = (sum(p[0] for p in parts), sum(p[1] for p in parts))
        if s == prev:
            converged = True
            break
        prev = s
    if not converged:
        raise RuntimeError(f"sssp: not converged after {max_rounds} rounds")
    return dist.to_dataset()


def greedy_matching(
    edges: "ray.data.Dataset",
    max_rounds: int = 12,
    n_buckets: int = 16,
    salt: str = "gm",
    weight_col: str | None = None,
) -> "ray.data.Dataset":
    """Deterministic MAXIMAL MATCHING — the edge-domain Luby: each
    round every edge whose md5 priority is the minimum at BOTH
    endpoints joins the matching; its endpoints (and their incident
    edges) leave the graph. The parallel pairing primitive (record
    linkage one-to-one assignment, dedup pair resolution). DISTINCT
    (a, b), a < b, INTEGER node ids.

    Priorities are md5(salt:a:b) (60 bits); an adjacent-collision tie
    simply leaves both edges for a later round — identically on the
    Ray and SQL sides, so determinism survives without a tie-fold.
    Always ≥ 1 edge (the global minimum) matches per round, and in
    expectation a constant fraction of edges drops — ``max_rounds``
    bounds the tail, with a LOUD failure if edges remain.

    Per round: one per-node min exchange + one winners pass + two
    anti-joins, all edge-sized. Returns (a, b, round).

    With ``weight_col`` (non-negative int64 < 2²²) the same loop
    computes the LOCALLY-DOMINANT weighted matching (Preis'99 — the
    parallel ½-approximation of maximum-weight matching): an edge
    matches when it is the HEAVIEST at both endpoints; priority
    encodes (2²²−1−w) in the high bits with a 40-bit md5 tie-break in
    the low bits, so the min-at-both-endpoints machinery, the SQL
    oracle shape and the collision-defers-identically argument all
    carry over unchanged."""
    import hashlib

    from fastie_ray.state.exchange import BlockSet

    def prio(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["a", "b"]].astype("int64").copy()
        if weight_col is None:
            out["p"] = np.array(
                [
                    int(hashlib.md5(
                        f"{salt}:{a}:{b}".encode()
                    ).hexdigest()[:15], 16)
                    for a, b in zip(out["a"], out["b"])
                ],
                dtype=np.int64,
            )
            return out
        w = df[weight_col].astype("int64").to_numpy()
        if len(w) and (w.min() < 0 or w.max() >= (1 << 22)):
            raise ValueError("weights must be in [0, 2**22)")
        md40 = np.array(
            [
                int(hashlib.md5(f"{salt}:{a}:{b}".encode()).hexdigest()[:10],
                    16)
                for a, b in zip(out["a"], out["b"])
            ],
            dtype=np.int64,
        )
        out["p"] = (((1 << 22) - 1 - w) << 40) | md40
        return out

    # Raw-task BlockSet loop — FOUR node/edge-sized exchanges per
    # round, no sort barriers (the Dataset form paid a min aggregate +
    # two hash joins + two anti joins + materializes per round):
    #   X1 key=node:   edge halves meet; per-endpoint min priority is
    #                  attached in place (transform, no second join);
    #   X2 key=(a,b):  both halves of an edge meet; winner iff
    #                  min(nm_a, nm_b) == p (nm ≤ p always ⇒ both == p);
    #   X3 key=node:   matched endpoints kill incident halves;
    #   X4 key=(a,b):  an edge survives iff BOTH its halves survived.
    rem = BlockSet.from_dataset(edges).map(prio).compact(n_buckets)
    n_rem = rem.count()
    matched_parts: list[BlockSet] = []

    def halves(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [df.assign(node=df["a"]), df.assign(node=df["b"])],
            ignore_index=True,
        )[["node", "a", "b", "p"]]

    def attach_nm(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["nm"] = g.groupby("node")["p"].transform("min").astype("int64")
        return g

    def decide(rnd: int):
        def f(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby(["a", "b"], as_index=False).agg(
                p=("p", "first"), nmin=("nm", "min")
            )
            # nm ≤ p at each endpoint, so min(nm_a, nm_b) == p ⇔ the
            # edge is the minimum at BOTH endpoints
            win = (agg["nmin"] == agg["p"]).to_numpy()
            w = agg.loc[win]
            lose = agg.loc[~win]
            out = [
                pd.DataFrame(
                    {"node": np.int64(0), "a": lose["a"], "b": lose["b"],
                     "p": lose["p"], "rnd": np.int64(0), "t": np.int8(0)}
                ),
                pd.DataFrame(
                    {"node": np.int64(0), "a": w["a"], "b": w["b"],
                     "p": w["p"], "rnd": np.int64(rnd), "t": np.int8(1)}
                ),
                pd.DataFrame(
                    {"node": pd.concat([w["a"], w["b"]], ignore_index=True),
                     "a": np.int64(0), "b": np.int64(0), "p": np.int64(0),
                     "rnd": np.int64(0), "t": np.int8(2)}
                ),
            ]
            return pd.concat(out, ignore_index=True)
        return f

    def x3_map(df: pd.DataFrame) -> pd.DataFrame:
        ed = df[df["t"] == 0]
        h = pd.concat(
            [ed.assign(node=ed["a"]), ed.assign(node=ed["b"])],
            ignore_index=True,
        )
        return pd.concat(
            [h, df[df["t"] == 2]], ignore_index=True
        )[["node", "a", "b", "p", "t"]]

    def x3_drop_dead(g: pd.DataFrame) -> pd.DataFrame:
        dead = g.loc[g["t"] == 2, "node"].to_numpy()
        ok = g[g["t"] == 0]
        if len(dead):
            ok = ok[~ok["node"].isin(dead)]
        return ok[["a", "b", "p"]]

    def x4_both(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["a", "b", "p"], as_index=False).size()
        return c.loc[c["size"] == 2, ["a", "b", "p"]].astype("int64")

    for rnd in range(1, max_rounds + 1):
        if n_rem == 0:
            break
        tagged = rem.exchange(
            ["node"], attach_nm, n_buckets, map_fn=halves
        ).exchange(["a", "b"], decide(rnd), n_buckets)
        winners = tagged.map(
            lambda df: df.loc[df["t"] == 1, ["a", "b", "rnd"]].rename(
                columns={"rnd": "round"}
            )
        )
        if winners.count() == 0:
            # only possible via adjacent priority collisions; retrying
            # cannot make progress
            raise RuntimeError("greedy_matching: no winner in a round")
        matched_parts.append(winners)
        rem = tagged.exchange(
            ["node"], x3_drop_dead, n_buckets, map_fn=x3_map
        ).exchange(["a", "b"], x4_both, n_buckets)
        n_rem = rem.count()

    if n_rem > 0:
        raise RuntimeError(
            f"greedy_matching: edges remain after {max_rounds} rounds"
        )
    out = matched_parts[0]
    if len(matched_parts) > 1:
        out = out.union(*matched_parts[1:])
    return out.map(
        lambda df: df.astype({"a": "int64", "b": "int64", "round": "int64"})
    ).to_dataset()


def transitive_closure(
    edges: "ray.data.Dataset",
    src_col: str = "node",
    dst_col: str = "parent",
    max_rounds: int = 8,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """All (node, ancestor) pairs reachable through repeated
    ``src → dst`` hops — the KG HIERARCHY CLOSURE (subclass-of /
    part-of expansion, the materialization every ontology-aware query
    engine precomputes).

    Pointer-DOUBLING composition (R ← R ∪ R∘R), so depth-d chains
    close in ⌈log₂ d⌉ rounds instead of d: each round is ONE tag-union
    compose exchange keyed on the mid node (rows of R enter twice —
    once keyed by their head as the LEFT factor, once keyed by their
    tail as the RIGHT factor) and ONE (node, ancestor) dedup exchange;
    a blocking pair count per round detects the fixpoint. Payload per
    round is closure-sized (the output itself re-ships O(log d) times
    — the standard doubling trade against d rounds of linear
    chaining). Works on DAGs; on a cyclic input it still converges to
    reachability pairs (x reaches y, x ≠ y kept as emitted).

    Returns a Dataset of (node, ancestor)."""
    from fastie_ray.state.exchange import BlockSet

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"x": df[src_col], "y": df[dst_col]}
        ).drop_duplicates()

    R = BlockSet.from_dataset(edges).exchange(
        ["x", "y"], lambda g: g.drop_duplicates(), n_buckets=n_buckets,
        map_fn=canon,
    )
    n_prev = R.count()

    def factor_rows(df: pd.DataFrame) -> pd.DataFrame:
        left = pd.DataFrame(
            {"k": df["y"], "x": df["x"], "y": df["y"], "t": "l"}
        )
        right = pd.DataFrame(
            {"k": df["x"], "x": df["x"], "y": df["y"], "t": "r"}
        )
        return pd.concat([left, right], ignore_index=True)

    def compose(g: pd.DataFrame) -> pd.DataFrame:
        L = g.loc[g["t"] == "l", ["k", "x"]]
        Rf = g.loc[g["t"] == "r", ["k", "y"]]
        m = L.merge(Rf, on="k", sort=False)
        return m.loc[m["x"] != m["y"], ["x", "y"]].drop_duplicates()

    for _ in range(max_rounds):
        hops = R.exchange(
            ["k"], compose, n_buckets=n_buckets, map_fn=factor_rows
        )
        R = R.union(hops).exchange(
            ["x", "y"], lambda g: g.drop_duplicates(), n_buckets=n_buckets
        )
        n_now = R.count()
        if n_now == n_prev:
            break
        n_prev = n_now

    return R.map(
        lambda df: df.rename(columns={"x": "node", "y": "ancestor"})
    ).to_dataset()


def anf_reach(
    edges: "ray.data.Dataset",
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 3,
    n_registers: int = 64,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """HyperANF (Boldi-Rosa-Vigna 2011): the per-node NEIGHBORHOOD
    FUNCTION sketch — each node carries an ``n_registers``-byte HLL
    register array over its ≤``max_hops``-hop OUT-reachable set,
    propagated by register-wise max message passing. THE way to
    estimate reach / effective diameter on graphs where exact per-node
    reachability sets are quadratic.

    Raw-task shape (the sssp/CC skeleton): edges are hash-partitioned
    by their DST once and PINNED (messages flow w → v for edge v→w);
    each hop is one exchange of the node-sized register table against
    the pinned buckets (candidate registers + own pass-through,
    max-combined in the bucket) plus one node-keyed max merge. Payload
    per hop: nodes × n_registers bytes — constant per node, never a
    reachability set.

    Determinism / oracle design mirrors ``ops.sketch``: registers are
    md5-derived (60-bit hash, rho = trailing zeros of h//R plus one,
    all-zero sentinel 61), so the propagated STATE is SQL-verifiable
    bit-for-bit against a bounded recursive-CTE reach + GROUP BY
    register MAX. Returns per node the integer state summary
    (node, regs_nonzero, rho_sum); the float reach estimate derives
    from the state on the driver (``ops.sketch.hll_estimate``)."""
    from fastie_ray.ops.sketch import _hash60
    from fastie_ray.state.exchange import BlockSet

    R = n_registers

    def rev_canon(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=object),
                 "to": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {"node": df[dst_col].astype(str), "to": df[src_col].astype(str)}
        ).drop_duplicates()

    ebs = BlockSet.from_dataset(edges)
    eparts = ebs.partition(["node"], n_buckets, map_fn=rev_canon)

    def _max_merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("node", kind="mergesort")
        arr = np.frombuffer(
            b"".join(df["regs"]), dtype=np.uint8
        ).reshape(len(df), R)
        nodes = df["node"].to_numpy()
        starts = np.flatnonzero(np.r_[True, nodes[1:] != nodes[:-1]])
        out = np.maximum.reduceat(arr, starts, axis=0)
        return pd.DataFrame(
            {"node": nodes[starts], "regs": [r.tobytes() for r in out]}
        )

    def endpoints(df: pd.DataFrame) -> pd.DataFrame:
        e = rev_canon(df)
        return pd.DataFrame(
            {"node": pd.concat([e["node"], e["to"]], ignore_index=True)}
        ).drop_duplicates()

    def init_regs(g: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.unique(g["node"])
        h = _hash60(nodes)
        reg = (h % R).astype(np.int64)
        rest = h // R
        rho = np.full(len(nodes), 61, dtype=np.uint8)
        nz = rest != 0
        low = rest[nz] & -rest[nz]
        rho[nz] = (np.log2(low.astype(np.float64)).astype(np.int64) + 1).astype(
            np.uint8
        )
        arr = np.zeros((len(nodes), R), dtype=np.uint8)
        arr[np.arange(len(nodes)), reg] = rho
        return pd.DataFrame(
            {"node": nodes, "regs": [a.tobytes() for a in arr]}
        )

    regs = ebs.exchange(["node"], init_regs, n_buckets=n_buckets,
                        map_fn=endpoints)

    _EMPTY_NR = pd.DataFrame(
        {"node": pd.Series([], dtype=object),
         "regs": pd.Series([], dtype=object)}
    )

    def relax(g: pd.DataFrame, eb: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "node" not in g.columns:
            return _EMPTY_NR.copy()
        own = g[["node", "regs"]]
        if len(eb) == 0:
            return own
        m = eb.merge(own, on="node", sort=False)
        cand = pd.DataFrame({"node": m["to"], "regs": m["regs"]})
        return _max_merge(pd.concat([own, cand], ignore_index=True))

    for _ in range(max_hops):
        cand = regs.exchange(["node"], relax, n_buckets=n_buckets,
                             side=eparts)
        regs = cand.exchange(["node"], _max_merge, n_buckets=n_buckets)

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        arr = np.frombuffer(
            b"".join(df["regs"]), dtype=np.uint8
        ).reshape(len(df), R)
        return pd.DataFrame(
            {
                "node": df["node"],
                "regs_nonzero": (arr > 0).sum(axis=1).astype("int64"),
                "rho_sum": arr.sum(axis=1, dtype=np.int64),
            }
        )

    return regs.map(summarize).to_dataset()


def butterfly_count(
    edges: "ray.data.Dataset",
    u_col: str = "u",
    i_col: str = "i",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """BUTTERFLY counting — the bipartite motif (2×2 biclique:
    two users × two items fully connected), the clustering primitive
    of user-item / doc-term graphs where triangles cannot exist.
    n_butterflies = Σ over item pairs C(common_users, 2).

    Two exchanges over DISTINCT (u, i) edges: (1) keyed u — per-user
    item pairs with a batch-distinct combiner (volume Σ deg(u)², the
    wedge bound; cap hub users upstream if needed); (2) keyed item
    pair — common-user counts, with the C(cu, 2) partial sums reduced
    per bucket so the driver merges n_buckets scalar rows. Returns one
    row (n_butterflies, n_item_pairs, n_wedges)."""
    from fastie_ray.state.exchange import BlockSet

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"u": df[u_col].astype(str), "i": df[i_col].astype(str)}
        ).drop_duplicates()

    def item_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        m = g.merge(g, on="u", sort=False)
        m = m[m["i_x"] < m["i_y"]]
        out = m.groupby(["i_x", "i_y"], as_index=False).size()
        out["size"] = out["size"].astype("int64")
        return out

    def partial_butterflies(g: pd.DataFrame) -> pd.DataFrame:
        cu = g.groupby(["i_x", "i_y"], as_index=False)["size"].sum()["size"]
        cu = cu.astype("int64")
        return pd.DataFrame(
            {
                "bf": [np.int64((cu * (cu - 1) // 2).sum())],
                "pairs": [np.int64(len(cu))],
                "wedges": [np.int64(cu.sum())],
            }
        )

    ebs = BlockSet.from_dataset(edges)
    wedges = ebs.exchange(["u"], item_pairs, n_buckets=n_buckets,
                          map_fn=canon)
    parts = wedges.exchange(
        ["i_x", "i_y"], partial_butterflies, n_buckets=n_buckets
    ).to_pandas()
    return pd.DataFrame(
        {
            "n_butterflies": [np.int64(parts["bf"].sum() if len(parts) else 0)],
            "n_item_pairs": [np.int64(parts["pairs"].sum() if len(parts) else 0)],
            "n_wedges": [np.int64(parts["wedges"].sum() if len(parts) else 0)],
        }
    )


def random_walks_frontier(
    edges: "ray.data.Dataset",
    walk_len: int = 3,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Deterministic random-walk corpus over a directed graph — the
    graph-embedding training-data generator (DeepWalk/node2vec input):
    one walk per node, ``walk_len`` steps, emitted as
    (start, step, node) rows (step 0 = the start node itself; a walk
    ends early at a node with no out-edges).

    Determinism (the reproducibility contract a training-data pipeline
    needs): at step t from node u on the walk started at s, the next
    edge is the ``H(s|t|u) mod outdeg(u)``-th out-neighbor of u in
    dst-sorted order, with H = first 60 bits of md5 — bit-exactly
    reproducible in SQL (and across reruns/resumes) while still mixing
    like a hash. No RNG state ships anywhere.

    Scale shape: the edge table is ranked ONCE by a src-keyed exchange
    (rank + outdeg per src are bucket-local since all of a src's edges
    co-locate) and its per-bucket outputs are PINNED as the side of
    every walk round — ``walk_len`` exchanges each carry only the
    (shrinking) frontier, one row per live walk, never the edge table.
    Frontier volume is bounded by #nodes per round regardless of walk
    count × length products downstream."""
    from fastie_ray.state.exchange import BlockSet

    def edge_canon(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "src" not in df.columns:
            return pd.DataFrame(
                {"cur": pd.Series([], dtype="object"),
                 "dst": pd.Series([], dtype="object")}
            )
        return pd.DataFrame(
            {"cur": df["src"], "dst": df["dst"]}
        ).drop_duplicates()

    def rank_adj(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates().sort_values(["cur", "dst"], kind="mergesort")
        g["rnk"] = g.groupby("cur").cumcount().astype("int64")
        g["outdeg"] = g.groupby("cur")["dst"].transform("size").astype("int64")
        return g.reset_index(drop=True)

    bs = BlockSet.from_dataset(edges)
    # exchange output blocks ARE the hash buckets of ["cur"] (same
    # _hash_bucket, same n_buckets) — reuse them directly as the
    # pinned side of every walk round, no second partition pass
    adj = bs.exchange(["cur"], rank_adj, n_buckets=n_buckets,
                      map_fn=edge_canon)

    def seed_rows(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "cur" not in df.columns:
            return pd.DataFrame(
                {"cur": pd.Series([], dtype="object"),
                 "start": pd.Series([], dtype="object")}
            )
        n = pd.concat([df["cur"], df["dst"]], ignore_index=True)
        n = pd.Series(n.unique(), dtype="object")
        return pd.DataFrame({"cur": n, "start": n})

    frontier = bs.exchange(
        ["cur"],
        lambda g: g.drop_duplicates().reset_index(drop=True),
        n_buckets=n_buckets,
        map_fn=lambda df: seed_rows(edge_canon(df)),
    )

    _EMPTY_F = pd.DataFrame(
        {"cur": pd.Series([], dtype="object"),
         "start": pd.Series([], dtype="object")}
    )

    def walk_rows(bsx: BlockSet, step: int) -> BlockSet:
        def emit(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0 or "cur" not in df.columns:
                return pd.DataFrame(
                    {"start": pd.Series([], dtype="object"),
                     "step": pd.Series([], dtype="int64"),
                     "node": pd.Series([], dtype="object")}
                )
            return pd.DataFrame(
                {"start": df["start"],
                 "step": np.int64(step),
                 "node": df["cur"]}
            )

        return bsx.map(emit)

    out_parts = [walk_rows(frontier, 0)]
    import hashlib as _hl

    for t in range(walk_len):
        def hop(g: pd.DataFrame, adj_b: pd.DataFrame, _t=t) -> pd.DataFrame:
            if len(g) == 0 or "cur" not in g.columns or len(adj_b) == 0:
                return _EMPTY_F.copy()
            m = g.merge(adj_b, on="cur", sort=False)
            if len(m) == 0:
                return _EMPTY_F.copy()
            key = (
                m["start"].astype(str) + "|" + str(_t) + "|"
                + m["cur"].astype(str)
            )
            idx = key.map(
                lambda s: int(_hl.md5(s.encode()).hexdigest()[:15], 16)
            ).to_numpy(dtype=np.uint64)
            pick = m[(idx % m["outdeg"].to_numpy(dtype=np.uint64))
                     == m["rnk"].to_numpy(dtype=np.uint64)]
            return pd.DataFrame(
                {"cur": pick["dst"], "start": pick["start"]}
            ).reset_index(drop=True)

        # ONE exchange per step: the split re-keys the frontier on its
        # current node, the reduce joins bucket-local pinned adjacency
        frontier = frontier.exchange(
            ["cur"], hop, n_buckets=n_buckets, side=adj.refs
        )
        out_parts.append(walk_rows(frontier, t + 1))

    result = out_parts[0]
    result = result.union(*out_parts[1:])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "step" not in df.columns:
            return pd.DataFrame(
                {"start": pd.Series([], dtype="object"),
                 "step": pd.Series([], dtype="int64"),
                 "node": pd.Series([], dtype="object")}
            )
        df = df.copy()
        df["step"] = df["step"].astype("int64")
        return df

    return result.map(finish).to_dataset()


def walk_skipgrams(
    walks: "ray.data.Dataset",
    window: int = 2,
    negatives_per_pos: int = 1,
    salt: str = "neg",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Skip-gram-with-negative-sampling training pairs from a
    random-walk corpus (the word2vec/DeepWalk data half): for every
    walk position i, each node at distance 1..``window`` on the SAME
    walk is a positive ``(center, context, label=1)``; each positive
    occurrence also draws ``negatives_per_pos`` deterministic negative
    contexts (label=0) from the corpus node vocabulary. Output is the
    aggregated ``(center, context, label, n)`` table — the exact
    multiset a distributed SGNS trainer would consume, reproducible
    bit-for-bit across reruns.

    Negative choice is the md5-grid convention: negative q for the
    positive at (start, i, j) is ``vocab[int(md5(
    f"{salt}:{start}:{i}:{j}:{q}")[:15], 16) % V]`` over the
    node-sorted vocabulary — seedless, SQL-reproducible; collisions
    with the true context are kept (standard SGNS behavior, and
    determinism matters more than the tiny noise term).

    Scale shape: walks are keyed by ``start`` (``random_walks_frontier``
    emits one walk per start node), so ONE exchange on ``start``
    co-locates every step of a walk and pair generation is
    bucket-local (a within-bucket self-merge bounded by walk_len²
    per walk); a second exchange sums counts per (center, context,
    label). The node vocabulary is vocabulary-bounded (entity graphs:
    alias vocab + NIL surfaces) and broadcast once via ``ray.put`` —
    the same partitioning assumption ``random_walks`` documents. The
    walk corpus is materialized once (it is nodes × walk_len rows,
    NOT corpus-scale) so vocab and pair passes don't recompute the
    upstream extraction pipeline."""
    import hashlib

    import ray

    from fastie_ray.state.exchange import BlockSet

    mat = walks.materialize()
    vocab_parts = mat.map_batches(
        lambda df: pd.DataFrame({"node": df["node"].unique()})
        if len(df) else pd.DataFrame({"node": pd.Series([], dtype="object")}),
        batch_format="pandas",
    ).to_pandas()
    if len(vocab_parts) == 0:
        return ray.data.from_items([]).map_batches(
            lambda df: pd.DataFrame(
                {"center": pd.Series([], dtype="object"),
                 "context": pd.Series([], dtype="object"),
                 "label": pd.Series([], dtype="int64"),
                 "n": pd.Series([], dtype="int64")}
            ),
            batch_format="pandas",
        )
    vocab = np.sort(vocab_parts["node"].astype(str).unique())
    vocab_ref = ray.put(vocab)
    n_vocab = len(vocab)

    _EMPTY = pd.DataFrame(
        {"center": pd.Series([], dtype="object"),
         "context": pd.Series([], dtype="object"),
         "label": pd.Series([], dtype="int64"),
         "n": pd.Series([], dtype="int64")}
    )

    def pair_gen(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "start" not in g.columns:
            return _EMPTY.copy()
        v = ray.get(vocab_ref)
        a = g[["start", "step", "node"]]
        m = a.merge(a, on="start", sort=False, suffixes=("_c", "_x"))
        d = (m["step_c"] - m["step_x"]).abs()
        m = m[(d >= 1) & (d <= window)]
        if len(m) == 0:
            return _EMPTY.copy()
        pos = pd.DataFrame(
            {"center": m["node_c"], "context": m["node_x"],
             "label": np.int64(1)}
        )
        negs = []
        for q in range(negatives_per_pos):
            key = (
                salt + ":" + m["start"].astype(str) + ":"
                + m["step_c"].astype(str) + ":" + m["step_x"].astype(str)
                + ":" + str(q)
            )
            idx = key.map(
                lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            ).to_numpy(dtype=np.uint64) % np.uint64(n_vocab)
            negs.append(pd.DataFrame(
                {"center": m["node_c"].to_numpy(),
                 "context": v[idx.astype(np.int64)],
                 "label": np.int64(0)}
            ))
        out = pd.concat([pos, *negs], ignore_index=True)
        out = out.groupby(
            ["center", "context", "label"], as_index=False, sort=False
        ).size().rename(columns={"size": "n"})
        out["n"] = out["n"].astype("int64")
        out["label"] = out["label"].astype("int64")
        return out

    def sum_counts(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "center" not in g.columns:
            return _EMPTY.copy()
        out = g.groupby(
            ["center", "context", "label"], as_index=False, sort=False
        )["n"].sum()
        out["n"] = out["n"].astype("int64")
        return out

    bs = BlockSet.from_dataset(mat)
    pairs = bs.exchange(["start"], pair_gen, n_buckets=n_buckets)
    return pairs.exchange(
        ["center", "context", "label"], sum_counts, n_buckets=n_buckets
    ).to_dataset()


def modularity(
    edges: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Newman modularity of a given node partition over an undirected
    simple graph (DISTINCT canonical ``(a, b)``, ``a < b`` rows) —
    the community-quality gate a KG-construction pipeline runs after
    community detection (is the nation/type/LPA partition better than
    chance?). ``labels`` is a (node, label) Dataset covering every
    endpoint.

    All-integer so the SQL oracle reproduces it exactly: with
    m = |E|, e_c = # intra-community edges of c and K_c = Σ deg(v)
    over v ∈ c,

        Q·(4m²) = Σ_c q_num(c),   q_num(c) = 4·m·e_c − K_c²

    Returns one row per community (label, n_nodes, internal_edges,
    degree_sum, q_num) plus the global denominator in ``four_m2`` —
    exact rational modularity, no float anywhere.

    Scale shape: two task-based ``hash_join``s ship the node-sized
    label table onto the edge stream (edges never re-key); degrees and
    per-community sums are per-batch partials + ONE bucketed exchange
    each. The returned frame is community-sized.
    """
    edges = edges.repartition(n_buckets).materialize()
    labels = labels.materialize()

    la = hash_join(
        edges, labels, on="a", right_on="node",
        left_cols=["a", "b"], right_cols=["node", "label"],
        n_buckets=n_buckets,
    )
    lab = hash_join(
        la, labels, on="b", right_on="node",
        left_cols=["a", "b", "label"], right_cols=["node", "label"],
        n_buckets=n_buckets, suffix="_b",
    ).materialize()

    # m: driver scalar (one tiny count aggregate)
    m = edges.count()

    # e_c: intra-edge counts — per-batch partial, one bucketed final
    def intra_partial(df: pd.DataFrame) -> pd.DataFrame:
        same = df[df["label"] == df["label_b"]]
        out = same.groupby("label", as_index=False).size()
        out = out.rename(columns={"size": "e"})
        out["__b"] = _bucket(out["label"], n_buckets)
        return out

    def intra_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("label", as_index=False)["e"].sum()
        out["e"] = out["e"].astype("int64")
        return out

    intra = (
        lab.map_batches(intra_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(intra_final, batch_format="pandas")
        .to_pandas()
    )

    # K_c and n_nodes: degree partials off the labelled edge stream
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.DataFrame(
            {"node": pd.concat([df["a"], df["b"]], ignore_index=True),
             "label": pd.concat([df["label"], df["label_b"]], ignore_index=True)}
        )
        out = both.groupby(["node", "label"], as_index=False).size()
        out = out.rename(columns={"size": "deg"})
        out["__b"] = _bucket(out["node"], n_buckets)
        return out

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["node", "label"], as_index=False
        )["deg"].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    def comm_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("label", as_index=False).agg(
            k_sum=("deg", "sum"), n_nodes=("node", "size")
        )
        out["__b"] = _bucket(out["label"], n_buckets)
        return out

    def comm_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("label", as_index=False).agg(
            k_sum=("k_sum", "sum"), n_nodes=("n_nodes", "sum")
        )
        return out.astype({"k_sum": "int64", "n_nodes": "int64"})

    comm = (
        lab.map_batches(deg_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(deg_final, batch_format="pandas")
        .map_batches(comm_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(comm_final, batch_format="pandas")
        .to_pandas()
    )

    out = comm.merge(intra, on="label", how="left")
    out["e"] = out["e"].fillna(0).astype("int64")
    out["q_num"] = 4 * m * out["e"] - out["k_sum"] * out["k_sum"]
    out["four_m2"] = np.int64(4) * m * m
    out = out.rename(
        columns={"e": "internal_edges", "k_sum": "degree_sum"}
    )[["label", "n_nodes", "internal_edges", "degree_sum", "q_num", "four_m2"]]
    return out.sort_values("label").reset_index(drop=True)


def edge_jaccard(
    edges: "ray.data.Dataset", n_buckets: int = 16
) -> "ray.data.Dataset":
    """Neighborhood-Jaccard weight for every EXISTING edge of an
    undirected simple graph (DISTINCT canonical ``(a, b)``, ``a < b``):

        jac(a,b) = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
                 = cn / (deg(a) + deg(b) − cn)

    (endpoints stay in the union — a and b are each other's
    neighbors, so the denominator is never 0). The classic local graph
    sparsification / ego-similarity weight (Satuluri et al. 2011):
    keep each node's top-jaccard edges and community structure
    survives at a fraction of the edges. Returns
    (a, b, cn, deg_a, deg_b, jac_e6) with ``jac_e6 =
    1e6·cn // (deg_a+deg_b−cn)`` — all-integer, SQL-exact.

    Scale shape: cn(a,b) = # wedges closing the edge — the same
    degree-oriented wedge enumeration as ``local_clustering`` (each
    wedge is generated at its lowest-degree corner, so hub centers
    don't explode), matched against the edge set by ONE task-based
    hash join, then two node-sized degree joins. No driver-side
    adjacency ever materializes.
    """
    edges = edges.repartition(n_buckets).materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([df["a"], df["b"]], ignore_index=True)
        out = both.value_counts().rename_axis("node").reset_index(name="deg")
        out["__b"] = _bucket(out["node"], n_buckets)
        return out

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("node", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    degrees = (
        edges.map_batches(deg_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(deg_final, batch_format="pandas")
        .materialize()
    )

    with_da = hash_join(
        edges, degrees, on="a", right_on="node",
        left_cols=["a", "b"], right_cols=["node", "deg"], n_buckets=n_buckets,
    )
    with_db = hash_join(
        with_da, degrees, on="b", right_on="node",
        left_cols=["a", "b", "deg"], right_cols=["node", "deg"],
        n_buckets=n_buckets, suffix="_b",
    )

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a_lo = df["deg"] <= df["deg_b"]
        lo = df["a"].where(a_lo, df["b"])
        hi = df["b"].where(a_lo, df["a"])
        return pd.DataFrame({"lo": lo, "hi": hi})

    oriented = with_db.map_batches(orient, batch_format="pandas").materialize()

    def add_blo(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket(df["lo"], n_buckets)
        return df

    def ukey(x: pd.Series, y: pd.Series) -> pd.Series:
        lo = x.where(x < y, y)
        hi = y.where(x < y, x)
        return lo.astype(str) + "|" + hi.astype(str)

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        m = g.merge(g, on="lo", suffixes=("_1", "_2"))
        m = m[m["hi_1"] < m["hi_2"]]
        out = pd.DataFrame({"c": m["lo"], "u": m["hi_1"], "v": m["hi_2"]})
        out["k"] = ukey(out["u"], out["v"])
        return out

    # each wedge generated ONCE, at its lowest-degree corner
    wedge_ds = (
        oriented.map_batches(add_blo, batch_format="pandas")
        .groupby("__b")
        .map_groups(wedges, batch_format="pandas")
    )

    ekeys = edges.map_batches(
        lambda df: pd.DataFrame(
            {"k": df["a"].astype(str) + "|" + df["b"].astype(str)}
        ),
        batch_format="pandas",
    ).materialize()
    # closed wedges = triangles; each credits ALL THREE of its edges
    # (cn(a,b) counts triangles THROUGH the edge, and the triangle's
    # min-degree corner may be a or b itself — crediting only the
    # leaf pair undercounts; pinned by the brute-force parity test)
    tri = hash_join(
        wedge_ds, ekeys, on="k", how="semi",
        left_cols=["k", "c", "u", "v"], n_buckets=n_buckets,
    )

    def tri_edges(df: pd.DataFrame) -> pd.DataFrame:
        def canon(x: pd.Series, y: pd.Series) -> pd.DataFrame:
            lo = x.where(x < y, y)
            hi = y.where(x < y, x)
            return pd.DataFrame({"a": lo, "b": hi})

        three = pd.concat(
            [
                pd.DataFrame({"a": df["u"], "b": df["v"]}),
                canon(df["c"], df["u"]),
                canon(df["c"], df["v"]),
            ],
            ignore_index=True,
        )
        out = three.groupby(["a", "b"], as_index=False).size()
        out = out.rename(columns={"size": "cn"})
        out["__b"] = _bucket(
            out["a"].astype(str) + "|" + out["b"].astype(str), n_buckets
        )
        return out

    def cn_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(["a", "b"], as_index=False)[
            "cn"
        ].sum()
        out["cn"] = out["cn"].astype("int64")
        out["k"] = out["a"].astype(str) + "|" + out["b"].astype(str)
        return out[["k", "a", "b", "cn"]]

    closed = (
        tri.map_batches(tri_edges, batch_format="pandas")
        .groupby("__b")
        .map_groups(cn_final, batch_format="pandas")
        .materialize()  # consumed by the anti-join AND the union
    )

    def key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["k"] = df["a"].astype(str) + "|" + df["b"].astype(str)
        return df

    # edges with zero common neighbors must still appear: anti-join
    # the edge set against the closed pairs, union with cn=0
    open_edges = hash_join(
        edges.map_batches(key, batch_format="pandas"),
        closed, on="k", right_on="k", how="anti",
        left_cols=["k", "a", "b"], n_buckets=n_buckets,
    ).map_batches(
        lambda df: df.assign(cn=np.int64(0)), batch_format="pandas"
    )
    all_pairs = closed.union(open_edges)

    j1 = hash_join(
        all_pairs, degrees, on="a", right_on="node",
        left_cols=["a", "b", "cn"], right_cols=["node", "deg"],
        n_buckets=n_buckets,
    )
    j2 = hash_join(
        j1, degrees, on="b", right_on="node",
        left_cols=["a", "b", "cn", "deg"], right_cols=["node", "deg"],
        n_buckets=n_buckets, suffix="_b",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        den = df["deg"] + df["deg_b"] - df["cn"]
        return pd.DataFrame(
            {
                "a": df["a"], "b": df["b"],
                "cn": df["cn"].astype("int64"),
                "deg_a": df["deg"].astype("int64"),
                "deg_b": df["deg_b"].astype("int64"),
                "jac_e6": (df["cn"] * 1_000_000 // den).astype("int64"),
            }
        )

    return j2.map_batches(finish, batch_format="pandas")


def degree_assortativity(
    edges: "ray.data.Dataset", n_buckets: int = 16
) -> pd.DataFrame:
    """Degree-assortativity components of an undirected simple graph
    (DISTINCT canonical (a, b) rows) — do hubs attach to hubs (social
    shape, r > 0) or to leaves (web/KG shape, r < 0)? Every edge is
    taken in BOTH orientations (the standard Newman 2002 convention),
    giving 2m (d_x, d_y) degree pairs; the Pearson correlation over
    them is returned as EXACT int64 components (by symmetry the two
    marginal sums coincide, so one denominator suffices):

        r = num / den,  num = n·Σd_x d_y − (Σd_x)²,
                        den = n·Σd_x²   − (Σd_x)²,   n = 2m

    Single row (n_pairs, sum_x, sum_xy, sum_x2, num, den) — no float
    anywhere, SQL-exact.

    Scale shape: one degree exchange + two node-sized degree joins
    onto the edge stream, then per-batch moment partials summed on
    the driver (5 ints per batch)."""
    edges = edges.repartition(n_buckets).materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([df["a"], df["b"]], ignore_index=True)
        out = both.value_counts().rename_axis("node").reset_index(name="deg")
        out["__b"] = _bucket(out["node"], n_buckets)
        return out

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("node", as_index=False)["deg"].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    degrees = (
        edges.map_batches(deg_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(deg_final, batch_format="pandas")
        .materialize()
    )
    j1 = hash_join(
        edges, degrees, on="a", right_on="node",
        left_cols=["a", "b"], right_cols=["node", "deg"], n_buckets=n_buckets,
    )
    j2 = hash_join(
        j1, degrees, on="b", right_on="node",
        left_cols=["a", "b", "deg"], right_cols=["node", "deg"],
        n_buckets=n_buckets, suffix="_b",
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        dx = df["deg"].to_numpy(dtype=np.int64)
        dy = df["deg_b"].to_numpy(dtype=np.int64)
        # both orientations: x-marginal = y-marginal = deg stream
        return pd.DataFrame(
            {
                "n": [np.int64(2 * len(df))],
                "sx": [np.int64(dx.sum() + dy.sum())],
                "sxy": [np.int64(2 * (dx * dy).sum())],
                "sx2": [np.int64((dx * dx).sum() + (dy * dy).sum())],
            }
        )

    p = j2.map_batches(moments, batch_format="pandas").to_pandas().sum()
    n, sx, sxy, sx2 = (int(p["n"]), int(p["sx"]), int(p["sxy"]), int(p["sx2"]))
    return pd.DataFrame(
        {
            "n_pairs": [np.int64(n)],
            "sum_x": [np.int64(sx)],
            "sum_xy": [np.int64(sxy)],
            "sum_x2": [np.int64(sx2)],
            "num": [np.int64(n * sxy - sx * sx)],
            "den": [np.int64(n * sx2 - sx * sx)],
        }
    )


def neighbor_sample(
    edges: "ray.data.Dataset",
    k: int = 8,
    salt: str = "nbrs",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Deterministic per-node neighbor sampling (the GNN mini-batch
    fan-out primitive, GraphSAGE-style): for every node of an
    undirected simple graph (DISTINCT canonical (a, b) rows), keep its
    ``k`` neighbors with the smallest md5 edge hashes — a pure
    function of the edge set, so a resumed / re-sharded run (and the
    SQL oracle's ``row_number() OVER (ORDER BY hash)``) selects the
    identical subgraph. Returns (node, nbr, rnk) with rnk 1..k.

    Scale shape: per-batch per-node bottom-k combiner over both edge
    orientations (each batch ships ≤ k·nodes_in_batch rows) → ONE
    node-bucketed exchange → per-node merge. Hub nodes never
    concentrate more than k rows downstream — this IS the degree cap
    that makes 2-hop expansion tractable at 100 TB."""
    import hashlib as _h

    def _hash(series: pd.Series) -> np.ndarray:
        return np.fromiter(
            (int(_h.md5(s.encode()).hexdigest()[:15], 16) for s in series),
            dtype=np.int64, count=len(series),
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hkey = (
            salt + ":" + df["a"].astype(str) + "|" + df["b"].astype(str)
        )
        h = _hash(hkey)
        both = pd.DataFrame(
            {
                "node": pd.concat([df["a"], df["b"]], ignore_index=True),
                "nbr": pd.concat([df["b"], df["a"]], ignore_index=True),
                "h": np.concatenate([h, h]),
            }
        )
        out = (
            both.sort_values(["node", "h", "nbr"])
            .groupby("node", as_index=False)
            .head(k)
        )
        hb = pd.util.hash_pandas_object(out["node"], index=False).to_numpy()
        out = out.assign(__b=(hb % np.uint64(n_buckets)).astype(np.int64))
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b").drop_duplicates(["node", "nbr", "h"])
        g = (
            g.sort_values(["node", "h", "nbr"])
            .groupby("node", as_index=False)
            .head(k)
        )
        g["rnk"] = g.groupby("node").cumcount().astype("int64") + 1
        return g[["node", "nbr", "rnk"]]

    return (
        edges.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def _landmark_sigma_dag(
    edges: "ray.data.Dataset",
    landmarks: list[str],
    max_hops: int,
    src: str,
    dst: str,
    n_buckets: int,
):
    """Shared forward half of the landmark-centrality family
    (``path_load``, ``brandes_betweenness``): hop-limited
    multi-landmark BFS over the symmetrized edge set, shortest-path
    DAG build, and per-level shortest-path counts σ — each step a
    ``BlockSet.exchange`` against the once-partitioned pinned
    adjacency (NOTES fact 11 discipline; no Dataset sort barriers
    inside the loop). Returns ``(dist, dag_u_parts, dag_v_parts,
    sig_levels, seed)``: dist = BlockSet (lm, node, hop);
    dag_*_parts = pinned partitionings of the shortest-path DAG edges
    (lm, u, v, hu) by (lm, u) / (lm, v); sig_levels[h] = BlockSet
    (lm, node, sigma) for hop h; seed = the (lm, node) landmark
    frame."""
    from fastie_ray.state.exchange import BlockSet

    _E2 = pd.DataFrame(
        {"lm": pd.Series([], dtype=object),
         "node": pd.Series([], dtype=object)}
    )

    def sym_canon(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or src not in df.columns:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object),
                 "b": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {
                "a": pd.concat([df[src], df[dst]], ignore_index=True),
                "b": pd.concat([df[dst], df[src]], ignore_index=True),
            }
        )

    bs_edges = BlockSet.from_dataset(edges)
    adj_parts = bs_edges.partition(["a"], n_buckets, map_fn=sym_canon)

    seed = pd.DataFrame(
        {"lm": list(landmarks), "node": list(landmarks)}
    ).drop_duplicates()
    seed["hop"] = np.int64(0)
    visited = BlockSet.from_pandas(seed, 1)
    frontier = visited

    def expand(g: pd.DataFrame, eb: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "node" not in g.columns or len(eb) == 0:
            return _E2.copy()
        m = eb.merge(
            g[["lm", "node"]].drop_duplicates(),
            left_on="a", right_on="node",
        )
        return pd.DataFrame(
            {"lm": m["lm"], "node": m["b"]}
        ).drop_duplicates()

    reached = 0
    for h in range(1, max_hops + 1):
        cand = frontier.exchange(
            ["node"], expand, n_buckets=n_buckets, side=adj_parts
        )

        def tag_new(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0 or "lm" not in df.columns:
                out = _E2.copy()
                out["hop"] = pd.Series([], dtype="int64")
                return out
            df = df.copy()
            df["hop"] = np.int64(-1)
            return df

        def merge(g: pd.DataFrame, hop=h) -> pd.DataFrame:
            if len(g) == 0 or "hop" not in g.columns:
                out = _E2.copy()
                out["hop"] = pd.Series([], dtype="int64")
                return out
            old = g[g["hop"] >= 0][["lm", "node", "hop"]]
            new = g[g["hop"] < 0][["lm", "node"]].drop_duplicates()
            new = new.merge(
                old[["lm", "node"]], on=["lm", "node"],
                how="left", indicator=True,
            )
            new = new[new["_merge"] == "left_only"][["lm", "node"]].copy()
            new["hop"] = np.int64(hop)
            out = pd.concat([old, new], ignore_index=True)
            out["hop"] = out["hop"].astype("int64")
            return out

        visited = visited.union(cand.map(tag_new)).exchange(
            ["lm", "node"], merge, n_buckets=n_buckets
        )
        frontier = visited.map(
            lambda df, hop=h: df.loc[df.get("hop", pd.Series([])) == hop,
                                     ["lm", "node"]]
            if len(df) and "hop" in df.columns else _E2.copy()
        )
        n_new = sum(frontier.scalar(len))
        if n_new == 0:
            break
        reached = h

    dist = visited  # (lm, node, hop)
    dist_parts = dist.partition(["lm", "node"], n_buckets)

    _EDAG = pd.DataFrame(
        {"lm": pd.Series([], dtype=object),
         "u": pd.Series([], dtype=object),
         "v": pd.Series([], dtype=object),
         "hu": pd.Series([], dtype="int64")}
    )

    def mk_edges(g: pd.DataFrame, eb: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "node" not in g.columns or len(eb) == 0:
            return _EDAG.copy()
        m = eb.merge(g[["lm", "node", "hop"]], left_on="a",
                     right_on="node")
        return pd.DataFrame(
            {"lm": m["lm"], "u": m["a"], "v": m["b"],
             "hu": m["hop"].astype("int64")}
        )

    e1 = dist.exchange(
        ["node"], mk_edges, n_buckets=n_buckets, side=adj_parts
    )

    def attach_hv(g: pd.DataFrame, db: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "v" not in g.columns or len(db) == 0:
            return _EDAG.copy()
        m = g.merge(
            db[["lm", "node", "hop"]],
            left_on=["lm", "v"], right_on=["lm", "node"],
        )
        m = m[m["hop"] == m["hu"] + 1]
        return m[["lm", "u", "v", "hu"]].reset_index(drop=True)

    dag = e1.exchange(
        ["lm", "v"], attach_hv, n_buckets=n_buckets, side=dist_parts
    )
    dag_u_parts = dag.partition(["lm", "u"], n_buckets)
    dag_v_parts = dag.partition(["lm", "v"], n_buckets)

    _ESIG = pd.DataFrame(
        {"lm": pd.Series([], dtype=object),
         "node": pd.Series([], dtype=object),
         "sigma": pd.Series([], dtype="int64")}
    )

    def sum_sigma(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "sigma" not in g.columns:
            return _ESIG.copy()
        out = g.groupby(["lm", "node"], as_index=False)["sigma"].sum()
        out["sigma"] = out["sigma"].astype("int64")
        return out

    sig0 = seed[["lm", "node"]].copy()
    sig0["sigma"] = np.int64(1)
    sig_prev = BlockSet.from_pandas(sig0, 1)
    sig_levels = [sig_prev]
    for h in range(1, reached + 1):
        def fwd(g: pd.DataFrame, db: pd.DataFrame, hh=h) -> pd.DataFrame:
            if len(g) == 0 or "sigma" not in g.columns or len(db) == 0:
                return _ESIG.copy()
            e = db[db["hu"] == hh - 1]
            if len(e) == 0:
                return _ESIG.copy()
            m = e.merge(
                g, left_on=["lm", "u"], right_on=["lm", "node"]
            )
            out = pd.DataFrame(
                {"lm": m["lm"], "node": m["v"], "sigma": m["sigma"]}
            )
            return out.groupby(
                ["lm", "node"], as_index=False
            )["sigma"].sum()

        part = sig_prev.exchange(
            ["lm", "node"], fwd, n_buckets=n_buckets, side=dag_u_parts
        )
        sig_h = part.exchange(
            ["lm", "node"], sum_sigma, n_buckets=n_buckets
        )
        if sum(sig_h.scalar(len)) == 0:
            break
        sig_levels.append(sig_h)
        sig_prev = sig_h

    return dist, dag_u_parts, dag_v_parts, sig_levels, seed


def path_load(
    edges: "ray.data.Dataset",
    landmarks: list[str],
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Landmark PATH-LOAD centrality — the integer-exact member of the
    Brandes betweenness family: for each landmark s and node v,

        load_s(v) = σ_sv · (1 + D_sv)

    where σ_sv counts shortest s→v paths (hop-limited BFS DAG) and
    D_sv counts DAG path continuations out of v — so load_s(v) is the
    number of shortest-path instances from s (to ANY target within
    ``max_hops``) that pass through or end at v. Summed over
    landmarks: (node, path_load). Unlike betweenness's σ_sv/σ_st
    fractions this stays in int64, so the unrolled SQL oracle matches
    bit-for-bit — same screening use (which nodes carry the traffic),
    none of the float nondeterminism. For the true normalized
    pair-dependency semantics see ``brandes_betweenness``.

    Raw-task shape (NOTES fact 11 discipline): the symmetric adjacency
    is hash-partitioned ONCE by source endpoint and PINNED; BFS, the
    DAG build, the forward-σ sweep and the backward-D sweep are each
    one-or-two ``BlockSet.exchange`` rounds per level against pinned
    sides — no Dataset sort barriers inside the loop. Per-level state
    (labels, σ partials, D partials) is frontier-sized; the adjacency
    never re-ships."""
    from fastie_ray.state.exchange import BlockSet

    dist, dag_u_parts, dag_v_parts, sig_levels, seed = _landmark_sigma_dag(
        edges, landmarks, max_hops, src, dst, n_buckets
    )

    _ED = pd.DataFrame(
        {"lm": pd.Series([], dtype=object),
         "node": pd.Series([], dtype=object),
         "d": pd.Series([], dtype="int64")}
    )

    def sum_d(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "d" not in g.columns:
            return _ED.copy()
        out = g.groupby(["lm", "node"], as_index=False)["d"].sum()
        out["d"] = out["d"].astype("int64")
        return out

    d_prev = BlockSet.from_pandas(_ED.copy(), 1)
    d_levels = []
    for h in range(len(sig_levels) - 2, -1, -1):
        def bwd(g: pd.DataFrame, db: pd.DataFrame, hh=h) -> pd.DataFrame:
            if len(db) == 0:
                return _ED.copy()
            e = db[db["hu"] == hh]
            if len(e) == 0:
                return _ED.copy()
            if len(g) and "d" in g.columns:
                m = e.merge(
                    g, left_on=["lm", "v"], right_on=["lm", "node"],
                    how="left",
                )
                inc = (m["d"].fillna(0) + 1).astype("int64")
            else:
                m = e
                inc = np.ones(len(e), dtype=np.int64)
            out = pd.DataFrame(
                {"lm": m["lm"], "node": m["u"], "d": inc}
            )
            return out.groupby(["lm", "node"], as_index=False)["d"].sum()

        part = d_prev.exchange(
            ["lm", "node"], bwd, n_buckets=n_buckets, side=dag_v_parts
        )
        d_h = part.exchange(["lm", "node"], sum_d, n_buckets=n_buckets)
        d_levels.append(d_h)
        d_prev = d_h

    sig_all = sig_levels[0].union(*sig_levels[1:]) if len(
        sig_levels
    ) > 1 else sig_levels[0]
    if d_levels:
        d_union = d_levels[0].union(*d_levels[1:]) if len(
            d_levels
        ) > 1 else d_levels[0]
        d_parts = d_union.partition(["lm", "node"], n_buckets)
    else:
        d_parts = BlockSet.from_pandas(_ED.copy(), 1).partition(
            ["lm", "node"], n_buckets
        )

    _EOUT = pd.DataFrame(
        {"node": pd.Series([], dtype=object),
         "load": pd.Series([], dtype="int64")}
    )

    def fin(g: pd.DataFrame, db: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "sigma" not in g.columns:
            return _EOUT.copy()
        if len(db) and "d" in db.columns:
            m = g.merge(db, on=["lm", "node"], how="left")
            d = m["d"].fillna(0).astype("int64")
        else:
            m = g
            d = np.zeros(len(g), dtype=np.int64)
        return pd.DataFrame(
            {"node": m["node"],
             "load": (m["sigma"] * (d + 1)).astype("int64")}
        )

    loaded = sig_all.exchange(
        ["lm", "node"], fin, n_buckets=n_buckets, side=d_parts
    )

    def per_node(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "load" not in g.columns:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=object),
                 "path_load": pd.Series([], dtype="int64")}
            )
        out = g.groupby("node", as_index=False)["load"].sum()
        return out.rename(columns={"load": "path_load"}).astype(
            {"path_load": "int64"}
        )

    return loaded.exchange(
        ["node"], per_node, n_buckets=n_buckets
    ).to_dataset()


def brandes_betweenness(
    edges: "ray.data.Dataset",
    landmarks: list[str],
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Landmark betweenness centrality, integer-exact — Brandes via
    explicit pair dependencies. For landmark s and node v ∉ {s}:

        bc_floor_e6(s, v) = Σ_{t ∉ {s, v}} ⌊10⁶ · σ_sv · P(v, t) / σ_st⌋

    where σ_sv counts shortest s→v paths on the hop-limited BFS DAG
    and P(v, t) counts DAG paths v→t, so σ_sv·P(v, t) = σ_st(v) is the
    classic "shortest s→t paths through v" numerator and each term is
    Brandes's pair dependency δ_st(v) = σ_st(v)/σ_st floor-scaled to
    10⁶. Quantizing PER TERM keeps every operation in int64 — exactly
    reproducible in an unrolled SQL oracle, where the float
    δ-accumulation of textbook Brandes (δ(v) = Σ (σ_v/σ_w)(1+δ(w)))
    would inherit summation-order nondeterminism. ``path_load`` is the
    σ·(1+D) un-normalized sibling; this one carries (v, target) pair
    labels backward instead of a scalar continuation count, trading
    state size (pairs-on-DAG, bounded by the hop limit) for true
    normalized dependencies.

    Output: (landmark, node, bc_floor_e6, n_targets) — one row per
    (landmark, node) with at least one valid target. Overflow needs
    10⁶·σ_st > 2⁶³ (σ_st > 9.2e12): unreachable at small hop limits.

    Scale shape: identical to ``path_load`` — adjacency and DAG
    partitioned once and pinned; the backward sweep moves only
    per-level pair state through ``BlockSet.exchange``. The pair table
    is Σ_t |ancestors(t)| rows; the hop limit is the knob that bounds
    it (landmark centrality at 100 TB is always hop-limited)."""
    from fastie_ray.state.exchange import BlockSet

    dist, dag_u_parts, dag_v_parts, sig_levels, seed = _landmark_sigma_dag(
        edges, landmarks, max_hops, src, dst, n_buckets
    )
    del dag_u_parts, seed  # forward-only state

    _EP = pd.DataFrame(
        {"lm": pd.Series([], dtype=object),
         "u": pd.Series([], dtype=object),
         "t": pd.Series([], dtype=object),
         "cnt": pd.Series([], dtype="int64")}
    )

    def seeds_at(h: int) -> "BlockSet":
        def pick(df: pd.DataFrame, hh=h) -> pd.DataFrame:
            if len(df) == 0 or "node" not in df.columns:
                return _EP.copy()
            g = df.loc[df["hop"] == hh, ["lm", "node"]]
            return pd.DataFrame(
                {"lm": g["lm"], "u": g["node"], "t": g["node"],
                 "cnt": np.ones(len(g), dtype=np.int64)}
            )

        return dist.map(pick)

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "cnt" not in g.columns:
            return _EP.copy()
        out = g.groupby(["lm", "u", "t"], as_index=False)["cnt"].sum()
        out["cnt"] = out["cnt"].astype("int64")
        return out

    top = len(sig_levels) - 1
    p_prev = seeds_at(top).exchange(
        ["lm", "u"], sum_pairs, n_buckets=n_buckets
    )
    p_levels = [p_prev]
    for h in range(top - 1, -1, -1):
        def bwd(g: pd.DataFrame, db: pd.DataFrame, hh=h) -> pd.DataFrame:
            if len(g) == 0 or "cnt" not in g.columns or len(db) == 0:
                return _EP.copy()
            e = db[db["hu"] == hh]
            if len(e) == 0:
                return _EP.copy()
            m = e.rename(columns={"u": "pu"}).merge(
                g, left_on=["lm", "v"], right_on=["lm", "u"]
            )
            out = pd.DataFrame(
                {"lm": m["lm"], "u": m["pu"], "t": m["t"], "cnt": m["cnt"]}
            )
            return out.groupby(
                ["lm", "u", "t"], as_index=False
            )["cnt"].sum()

        contrib = p_prev.exchange(
            ["lm", "u"], bwd, n_buckets=n_buckets, side=dag_v_parts
        )
        p_h = contrib.union(seeds_at(h)).exchange(
            ["lm", "u"], sum_pairs, n_buckets=n_buckets
        )
        p_levels.append(p_h)
        p_prev = p_h

    all_pairs = p_levels[0].union(*p_levels[1:]) if len(
        p_levels
    ) > 1 else p_levels[0]

    sig_all = sig_levels[0].union(*sig_levels[1:]) if len(
        sig_levels
    ) > 1 else sig_levels[0]
    sig_parts = sig_all.partition(["lm", "node"], n_buckets)

    _EW = pd.DataFrame(
        {"lm": pd.Series([], dtype=object),
         "u": pd.Series([], dtype=object),
         "t": pd.Series([], dtype=object),
         "cnt": pd.Series([], dtype="int64"),
         "su": pd.Series([], dtype="int64")}
    )

    def att_su(g: pd.DataFrame, sb: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "cnt" not in g.columns or len(sb) == 0:
            return _EW.copy()
        m = g.merge(
            sb[["lm", "node", "sigma"]],
            left_on=["lm", "u"], right_on=["lm", "node"],
        )
        return pd.DataFrame(
            {"lm": m["lm"], "u": m["u"], "t": m["t"],
             "cnt": m["cnt"].astype("int64"),
             "su": m["sigma"].astype("int64")}
        )

    wsu = all_pairs.exchange(
        ["lm", "u"], att_su, n_buckets=n_buckets, side=sig_parts
    )

    _ET = pd.DataFrame(
        {"lm": pd.Series([], dtype=object),
         "u": pd.Series([], dtype=object),
         "term": pd.Series([], dtype="int64")}
    )

    def att_st(g: pd.DataFrame, sb: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "su" not in g.columns or len(sb) == 0:
            return _ET.copy()
        m = g.merge(
            sb[["lm", "node", "sigma"]],
            left_on=["lm", "t"], right_on=["lm", "node"],
        )
        m = m[(m["u"] != m["t"]) & (m["u"] != m["lm"]) & (m["t"] != m["lm"])]
        if len(m) == 0:
            return _ET.copy()
        term = (
            np.int64(1_000_000)
            * m["su"].to_numpy(dtype=np.int64)
            * m["cnt"].to_numpy(dtype=np.int64)
        ) // m["sigma"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"lm": m["lm"], "u": m["u"], "term": term.astype(np.int64)}
        )

    terms = wsu.exchange(
        ["lm", "t"], att_st, n_buckets=n_buckets, side=sig_parts
    )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "term" not in g.columns:
            return pd.DataFrame(
                {"landmark": pd.Series([], dtype=object),
                 "node": pd.Series([], dtype=object),
                 "bc_floor_e6": pd.Series([], dtype="int64"),
                 "n_targets": pd.Series([], dtype="int64")}
            )
        out = g.groupby(["lm", "u"], as_index=False).agg(
            bc_floor_e6=("term", "sum"), n_targets=("term", "size")
        )
        out = out.rename(columns={"lm": "landmark", "u": "node"})
        out["bc_floor_e6"] = out["bc_floor_e6"].astype("int64")
        out["n_targets"] = out["n_targets"].astype("int64")
        return out

    return terms.exchange(
        ["lm", "u"], agg, n_buckets=n_buckets
    ).to_dataset()


def rich_club(
    edges: "ray.data.Dataset",
    ks: list[int] = (2, 4, 8, 16),
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Rich-club census of an undirected simple graph (DISTINCT
    canonical (a, b) rows): for each degree threshold k, how many
    nodes have degree > k and how many edges connect two such nodes —
    the exact integer components of the rich-club coefficient
    φ(k) = 2·E_k / (N_k·(N_k−1)) (do the hubs form their own dense
    club, or spread across the periphery?). Returns
    (k, n_rich, n_rich_edges, n_pairs = N_k·(N_k−1)/2), int64.

    Scale shape: ONE degree exchange, the same two node-sized degree
    joins onto the edge stream as ``degree_assortativity``, then a
    per-batch combiner emits len(ks) counters per batch (the k list is
    a broadcast constant) — the driver merges batches × len(ks)
    ints."""
    from fastie_ray.ops.join import hash_join

    ks = list(ks)
    edges = edges.repartition(n_buckets).materialize()

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.concat([df["a"], df["b"]], ignore_index=True)
        out = both.value_counts().rename_axis("node").reset_index(
            name="deg"
        )
        out["__b"] = _bucket(out["node"], n_buckets)
        return out

    def deg_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("node", as_index=False)[
            "deg"
        ].sum()
        out["deg"] = out["deg"].astype("int64")
        return out

    degrees = (
        edges.map_batches(deg_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(deg_final, batch_format="pandas")
        .materialize()
    )

    def rich_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df["deg"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"k": np.array(ks, dtype=np.int64),
             "n_rich": np.array([(d > k).sum() for k in ks],
                                dtype=np.int64)}
        )

    n_rich = (
        degrees.map_batches(rich_counts, batch_format="pandas")
        .to_pandas()
        .groupby("k", as_index=False)["n_rich"]
        .sum()
    )

    j1 = hash_join(
        edges, degrees, on="a", right_on="node",
        left_cols=["a", "b"], right_cols=["node", "deg"],
        n_buckets=n_buckets,
    )
    j2 = hash_join(
        j1, degrees, on="b", right_on="node",
        left_cols=["a", "b", "deg"], right_cols=["node", "deg"],
        n_buckets=n_buckets, suffix="_b",
    )

    def edge_counts(df: pd.DataFrame) -> pd.DataFrame:
        da = df["deg"].to_numpy(dtype=np.int64)
        db = df["deg_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {"k": np.array(ks, dtype=np.int64),
             "n_rich_edges": np.array(
                 [((da > k) & (db > k)).sum() for k in ks],
                 dtype=np.int64)}
        )

    n_edges = (
        j2.map_batches(edge_counts, batch_format="pandas")
        .to_pandas()
        .groupby("k", as_index=False)["n_rich_edges"]
        .sum()
    )
    out = n_rich.merge(n_edges, on="k", how="left")
    out["n_rich_edges"] = out["n_rich_edges"].fillna(0).astype("int64")
    out["n_pairs"] = (out["n_rich"] * (out["n_rich"] - 1) // 2).astype(
        "int64"
    )
    return out.astype({"k": "int64", "n_rich": "int64"}).sort_values(
        "k"
    ).reset_index(drop=True)
