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
    import ray.data

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.concat([df["u"], df["v"]], ignore_index=True),
                "nbr": pd.concat([df["v"], df["u"]], ignore_index=True),
            }
        )

    sym = edges.map_batches(both_dirs, batch_format="pandas")

    # labels: start with comp = node (nodes from the edge list)
    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": df["node"].unique()})
        out["comp"] = out["node"]
        return out

    labels = dedup_exact(
        sym.map_batches(init_labels, batch_format="pandas"), ["node"], n_buckets
    ).materialize()

    for _ in range(max_rounds):
        # comp of each neighbor: join sym(nbr) with labels(node)
        j = sym.join(
            labels,
            join_type="inner",
            num_partitions=n_buckets,
            on=("nbr",),
            right_on=("node",),
            right_suffix="_r",
        )
        # candidate label per node = min(neighbor comps); combiner first

        def partial_min(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("node", as_index=False)["comp"].min()

        cand = j.select_columns(["node", "comp"]).map_batches(
            partial_min, batch_format="pandas"
        )
        merged = labels.union(cand)
        new_labels = (
            merged.map_batches(_bucketize("node", n_buckets), batch_format="pandas")
            .groupby("__b")
            .map_groups(partial_min_grouped, batch_format="pandas")
        ).materialize()
        # converged? (cheap: count of changed labels)
        changed = (
            labels.join(
                new_labels,
                join_type="inner",
                num_partitions=n_buckets,
                on=("node",),
                right_on=("node",),
                right_suffix="_new",
            )
            .map_batches(
                lambda df: pd.DataFrame(
                    {"changed": [int((df["comp"] != df["comp_new"]).sum())]}
                ),
                batch_format="pandas",
            )
            .sum("changed")
        )
        labels = new_labels
        if not changed:
            break
    out = labels.to_pandas()
    return out.rename(columns={"comp": "component_id"})


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


def partial_min_grouped(g: pd.DataFrame) -> pd.DataFrame:
    out = g.groupby("node", as_index=False)["comp"].min()
    out["__b"] = g["__b"].iloc[0] if len(g) else 0
    return out.drop(columns="__b")


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


def component_map(labels: pd.DataFrame) -> dict[str, str]:
    """entity node → component id (surface nodes dropped; component ids
    re-keyed to the smallest member entity id when one exists)."""
    ents = labels[labels["node"].str.startswith("e:")]
    # canonical component id: min entity id in the component, else the label
    min_ent = ents.groupby("component_id")["node"].min().to_dict()
    return {
        row.node[2:]: min_ent.get(row.component_id, row.component_id)[2:]
        for row in ents.itertuples()
    }
