"""Distributed k-means (Lloyd's) over an embedding column — the
topic-clustering / corpus-bucketing step of a training-data pipeline
(engine-side addition; no reference counterpart).

Shape for 100-TB inputs:
- centroids are tiny (k × dim) and DRIVER-RESIDENT by construction of
  Lloyd's — each iteration broadcasts them via closure capture and
  reduces k partial (count, sum-vector) rows per batch on the driver:
  no shuffle at any point, one streaming pass over the corpus per
  iteration;
- the per-batch kernel is one numpy matmul (‖x‖² − 2x·Cᵀ + ‖c‖²),
  never a Python loop over rows;
- assignment is deterministic: float64 accumulation, ties broken by
  the lowest centroid id — reproducible against a DuckDB
  ``list_distance`` oracle for the assign step.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def _batch_matrix(df: pd.DataFrame, vec_col: str) -> np.ndarray:
    return np.array(list(df[vec_col]), dtype=np.float64)


def smallest_k_rows(
    ds: "ray.data.Dataset", k: int, id_col: str = "vec_id"
) -> pd.DataFrame:
    """The k rows with the smallest ids, without a global sort:
    per-batch local head-k (combiner) → driver merge of the
    ``n_batches × k`` candidates."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(id_col).head(k)

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    return cand.sort_values(id_col).head(k).reset_index(drop=True)


def init_centroids(
    ds: "ray.data.Dataset",
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic init: the embeddings of the k smallest ids
    (SQL-reproducible: ``ORDER BY vec_id LIMIT k``). Returns
    (centroid_ids, centroid_matrix)."""
    rows = smallest_k_rows(ds, k, id_col)
    return rows[id_col].to_numpy(), _batch_matrix(rows, vec_col)


def _assign(x: np.ndarray, cents: np.ndarray) -> np.ndarray:
    # squared distances via one matmul; argmin takes the FIRST minimum,
    # so with centroids sorted by id the tie-break is lowest-id
    d = (x * x).sum(1)[:, None] - 2.0 * (x @ cents.T) + (cents * cents).sum(1)[None, :]
    return d.argmin(1)


def kmeans_assign(
    ds: "ray.data.Dataset",
    centroid_ids: np.ndarray,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """(id, cluster_id) assignment of every row to its nearest centroid;
    ``cluster_id`` is the centroid's id, not its index."""
    order = np.argsort(centroid_ids, kind="stable")
    cids = np.ascontiguousarray(centroid_ids[order])
    cents = np.ascontiguousarray(centroids[order])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({id_col: [], "cluster_id": []})
        a = _assign(_batch_matrix(df, vec_col), cents)
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(),
                "cluster_id": cids[a],
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


def kmeans_fit(
    ds: "ray.data.Dataset",
    k: int,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-9,
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd's iterations; returns (centroid_ids, centroids). Each
    round is one streaming pass emitting k partial (count, sum) rows
    per batch; the driver reduce touches ``k × n_batches`` rows.
    Empty clusters keep their previous centroid. ``centroid_ids``
    stay the INITIAL ids (stable cluster naming across iterations).
    Stops early when the max squared centroid shift drops below
    ``tol`` (a free driver-side check — at any scale each avoided
    iteration is a whole corpus pass). The corpus is deliberately NOT
    materialized between iterations: at target scale pinning it in the
    object store would spill; re-streaming the pruned columns is the
    cheaper side of the trade."""
    cids, cents = init_centroids(ds, k, id_col, vec_col)
    order = np.argsort(cids, kind="stable")
    cids, cents = cids[order], cents[order]
    dim = cents.shape[1]

    for _ in range(iters):
        frozen = cents.copy()

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame({"c": [], "n": [], "s": []})
            x = _batch_matrix(df, vec_col)
            a = _assign(x, frozen)
            out_c, out_n, out_s = [], [], []
            for j in np.unique(a):
                m = a == j
                out_c.append(int(j))
                out_n.append(int(m.sum()))
                out_s.append(x[m].sum(0))
            return pd.DataFrame({"c": out_c, "n": out_n, "s": out_s})

        parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        # deterministic reduce order regardless of block arrival
        parts = parts.sort_values(["c", "n"], kind="stable")
        for c, n, s in zip(parts["c"], parts["n"], parts["s"]):
            counts[int(c)] += int(n)
            sums[int(c)] += np.asarray(s, dtype=np.float64)
        nonempty = counts > 0
        new_cents = np.where(
            nonempty[:, None], sums / np.maximum(counts, 1)[:, None], cents
        )
        shift = float(((new_cents - cents) ** 2).sum(1).max())
        cents = new_cents
        if shift < tol:
            break
    return cids, cents


def kmeans_cluster_sizes(
    ds: "ray.data.Dataset",
    k: int,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tol: float = 1e-9,
) -> pd.DataFrame:
    """Full k-means → (cluster_id, n_members) summary (one extra
    assignment pass with a per-batch count combiner)."""
    cids, cents = kmeans_fit(ds, k, iters, id_col, vec_col, tol=tol)
    assigned = kmeans_assign(ds, cids, cents, id_col, vec_col)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("cluster_id", as_index=False).agg(n_members=(id_col, "count"))

    parts = assigned.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("cluster_id", as_index=False)["n_members"].sum()
    out["n_members"] = out["n_members"].astype("int64")
    return out.sort_values("cluster_id").reset_index(drop=True)


def kmeans_assign_frozen_int(
    ds: "ray.data.Dataset",
    int_centroids: "list[list[int]] | np.ndarray",
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Assignment against FROZEN integer-grid centroids — the
    SQL-oracle-able inference half of Lloyd's, split the way
    ``bpe_encode_apply`` splits BPE (VERDICT r3 #3): the trained float
    centroids are quantized once to ``floor(scale * c)`` int64 and
    pinned as literals; every row embedding is quantized the same way
    at assign time, so distances are exact integers and the argmin
    (ties → lowest centroid index) is bit-reproducible in DuckDB.

    ``cluster_id`` is the centroid's INDEX in ``int_centroids`` (the
    frozen table defines the naming). Broadcast-only — the centroid
    matrix rides the closure, one streaming pass, no shuffle."""
    cents = np.asarray(int_centroids, dtype=np.int64)
    c2 = (cents * cents).sum(1)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"),
                 "cluster_id": pd.Series([], dtype="int64")}
            )
        x = np.floor(_batch_matrix(df, vec_col) * float(scale)).astype(np.int64)
        # integer squared distance; argmin takes the FIRST minimum →
        # lowest centroid index on ties, matching ORDER BY dist, cid
        d = (x * x).sum(1)[:, None] - 2 * (x @ cents.T) + c2[None, :]
        return pd.DataFrame(
            {id_col: df[id_col].to_numpy(), "cluster_id": d.argmin(1).astype(np.int64)}
        )

    return ds.map_batches(assign, batch_format="pandas")


def kcenter_coreset(
    ds: "ray.data.Dataset",
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
) -> pd.DataFrame:
    """Greedy k-center coreset selection (Gonzalez farthest-first) —
    the diversity-sampling pass of embedding curation: pick the
    min-id vector, then k-1 times the vector FARTHEST from the chosen
    set (squared-euclidean; ties by smallest id).

    Integer-exact: vectors are scaled to ``floor(scale * x)`` int64
    grids first, so distances are exact integers and the argmax is
    reproducible in an unrolled SQL oracle (float reductions would be
    order-dependent).

    Scale shape per iteration: ONE streaming pass updates the running
    min-distance-to-set column against the newest center (broadcast —
    one vector), and a per-batch local argmax reduces to
    ``n_blocks`` candidate rows merged on the driver. The
    (id, intvec, mind) state table is materialized per iteration —
    corpus-row-sized but narrow, exactly the PageRank rank-table
    pattern. No shuffle anywhere.

    Returns a k-row DataFrame (rank, vec_id, dist) where ``dist`` is
    the max-min distance at pick time (rank 0 → 0)."""
    import ray.data  # noqa: F401

    def to_int(df: pd.DataFrame) -> pd.DataFrame:
        m = np.floor(
            scale * np.stack(df[vec_col].to_numpy()).astype(np.float64)
        ).astype(np.int64)
        return pd.DataFrame({id_col: df[id_col].astype("int64"), "v": list(m)})

    iv = ds.map_batches(to_int, batch_format="pandas").materialize()

    first_id = int(iv.min(id_col))
    c0 = (
        iv.filter(lambda r, fid=first_id: r[id_col] == fid)
        .take(1)[0]["v"]
    )
    center = np.asarray(c0, dtype=np.int64)
    picks = [(0, first_id, 0)]

    # state: (id, v, mind); mind vs the chosen set so far
    state = None
    for rank in range(1, k):
        cvec = center  # rebound per iteration for the closure

        def update(df: pd.DataFrame, cvec=cvec) -> pd.DataFrame:
            m = np.stack(df["v"].to_numpy()).astype(np.int64)
            d = ((m - cvec) ** 2).sum(axis=1)
            if "mind" in df.columns:
                d = np.minimum(d, df["mind"].to_numpy(dtype=np.int64))
            out = pd.DataFrame(
                {id_col: df[id_col], "v": df["v"], "mind": d.astype(np.int64)}
            )
            return out

        state = (state if state is not None else iv).map_batches(
            update, batch_format="pandas"
        ).materialize()

        def local_best(df: pd.DataFrame) -> pd.DataFrame:
            i = np.lexsort((df[id_col].to_numpy(), -df["mind"].to_numpy()))[0]
            return df.iloc[[i]]

        cands = state.map_batches(local_best, batch_format="pandas").to_pandas()
        best = cands.sort_values(["mind", id_col], ascending=[False, True]).iloc[0]
        picks.append((rank, int(best[id_col]), int(best["mind"])))
        center = np.asarray(best["v"], dtype=np.int64)

    return pd.DataFrame(picks, columns=["rank", id_col, "dist"]).astype("int64")
