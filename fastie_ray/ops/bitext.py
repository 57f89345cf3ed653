"""Margin-based bitext mining: find high-confidence translation /
paraphrase pairs between two embedding collections (sides A and B)
using the ratio-margin criterion of Artetxe & Schwenk (2019) — the
CCMatrix / LASER mining recipe:

    margin(x, y) = cos(x, y) / ((avg_x + avg_y) / 2)

where ``avg_x`` is the mean cosine of ``x`` to its k nearest
neighbours in B and ``avg_y`` the mean cosine of ``y`` to its k
nearest in A.  A pair is emitted when ``y`` is the margin-argmax among
``x``'s top-k forward neighbours and the margin clears a threshold.

Scale shape (no reference counterpart; extends the similarity family
of ``ops/similarity.py``):

- **Block-pair exact kNN, both directions in one pass.**  Side A rows
  are routed to ``n_a_blocks`` blocks, side B rows to ``n_b_blocks``, and each
  row is replicated to the opposite side's block axis so every
  (ba, bb) block pair co-locates in ONE exchange.  Each block task
  does a vectorized float64 matmul and emits per-row local top-k
  partials for BOTH directions (A→B and B→A) — the backward averages
  cost no extra pass.  Replication factor is the opposite side's block count and
  chosen small; at 100-TB scale replace the dense block enumeration
  with IVF cell routing (``ops/similarity.ivf_knn``) so each row only
  meets its probed cells — the reductions below are unchanged.
- **Bounded reductions.**  Partials are merged per (direction,
  anchor) — at most ``rows × opposite_blocks × k`` rows ever shuffle,
  never rows².  Forward candidates leave that exchange already
  carrying ``avg_x`` (same group); only ``avg_y`` needs a join, done
  with the task-based ``ops/join.hash_join`` (no Acero actors).
- **Never a driver-side matrix.**  Unlike a broadcast brute-force
  scan, no side is ever materialized on the driver.

Output: one row per accepted source vector —
``(src_id, tgt_id, margin)`` with margin rounded to 4 decimals
(float64 compute; the rounding absorbs summation-order noise).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:
    import ray.data


def _stack(col: pd.Series) -> np.ndarray:
    m = np.stack([np.asarray(v, dtype=np.float64) for v in col])
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(n, 1e-30)


def bitext_mine(
    ds: "ray.data.Dataset",
    id_col: str = "vec_id",
    side_col: str = "side",
    emb_col: str = "embedding",
    k: int = 4,
    margin_thresh: float = 1.0,
    n_a_blocks: int = 2,
    n_b_blocks: int = 2,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Mine margin-best pairs from side ``a`` rows to side ``b`` rows
    of ``ds``.  ``side_col`` must hold the strings ``"a"`` / ``"b"``.
    Returns a driver DataFrame (src_id, tgt_id, margin) sorted by
    src_id — the accepted-pair table is output-sized (≤ |A| rows)."""

    def route(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[id_col, side_col, emb_col]]
        if len(df) == 0:
            out = df.copy()
            out["__blk"] = np.array([], dtype=np.int64)
            return out
        parts = []
        ids = df[id_col].to_numpy()
        is_a = (df[side_col] == "a").to_numpy()
        for rep in range(max(n_a_blocks, n_b_blocks)):
            sub = df.copy()
            own = np.where(is_a, ids % n_a_blocks, ids % n_b_blocks).astype(np.int64)
            if rep < n_b_blocks:
                blk_a = own * n_b_blocks + rep
            else:
                blk_a = np.full(len(df), -1, dtype=np.int64)
            if rep < n_a_blocks:
                blk_b = rep * n_b_blocks + own
            else:
                blk_b = np.full(len(df), -1, dtype=np.int64)
            sub["__blk"] = np.where(is_a, blk_a, blk_b)
            parts.append(sub[sub["__blk"] >= 0])
        return pd.concat(parts, ignore_index=True)

    def block_topk(g: pd.DataFrame) -> pa.Table:
        a = g[g[side_col] == "a"]
        b = g[g[side_col] == "b"]
        cols = {
            "__dir": np.array([], dtype=object),
            "anchor": np.array([], dtype=np.int64),
            "other": np.array([], dtype=np.int64),
            "cos": np.array([], dtype=np.float64),
        }
        if len(a) and len(b):
            ma, mb = _stack(a[emb_col]), _stack(b[emb_col])
            ia = a[id_col].to_numpy(dtype=np.int64)
            ib = b[id_col].to_numpy(dtype=np.int64)
            sim = ma @ mb.T  # |a| × |b| float64
            outs = []
            for dirn, mat, anc, oth in (
                ("f", sim, ia, ib),
                ("b", sim.T, ib, ia),
            ):
                kk = min(k, mat.shape[1])
                idx = np.argpartition(-mat, kk - 1, axis=1)[:, :kk]
                rowi = np.repeat(np.arange(mat.shape[0]), kk)
                outs.append(
                    pd.DataFrame(
                        {
                            "__dir": dirn,
                            "anchor": anc[rowi],
                            "other": oth[idx.ravel()],
                            "cos": mat[rowi, idx.ravel()],
                        }
                    )
                )
            d = pd.concat(outs, ignore_index=True)
            return pa.Table.from_pandas(d, preserve_index=False)
        return pa.table(cols)

    def add_ab(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__ab"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df["__dir"].astype(str) + ":" + df["anchor"].astype(str), index=False
        ).to_numpy()
        df["__ab"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def merge_topk(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["cos", "other"], ascending=[False, True], kind="mergesort")
        # exact global top-k per (dir, anchor): partials are supersets
        g = g.drop_duplicates(["__dir", "anchor", "other"])
        g = g.groupby(["__dir", "anchor"], group_keys=False).head(k)
        avg = g.groupby(["__dir", "anchor"], as_index=False)["cos"].mean()
        avg = avg.rename(columns={"cos": "avg_cos"})
        fwd = g[g["__dir"] == "f"].merge(avg[avg["__dir"] == "f"], on=["__dir", "anchor"])
        cand = pd.DataFrame(
            {
                "kind": "cand",
                "src_id": fwd["anchor"].astype("int64"),
                "tgt_id": fwd["other"].astype("int64"),
                "cos": fwd["cos"],
                "avg_x": fwd["avg_cos"],
            }
        )
        av_b = avg[avg["__dir"] == "b"]
        avy = pd.DataFrame(
            {
                "kind": "avgy",
                "src_id": np.int64(-1),
                "tgt_id": av_b["anchor"].astype("int64"),
                "cos": np.float64(0.0),
                "avg_x": av_b["avg_cos"],
            }
        )
        out = pd.concat([cand, avy], ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    merged = (
        ds.map_batches(route, batch_format="pandas")
        .groupby("__blk")
        .map_groups(block_topk, batch_format="pandas")
        .map_batches(add_ab, batch_format="pandas")
        .groupby("__ab")
        .map_groups(lambda g: merge_topk(g.drop(columns="__ab")), batch_format="pandas")
    ).materialize()  # two consumers below — pin so the matmul pass runs once

    from fastie_ray.ops.join import hash_join

    def _take(kind: str, cols: list[str]):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["kind"] == kind][cols]

        return fn

    cand = merged.map_batches(
        _take("cand", ["src_id", "tgt_id", "cos", "avg_x"]), batch_format="pandas"
    )
    avgy = merged.map_batches(
        _take("avgy", ["tgt_id", "avg_x"]), batch_format="pandas"
    )

    joined = hash_join(
        cand,
        avgy,
        on="tgt_id",
        left_cols=["src_id", "tgt_id", "cos", "avg_x"],
        right_cols=["tgt_id", "avg_x"],
        n_buckets=min(n_buckets, 8),
        suffix="_y",
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "src_id": pd.Series([], dtype="int64"),
                    "tgt_id": pd.Series([], dtype="int64"),
                    "margin": pd.Series([], dtype="float64"),
                }
            )
        denom = (df["avg_x"].to_numpy() + df["avg_x_y"].to_numpy()) / 2.0
        m = df["cos"].to_numpy() / np.maximum(denom, 1e-30)
        out = pd.DataFrame(
            {"src_id": df["src_id"], "tgt_id": df["tgt_id"], "margin": m}
        )
        return out[out["margin"] > margin_thresh]

    scored = joined.map_batches(score, batch_format="pandas")

    # best margin per src: candidate rows for one src share its hash
    # bucket, so the per-group argmax is globally complete.
    def add_sb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__sb"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["src_id"], index=False).to_numpy()
        df["__sb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def best(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(
            ["src_id", "margin", "tgt_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        g = g.drop_duplicates("src_id").drop(columns="__sb")
        g["margin"] = g["margin"].round(4)
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        scored.map_batches(add_sb, batch_format="pandas")
        .groupby("__sb")
        .map_groups(best, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "src_id": pd.Series([], dtype="int64"),
                "tgt_id": pd.Series([], dtype="int64"),
                "margin": pd.Series([], dtype="float64"),
            }
        )
    out["src_id"] = out["src_id"].astype("int64")
    out["tgt_id"] = out["tgt_id"].astype("int64")
    return out.sort_values("src_id").reset_index(drop=True)
