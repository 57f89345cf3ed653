"""Distributed decision-stump split search — the inner loop of every
tree learner (GBDT node split, boosting round, feature screening) as a
Ray Data exchange. Binary label, integer features; everything is
count-exact so a SQL oracle reproduces the search bit-for-bit.

For each feature f and candidate threshold t (the feature's distinct
values): split into x ≤ t (left) / x > t (right) and take the better
of the two polarities,

    errA(t) = L0 + R1   (left → 1, right → 0)
    errB(t) = L1 + R0   (left → 0, right → 1)

with L1/L0 the label-1/label-0 counts on the left (cumulative counts
over the value-ordered histogram — never the rows). The reported best
split per feature minimizes (err, t) with polarity A preferred on
ties — a total order, deterministic.

Scale shape: per-batch (feature, value, n1, n0) histogram combiner →
ONE feature-bucketed exchange → per-feature cumulative scan + argmin
over its value histogram (feature-cardinality-sized state, never
row-sized). The classic "histogram aggregation" trick of distributed
GBDT (XGBoost/LightGBM approx mode) with exact integer counts.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def best_stump(
    ds: "ray.data.Dataset",
    feature_cols: list[str],
    label_col: str,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """One row per feature:
    (feature, threshold, polarity, err, n_left, n_total) — the best
    ``x ≤ threshold`` split. ``polarity`` is 'le_pos' (left → 1) or
    'le_neg'. Features and label must be integer-typed (raises
    otherwise: float thresholds would not be SQL-portable)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not pd.api.types.is_integer_dtype(df[label_col]):
            raise TypeError(f"label {label_col!r} must be integer 0/1")
        frames = []
        y = df[label_col].to_numpy(dtype=np.int64)
        for f in feature_cols:
            if not pd.api.types.is_integer_dtype(df[f]):
                raise TypeError(
                    f"feature {f!r} must be integer-typed (scale floats "
                    f"upstream, e.g. floor(x * 1e6))"
                )
            g = (
                pd.DataFrame({"v": df[f].to_numpy(dtype=np.int64), "y": y})
                .groupby("v", as_index=False)
                .agg(n1=("y", "sum"), n=("y", "size"))
            )
            g["n0"] = g["n"] - g["n1"]
            g["feature"] = f
            frames.append(g[["feature", "v", "n1", "n0"]])
        out = pd.concat(frames, ignore_index=True)
        h = pd.util.hash_pandas_object(out["feature"], index=False).to_numpy()
        out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.drop(columns="__b")
            .groupby(["feature", "v"], as_index=False)
            .agg(n1=("n1", "sum"), n0=("n0", "sum"))
        )
        rows = []
        for f, sub in g.groupby("feature", sort=True):
            sub = sub.sort_values("v")
            tot1 = int(sub["n1"].sum())
            tot0 = int(sub["n0"].sum())
            l1 = sub["n1"].cumsum().to_numpy(dtype=np.int64)
            l0 = sub["n0"].cumsum().to_numpy(dtype=np.int64)
            err_a = l0 + (tot1 - l1)  # left → 1, right → 0
            err_b = l1 + (tot0 - l0)  # left → 0, right → 1
            err = np.minimum(err_a, err_b)
            i = int(np.argmin(err))  # first minimum: smallest threshold
            pol = "le_pos" if err_a[i] <= err_b[i] else "le_neg"
            rows.append(
                (f, int(sub["v"].iloc[i]), pol, int(err[i]),
                 int(l1[i] + l0[i]), tot1 + tot0)
            )
        return pd.DataFrame(
            rows,
            columns=["feature", "threshold", "polarity", "err",
                     "n_left", "n_total"],
        ).astype({"threshold": "int64", "err": "int64",
                  "n_left": "int64", "n_total": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def greedy_tree(
    ds: "ray.data.Dataset",
    feature_cols: list[str],
    label_col: str,
    depth: int = 2,
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Greedy depth-``depth`` CART tree over integer features and a
    binary label — the full iterative extension of ``best_stump``:
    one histogram exchange PER LEVEL keyed on (leaf, feature, value),
    with the level's chosen splits broadcast back into the next
    level's row→leaf assignment (a dict of ≤ 2^level entries — the
    model is always driver-sized, the data never is).

    Node split = argmin over (err, feature, threshold) of the
    misclassification count with the better polarity (ties: polarity A
    'le_pos' preferred) — a total order, so the tree is a pure
    function of the data and the SQL oracle grows one unrolled CTE
    block per node. Leaves with < 2 distinct (feature, value) rows or
    err 0 stop early.

    Returns one row per internal node:
    (node, feature, threshold, polarity, err, n_node, n_left), node
    addressed by its path string ('' root, then 'L'/'R' appended)."""

    splits: dict[str, tuple[str, int, str]] = {}
    out_rows: list[tuple] = []

    for _level in range(depth):
        frozen = dict(splits)  # level-consistent broadcast

        def partial(df: pd.DataFrame, frozen=frozen) -> pd.DataFrame:
            node = pd.Series("", index=df.index, dtype=object)
            # replay splits level by level (path length == level)
            for lvl in range(depth):
                for path, (f, thr, _p) in frozen.items():
                    if len(path) != lvl:
                        continue
                    at = node == path
                    if at.any():
                        side = np.where(df.loc[at, f] <= thr, "L", "R")
                        node.loc[at] = path + pd.Series(
                            side, index=df.index[at]
                        )
            y = df[label_col].to_numpy(dtype=np.int64)
            frames = []
            for f in feature_cols:
                g = (
                    pd.DataFrame(
                        {"node": node.to_numpy(),
                         "v": df[f].to_numpy(dtype=np.int64), "y": y}
                    )
                    .groupby(["node", "v"], as_index=False)
                    .agg(n1=("y", "sum"), n=("y", "size"))
                )
                g["n0"] = g["n"] - g["n1"]
                g["feature"] = f
                frames.append(g[["node", "feature", "v", "n1", "n0"]])
            out = pd.concat(frames, ignore_index=True)
            h = pd.util.hash_pandas_object(
                out["node"] + "|" + out["feature"], index=False
            ).to_numpy()
            out["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
            return out

        def feat_best(g: pd.DataFrame) -> pd.DataFrame:
            g = (
                g.drop(columns="__b")
                .groupby(["node", "feature", "v"], as_index=False)
                .agg(n1=("n1", "sum"), n0=("n0", "sum"))
            )
            rows = []
            for (node, f), sub in g.groupby(["node", "feature"], sort=True):
                sub = sub.sort_values("v")
                tot1 = int(sub["n1"].sum())
                tot0 = int(sub["n0"].sum())
                if len(sub) < 2:
                    continue  # nothing to split on
                l1 = sub["n1"].cumsum().to_numpy(dtype=np.int64)
                l0 = sub["n0"].cumsum().to_numpy(dtype=np.int64)
                err_a = l0 + (tot1 - l1)
                err_b = l1 + (tot0 - l0)
                err = np.minimum(err_a, err_b)
                i = int(np.argmin(err))
                pol = "le_pos" if err_a[i] <= err_b[i] else "le_neg"
                rows.append(
                    (node, f, int(sub["v"].iloc[i]), pol, int(err[i]),
                     tot1 + tot0, int(l1[i] + l0[i]))
                )
            return pd.DataFrame(
                rows, columns=["node", "feature", "threshold", "polarity",
                               "err", "n_node", "n_left"],
            )

        cand = (
            ds.map_batches(partial, batch_format="pandas")
            .groupby("__b")
            .map_groups(feat_best, batch_format="pandas")
            .to_pandas()
        )
        if len(cand) == 0:
            break
        # per-node argmin over (err, feature, threshold)
        cand = cand.sort_values(
            ["node", "err", "feature", "threshold"]
        ).groupby("node", as_index=False).head(1)
        grew = False
        for r in cand.itertuples(index=False):
            if len(r.node) != _level:
                continue  # a leaf that stopped earlier
            splits[r.node] = (r.feature, int(r.threshold), r.polarity)
            out_rows.append(
                (r.node, r.feature, int(r.threshold), r.polarity,
                 int(r.err), int(r.n_node), int(r.n_left))
            )
            grew = True
        if not grew:
            break

    out = pd.DataFrame(
        out_rows,
        columns=["node", "feature", "threshold", "polarity", "err",
                 "n_node", "n_left"],
    ).astype({"threshold": "int64", "err": "int64", "n_node": "int64",
              "n_left": "int64"})
    return out.sort_values("node").reset_index(drop=True)
