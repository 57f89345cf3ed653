"""Distributed linear-classifier training over hashed text features —
the data-parallel training loop of the curation stack (quality / domain
classifiers are trained exactly like this at corpus scale: fastText-
style hashed features, full-batch updates, gradient all-reduce).

Integer-exact full-batch perceptron so the iterative algorithm is
reproducible bit-for-bit in an unrolled SQL oracle (the PageRank
pattern, one CTE group per iteration):

- features: bigrams hashed into ``n_features`` md5 buckets
  (``ops.dsir`` feature space); per doc, integer bucket counts;
- labels: ``y ∈ {+1, -1}`` from a caller column;
- iteration t: ``score(d) = Σ_b cnt(d,b) · w_t[b]``; docs with
  ``y · score <= 0`` violate; ``w_{t+1} = w_t + Σ_violations y · cnt``
  (lr = 1, integer weights forever).

The gradient is a SUM of per-doc integer vectors — order-independent,
so the cross-partition reduce is exact no matter how Ray schedules it
(a float SGD loop would not be; and *sequential* SGD is inherently
serial — full-batch is the honest data-parallel formulation).

Scale shape: the (doc, bucket, cnt, y) feature table is built ONCE and
materialized (bigram-bounded rows, narrow ints); each iteration is one
streaming pass — broadcast w (``n_features`` ints via closure capture
of a driver array), per-batch local gradient partial (numpy bincount),
driver adds ``n_blocks`` partial vectors. No shuffle at any point.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.dsir import _feature_buckets
from fastie_ray.ops.lm_filter import _doc_bigrams

if TYPE_CHECKING:
    import ray.data


def feature_table(
    ds: "ray.data.Dataset",
    label_col: str,
    n_features: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(doc, y, bucket, cnt) hashed-bigram feature rows; docs without
    bigrams contribute nothing (no feature evidence)."""

    def feats(df: pd.DataFrame) -> pd.DataFrame:
        big = _doc_bigrams(df, text_col, id_col)
        if len(big) == 0:
            return pd.DataFrame(
                {
                    "doc": pd.Series([], dtype="int64"),
                    "y": pd.Series([], dtype="int64"),
                    "bucket": pd.Series([], dtype="int64"),
                    "cnt": pd.Series([], dtype="int64"),
                }
            )
        b = pd.DataFrame(
            {
                "doc": big["doc"].to_numpy(),
                "bucket": _feature_buckets(big["bigram"], n_features),
            }
        )
        out = b.groupby(["doc", "bucket"], as_index=False).agg(cnt=("bucket", "count"))
        ymap = dict(zip(df[id_col], df[label_col].astype("int64")))
        out["y"] = out["doc"].map(ymap).astype("int64")
        return out[["doc", "y", "bucket", "cnt"]].astype("int64")

    return ds.map_batches(feats, batch_format="pandas")


def perceptron_train(
    ds: "ray.data.Dataset",
    label_col: str,
    n_iter: int = 3,
    n_features: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """Full-batch integer perceptron; returns the final weight table
    (bucket, weight). Callers needing diagnostics (violation counts,
    accuracy) re-score with the returned weights via
    ``perceptron_score``."""
    feats = feature_table(
        ds, label_col, n_features=n_features, text_col=text_col, id_col=id_col
    ).materialize()

    w = np.zeros(n_features, dtype=np.int64)
    for _ in range(n_iter):
        w_t = w.copy()

        def grad_partial(df: pd.DataFrame, w_t=w_t) -> pd.DataFrame:
            if len(df) == 0:
                return pd.DataFrame(
                    {
                        "bucket": pd.Series([], dtype="int64"),
                        "g": pd.Series([], dtype="int64"),
                    }
                )
            score = df["cnt"].to_numpy() * w_t[df["bucket"].to_numpy()]
            s = df.assign(sc=score).groupby("doc").agg(
                y=("y", "first"), total=("sc", "sum")
            )
            viol = s[s["y"] * s["total"] <= 0].index
            v = df[df["doc"].isin(viol)]
            if len(v) == 0:
                return pd.DataFrame(
                    {
                        "bucket": pd.Series([], dtype="int64"),
                        "g": pd.Series([], dtype="int64"),
                    }
                )
            g = np.bincount(
                v["bucket"].to_numpy(),
                weights=(v["y"] * v["cnt"]).to_numpy(),
                minlength=len(w_t),
            ).astype(np.int64)
            nz = np.nonzero(g)[0]
            return pd.DataFrame({"bucket": nz.astype("int64"), "g": g[nz]})

        # batch_size=None → whole blocks: a doc's feature rows were
        # emitted together by one feature_table task and must not be
        # re-sliced mid-doc (the violation test is per-doc)
        parts = feats.map_batches(
            grad_partial, batch_format="pandas", batch_size=None
        ).to_pandas()
        if len(parts):
            upd = parts.groupby("bucket")["g"].sum()
            w[upd.index.to_numpy()] += upd.to_numpy(dtype=np.int64)

    return pd.DataFrame(
        {"bucket": np.arange(n_features, dtype=np.int64), "weight": w}
    )


def perceptron_score(
    ds: "ray.data.Dataset",
    weights: np.ndarray,
    n_features: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Inference pass for a trained integer linear model: per doc,
    ``score = Σ cnt(b) · w[b]`` and ``pred = 1 if score > 0 else -1``.
    Streaming and exchange-free; the weight vector ships in the
    closure (``n_features`` ints). Docs without bigrams are dropped
    (no feature evidence), matching training."""
    w = np.asarray(weights, dtype=np.int64)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        big = _doc_bigrams(df, text_col, id_col)
        if len(big) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="int64"),
                    "pred": pd.Series([], dtype="int64"),
                }
            )
        b = _feature_buckets(big["bigram"], len(w))
        out = (
            pd.DataFrame({id_col: big["doc"].to_numpy(), "s": w[b]})
            .groupby(id_col, as_index=False)["s"]
            .sum()
            .rename(columns={"s": "score"})
        )
        out["pred"] = np.where(out["score"].to_numpy() > 0, 1, -1)
        return out.astype({id_col: "int64", "score": "int64", "pred": "int64"})

    return ds.map_batches(score, batch_format="pandas")


def grouped_ols(
    ds: "ray.data.Dataset",
    xy_fn,
    round_dp: int = 4,
) -> pd.DataFrame:
    """Per-group simple linear regression (slope + intercept) from
    SUFFICIENT STATISTICS — the distributed-OLS shape: each batch
    contributes five numbers per group (n, Σx, Σy, Σxy, Σx²), partials
    merge by sum (bounded by the group domain, the bounded-small-side
    pattern), and the driver solves the 1-D normal equations. One pass,
    no shuffle; the trend-monitoring / drift-detection statistic of a
    pipeline observability layer.

    ``xy_fn(batch: pd.DataFrame) -> pd.DataFrame`` with columns
    (group, x, y). Center x near the data (e.g. days since a fixed
    epoch) — the caller owns the scale; sufficient-statistic
    cancellation is benign for centered x.

    SQL oracle: ``regr_slope(y, x)`` / ``regr_intercept(y, x)`` per
    group, both rounded to ``round_dp``."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = xy_fn(df)
        if len(p) == 0:
            return pd.DataFrame(
                {"group": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64"),
                 "sx": pd.Series([], dtype="float64"),
                 "sy": pd.Series([], dtype="float64"),
                 "sxy": pd.Series([], dtype="float64"),
                 "sxx": pd.Series([], dtype="float64")}
            )
        p = p.assign(xy=p["x"] * p["y"], xx=p["x"] * p["x"])
        g = p.groupby("group", as_index=False).agg(
            n=("x", "count"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"),
        )
        g["n"] = g["n"].astype("int64")
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(
            {"group": pd.Series([], dtype=object),
             "slope": pd.Series([], dtype="float64"),
             "intercept": pd.Series([], dtype="float64")}
        )
    s = parts.groupby("group", as_index=False).sum()
    n = s["n"].to_numpy(dtype=np.float64)
    den = n * s["sxx"].to_numpy() - s["sx"].to_numpy() ** 2
    slope = np.where(
        den != 0, (n * s["sxy"].to_numpy() - s["sx"].to_numpy() * s["sy"].to_numpy()) / den, 0.0
    )
    intercept = (s["sy"].to_numpy() - slope * s["sx"].to_numpy()) / n
    out = pd.DataFrame(
        {"group": s["group"], "slope": np.round(slope, round_dp),
         "intercept": np.round(intercept, round_dp)}
    )
    return out.sort_values("group").reset_index(drop=True)


def uncertainty_sample(
    scored: "ray.data.Dataset",
    k: int,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> pd.DataFrame:
    """Active-learning acquisition: the ``k`` rows the model is LEAST
    sure about — smallest |score| (margin), ties by id. Per-batch local
    bottom-k combiner, driver merges blocks × k candidates; no
    exchange. The standard label-budget allocator for classifier-
    curated corpora (label what the filter can't decide)."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[id_col, score_col]].copy()
        out["margin"] = out[score_col].abs().astype("int64")
        return out.sort_values(["margin", id_col]).head(k)

    cand = scored.map_batches(local, batch_format="pandas").to_pandas()
    out = cand.sort_values(["margin", id_col]).head(k)
    out[score_col] = out[score_col].astype("int64")
    return out.reset_index(drop=True)

def cuped_adjust(
    ds: "ray.data.Dataset",
    arm_col: str = "arm",
    x_col: str = "x",
    y_col: str = "y",
) -> pd.DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al., WSDM'13 — the
    standard experimentation-platform adjustment): per experiment arm,
    the covariate-adjusted mean

        adj_a = Ȳ_a − θ·(X̄_a − X̄)      θ = cov(X, Y) / var(X)

    over per-UNIT integer metrics (X = pre-period covariate, Y =
    experiment metric, e.g. cents) — pooled θ, as in production CUPED.

    Everything is EXACT integer arithmetic on sufficient statistics:
    one per-batch (arm → n, Σx, Σy, Σx², Σxy) combiner, an arm-domain
    driver merge (fixed width — nothing row-sized moves), then
    Python bigints build the single-fraction numerator/denominator

        adj_a = [Σy_a·V·n − C·(Σx_a·n − Σx·n_a)] / (n_a·n·V)
        C = n·Σxy − Σx·Σy,   V = n·Σx² − (Σx)²

    scaled 1e6 with TRUNCATING division (SQL's ``//`` truncates toward
    zero on negatives, unlike Python's floor — matched explicitly so a
    negative θ or adjustment reproduces bit-for-bit in HUGEINT).
    Returns (arm, n, mean_y_e6, adj_mean_e6, theta_e6); V = 0
    (constant covariate) degrades to θ = 0 = no adjustment."""

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a < 0) == (b < 0) else -q

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "arm": df[arm_col],
                "x": df[x_col].astype("int64"),
                "y": df[y_col].astype("int64"),
            }
        )
        g["xx"] = g["x"] * g["x"]
        g["xy"] = g["x"] * g["y"]
        out = g.groupby("arm", as_index=False).agg(
            n=("x", "count"), sx=("x", "sum"), sy=("y", "sum"),
            sxx=("xx", "sum"), sxy=("xy", "sum"),
        )
        return out

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    arms = parts.groupby("arm", as_index=False).sum()
    n = int(arms["n"].sum())
    sx = int(arms["sx"].sum())
    sy = int(arms["sy"].sum())
    sxx = int(arms["sxx"].sum())
    sxy = int(arms["sxy"].sum())
    cov_num = n * sxy - sx * sy
    var_num = n * sxx - sx * sx
    theta_e6 = tdiv(cov_num * 1_000_000, var_num) if var_num else 0
    rows = []
    for r in arms.itertuples():
        na, sxa, sya = int(r.n), int(r.sx), int(r.sy)
        mean_y_e6 = tdiv(sya * 1_000_000, na)
        if var_num:
            num = sya * var_num * n - cov_num * (sxa * n - sx * na)
            den = na * n * var_num
            adj_e6 = tdiv(num * 1_000_000, den)
        else:
            adj_e6 = mean_y_e6
        rows.append((r.arm, na, mean_y_e6, adj_e6, theta_e6))
    out = pd.DataFrame(
        rows, columns=["arm", "n", "mean_y_e6", "adj_mean_e6", "theta_e6"]
    ).sort_values("arm").reset_index(drop=True)
    for c in ("n", "mean_y_e6", "adj_mean_e6", "theta_e6"):
        out[c] = out[c].astype("int64")
    return out

def theil_sen_slope(
    ds: "ray.data.Dataset",
    group_col: str = "g",
    x_col: str = "x",
    y_col: str = "y",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-group Theil-Sen ROBUST trend — the median of all pairwise
    slopes (y_j−y_i)/(x_j−x_i), x_i < x_j — the outlier-immune
    companion to ``grouped_ols`` (one wild day cannot flip the sign,
    unlike least squares; breakdown point 29%).

    Contract: feed PRE-AGGREGATED per-(group, x) points (e.g. daily
    totals — the ``trend_by_type`` shape), so per-group volume is
    calendar-bounded and the in-task O(n²) pair enumeration is safe; a
    single group-bucketed exchange co-locates each group. Slopes are
    integer slope_e6 = trunc(Δy·10⁶ / Δx) (TRUNCATING division — SQL
    ``//`` semantics on negative Δy), median with quantile_disc
    semantics (smallest value with cum count ≥ ⌈n/2⌉). Duplicate-x
    pairs are skipped, as in the classic estimator. Returns
    (group, n_pairs, slope_e6)."""

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                group_col: df[group_col],
                "x": df[x_col].astype("int64"),
                "y": df[y_col].astype("int64"),
            }
        )
        # combiner: collapse duplicate (group, x) by summing y so the
        # exchange ships at most group×x-domain rows
        return out.groupby([group_col, "x"], as_index=False)["y"].sum()

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df[group_col], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.drop(columns="__b")
            .groupby([group_col, "x"], as_index=False)["y"]
            .sum()
            .sort_values([group_col, "x"])
        )
        rows = []
        for key, grp in g.groupby(group_col, sort=False):
            x = grp["x"].to_numpy(dtype=np.int64)
            y = grp["y"].to_numpy(dtype=np.int64)
            i, j = np.triu_indices(len(x), k=1)
            dx = x[j] - x[i]
            dy = y[j] - y[i]
            ok = dx != 0
            dx, dy = dx[ok], dy[ok]
            if len(dx) == 0:
                continue
            # truncating division matching SQL // on negative dy
            q = np.abs(dy) * 1_000_000 // np.abs(dx)
            slopes = np.where(np.sign(dy) * np.sign(dx) < 0, -q, q)
            slopes.sort()
            k = -(-len(slopes) // 2)  # ceil(n/2)
            rows.append((key, len(slopes), int(slopes[k - 1])))
        out = pd.DataFrame(
            rows, columns=[group_col, "n_pairs", "slope_e6"]
        )
        out["n_pairs"] = out["n_pairs"].astype("int64")
        out["slope_e6"] = out["slope_e6"].astype("int64")
        return out

    return (
        ds.map_batches(prep, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
