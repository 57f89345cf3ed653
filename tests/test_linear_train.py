"""Oracles for `fastie_ray/ops/linear_train.py`: numpy full-batch
reference parity, learning-actually-works separation, and partition
invariance (the integer all-reduce must be order-independent)."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.dsir import _feature_buckets
from fastie_ray.ops.lm_filter import _doc_bigrams
from fastie_ray.ops.linear_train import perceptron_train

NF = 32


def _corpus(n=60, seed=29):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        if i % 3 == 0:
            words = rng.choice(["def", "return", "class", "import"], 10)
            y = 1
        else:
            words = rng.choice(["buy", "now", "click", "free"], 10)
            y = -1
        rows.append({"doc_id": i, "text": " ".join(words), "y": y})
    return pd.DataFrame(rows)


def _reference(df, n_iter, nf):
    big = _doc_bigrams(df, "text", "doc_id")
    f = pd.DataFrame(
        {
            "doc": big["doc"].to_numpy(),
            "bucket": _feature_buckets(big["bigram"], nf),
        }
    ).groupby(["doc", "bucket"], as_index=False).size()
    f.columns = ["doc", "bucket", "cnt"]
    f["y"] = f["doc"].map(dict(zip(df["doc_id"], df["y"])))
    w = np.zeros(nf, dtype=np.int64)
    for _ in range(n_iter):
        sc = f["cnt"].to_numpy() * w[f["bucket"].to_numpy()]
        tot = pd.DataFrame({"doc": f["doc"], "s": sc}).groupby("doc")["s"].sum()
        y = f.groupby("doc")["y"].first()
        viol = tot.index[(y * tot) <= 0]
        v = f[f["doc"].isin(viol)]
        g = np.bincount(
            v["bucket"], weights=(v["y"] * v["cnt"]).to_numpy(), minlength=nf
        ).astype(np.int64)
        w = w + g
    return pd.DataFrame({"bucket": np.arange(nf, dtype=np.int64), "weight": w})


def test_perceptron_matches_reference_any_partitioning():
    df = _corpus()
    want = _reference(df, n_iter=3, nf=NF)
    for parts in (1, 6):
        got = perceptron_train(
            ray.data.from_pandas(df).repartition(parts), "y",
            n_iter=3, n_features=NF,
        )
        pd.testing.assert_frame_equal(got, want)


def test_perceptron_separates_disjoint_vocabularies():
    df = _corpus()
    w = perceptron_train(
        ray.data.from_pandas(df), "y", n_iter=5, n_features=NF
    )["weight"].to_numpy()
    big = _doc_bigrams(df, "text", "doc_id")
    b = _feature_buckets(big["bigram"], NF)
    sc = pd.DataFrame({"doc": big["doc"].to_numpy(), "s": w[b]}).groupby("doc")["s"].sum()
    y = df.set_index("doc_id").loc[sc.index, "y"]
    acc = ((np.sign(sc) == y).sum()) / len(sc)
    # disjoint vocab → near-perfect training accuracy (hash collisions
    # across the two vocabularies can cost an occasional doc; full-batch
    # subgradient steps don't guarantee exact convergence in 5 iters)
    assert acc >= 0.95


def test_docs_without_bigrams_do_not_affect_training():
    base = _corpus(30)
    extra = pd.DataFrame({"doc_id": [900], "text": ["single"], "y": [1]})
    w1 = perceptron_train(ray.data.from_pandas(base), "y", n_iter=2, n_features=NF)
    w2 = perceptron_train(
        ray.data.from_pandas(pd.concat([base, extra], ignore_index=True)),
        "y", n_iter=2, n_features=NF,
    )
    pd.testing.assert_frame_equal(w1, w2)


def test_perceptron_score_agrees_with_training_violation_rule():
    from fastie_ray.ops.linear_train import perceptron_score

    df = _corpus(40)
    w = perceptron_train(ray.data.from_pandas(df), "y", n_iter=4, n_features=NF)
    out = (
        perceptron_score(
            ray.data.from_pandas(df).repartition(3),
            w["weight"].to_numpy(),
            n_features=NF,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # reference scores
    big = _doc_bigrams(df, "text", "doc_id")
    b = _feature_buckets(big["bigram"], NF)
    wv = w["weight"].to_numpy()
    ref = (
        pd.DataFrame({"doc_id": big["doc"].to_numpy(), "s": wv[b]})
        .groupby("doc_id", as_index=False)["s"].sum()
    )
    assert (out["score"].to_numpy() == ref["s"].to_numpy()).all()
    assert (out["pred"].to_numpy() == np.where(out["score"] > 0, 1, -1)).all()


def test_grouped_ols_matches_polyfit_any_partitioning():
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.linear_train import grouped_ols

    rng = np.random.default_rng(113)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "x": rng.random(n) * 30,
            "y": rng.random(n) * 10,
        }
    )
    df["y"] += np.where(df["g"] == "a", 2.5 * df["x"], -0.7 * df["x"])

    def xy_fn(b):
        return pd.DataFrame({"group": b["g"], "x": b["x"], "y": b["y"]})

    want = {}
    for g, gd in df.groupby("g"):
        sl, ic = np.polyfit(gd["x"], gd["y"], 1)
        want[g] = (round(sl, 4), round(ic, 4))
    for parts in (1, 8):
        got = grouped_ols(ray.data.from_pandas(df).repartition(parts), xy_fn)
        for g, sl, ic in got.itertuples(index=False):
            assert abs(sl - want[g][0]) <= 2e-4, (g, sl, want[g])
            assert abs(ic - want[g][1]) <= 2e-4, (g, ic, want[g])


def test_uncertainty_sample_picks_smallest_margins(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.linear_train import uncertainty_sample

    rows = [{"doc_id": i, "score": s} for i, s in enumerate([5, -1, 0, 3, -2, 1])]
    ds = ray.data.from_items(rows).repartition(3)
    out = uncertainty_sample(ds, k=3)
    assert list(out["doc_id"]) == [2, 1, 5]  # margins 0, 1, 1 (tie by id)
    assert list(out["margin"]) == [0, 1, 1]


def test_cuped_matches_float_reference_and_reduces_variance(ray_session):
    from fastie_ray.ops.linear_train import cuped_adjust

    rng = np.random.default_rng(47)
    n = 2000
    x = rng.integers(0, 10_000, n).astype("int64")
    arm = (np.arange(n) % 2).astype("int64")
    # y correlated with x plus a small arm effect
    y = (x * 3 // 2 + rng.integers(0, 2000, n) + 500 * arm).astype("int64")
    df = pd.DataFrame({"arm": arm, "x": x, "y": y})
    got = cuped_adjust(
        ray.data.from_pandas(df).repartition(4), "arm", "x", "y"
    )
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    assert abs(got["theta_e6"].iloc[0] / 1e6 - theta) < 1e-3
    xbar = x.mean()
    for _, row in got.iterrows():
        m = arm == row["arm"]
        adj = y[m].mean() - theta * (x[m].mean() - xbar)
        assert abs(row["adj_mean_e6"] / 1e6 - adj) < 1e-2, row["arm"]
        # CUPED must shrink the adjusted-metric variance
        yadj = y[m] - theta * (x[m] - xbar)
        assert yadj.var() < y[m].var()


def test_cuped_constant_covariate_degrades_to_raw_means(ray_session):
    from fastie_ray.ops.linear_train import cuped_adjust

    df = pd.DataFrame(
        {
            "arm": pd.Series([0, 0, 1, 1], dtype="int64"),
            "x": pd.Series([7, 7, 7, 7], dtype="int64"),
            "y": pd.Series([10, 20, 30, 50], dtype="int64"),
        }
    )
    got = cuped_adjust(ray.data.from_pandas(df), "arm", "x", "y")
    assert got["theta_e6"].tolist() == [0, 0]
    assert got["adj_mean_e6"].tolist() == got["mean_y_e6"].tolist()
    assert got["mean_y_e6"].tolist() == [15_000_000, 40_000_000]


def test_theil_sen_bruteforce_and_outlier_immunity(ray_session):
    from fastie_ray.ops.linear_train import theil_sen_slope

    rng = np.random.default_rng(53)
    rows = []
    for g, slope in (("a", 30), ("b", -20)):
        x = np.arange(25, dtype=np.int64)
        y = slope * x + rng.integers(-3, 4, 25)
        rows.append(pd.DataFrame({"g": g, "x": x, "y": y}))
    df = pd.concat(rows, ignore_index=True)
    # one wild outlier in group a must not flip the estimate
    df.loc[5, "y"] = 10**7
    got = (
        theil_sen_slope(
            ray.data.from_pandas(df).repartition(4), "g", "x", "y",
            n_buckets=4,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )

    def ref(sub):
        sub = sub.groupby("x", as_index=False)["y"].sum()
        x, y = sub["x"].to_numpy(), sub["y"].to_numpy()
        ss = []
        for i in range(len(x)):
            for j in range(i + 1, len(x)):
                dy, dx = int(y[j] - y[i]), int(x[j] - x[i])
                q = abs(dy) * 1_000_000 // abs(dx)
                ss.append(-q if (dy < 0) != (dx < 0) else q)
        ss.sort()
        return len(ss), ss[-(-len(ss) // 2) - 1]

    for g in ("a", "b"):
        n_pairs, med = ref(df[df["g"] == g])
        row = got[got["g"] == g].iloc[0]
        assert (row["n_pairs"], row["slope_e6"]) == (n_pairs, med), g
    # robust: group a's median slope stays near 30e6 despite the spike
    a = got[got["g"] == "a"]["slope_e6"].iloc[0]
    assert 25_000_000 < a < 35_000_000


def test_noisy_label_audit_recovers_planted_flips(ray_session):
    from fastie_ray.ops.join import hash_join
    from fastie_ray.ops.linear_train import (
        perceptron_score,
        perceptron_train,
    )

    # separable corpus: class +1 says "alpha beta", class -1 "gamma
    # delta"; every 10th label is flipped. A majority-fit classifier
    # must disagree exactly on the flips.
    n = 200
    rows = []
    for i in range(n):
        pos = i % 2 == 0
        text = "alpha beta alpha" if pos else "gamma delta gamma"
        y = 1 if pos else -1
        if i % 10 == 0:
            y = -y
        rows.append((i, text, y))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "y"])
    ds = ray.data.from_pandas(df).repartition(3)
    w = perceptron_train(ds, "y", n_iter=3, n_features=64)
    scored = perceptron_score(ds, w["weight"].to_numpy(), n_features=64)
    joined = hash_join(
        scored, ds.map_batches(
            lambda d: d[["doc_id", "y"]], batch_format="pandas"
        ),
        on="doc_id", left_cols=["doc_id", "score", "pred"],
        right_cols=["doc_id", "y"], n_buckets=4,
    ).to_pandas()
    flagged = set(joined.loc[joined["pred"] != joined["y"], "doc_id"])
    want = {i for i in range(n) if i % 10 == 0}
    assert flagged == want
