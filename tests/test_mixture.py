"""Domain-mixture budget sampling (`fastie_ray/ops/mixture.py`):
brute-force reference, overflow-boundary cases (exact fit, first doc
too big, zero-token docs after overflow), range-size invariance, and
the unlimited-default path."""

import re

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.mixture import budget_sample

SF = "/root/testdata/sf0.001"


def _docs(rows):
    return pd.DataFrame(rows, columns=["doc_id", "source", "text"]).astype(
        {"doc_id": "int64"}
    )


def _ref(df, budgets, default=None):
    df = df.sort_values("doc_id")
    nt = df["text"].map(lambda s: len(re.findall(r"[A-Za-z0-9]+", s)))
    out = []
    running: dict[str, int] = {}
    for (_, row), n in zip(df.iterrows(), nt):
        r = running.get(row["source"], 0) + n
        running[row["source"]] = r
        cap = budgets.get(row["source"], default)
        if cap is None or r <= cap:
            out.append((row["doc_id"], row["source"], n, r))
    return pd.DataFrame(
        out, columns=["doc_id", "source", "n_tokens", "running"]
    ).astype({"doc_id": "int64", "n_tokens": "int64", "running": "int64"})


ROWS = [
    (1, "a", "one two three"),        # 3 → running 3
    (2, "a", "x y z w"),              # 4 → running 7 (cap 7: exact fit)
    (3, "a", "overflow now"),         # 2 → 9 > 7: dropped
    (4, "a", ""),                     # 0 → running stays 9: dropped
    (5, "b", "way too many tokens here for sure yes"),  # 8 > 5: dropped
    (6, "b", "tiny"),                 # running 9 > 5: dropped too
    (7, "c", "uncapped source keeps everything always"),
]


def test_budget_sample_bruteforce(ray_session):
    ds = ray.data.from_pandas(_docs(ROWS))
    budgets = {"a": 7, "b": 5}
    got = (
        budget_sample(ds, budgets, default_budget=None, range_size=2, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref(_docs(ROWS), budgets))
    assert list(got["doc_id"]) == [1, 2, 7]  # exact fit kept, overflow chain dropped


def test_range_size_invariance(ray_session):
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    budgets = {f"src{i}": 600 for i in range(0, 20, 2)}
    a = (
        budget_sample(ds, budgets, default_budget=900, range_size=37)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        budget_sample(ds, budgets, default_budget=900, range_size=500)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # the cap must actually bite on the synth corpus
    assert a.groupby("source")["doc_id"].count().min() < 25
    assert (a.groupby("source")["running"].max() <= 900).all()
