"""Brute-force parity tests for the round-3 wave-10 operators:
mad_outliers (median/MAD robust gate) and dict_encode (distributed
dense-rank dictionary encoding)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def _low_median(vals: list[int]) -> int:
    s = sorted(vals)
    return s[(len(s) + 1) // 2 - 1]


def test_mad_outliers_brute_force():
    from fastie_ray.ops.stats import mad_outliers

    rng = np.random.RandomState(31)
    rows = []
    for i in range(400):
        g = ["a", "b", "c"][i % 3]
        base = {"a": 10.0, "b": 100.0, "c": 1000.0}[g]
        v = base + rng.randint(-50, 51) / 100.0
        if i % 97 == 0:  # planted gross outliers
            v = base * 50
        rows.append({"event_id": i, "event_type": g, "value": v})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)
    got = (
        mad_outliers(ds, "event_type", "value", "event_id", k=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )

    cents = df.assign(
        cents=np.floor(df["value"].to_numpy() * 100).astype("int64")
    )
    want_rows = []
    for g, sub in cents.groupby("event_type"):
        med = _low_median(sub["cents"].tolist())
        devs = (sub["cents"] - med).abs()
        mad = _low_median(devs.tolist())
        out = sub[devs > 3 * mad]
        for _, r in out.iterrows():
            want_rows.append(
                (int(r["event_id"]), g, int(r["cents"]), med, mad,
                 int(abs(r["cents"] - med)))
            )
    want = pd.DataFrame(
        sorted(want_rows),
        columns=["event_id", "event_type", "cents", "med", "mad", "dev"],
    )
    assert len(want) > 0  # the planted outliers must be flagged
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # every planted gross outlier is caught
    planted = set(df[df["value"] > 5000]["event_id"]) & {
        i for i in range(0, 400, 97) if ["a", "b", "c"][i % 3] == "c"
    }
    assert planted <= set(got["event_id"])


def test_vocab_ids_dense_lexicographic():
    from fastie_ray.ops.encoding import vocab_ids

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2],
         "text": ["zeta alpha 9lives", "beta alpha", "Mixed CASE beta"]}
    )
    got = (
        vocab_ids(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("token_id")
        .reset_index(drop=True)
    )
    vocab = sorted(
        set(re.findall(r"[a-z0-9]+", " ".join(df["text"]).lower()))
    )
    assert got["token"].tolist() == vocab
    assert got["token_id"].tolist() == list(range(len(vocab)))


def test_dict_encode_round_trip():
    from fastie_ray.ops.encoding import dict_encode, vocab_ids

    df = pd.DataFrame(
        {"doc_id": [7, 8], "text": ["red green blue", "blue red red"]}
    )
    ds = ray.data.from_pandas(df)
    vocab = vocab_ids(ds).to_pandas()
    inv = dict(zip(vocab["token_id"], vocab["token"]))
    enc = dict_encode(ds).to_pandas().sort_values(["doc_id", "pos"])
    rebuilt = {
        did: " ".join(inv[t] for t in sub["token_id"])
        for did, sub in enc.groupby("doc_id")
    }
    assert rebuilt == {7: "red green blue", 8: "blue red red"}
    assert enc.groupby("doc_id")["pos"].apply(
        lambda s: s.tolist() == list(range(1, len(s) + 1))
    ).all()
