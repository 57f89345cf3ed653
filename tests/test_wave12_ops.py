"""Brute-force parity tests for the round-3 wave-12 operators:
mirror_overlap (pairwise source sharing), quantile_transform
(strict-rank percentile normalization), late_events (watermark
violations via distributed prefix max)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def test_source_overlap_tokenset():
    from fastie_ray.ops.profile import source_overlap

    df = pd.DataFrame(
        [
            {"source": "a", "text": "red green blue"},
            {"source": "b", "text": "blue green red"},     # reordered
            {"source": "b", "text": "red green blue"},     # exact
            {"source": "c", "text": "totally different"},
            {"source": "c", "text": "green red blue"},     # reordered
            {"source": "a", "text": "solo content here"},
        ]
    )
    got = source_overlap(ray.data.from_pandas(df), key="tokenset")
    # one shared fingerprint {blue,green,red} across a, b, c
    want = pd.DataFrame(
        [("a", "b", 1), ("a", "c", 1), ("b", "c", 1)],
        columns=["src_a", "src_b", "n_shared"],
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    # exact mode must NOT count the reordered copies
    got_exact = source_overlap(ray.data.from_pandas(df), key="text")
    want_exact = pd.DataFrame(
        [("a", "b", 1)], columns=["src_a", "src_b", "n_shared"]
    )
    pd.testing.assert_frame_equal(
        got_exact.reset_index(drop=True), want_exact, check_dtype=False
    )


def test_quantile_transform_strict_rank():
    from fastie_ray.ops.encoding import quantile_transform

    rng = np.random.RandomState(3)
    rows = [
        {"event_id": i, "event_type": ["x", "y"][i % 2],
         "value": float(rng.randint(0, 50)) / 10}
        for i in range(500)
    ]
    df = pd.DataFrame(rows)
    got = (
        quantile_transform(
            ray.data.from_pandas(df), "event_type", "value", "event_id"
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    cents = np.floor(df["value"].to_numpy() * 100).astype("int64")
    df2 = df.assign(cents=cents)
    want_rows = []
    for g, sub in df2.groupby("event_type"):
        vals = sub["cents"].to_numpy()
        n = len(vals)
        for _, r in sub.iterrows():
            n_lt = int((vals < r["cents"]).sum())
            want_rows.append(
                (int(r["event_id"]), g, int(r["cents"]),
                 n_lt * 1_000_000 // n)
            )
    want = pd.DataFrame(
        sorted(want_rows),
        columns=["event_id", "event_type", "cents", "pct_e6"],
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # percentiles span [0, 1e6)
    assert got["pct_e6"].min() == 0 and got["pct_e6"].max() < 1_000_000


def test_late_events_brute_force():
    from fastie_ray.ops.windows import late_events

    rng = np.random.RandomState(77)
    base = pd.Timestamp("2024-05-01")
    rows = []
    for i in range(600):
        # ingest order i, but timestamps jitter ±5 min around a trend
        ts = base + pd.Timedelta(seconds=int(i * 60 + rng.randint(-300, 300)))
        rows.append(
            {"event_id": i, "event_type": ["a", "b", "c"][i % 3], "ts": ts}
        )
    df = pd.DataFrame(rows)
    got = late_events(
        ray.data.from_pandas(df), order_col="event_id", range_size=64
    )

    us = (
        df.sort_values("event_id")["ts"]
        .to_numpy()
        .astype("datetime64[us]")
        .astype("int64")
    )
    types = df.sort_values("event_id")["event_type"].to_numpy()
    run = np.iinfo(np.int64).min
    agg: dict = defaultdict(lambda: [0, 0, 0])
    for u, g in zip(us, types):
        a = agg[g]
        a[0] += 1
        if run > u:
            a[1] += 1
            a[2] = max(a[2], run - u)
        run = max(run, u)
    want = pd.DataFrame(
        sorted((g, *v) for g, v in agg.items()),
        columns=["event_type", "n_events", "n_late", "max_lateness_us"],
    )
    assert want["n_late"].sum() > 0  # jitter must produce late events
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
