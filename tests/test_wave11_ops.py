"""Brute-force parity tests for the round-3 wave-11 operators:
hll_sliding_registers (trailing-window sketch merge),
token_budget_select (grouped prefix-sum take-while), and
source_scorecard (per-source ingest report)."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data


def test_hll_sliding_matches_daily_merge():
    from fastie_ray.ops.sketch import hll_sliding_registers

    rng = np.random.RandomState(5)
    rows = []
    for i in range(2000):
        day = int(rng.randint(0, 20))
        rows.append(
            {"ts": pd.Timestamp("2024-03-01") + pd.Timedelta(days=day),
             "user_id": int(rng.randint(0, 300))}
        )
    df = pd.DataFrame(rows)
    got = hll_sliding_registers(
        ray.data.from_pandas(df), "user_id", window_days=7
    )

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    daily: dict[int, dict[int, int]] = defaultdict(dict)
    for _, r in df.drop_duplicates().iterrows():
        day = (r["ts"] - pd.Timestamp("1970-01-01")).days
        x = h60(str(int(r["user_id"])))
        reg, rest = x % 256, x // 256
        rho = 61 if rest == 0 else (rest & -rest).bit_length()
        daily[day][reg] = max(daily[day].get(reg, 0), rho)
    want_rows = []
    for d in sorted(daily):
        merged: dict[int, int] = {}
        for dd in range(d - 6, d + 1):
            for reg, rho in daily.get(dd, {}).items():
                merged[reg] = max(merged.get(reg, 0), rho)
        for reg in sorted(merged):
            want_rows.append((d, reg, merged[reg]))
    want = pd.DataFrame(want_rows, columns=["day", "register", "max_rho"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.astype("int64"), check_dtype=False
    )
    # windows must be supersets of their own day's sketch
    assert len(got) >= sum(len(v) for v in daily.values()) / 7


def test_token_budget_select_take_while():
    from fastie_ray.ops.selection import token_budget_select

    rng = np.random.RandomState(13)
    rows = []
    for i in range(300):
        n = int(rng.randint(5, 40))
        rows.append(
            {"doc_id": i, "source": f"s{i % 4}",
             "text": " ".join(["tok"] * n)}
        )
    df = pd.DataFrame(rows)
    got = (
        token_budget_select(ray.data.from_pandas(df), budget=400)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    df = df.assign(
        n_tokens=df["text"].str.count(r"[A-Za-z0-9]+"),
        rk=df["doc_id"].map(
            lambda i: hashlib.md5(f"sel:{i}".encode()).hexdigest()
        ),
    )
    want_rows = []
    for g, sub in df.groupby("source"):
        sub = sub.sort_values(["rk", "doc_id"])
        cum = 0
        for _, r in sub.iterrows():
            cum += int(r["n_tokens"])
            if cum > 400:
                break
            want_rows.append((int(r["doc_id"]), g, int(r["n_tokens"]), cum))
    want = pd.DataFrame(
        sorted(want_rows),
        columns=["doc_id", "source", "n_tokens", "cum_tokens"],
    )
    assert 0 < len(want) < len(df)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    # per-group totals never exceed the budget
    assert (got.groupby("source")["cum_tokens"].max() <= 400).all()


def test_source_scorecard_brute_force():
    from fastie_ray.ops.profile import source_scorecard

    df = pd.DataFrame(
        [
            {"source": "a", "lang": "en", "text": "one two"},
            {"source": "a", "lang": "de", "text": "dup text"},
            {"source": "a", "lang": "en", "text": "dup text"},
            {"source": "b", "lang": "en", "text": "dup text"},
            {"source": "b", "lang": "en", "text": "unique here"},
        ]
    )
    got = source_scorecard(ray.data.from_pandas(df))
    want = pd.DataFrame(
        [
            # a: 3 docs, 2 of them in the corpus-wide 'dup text' group
            ("a", 3, 2, 7 + 8 + 8, (7 + 8 + 8) // 3, 2),
            # b: 2 docs, 1 in the dup group
            ("b", 2, 1, 8 + 11, (8 + 11) // 2, 1),
        ],
        columns=["source", "n_docs", "n_dup_docs", "sum_chars",
                 "mean_chars", "n_langs"],
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
