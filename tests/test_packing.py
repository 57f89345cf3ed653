"""Sequence packing (`fastie_ray/ops/packing.py`): brute-force
reference for the distributed prefix sum and window explosion, edge
cases the synth corpus never hits (empty docs, a doc spanning many
windows, doc_id gaps, range boundaries), and packing invariants."""

import re

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.packing import pack_offsets, pack_segments

SF = "/root/testdata/sf0.001"


def _docs(texts, ids=None):
    ids = ids if ids is not None else np.arange(len(texts))
    return pd.DataFrame(
        {"doc_id": np.asarray(ids, dtype=np.int64), "text": texts}
    )


def _ref_offsets(df, ctx_len):
    df = df.sort_values("doc_id").reset_index(drop=True)
    nt = df["text"].map(lambda s: len(re.findall(r"[A-Za-z0-9]+", s)))
    start = nt.cumsum().shift(fill_value=0)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": nt.astype("int64"),
            "start_offset": start.astype("int64"),
            "first_window": (start // ctx_len).astype("int64"),
            "last_window": (
                (start + np.maximum(nt - 1, 0)) // ctx_len
            ).astype("int64"),
        }
    )


TEXTS = [
    "one two three four five",          # 5 tokens
    "",                                  # empty: occupies nothing
    " ".join(f"t{i}" for i in range(23)),  # spans multiple 8-windows
    "a b",                               # 2
    " ".join("x" for _ in range(9)),     # 9 → crosses a boundary
]
IDS = [3, 7, 10, 101, 205]  # gaps + spread across range_size=100 ranges


def test_pack_offsets_matches_bruteforce(ray_session):
    ds = ray.data.from_pandas(_docs(TEXTS, IDS))
    got = (
        pack_offsets(ds, ctx_len=8, range_size=100, n_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref_offsets(_docs(TEXTS, IDS), 8))


def test_pack_segments_invariants(ray_session):
    ds = ray.data.from_pandas(_docs(TEXTS, IDS))
    seg = (
        pack_segments(ds, ctx_len=8, range_size=100, n_buckets=4)
        .to_pandas()
        .sort_values(["window_id", "doc_id"])
        .reset_index(drop=True)
    )
    total_tokens = sum(len(re.findall(r"[A-Za-z0-9]+", t)) for t in TEXTS)
    # segments exactly tile the concatenated token stream
    assert seg["seg_len"].sum() == total_tokens
    # every window except possibly the last is exactly full
    sums = seg.groupby("window_id")["seg_len"].sum().sort_index()
    assert (sums.iloc[:-1] == 8).all()
    # per-doc segments are contiguous and cover [0, n_tokens)
    for doc_id, g in seg.groupby("doc_id"):
        g = g.sort_values("seg_start")
        assert g["seg_start"].iloc[0] == 0
        ends = (g["seg_start"] + g["seg_len"]).to_numpy()
        assert (g["seg_start"].to_numpy()[1:] == ends[:-1]).all()
    # empty doc emits no segments
    assert 7 not in set(seg["doc_id"])
    # the 23-token doc spans ceil-many windows
    assert (seg["doc_id"] == 10).sum() >= 3


def test_range_size_invariance(ray_session):
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = (
        pack_offsets(ds, ctx_len=512, range_size=37)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        pack_offsets(ds, ctx_len=512, range_size=1000)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # prefix-sum sanity: offsets strictly increase by n_tokens
    nt = a["n_tokens"].to_numpy()
    off = a["start_offset"].to_numpy()
    assert (off[1:] == off[:-1] + nt[:-1]).all()
