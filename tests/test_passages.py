"""Oracles for `fastie_ray/ops/passages.py`: window coverage and
overlap invariants, slicing reference, and emit modes."""

import hashlib

import pandas as pd
import pytest
import ray.data

from fastie_ray.ops.passages import passage_windows


def test_windows_cover_and_overlap():
    t = "abcdefghij" * 30  # 300 chars
    df = pd.DataFrame({"doc_id": [0], "text": [t]})
    out = (
        passage_windows(ray.data.from_pandas(df), size=256, stride=128)
        .to_pandas()
        .sort_values("win_id")
    )
    assert out["start"].tolist() == [0, 128, 256]
    assert out["n_chars"].tolist() == [256, 172, 44]
    # every char position is covered by some window
    covered = set()
    for s, n in zip(out["start"], out["n_chars"]):
        covered.update(range(s, s + n))
    assert covered == set(range(300))
    # consecutive windows overlap by size - stride chars
    assert out["start"].iloc[1] - out["start"].iloc[0] == 128 < 256


def test_hash_and_text_emit_agree():
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["x" * 500, "short"]})
    h = passage_windows(ray.data.from_pandas(df), size=100, stride=60).to_pandas()
    t = passage_windows(
        ray.data.from_pandas(df), size=100, stride=60, emit="text"
    ).to_pandas()
    m = h.merge(t, on=["doc_id", "win_id", "start", "n_chars"])
    assert len(m) == len(h) == len(t)
    for _, r in m.iterrows():
        assert hashlib.md5(r["passage"].encode()).hexdigest() == r["passage_md5"]
        assert len(r["passage"]) == r["n_chars"]


def test_empty_doc_gets_single_empty_window_and_bad_args_raise():
    df = pd.DataFrame({"doc_id": [0], "text": [""]})
    out = passage_windows(ray.data.from_pandas(df), size=10, stride=5).to_pandas()
    assert len(out) == 1 and out["n_chars"].iloc[0] == 0
    with pytest.raises(ValueError):
        passage_windows(ray.data.from_pandas(df), size=0, stride=5)
    with pytest.raises(ValueError):
        passage_windows(ray.data.from_pandas(df), size=5, stride=5, emit="nope")
