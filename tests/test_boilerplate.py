"""boilerplate_windows: planted per-source boilerplate is flagged;
cross-source repeats and sub-threshold repeats are not."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def test_boilerplate_planted(ray_session):
    from fastie_ray.ops.text_analysis import boilerplate_windows

    rng = np.random.default_rng(5)
    bp = " ".join(f"nav{i}" for i in range(8))       # planted boilerplate
    other = " ".join(f"foot{i}" for i in range(8))   # only 2 docs — below K
    rows = []
    # source A: 5 docs, each = bp + 2 unique windows
    for d in range(5):
        uniq = " ".join(
            f"w{d}_{j}" for j in range(16)
        )
        rows.append({"doc_id": d, "source": "A", "text": f"{bp} {uniq}"})
    # source B: bp appears in only 1 doc (cross-source must not count)
    rows.append({"doc_id": 10, "source": "B",
                 "text": bp + " " + " ".join(f"b{j}" for j in range(16))})
    # source A: 'other' window in exactly 2 docs — below min_docs=3
    for d in (20, 21):
        rows.append({"doc_id": d, "source": "A",
                     "text": other + " " + " ".join(
                         f"x{d}_{j}" for j in range(8))})
    ds = ray.data.from_pandas(pd.DataFrame(rows)).repartition(4)
    got = (
        boilerplate_windows(ds, shingle=8, min_docs=3)
        .to_pandas().set_index("doc_id").sort_index()
    )
    # source-A main docs: 3 windows each, exactly the bp one flagged
    for d in range(5):
        assert got.loc[d, "n_windows"] == 3
        assert got.loc[d, "n_bp"] == 1
        assert got.loc[d, "bp_e6"] == 333_333
    # source-B doc shares the bp text but in a different source
    assert got.loc[10, "n_bp"] == 0
    # below-threshold repeats unflagged
    assert got.loc[20, "n_bp"] == 0 and got.loc[21, "n_bp"] == 0


def test_boilerplate_within_doc_repeat_counts_once_for_df(ray_session):
    """A window repeated 5x inside ONE doc contributes df=1 — within-doc
    repetition alone cannot cross the distinct-doc threshold; the RATIO
    still counts every instance once flagged."""
    from fastie_ray.ops.text_analysis import boilerplate_windows

    w = " ".join(f"r{i}" for i in range(8))
    rows = [{"doc_id": 0, "source": "A", "text": " ".join([w] * 5)}]
    got = boilerplate_windows(
        ray.data.from_pandas(pd.DataFrame(rows)), shingle=8, min_docs=3
    ).to_pandas()
    assert int(got.loc[0, "n_windows"]) == 5
    assert int(got.loc[0, "n_bp"]) == 0
    # now plant the same window in 2 more docs -> df=3 -> every
    # instance in doc 0 flags
    rows += [
        {"doc_id": 1, "source": "A", "text": w},
        {"doc_id": 2, "source": "A", "text": w},
    ]
    got = boilerplate_windows(
        ray.data.from_pandas(pd.DataFrame(rows)), shingle=8, min_docs=3
    ).to_pandas().set_index("doc_id")
    assert int(got.loc[0, "n_bp"]) == 5
    assert int(got.loc[0, "bp_e6"]) == 1_000_000
