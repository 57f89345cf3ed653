"""Test ops.selection.greedy_coverage against a brute-force greedy
oracle, including early stop when coverage is exhausted."""

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 3):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def _greedy_ref(docs: dict, k: int):
    covered: set = set()
    out = []
    for rnd in range(1, k + 1):
        gains = {
            d: len(t - covered) for d, t in docs.items() if t - covered
        }
        if not gains:
            break
        best = min(gains, key=lambda d: (-gains[d], d))
        out.append((rnd, best, gains[best]))
        covered |= docs[best]
    return out


def test_greedy_coverage_matches_reference_and_stops():
    from fastie_ray.ops.selection import greedy_coverage

    rng = np.random.default_rng(47)
    vocab = [f"w{i}" for i in range(20)]
    rows = []
    docs = {}
    for d in range(30):
        t = set(rng.choice(vocab, size=rng.integers(2, 8), replace=False))
        docs[d] = t
        rows.append((d, " ".join(sorted(t))))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])

    got = greedy_coverage(_ds(df, 3), k=6, n_buckets=4)
    want = pd.DataFrame(
        _greedy_ref(docs, 6), columns=["round", "doc_id", "gain"]
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)

    # tiny corpus: exhausts before k -> early stop, fewer rows
    small = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b c", "a b"]}
    )
    got2 = greedy_coverage(_ds(small, 2), k=5, n_buckets=4)
    assert len(got2) == 1  # doc 0 covers everything; doc 1 adds nothing
    assert got2.iloc[0]["doc_id"] == 0 and got2.iloc[0]["gain"] == 3


def test_proportional_sample_allocation_and_determinism():
    from fastie_ray.ops.sampling import proportional_sample

    rng = np.random.default_rng(89)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(1000, dtype=np.int64),
            "g": rng.choice(["a", "b", "c", "d"], 1000, p=[0.5, 0.3, 0.15, 0.05]),
        }
    )
    got = (
        proportional_sample(_ds(df, 3), total_k=77, group_col="g",
                            id_col="doc_id")
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == 77
    # largest-remainder reference allocation
    sizes = df.groupby("g").size()
    n = int(sizes.sum())
    base = (sizes * 77) // n
    rem = sizes * 77 - base * n
    order = sorted(
        sizes.index, key=lambda g: (-int(rem[g]), -int(sizes[g]), g)
    )
    alloc = dict(base)
    for g in order[: 77 - int(base.sum())]:
        alloc[g] += 1
    assert got.groupby("g").size().to_dict() == {
        g: k for g, k in alloc.items() if k > 0
    }
    # per-group allocations exact and block-invariant
    got2 = (
        proportional_sample(_ds(df, 7), total_k=77, group_col="g",
                            id_col="doc_id")
        .to_pandas()
        .sort_values(["g", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)
