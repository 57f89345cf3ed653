"""Directional containment join (`ops/neardup.containment_pairs`):
brute-force parity, duplicate-row dedup, and the max_df vocabulary cap."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.neardup import containment_pairs


def _ref(tok: pd.DataFrame, thresh_e6: int, max_df=None) -> pd.DataFrame:
    tok = tok.drop_duplicates()
    if max_df is not None:
        df_ = tok.groupby("token")["id"].size()
        tok = tok[tok["token"].map(df_) <= max_df]
    sets = tok.groupby("id")["token"].agg(set)
    rows = []
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if inter * 1_000_000 >= thresh_e6 * len(sa):
                rows.append((a, b, inter * 1_000_000 // len(sa)))
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "containment_e6"])
    return (
        out.astype("int64")
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )


def _toks(seed=3, n_ids=40, vocab=25) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_ids):
        ts = rng.choice(vocab, size=rng.integers(2, 10), replace=False)
        rows.extend((i, f"t{t}") for t in ts)
    return pd.DataFrame(rows, columns=["id", "token"]).astype({"id": "int64"})


def _got(tok, thresh, **kw):
    df = containment_pairs(
        ray.data.from_pandas(tok).repartition(3),
        threshold=thresh, n_buckets=4, **kw,
    ).to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("id_a", "id_b", "containment_e6")}
        )
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def test_containment_bruteforce(ray_session):
    tok = _toks()
    for thresh in (0.5, 0.8, 1.0):
        got = _got(tok, thresh)
        want = _ref(tok, int(round(thresh * 1e6)))
        pd.testing.assert_frame_equal(got, want, check_dtype=False), thresh


def test_containment_dedups_input_rows(ray_session):
    tok = _toks(seed=5)
    dup = pd.concat([tok, tok.head(40)], ignore_index=True)
    got = _got(dup, 0.8)
    pd.testing.assert_frame_equal(
        got, _ref(tok, 800_000), check_dtype=False
    )


def test_containment_max_df_cap(ray_session):
    tok = _toks(seed=7)
    # plant a stop-token in every doc: without the cap every pair
    # shares it; with max_df it vanishes from postings AND sizes
    stop = pd.DataFrame(
        {"id": tok["id"].unique().astype("int64"), "token": "STOP"}
    )
    tok2 = pd.concat([tok, stop], ignore_index=True)
    got = _got(tok2, 0.8, max_df=10)
    want = _ref(tok2, 800_000, max_df=10)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
