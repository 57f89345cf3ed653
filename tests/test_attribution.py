"""memorization_attribution: planted verbatim blocks are attributed to
their source; the df cap excludes ubiquitous grams; argmax tie-break."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def _toks(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_attribution_planted_verbatim_block(ray_session):
    from fastie_ray.ops.attribution import memorization_attribution

    block = _toks("memo", 12)  # 12 tokens → 9 distinct 4-grams
    rows = [
        # the sample: half verbatim block, half unique — doc_id 0 is a
        # sample under sample_mod=61
        {"doc_id": 0, "text": block + " " + _toks("u", 12)},
        # the source doc carrying the block
        {"doc_id": 5, "text": _toks("a", 6) + " " + block},
        # an unrelated doc
        {"doc_id": 7, "text": _toks("z", 30)},
    ]
    got = memorization_attribution(
        ray.data.from_pandas(pd.DataFrame(rows)).repartition(3),
        sample_mod=61, shingle=4, max_df=50,
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r["sample_id"], r["match_id"]) == (0, 5)
    assert r["shared"] == 9  # the block's 9 shared 4-grams
    # sample grams: 24 tokens → 21 sliding 4-grams, all distinct
    assert r["sample_grams"] == 21
    assert r["containment_e6"] == 9 * 1_000_000 // 21


def test_attribution_df_cap_and_tiebreak(ray_session):
    from fastie_ray.ops.attribution import memorization_attribution

    common = _toks("the", 4)  # one 4-gram present in EVERY doc
    block = _toks("memo", 5)  # two 4-grams
    rows = [{"doc_id": 0, "text": common + " " + block}]
    # the common gram appears in 10 docs total (9 here + the sample)
    # → df 10 > max_df 9 → excluded
    for d in range(1, 10):
        rows.append({"doc_id": d * 3 + 1, "text": common + " "
                     + _toks(f"x{d}_", 8)})
    # two candidate sources share the block equally → smaller id wins
    rows.append({"doc_id": 40, "text": block + " " + _toks("p", 6)})
    rows.append({"doc_id": 20, "text": block + " " + _toks("q", 6)})
    got = memorization_attribution(
        ray.data.from_pandas(pd.DataFrame(rows)).repartition(4),
        sample_mod=61, shingle=4, max_df=9,
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["match_id"] == 20  # tie on shared=2 → smaller doc_id
    assert r["shared"] == 2
    # the capped common gram does not count toward sample_grams
    # either: 9 tokens → 6 sliding grams, the pure-common one capped
    assert r["sample_grams"] == 5
