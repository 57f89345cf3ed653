"""Oracles for `fastie_ray/ops/blocking.py`: pandas LEAD reference,
the first-char-bucketing equivalence (the module's correctness proof),
and partition invariance."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.blocking import _common_prefix, sorted_neighborhood_pairs


def _reference(values, min_prefix):
    v = sorted(set(x for x in values if x))
    rows = []
    for a, b in zip(v[:-1], v[1:]):
        p = len(_common_prefix(a, b))
        if p >= min_prefix:
            rows.append((a, b, p))
    return pd.DataFrame(rows, columns=["a", "b", "prefix_len"])


def test_pairs_match_global_lead_reference_any_partitioning():
    rng = np.random.default_rng(47)
    values = [
        f"{p}{rng.integers(0, 99)}"
        for p in ["acme-corp-", "acme-inc-", "zeta-", "beta-", "b-"]
        for _ in range(40)
    ]
    df = pd.DataFrame({"v": values})
    want = _reference(values, 4).sort_values(["a", "b"]).reset_index(drop=True)
    for parts in (1, 5):
        got = (
            sorted_neighborhood_pairs(
                ray.data.from_pandas(df).repartition(parts), "v",
                min_prefix=4, n_buckets=4,
            )
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"prefix_len": "int64"}),
            want.astype({"prefix_len": "int64"}),
        )


def test_cross_first_char_successors_never_qualify():
    # global successors spanning a first-char boundary share no prefix;
    # the bucketed pass must produce the same set as the global scan
    values = ["aaa1", "aaa2", "abz", "baa1", "baa2", "zzz"]
    got = sorted_neighborhood_pairs(
        ray.data.from_pandas(pd.DataFrame({"v": values})), "v", min_prefix=3
    ).to_pandas()
    want = _reference(values, 3)
    assert set(map(tuple, got[["a", "b"]].to_numpy())) == set(
        map(tuple, want[["a", "b"]].to_numpy())
    )


def test_empty_and_null_values_ignored():
    df = pd.DataFrame({"v": ["", None, "abcd1", "abcd2"]})
    got = sorted_neighborhood_pairs(
        ray.data.from_pandas(df), "v", min_prefix=4
    ).to_pandas()
    assert got[["a", "b"]].values.tolist() == [["abcd1", "abcd2"]]


def test_edit_distance_verification_matches_reference():
    from fastie_ray.ops.blocking import _levenshtein, verify_pairs_edit_distance

    # hand-checked distances
    assert _levenshtein("kitten", "sitting") == 3
    assert _levenshtein("abc", "abc") == 0
    assert _levenshtein("", "ab") == 2
    pairs = pd.DataFrame(
        {
            "a": ["acme corp", "acme corp", "zeta", "same"],
            "b": ["acme corps", "acme incorporated", "zetb", "same"],
        }
    )
    got = (
        verify_pairs_edit_distance(
            ray.data.from_pandas(pairs).repartition(3), max_dist=2
        )
        .to_pandas()
        .sort_values("a")
        .reset_index(drop=True)
    )
    assert got["a"].tolist() == ["acme corp", "same", "zeta"]
    assert got["edit_dist"].tolist() == [1, 0, 1]


def test_golden_records_islands_and_survivorship(ray_session):
    import ray.data

    from fastie_ray.ops.blocking import golden_records

    vals = [
        # one cluster: sort-adjacent chain (last char varies)
        "acme corpa", "acme corpb", "acme corpc",
        # sorts after the chain; edit distance breaks it -> own cluster
        "acme corporation intl", "acme corporation intx",
        # singleton far away
        "zeta",
        # different first letter, own cluster
        "beta sitex", "beta sitey",
    ]
    ds = ray.data.from_items([{"v": v} for v in vals * 3])  # dups collapse
    out = (
        golden_records(ds, "v", min_prefix=4, max_dist=2)
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    assert list(out["cluster_id"]) == [
        "acme corpa", "acme corporation intl", "beta sitex",
    ]
    assert list(out["n_members"]) == [3, 2, 2]
    # canonical = longest member, ties lexicographic min
    assert list(out["canonical"]) == [
        "acme corpa", "acme corporation intl", "beta sitex",
    ]


def test_ed1_pairs_bruteforce_and_single_emission(ray_session):
    from fastie_ray.ops.blocking import _levenshtein, ed1_pairs

    rng = np.random.default_rng(13)
    words = list(
        {
            "".join(rng.choice(list("abc"), rng.integers(1, 6)))
            for _ in range(120)
        }
    )
    # duplicates across blocks must not double-emit
    df = pd.DataFrame({"w": words + words[:30]})
    got = (
        ed1_pairs(ray.data.from_pandas(df).repartition(4), "w", n_buckets=4)
        .to_pandas()
        .sort_values(["u", "v"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [
            (u, v)
            for i, u in enumerate(sorted(set(words)))
            for v in sorted(set(words))[i + 1:]
            if _levenshtein(u, v) == 1
        ],
        columns=["u", "v"],
    )
    assert got.duplicated().sum() == 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ed1_pairs_swap_is_not_matched(ray_session):
    from fastie_ray.ops.blocking import ed1_pairs

    # "ab"/"ba" share deletion variants but ed=2 — must verify away
    df = pd.DataFrame({"w": ["ab", "ba", "abc"]})
    got = ed1_pairs(ray.data.from_pandas(df), "w", n_buckets=2).to_pandas()
    got = set(map(tuple, got[["u", "v"]].itertuples(index=False)))
    assert got == {("ab", "abc")}


def test_ed1_lookup_bruteforce(ray_session):
    from fastie_ray.ops.blocking import _levenshtein, ed1_lookup

    rng = np.random.default_rng(79)
    dic = list({"".join(rng.choice(list("abc"), 4)) for _ in range(40)})
    qs = list({"".join(rng.choice(list("abc"), rng.integers(3, 6)))
               for _ in range(50)})
    got = (
        ed1_lookup(
            ray.data.from_pandas(pd.DataFrame({"q": qs + qs[:10]})),
            ray.data.from_pandas(pd.DataFrame({"e": dic})),
            "q", "e", n_buckets=4,
        )
        .to_pandas()
        .sort_values(["query", "entry"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [
            (q, e, _levenshtein(q, e))
            for q in sorted(set(qs))
            for e in sorted(dic)
            if _levenshtein(q, e) <= 1
        ],
        columns=["query", "entry", "edit_dist"],
    )
    want["edit_dist"] = want["edit_dist"].astype("int64")
    assert got.duplicated().sum() == 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_ed1_pairs_hypothesis_vs_bruteforce(ray_session):
    """Property: the deletion-POSITION algebra (same (variant, pos) ⟺
    substitution; shared variant == shorter string ⟺ ins/del) emits
    exactly the Levenshtein-distance-1 pairs — adversarial universe of
    short repeated-char strings where the old D₁-set reasoning was
    subtlest."""
    import itertools

    import pandas as pd
    import ray.data
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fastie_ray.ops.blocking import _levenshtein, ed1_pairs

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.text(alphabet="ab1", min_size=0, max_size=4),
            min_size=2, max_size=12, unique=True,
        )
    )
    def check(strings):
        df = pd.DataFrame({"s": strings})
        out = ed1_pairs(
            ray.data.from_pandas(df).repartition(2), "s", n_buckets=3
        ).to_pandas()
        # Dataset.to_pandas drops zero-row blocks, so an empty result
        # arrives column-less (Ray behavior, NOTES fact 34)
        got = sorted(zip(out["u"], out["v"])) if len(out) else []
        want = sorted(
            (min(a, b), max(a, b))
            for a, b in itertools.combinations(sorted(set(strings)), 2)
            if _levenshtein(a, b) == 1
        )
        assert got == want, (strings, got, want)

    check()
