"""Property-based tests (hypothesis) over the decode kernels and text
functions: random inputs against the dense line-for-line ports and
reference invariants — the fuzzing layer on top of the example-based
suite."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fastie_ray.kernels.gp_ner import decode_gp_dense, decode_gp_sparse
from fastie_ray.kernels.gplinker_re import (
    decode_gplinker_dense,
    decode_gplinker_sparse,
)
from fastie_ray.kernels.uie_span import get_bool_ids_greater_than, get_span


@st.composite
def gp_case(draw):
    L = draw(st.integers(min_value=3, max_value=24))
    C = draw(st.integers(min_value=1, max_value=4))
    n_hits = draw(st.integers(min_value=0, max_value=12))
    hits = [
        (
            draw(st.integers(0, C - 1)),
            draw(st.integers(0, L - 1)),
            draw(st.integers(0, L - 1)),
            1.0,
        )
        for _ in range(n_hits)
    ]
    return L, C, hits


@settings(max_examples=80, deadline=None)
@given(gp_case())
def test_gp_sparse_equals_dense_property(case):
    L, C, hits = case
    text = "x" * (L - 2)
    mapping = [(0, 0)] + [(i, i + 1) for i in range(L - 2)] + [(0, 0)]
    id2label = {i: f"L{i}" for i in range(C)}
    logits = np.full((C, L, L), -1.0, dtype=np.float32)
    for c, h, t, _ in hits:
        logits[c, h, t] = 1.0
    dense = decode_gp_dense(logits, L, text, mapping, id2label)
    sparse = decode_gp_sparse(hits, L, text, mapping, id2label)
    assert dense == sparse


@st.composite
def gplinker_case(draw):
    L = draw(st.integers(min_value=4, max_value=20))
    P = draw(st.integers(min_value=1, max_value=3))
    spans = draw(
        st.lists(
            st.tuples(st.integers(1, L - 2), st.integers(1, L - 2)),
            min_size=0, max_size=6,
        )
    )
    spans = [(min(h, t), max(h, t)) for h, t in spans]
    n_rel = draw(st.integers(min_value=0, max_value=6))
    rels = []
    for _ in range(n_rel):
        if not spans:
            break
        s = draw(st.sampled_from(spans))
        o = draw(st.sampled_from(spans))
        p = draw(st.integers(0, P - 1))
        rels.append((p, s, o))
    return L, P, spans, rels


@settings(max_examples=60, deadline=None)
@given(gplinker_case())
def test_gplinker_sparse_equals_dense_property(case):
    L, P, spans, rels = case
    text = "x" * (L - 2)
    mapping = [(0, 0)] + [(i, i + 1) for i in range(L - 2)] + [(0, 0)]
    id2pred = {i: f"P{i}" for i in range(P)}
    entity = np.full((2, L, L), -1.0, dtype=np.float32)
    head = np.full((P, L, L), -1.0, dtype=np.float32)
    tail = np.full((P, L, L), -1.0, dtype=np.float32)
    for h, t in spans:
        entity[0, h, t] = 1.0
        entity[1, h, t] = 1.0
    head_hits, tail_hits = [], []
    for p, (sh, st_), (oh, ot) in rels:
        head[p, sh, oh] = 1.0
        tail[p, st_, ot] = 1.0
        head_hits.append((p, sh, oh))
        tail_hits.append((p, st_, ot))
    dense = decode_gplinker_dense(entity, head, tail, L, text, mapping, id2pred)
    sparse = decode_gplinker_sparse(
        spans, spans, head_hits, tail_hits, L, text, mapping, id2pred
    )
    assert dense == sparse


@settings(max_examples=100, deadline=None)
@given(st.lists(st.floats(0, 1), min_size=0, max_size=40),
       st.lists(st.floats(0, 1), min_size=0, max_size=40))
def test_get_span_properties(sp, ep):
    """Invariants of the nearest-end pairing (decode_utils.py:38-87):
    every span has start ≤ end, endpoints come from the threshold
    survivors, and no start or end index appears in two spans with a
    conflicting order."""
    s_ids = get_bool_ids_greater_than(np.asarray(sp, dtype=np.float32), 0.5)
    e_ids = get_bool_ids_greater_than(np.asarray(ep, dtype=np.float32), 0.5)
    spans = get_span(s_ids, e_ids)
    for s, e in spans:
        assert s <= e
        assert s in s_ids and e in e_ids
    ordered = sorted(spans)
    for (s1, e1), (s2, e2) in zip(ordered, ordered[1:]):
        assert s1 <= s2  # sorted by construction of the scan


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="ab 。！？!?\n中文", max_size=60))
def test_cut_chinese_sent_reconstruction(text):
    """The sentence splitter loses only trailing whitespace: joining
    the pieces reproduces the rstripped paragraph (the reference quirk
    stages/chunk documents)."""
    from fastie_ray.functions.textnorm import cut_chinese_sent

    from tests.reference_port import ref_cut_chinese_sent

    assert cut_chinese_sent(text) == ref_cut_chinese_sent(text)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abc 中。", max_size=80), max_size=5),
       st.integers(5, 30), st.booleans())
def test_auto_splitter_matches_reference_port(texts, width, split_sentence):
    from fastie_ray.stages.chunk import auto_splitter

    from tests.reference_port import ref_auto_splitter

    assert auto_splitter(texts, width, split_sentence) == ref_auto_splitter(
        texts, width, split_sentence
    )


@settings(max_examples=60, deadline=None)
@given(st.lists(st.lists(st.tuples(st.text(max_size=4), st.floats(0.01, 1.0)),
                         max_size=3), max_size=5))
def test_cls_majority_vote_properties(chunks):
    """Vote invariants: winner is a predicted option; its chunk-count is
    maximal; probability is the mean over its votes."""
    from fastie_ray.functions.uie_prep import cls_majority_vote

    chunk_results = [
        [{"text": t, "probability": p} for t, p in ch] for ch in chunks
    ]
    out = cls_majority_vote(chunk_results)
    firsts = [ch[0] for ch in chunk_results if ch]
    if not firsts:
        assert out == []
        return
    assert len(out) == 1
    win = out[0]["text"]
    counts = {}
    probs = {}
    for r in firsts:
        counts[r["text"]] = counts.get(r["text"], 0) + 1
        probs.setdefault(r["text"], []).append(r["probability"])
    assert counts[win] == max(counts.values())
    assert abs(out[0]["probability"] - sum(probs[win]) / counts[win]) < 1e-9


@settings(max_examples=200, deadline=None)
@given(st.lists(st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                                   st.sampled_from([0.25, 0.5])),
                         max_size=2), min_size=0, max_size=6))
def test_cls_majority_vote_tie_semantics_match_reference(chunks):
    """NOTES r2 #5: a doc straddling >2 chunks whose cls votes tie
    EXACTLY on (count, prob_sum) must resolve identically to the
    reference ``_auto_joiner`` (first-seen insertion order wins in
    Python's max over dict items). Labels and probabilities are drawn
    from tiny discrete sets so exact ties actually occur."""
    from fastie_ray.functions.uie_prep import cls_majority_vote

    from tests.reference_port import ref_auto_joiner_cls

    chunk_results = [
        [{"text": t, "probability": p} for t, p in ch] for ch in chunks
    ]
    want = ref_auto_joiner_cls(chunk_results, {0: list(range(len(chunk_results)))})[0]
    assert cls_majority_vote(chunk_results) == want


# ---------------------------------------------------- new-op properties
# Ray-free properties: the distributed ops' kernels are deterministic
# functions of their inputs, so the per-batch/per-partition pieces are
# property-testable without a cluster; the Ray-level equivalence is
# covered by the seeded tests in test_rank_diff_cooc.py.


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=200),
    st.booleans(),
    st.integers(1, 64),
)
def test_global_rank_offsets_partition_row_number(keys, descending, range_size):
    """The driver-side exclusive scan of global_rank: per-range offsets
    + in-range positions must reproduce ROW_NUMBER over the whole
    list for ANY range_size (the partitioning is an implementation
    detail, never visible in ranks)."""
    import numpy as np
    import pandas as pd

    df = pd.DataFrame(
        {"key": np.asarray(keys, dtype=np.int64),
         "tie": np.arange(len(keys), dtype=np.int64)}
    )
    rids = df["key"] // range_size
    totals = (
        rids.value_counts().rename_axis("rid").reset_index(name="n")
        .sort_values("rid", ascending=not descending)
    )
    totals["off"] = totals["n"].cumsum() - totals["n"]
    offs = dict(zip(totals["rid"], totals["off"]))
    g = df.assign(rid=rids).sort_values(
        ["rid", "key", "tie"],
        ascending=[not descending, not descending, True],
    )
    local = g.groupby("rid", sort=False).cumcount().to_numpy()
    base = np.asarray([offs[r] for r in g["rid"]])
    got = pd.Series(base + local + 1, index=g.index).sort_index()
    exp = (
        df.sort_values(["key", "tie"], ascending=[not descending, True])
        .assign(rank=np.arange(1, len(df) + 1))
        .sort_index()["rank"]
    )
    assert (got.to_numpy() == exp.to_numpy()).all()


@settings(max_examples=80, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["http://", "https://", ""]),
              st.sampled_from(["www.", ""]),
              st.text(alphabet="ab/.", min_size=1, max_size=12),
              st.sampled_from(["", "/", "?x=1", "/?utm=2"])),
    min_size=1, max_size=30,
))
def test_canonical_url_idempotent_and_scheme_invariant(parts):
    """Normalization is idempotent, and any two decorations of the
    same core (that don't themselves contain '?' or a trailing '/')
    canonicalize identically."""
    import pandas as pd

    from fastie_ray.ops.urlnorm import canonical_url

    urls = pd.Series([s + w + core + t for s, w, core, t in parts])
    once = canonical_url(urls)
    twice = canonical_url(once)
    assert (once == twice).all()
    cores = pd.Series([core for _, _, core, _ in parts])
    # a bare, decoration-free core is a fixed point of its own canon
    bare = canonical_url(cores)
    assert (canonical_url(bare) == bare).all()


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(st.integers(0, 40), st.text("ab", max_size=3),
                    max_size=30),
    st.dictionaries(st.integers(0, 40), st.text("ab", max_size=3),
                    max_size=30),
)
def test_corpus_diff_matches_set_arithmetic(v1, v2):
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.diff import corpus_diff

    d1 = pd.DataFrame({"doc_id": list(v1), "text": list(v1.values())})
    d2 = pd.DataFrame({"doc_id": list(v2), "text": list(v2.values())})
    if len(d1) == 0 or len(d2) == 0:
        return  # union of an empty Ray dataset has no schema — skip
    got = corpus_diff(
        ray.data.from_pandas(d1), ray.data.from_pandas(d2), n_buckets=4
    ).to_pandas()
    exp = {}
    if len(got) == 0:
        # Ray's to_pandas drops columns when every block is an empty
        # sentinel (dataset .schema() is still typed) — compare counts
        for k in set(v1) | set(v2):
            assert (k in v1 and k in v2 and v1[k] == v2[k])
        return
    for k in v1.keys() - v2.keys():
        exp[k] = "removed"
    for k in v2.keys() - v1.keys():
        exp[k] = "added"
    for k in v1.keys() & v2.keys():
        if v1[k] != v2[k]:
            exp[k] = "changed"
    assert dict(zip(got["doc_id"], got["status"])) == exp


@given(
    st.lists(st.integers(0, 255), min_size=1, max_size=64),
    st.lists(st.integers(0, 255), min_size=1, max_size=64),
)
@settings(max_examples=60, deadline=None)
def test_interleave2_order_preserving_within_quadrant(xs, ys):
    import numpy as np

    from fastie_ray.ops.layout import interleave2

    n = min(len(xs), len(ys))
    x = np.array(xs[:n])
    y = np.array(ys[:n])
    z = interleave2(x, y)
    # deinterleave inverts exactly
    def deinterleave(z):
        xs_ = np.zeros_like(z)
        ys_ = np.zeros_like(z)
        for j in range(8):
            xs_ |= ((z >> (2 * j)) & 1) << j
            ys_ |= ((z >> (2 * j + 1)) & 1) << j
        return xs_, ys_

    xr, yr = deinterleave(z)
    assert np.array_equal(xr, x) and np.array_equal(yr, y)
    # monotone in each coordinate when the other is fixed
    z2 = interleave2(x, np.zeros_like(y))
    order = np.argsort(x, kind="stable")
    assert np.array_equal(np.argsort(z2[order], kind="stable"),
                          np.arange(n))


@given(
    st.lists(st.integers(0, 50), min_size=0, max_size=80),
    st.lists(st.integers(0, 50), min_size=0, max_size=80),
)
@settings(max_examples=60, deadline=None)
def test_sorted_inner_merge_matches_pandas(aks, bks):
    import numpy as np
    import pandas as pd

    from fastie_ray.ops.bucketed_io import _sorted_inner_merge

    a = pd.DataFrame({"k": sorted(aks), "va": range(len(aks))})
    b = pd.DataFrame({"k": sorted(bks), "vb": range(len(bks))})
    ai, bi = _sorted_inner_merge(a, b, "k", "k")
    got = pd.DataFrame(
        {"k": a["k"].to_numpy()[ai], "va": a["va"].to_numpy()[ai],
         "vb": b["vb"].to_numpy()[bi]}
    ).sort_values(["k", "va", "vb"]).reset_index(drop=True)
    want = a.merge(b, on="k").sort_values(["k", "va", "vb"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[["k", "va", "vb"]])


@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=200, unique=True))
@settings(max_examples=40, deadline=None)
def test_bloom_has_no_false_negatives(keys):
    import pandas as pd

    from fastie_ray.ops.join import _bloom_test, bloom_bits

    import ray.data

    ds = ray.data.from_items([{"k": k} for k in keys])
    bits = bloom_bits(ds, "k", m_bits=1 << 16, k=3)
    ok = _bloom_test(pd.Series(keys), bits, 1 << 16, 3)
    assert ok.all()  # every inserted key passes — no false negatives


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),            # key
            st.integers(0, 400),          # start
            st.integers(1, 120),          # length
        ),
        min_size=1, max_size=60,
    )
)
def test_coalesce_frame_matches_sweep_union(ivs):
    """_coalesce_frame (gaps-and-islands kernel of interval_coalesce)
    vs a brute-force boolean-line sweep (touch semantics, half-open)."""
    import pandas as pd

    from fastie_ray.ops.interval import _coalesce_frame

    df = pd.DataFrame(
        [(k, s, s + ln) for k, s, ln in ivs], columns=["k", "s", "e"]
    )
    got = _coalesce_frame(df, ["k"]).sort_values(["k", "s"]).reset_index(
        drop=True
    )
    for k, grp in df.groupby("k"):
        line = np.zeros(600, dtype=bool)
        for _, r in grp.iterrows():
            line[r["s"]:r["e"]] = True
        # reconstruct spans from the boolean line
        spans = []
        i = 0
        while i < len(line):
            if line[i]:
                j = i
                while j < len(line) and line[j]:
                    j += 1
                spans.append((i, j))
                i = j
            else:
                i += 1
        sub = got[got["k"] == k][["s", "e"]]
        assert list(map(tuple, sub.itertuples(index=False))) == spans, k


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40), st.integers(1, 50)),
        min_size=1, max_size=80,
    ),
    st.integers(1, 9),
)
def test_trailing_window_kernel_matches_bruteforce(rows, w):
    """The encoded-position cumsum/searchsorted trailing-window kernel
    (final stage of trailing_window_sums) vs per-(key, day) brute
    force."""
    import pandas as pd

    g = (
        pd.DataFrame(rows, columns=["k", "day", "v"])
        .groupby(["k", "day"], as_index=False)["v"]
        .sum()
        .sort_values(["k", "day"])
        .reset_index(drop=True)
    )
    k = g["k"].to_numpy(dtype=np.int64)
    day = g["day"].to_numpy(dtype=np.int64)
    v = g["v"].to_numpy(dtype=np.int64)
    codes = __import__("pandas").factorize(k)[0].astype(np.int64)
    enc = codes * (1 << 24) + day
    cum = np.cumsum(v)
    j = np.searchsorted(enc, enc - (w - 1), side="left")
    trailing = cum - np.where(j > 0, cum[np.maximum(j - 1, 0)], 0)
    for i in range(len(g)):
        m = (k == k[i]) & (day > day[i] - w) & (day <= day[i])
        assert trailing[i] == v[m].sum(), (k[i], day[i])


@settings(max_examples=100, deadline=None)
@given(st.integers(-10**12, 10**12), st.integers(1, 10**9))
def test_tdiv_matches_sql_truncation(a, b):
    """cuped's truncating division == DuckDB integer `//` semantics."""
    import duckdb

    q = abs(a) // abs(b)
    tdiv = q if a >= 0 else -q
    want = duckdb.sql(f"SELECT CAST({a} AS BIGINT) // {b}").fetchone()[0]
    assert tdiv == int(want)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="abc", min_size=0, max_size=7),
       st.text(alphabet="abc", min_size=0, max_size=7))
def test_ed1_deletion_neighborhood_completeness(x, y):
    """FastSS invariant: lev(x,y) ≤ 1 ⟹ D1(x) ∩ D1(y) ≠ ∅ — the
    completeness direction ed1_pairs' blocking relies on."""
    from fastie_ray.ops.blocking import _levenshtein

    def d1(s):
        return {s} | {s[:i] + s[i + 1:] for i in range(len(s))}

    if _levenshtein(x, y) <= 1:
        assert d1(x) & d1(y), (x, y)
