"""Fixed-point PageRank (`fastie_ray/ops/graph.py`): brute-force
single-process reference on hand-built graphs (chain, star, dangling
sinks, disconnected node), rank-mass conservation, and convergence
ordering on a known dominance structure."""

import numpy as np
import pandas as pd
import ray.data

from fastie_ray.ops.graph import node_table, pagerank

SCALE = 10**12


def _edges(pairs):
    return pd.DataFrame(pairs, columns=["src", "dst"])


def _ref_pagerank(pairs, n_iter=3, d_num=85, d_den=100, scale=SCALE):
    nodes = sorted({s for s, _ in pairs} | {d for _, d in pairs})
    out = {v: 0 for v in nodes}
    for s, _ in pairs:
        out[s] += 1
    n = len(nodes)
    base = scale // n
    rank = {v: base for v in nodes}
    for _ in range(n_iter):
        dang = sum(rank[v] for v in nodes if out[v] == 0)
        contrib = {v: 0 for v in nodes}
        for s, d in pairs:
            contrib[d] += rank[s] // out[s]
        rank = {
            v: ((d_den - d_num) * base + d_num * (contrib[v] + dang // n))
            // d_den
            for v in nodes
        }
    return (
        pd.DataFrame(
            {"node": nodes, "rank_scaled": [rank[v] for v in nodes]}
        ).astype({"rank_scaled": "int64"})
    )


GRAPH = [
    ("a", "b"), ("b", "c"), ("c", "a"),       # cycle
    ("a", "d"), ("b", "d"),                   # d: popular sink (outdeg 0)
    ("e", "a"),                               # e: source only
]


def test_pagerank_matches_bruteforce(ray_session):
    ds = ray.data.from_pandas(_edges(GRAPH))
    got = (
        pagerank(ds, n_iter=3, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref_pagerank(GRAPH))


def test_pagerank_mass_and_ordering(ray_session):
    # star: everyone points at h → h dominates
    star = [(f"x{i}", "h") for i in range(6)]
    ds = ray.data.from_pandas(_edges(star))
    got = pagerank(ds, n_iter=3, n_buckets=4).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("node").reset_index(drop=True), _ref_pagerank(star)
    )
    top = got.sort_values("rank_scaled", ascending=False).iloc[0]
    assert top["node"] == "h"
    # fixed-point floors only ever LOSE mass, never create it
    assert got["rank_scaled"].sum() <= SCALE
    assert got["rank_scaled"].sum() > SCALE * 0.98


def test_node_table_outdegrees(ray_session):
    ds = ray.data.from_pandas(_edges(GRAPH))
    nt = (
        node_table(ds, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    want = {"a": 2, "b": 2, "c": 1, "d": 0, "e": 1}
    assert dict(zip(nt["node"], nt["outdeg"])) == want


def test_pagerank_iteration_count_matters(ray_session):
    ds = ray.data.from_pandas(_edges(GRAPH))
    r1 = pagerank(ds, n_iter=1, n_buckets=4).to_pandas().sort_values("node")
    r3 = pagerank(ds, n_iter=3, n_buckets=4).to_pandas().sort_values("node")
    assert not r1["rank_scaled"].equals(r3["rank_scaled"])
    pd.testing.assert_frame_equal(
        r1.reset_index(drop=True), _ref_pagerank(GRAPH, n_iter=1)
    )


def test_triangle_count_known_graph():
    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles) plus a pendant edge (no new ones)
    edges = pd.DataFrame(
        {"a": [1, 1, 1, 2, 2, 3, 4], "b": [2, 3, 4, 3, 4, 4, 5]}
    ).astype("int64")
    ds = ray.data.from_pandas([p for p in np.array_split(edges, 3)])
    got = triangle_count(ds, n_buckets=4)
    assert got["n_triangles"].tolist() == [4]


def test_triangle_count_random_vs_bruteforce():
    import itertools

    import numpy as np
    import pandas as pd
    import ray.data

    from fastie_ray.ops.graph import triangle_count

    rng = np.random.default_rng(3)
    n = 25
    pairs = [(a, b) for a, b in itertools.combinations(range(n), 2)
             if rng.random() < 0.3]
    adj = set(pairs)
    brute = sum(
        1 for x, y, z in itertools.combinations(range(n), 3)
        if (x, y) in adj and (x, z) in adj and (y, z) in adj
    )
    edges = pd.DataFrame(pairs, columns=["a", "b"]).astype("int64")
    ds = ray.data.from_pandas([p for p in np.array_split(edges, 4)])
    got = triangle_count(ds, n_buckets=4)
    assert got["n_triangles"].tolist() == [brute]


# ---------------------------------------------------------------- khop


def _ref_bfs(pairs, seeds, k, directed=False):
    """Plain-Python BFS levels, the oracle for khop_reachability."""
    adj: dict = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    hop = {v: 0 for v in seeds}
    frontier = set(seeds)
    for i in range(1, k + 1):
        nxt = set()
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in hop:
                    hop[w] = i
                    nxt.add(w)
        frontier = nxt
    return hop


def _run_khop(pairs, seeds, k, directed=False):
    from fastie_ray.ops.graph import khop_reachability

    edges = ray.data.from_pandas(_edges(pairs))
    seed_ds = ray.data.from_pandas(pd.DataFrame({"node": seeds}))
    got = khop_reachability(
        edges, seed_ds, k, directed=directed, n_buckets=4
    ).to_pandas()
    return dict(zip(got["node"], got["hop"]))


def test_khop_chain_undirected():
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
    for k in (0, 1, 2, 3):
        assert _run_khop(pairs, ["a"], k) == _ref_bfs(pairs, ["a"], k)


def test_khop_directed_vs_undirected():
    pairs = [("a", "b"), ("c", "b"), ("c", "d")]
    # directed: b unreachable-from can't hop back to c
    assert _run_khop(pairs, ["a"], 3, directed=True) == _ref_bfs(
        pairs, ["a"], 3, directed=True
    ) == {"a": 0, "b": 1}
    assert _run_khop(pairs, ["a"], 3) == _ref_bfs(pairs, ["a"], 3)


def test_khop_isolated_seed_and_multi_seed():
    pairs = [("a", "b"), ("b", "c")]
    # seed 'z' has no edges: kept at hop 0; multi-seed min-hop wins
    got = _run_khop(pairs, ["z", "c"], 2)
    assert got == _ref_bfs(pairs, ["z", "c"], 2) == {"z": 0, "c": 0, "b": 1, "a": 2}


def test_khop_random_graphs_match_bfs():
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = 40
        pairs = [
            (f"n{rng.integers(n)}", f"n{rng.integers(n)}") for _ in range(120)
        ]
        pairs = [(s, d) for s, d in pairs if s != d]
        seeds = [f"n{rng.integers(n)}" for _ in range(3)]
        for directed in (False, True):
            assert _run_khop(pairs, seeds, 3, directed) == _ref_bfs(
                pairs, seeds, 3, directed
            )


def test_khop_semi_join_fallback_matches_broadcast():
    """broadcast_limit=0 forces the hash_join SEMI path every hop —
    both neighbor-generation strategies must agree exactly."""
    from fastie_ray.ops.graph import khop_reachability

    rng = np.random.default_rng(11)
    pairs = [(f"n{rng.integers(30)}", f"n{rng.integers(30)}") for _ in range(80)]
    pairs = [(s, d) for s, d in pairs if s != d]
    edges = ray.data.from_pandas(_edges(pairs))
    seeds = ray.data.from_pandas(pd.DataFrame({"node": ["n0", "n7"]}))
    a = khop_reachability(edges, seeds, 3, n_buckets=4).to_pandas()
    b = khop_reachability(
        edges, seeds, 3, n_buckets=4, broadcast_limit=0
    ).to_pandas()
    assert dict(zip(a["node"], a["hop"])) == dict(zip(b["node"], b["hop"]))
    assert dict(zip(a["node"], a["hop"])) == _ref_bfs(pairs, ["n0", "n7"], 3)


def _peel_reference(edges: pd.DataFrame, k: int, rounds: int) -> pd.DataFrame:
    """Driver-side peel: symmetrize-distinct, then R rounds of
    degree-filter — the kcore_peel contract."""
    e = pd.concat(
        [edges, edges.rename(columns={"src": "dst", "dst": "src"})],
        ignore_index=True,
    ).drop_duplicates()
    for _ in range(rounds):
        deg = e.groupby("src").size()
        keep = set(deg[deg >= k].index)
        e = e[e["src"].isin(keep) & e["dst"].isin(keep)]
    out = e.groupby("src", as_index=False).size()
    out.columns = ["node", "deg"]
    return out.sort_values("node").reset_index(drop=True)


def test_kcore_peel_cycle_with_tails():
    from fastie_ray.ops.graph import kcore_peel

    # a 4-cycle (the 2-core) with chains hanging off two of its nodes:
    # chains cascade-peel inward, the cycle survives with deg 2
    edges = pd.DataFrame(
        {
            "src": ["a", "b", "c", "d", "a", "t1", "t2", "c", "u1"],
            "dst": ["b", "c", "d", "a", "t1", "t2", "t3", "u1", "u2"],
        }
    )
    want = _peel_reference(edges, k=2, rounds=3)
    got = (
        kcore_peel(ray.data.from_pandas(edges).repartition(3), k=2, rounds=3, n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"deg": "int64"}), want.astype({"deg": "int64"}))
    assert set(got["node"]) == {"a", "b", "c", "d"}
    assert (got["deg"] == 2).all()
    # bounded-round == fixpoint here: one more round changes nothing
    again = kcore_peel(ray.data.from_pandas(edges), k=2, rounds=4, n_buckets=4).to_pandas()
    assert set(again["node"]) == {"a", "b", "c", "d"}


def test_kcore_peel_full_peel_yields_empty():
    from fastie_ray.ops.graph import kcore_peel

    # a pure path has no 2-core
    edges = pd.DataFrame(
        {"src": ["a", "b", "c", "d"], "dst": ["b", "c", "d", "e"]}
    )
    got = kcore_peel(ray.data.from_pandas(edges), k=2, rounds=3, n_buckets=4)
    assert got.count() == 0


def test_kcore_peel_random_vs_reference():
    from fastie_ray.ops.graph import kcore_peel

    rng = np.random.default_rng(11)
    n = 60
    edges = pd.DataFrame(
        {
            "src": [f"n{i}" for i in rng.integers(0, n, 300)],
            "dst": [f"n{i}" for i in rng.integers(0, n, 300)],
        }
    )
    edges = edges[edges["src"] != edges["dst"]].drop_duplicates()
    for k, rounds in ((2, 2), (3, 3), (5, 2)):
        want = _peel_reference(edges, k=k, rounds=rounds)
        got = (
            kcore_peel(ray.data.from_pandas(edges).repartition(4), k=k, rounds=rounds, n_buckets=4)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.astype({"deg": "int64"}), want.astype({"deg": "int64"})
        )


def test_functional_violations_and_path_census():
    import ray

    from fastie_ray.ops.kg_quality import functional_violations, relation_path_census

    edges = pd.DataFrame(
        {
            "subject_id": ["a", "a", "a", "b", "c", "c"],
            "predicate":  ["p", "p", "q", "p", "q", "q"],
            "object_id":  ["x", "y", "x", "x", "y", "z"],
            "n_support":  [3, 1, 2, 5, 1, 1],
        }
    )
    ds = ray.data.from_pandas(edges).repartition(3)
    v = functional_violations(ds, n_buckets=4).to_pandas().sort_values(
        ["subject_id", "predicate"]
    ).reset_index(drop=True)
    # a/p has objects {x,y}; c/q has {y,z}
    assert list(zip(v["subject_id"], v["predicate"])) == [("a", "p"), ("c", "q")]
    assert v["n_objects"].tolist() == [2, 2]
    assert v["total_support"].tolist() == [4, 2]
    # restricted to predicate q only
    vq = functional_violations(ds, predicates=["q"], n_buckets=4).to_pandas()
    assert set(vq["subject_id"]) == {"c"}

    # paths: a-p->x ... who has subject x? none; a-p->y, c-q->y: none from y;
    # add chainable rows
    edges2 = pd.DataFrame(
        {
            "subject_id": ["a", "x", "x", "y"],
            "predicate":  ["p", "q", "p", "q"],
            "object_id":  ["x", "y", "z", "w"],
        }
    )
    cen = relation_path_census(ray.data.from_pandas(edges2).repartition(2), n_buckets=4)
    # paths: a-p->x-q->y, a-p->x-p->z, x-q->y-q->w
    got = {(r.p1, r.p2): r.n_paths for r in cen.itertuples()}
    assert got == {("p", "q"): 1, ("p", "p"): 1, ("q", "q"): 1}


def test_pagerank_checkpoint_resume_bit_identical(tmp_path):
    import ray

    from fastie_ray.ops.graph import pagerank

    rng = np.random.default_rng(7)
    edges = pd.DataFrame(
        {
            "src": [f"n{i}" for i in rng.integers(0, 40, 150)],
            "dst": [f"n{i}" for i in rng.integers(0, 40, 150)],
        }
    ).drop_duplicates()
    ds = ray.data.from_pandas(edges)

    straight = pagerank(ds, n_iter=3).to_pandas().sort_values("node").reset_index(drop=True)

    ck = str(tmp_path / "pr")
    # "crashed" run: completes only 2 of 3 iterations
    pagerank(ds, n_iter=2, checkpoint_dir=ck).to_pandas()
    # resumed run picks up from iter 2 and runs only iter 3
    resumed = (
        pagerank(ds, n_iter=3, checkpoint_dir=ck, resume=True)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(resumed, straight)


def test_pagerank_checkpoint_ignores_incomplete(tmp_path):
    import os

    import ray

    from fastie_ray.ops.graph import _pagerank_ckpt_latest, pagerank

    edges = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
    ds = ray.data.from_pandas(edges)
    ck = str(tmp_path / "pr")
    pagerank(ds, n_iter=2, checkpoint_dir=ck).to_pandas()
    # simulate a mid-write crash at iter 3: directory without marker
    os.makedirs(os.path.join(ck, "iter_0003"))
    assert _pagerank_ckpt_latest(ck, 3) == 2
    straight = pagerank(ds, n_iter=3).to_pandas().sort_values("node").reset_index(drop=True)
    resumed = (
        pagerank(ds, n_iter=3, checkpoint_dir=ck, resume=True)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(resumed, straight)


def test_kcore_broadcast_and_semijoin_paths_agree():
    import ray

    from fastie_ray.ops.graph import kcore_peel

    rng = np.random.default_rng(53)
    edges = pd.DataFrame(
        {
            "src": [f"n{i}" for i in rng.integers(0, 50, 260)],
            "dst": [f"n{i}" for i in rng.integers(0, 50, 260)],
        }
    )
    edges = edges[edges["src"] != edges["dst"]].drop_duplicates()
    ds = ray.data.from_pandas(edges)
    a = kcore_peel(ds, k=3, rounds=3, n_buckets=4).to_pandas().sort_values(
        "node"
    ).reset_index(drop=True)
    b = kcore_peel(
        ds, k=3, rounds=3, n_buckets=4, broadcast_threshold=0  # force semi-join
    ).to_pandas().sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_weighted_pagerank_favors_heavy_edges(ray_session):
    import ray.data

    from fastie_ray.ops.graph import pagerank

    # a sends 9/10 of its rank to b and 1/10 to c
    edges = ray.data.from_items(
        [
            {"src": "a", "dst": "b", "w": 9},
            {"src": "a", "dst": "c", "w": 1},
        ]
    )
    out = (
        pagerank(edges, n_iter=3, weight_col="w")
        .to_pandas()
        .set_index("node")["rank_scaled"]
    )
    assert out["b"] > out["c"] > 0
    # uniform weights reproduce the unweighted ranks exactly
    uni_w = ray.data.from_items(
        [
            {"src": "a", "dst": "b", "w": 1},
            {"src": "a", "dst": "c", "w": 1},
        ]
    )
    uni = ray.data.from_items(
        [{"src": "a", "dst": "b"}, {"src": "a", "dst": "c"}]
    )
    w_ranks = pagerank(uni_w, n_iter=3, weight_col="w").to_pandas()
    u_ranks = pagerank(uni, n_iter=3).to_pandas()
    merged = w_ranks.merge(u_ranks, on="node", suffixes=("_w", "_u"))
    assert (merged["rank_scaled_w"] == merged["rank_scaled_u"]).all()


def test_personalized_pagerank_restarts_at_seeds(ray_session):
    import ray.data

    from fastie_ray.ops.graph import pagerank

    # two disconnected components; seeding in one leaves the other at 0
    edges = ray.data.from_items(
        [
            {"src": "a", "dst": "b"},
            {"src": "b", "dst": "a"},
            {"src": "x", "dst": "y"},
        ]
    )
    # even iteration count: rank mass on the 2-cycle sits at the seed
    # (odd counts park it at b — the cycle oscillates toward the
    # fixpoint, and the integer arithmetic preserves that exactly)
    out = (
        pagerank(edges, n_iter=4, seeds=["a"])
        .to_pandas()
        .set_index("node")["rank_scaled"]
    )
    assert out["a"] > out["b"] > 0
    assert out["x"] == 0 and out["y"] == 0


def test_reciprocity_counts(ray_session):
    import ray.data

    from fastie_ray.ops.graph import reciprocity

    edges = ray.data.from_items(
        [
            {"src": "a", "dst": "b"},
            {"src": "b", "dst": "a"},   # reciprocal pair
            {"src": "a", "dst": "c"},   # one-way
            {"src": "d", "dst": "d"},   # self-loop: its own reverse
        ]
    ).repartition(2)
    out = reciprocity(edges, n_buckets=4)
    assert int(out["n_edges"].iloc[0]) == 4
    assert int(out["n_reciprocal"].iloc[0]) == 3


def _ref_lpa(pairs, rounds):
    """Pure-python synchronous LPA: count desc, label asc tie-break."""
    adj = {}
    seen = set()
    for s, d in pairs:
        for a, b in ((s, d), (d, s)):
            if (a, b) not in seen:
                seen.add((a, b))
                adj.setdefault(b, []).append(a)
    lab = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v, nbrs in adj.items():
            cnt = {}
            for u in nbrs:
                cnt[lab[u]] = cnt.get(lab[u], 0) + 1
            new[v] = min(cnt, key=lambda L: (-cnt[L], L))
        lab = new
    return lab


def test_lpa_two_communities(ray_session):
    import ray.data

    from fastie_ray.ops.graph import lpa_communities

    # two disconnected triangles: labels can't cross, min label wins each
    pairs = [
        ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
        ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
        ("a1", "a2"),  # duplicate edge must not double-count
    ]
    edges = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in pairs]
    ).repartition(3)
    out = lpa_communities(edges, rounds=4, n_buckets=4).to_pandas()
    got = dict(zip(out["node"], out["community_id"]))
    assert got == _ref_lpa(pairs, 4)
    # the two triangles land in different communities
    assert got["a2"] != got["b2"]
    assert got["a2"] == got["a3"] and got["b2"] == got["b3"]


def test_lpa_matches_reference_on_random_graph(ray_session):
    import numpy as np
    import ray.data

    from fastie_ray.ops.graph import lpa_communities

    rng = np.random.default_rng(11)
    pairs = [
        (f"n{rng.integers(0, 30)}", f"n{rng.integers(0, 30)}")
        for _ in range(60)
    ]
    edges = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in pairs]
    ).repartition(4)
    for rounds in (1, 3):
        out = lpa_communities(edges, rounds=rounds, n_buckets=4).to_pandas()
        got = dict(zip(out["node"], out["community_id"]))
        assert got == _ref_lpa(pairs, rounds)


def test_triad_closure_census_known_motifs(ray_session):
    from fastie_ray.ops.graph import triad_closure_census

    # one 3-cycle (x→y→z→x), one feed-forward (p→q, q→r, p→r),
    # plus a dangling edge
    edges = pd.DataFrame(
        [("x", "y"), ("y", "z"), ("z", "x"),
         ("p", "q"), ("q", "r"), ("p", "r"),
         ("r", "s")],
        columns=["src", "dst"],
    )
    got = triad_closure_census(
        ray.data.from_pandas(edges), n_buckets=4
    )
    assert got["cyclic_paths"].iloc[0] == 3
    assert got["n_cycles"].iloc[0] == 1
    assert got["transitive_paths"].iloc[0] == 1


def test_triad_closure_census_bruteforce(ray_session):
    from fastie_ray.ops.graph import triad_closure_census

    rng = np.random.default_rng(71)
    n = 120
    u = rng.integers(0, 15, n)
    v = rng.integers(0, 15, n)
    m = u != v
    edges = pd.DataFrame(
        {"src": [f"n{i}" for i in u[m]], "dst": [f"n{i}" for i in v[m]]}
    ).drop_duplicates().reset_index(drop=True)
    es = set(map(tuple, edges.itertuples(index=False)))
    cyc = tr = 0
    for a, b in es:
        for b2, c in es:
            if b2 != b or c == a:
                continue
            if (c, a) in es:
                cyc += 1
            if (a, c) in es:
                tr += 1
    got = triad_closure_census(
        ray.data.from_pandas(edges).repartition(3), n_buckets=4
    )
    assert got["cyclic_paths"].iloc[0] == cyc
    assert got["transitive_paths"].iloc[0] == tr
    assert got["n_cycles"].iloc[0] == cyc // 3


def test_transitive_closure_chain_and_cycle(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.graph import transitive_closure

    # chain 1←2←3←4←5 (parent = n-1) plus a 2-cycle 10↔11
    edges = pd.DataFrame(
        {"node": [2, 3, 4, 5, 10, 11], "parent": [1, 2, 3, 4, 11, 10]}
    )
    out = (
        transitive_closure(
            ray.data.from_pandas(edges).repartition(3),
            max_rounds=6, n_buckets=4,
        )
        .to_pandas()
        .sort_values(["node", "ancestor"])
        .reset_index(drop=True)
    )
    got = set(zip(out["node"], out["ancestor"]))
    want = {(n, a) for n in range(2, 6) for a in range(1, n)}
    want |= {(10, 11), (11, 10)}
    assert got == want


def test_transitive_closure_doubling_depth(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.graph import transitive_closure

    # depth-40 chain closes within 8 doubling rounds (2^6 ≥ 40, plus
    # the fixpoint-detection round) — linear chaining would need 40
    n = 41
    edges = pd.DataFrame({"node": range(2, n + 1), "parent": range(1, n)})
    out = transitive_closure(
        ray.data.from_pandas(edges), max_rounds=8, n_buckets=4
    ).to_pandas()
    assert len(out) == n * (n - 1) // 2


def test_link_prediction_ra_weight_bruteforce(ray_session):
    import itertools

    import pandas as pd
    import ray.data

    from fastie_ray.ops.graph import link_prediction

    rng = __import__("random").Random(7)
    nodes = [f"n{i:02d}" for i in range(14)]
    es = sorted({
        tuple(sorted(rng.sample(nodes, 2))) for _ in range(30)
    })
    edges = pd.DataFrame(es, columns=["a", "b"])
    out = link_prediction(
        ray.data.from_pandas(edges).repartition(3),
        k=10, n_buckets=4, weight="ra",
    )

    adj: dict[str, set[str]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = {}
    for u, v in itertools.combinations(sorted(adj), 2):
        if v in adj[u]:
            continue
        cn = adj[u] & adj[v]
        if cn:
            scores[(u, v)] = sum(1_000_000 // len(adj[z]) for z in cn)
    want = sorted(
        ((s, u, v) for (u, v), s in scores.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:10]
    got = list(zip(out["ra_e6"], out["u"], out["v"]))
    assert got == want


def test_anf_reach_state_and_estimate(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.graph import anf_reach
    from fastie_ray.ops.sketch import _hash60

    # star + chain: c -> s_i (50 leaves), plus chain c0->c1->c2->c3
    edges = pd.DataFrame(
        {"src": ["c"] * 50 + ["c0", "c1", "c2"],
         "dst": [f"s{i}" for i in range(50)] + ["c1", "c2", "c3"]}
    )
    out = (
        anf_reach(ray.data.from_pandas(edges).repartition(3),
                  max_hops=3, n_registers=64, n_buckets=4)
        .to_pandas().set_index("node")
    )
    # exact register state for the hub: self + 50 leaves
    import numpy as np

    members = ["c"] + [f"s{i}" for i in range(50)]
    h = _hash60(pd.Index(members))
    reg = (h % 64).astype(np.int64)
    rest = h // 64
    rho = np.full(len(members), 61, dtype=np.int64)
    nz = rest != 0
    rho[nz] = np.log2((rest[nz] & -rest[nz]).astype(np.float64)).astype(
        np.int64
    ) + 1
    regs = np.zeros(64, dtype=np.int64)
    np.maximum.at(regs, reg, rho)
    assert out.loc["c", "regs_nonzero"] == int((regs > 0).sum())
    assert out.loc["c", "rho_sum"] == int(regs.sum())
    # a leaf reaches only itself; chain head reaches all 4 chain nodes
    assert out.loc["s0", "regs_nonzero"] == 1
    c0 = _hash60(pd.Index(["c0", "c1", "c2", "c3"]))
    assert out.loc["c0", "regs_nonzero"] == len(set(c0 % 64))
