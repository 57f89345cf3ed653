"""Deterministic random-walk corpus (ops/graph.random_walks)."""

import hashlib

import pandas as pd
import ray.data

from fastie_ray.ops.graph import random_walks


def _edges(rows):
    return ray.data.from_items([{"src": s, "dst": d} for s, d in rows])


def _pick(salt, s, w, t, node, nbrs):
    idx = int(hashlib.md5(f"{salt}:{s}:{w}:{t}:{node}".encode()).hexdigest()[:8], 16)
    return sorted(nbrs)[idx % len(nbrs)]


def test_walks_follow_md5_grid_and_stop_at_sinks(ray_session):
    # a -> {b, c}; b -> {c}; c is a sink
    ds = _edges([("a", "b"), ("a", "c"), ("b", "c"), ("a", "b")])  # dup edge
    out = random_walks(ds, walk_len=4, walks_per_node=2).to_pandas()
    # seeds = nodes with outgoing edges: a, b
    assert set(out["start"]) == {"a", "b"}
    for (s, w), g in out.groupby(["start", "walk"]):
        g = g.sort_values("step")
        assert list(g["step"]) == list(range(len(g)))
        node = s
        adj = {"a": ["b", "c"], "b": ["c"]}
        for t, row in enumerate(g.itertuples()):
            assert row.node == node
            if node in adj and t < len(g) - 1:
                node = _pick("walk", s, w, t + 1, node, adj[node])
        # walk either used the full budget or ended on the sink
        assert len(g) == 4 or g["node"].iloc[-1] == "c"

    # deterministic: a second run is identical
    out2 = random_walks(ds, walk_len=4, walks_per_node=2).to_pandas()
    key = ["start", "walk", "step"]
    pd.testing.assert_frame_equal(
        out.sort_values(key).reset_index(drop=True),
        out2.sort_values(key).reset_index(drop=True),
    )


def test_walks_per_node_and_salt(ray_session):
    ds = _edges([("x", "y"), ("y", "x")])
    out = random_walks(ds, walk_len=3, walks_per_node=3).to_pandas()
    assert len(out) == 2 * 3 * 3  # no sinks: full-length walks
    alt = random_walks(ds, walk_len=3, walks_per_node=3, salt="other").to_pandas()
    assert len(alt) == len(out)  # same shape, possibly different paths


def test_join_extension_walks_match_broadcast(ray_session):
    import pandas as pd
    import ray.data

    from fastie_ray.ops.graph import random_walks, random_walks_join

    ds = _edges(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d"), ("b", "a")]
    )
    key = ["start", "walk", "step"]
    a = random_walks(ds, walk_len=4, walks_per_node=2).to_pandas()
    b = random_walks_join(ds, walk_len=4, walks_per_node=2, n_buckets=4).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True)[key + ["node"]],
        b.sort_values(key).reset_index(drop=True)[key + ["node"]],
    )


def test_walk_skipgrams_match_bruteforce(ray_session):
    import hashlib

    import numpy as np
    import ray.data

    from fastie_ray.ops.graph import walk_skipgrams

    # two hand-written walks: w1 = a,b,c,d ; w2 = b,c (keyed by start)
    rows = [
        ("a", 0, "a"), ("a", 1, "b"), ("a", 2, "c"), ("a", 3, "d"),
        ("b", 0, "b"), ("b", 1, "c"),
    ]
    walks = ray.data.from_items(
        [{"start": s, "step": t, "node": n} for s, t, n in rows]
    )
    got = (
        walk_skipgrams(walks, window=2, negatives_per_pos=1, n_buckets=4)
        .to_pandas()
        .sort_values(["center", "context", "label"])
        .reset_index(drop=True)
    )

    vocab = np.sort(np.unique([n for _, _, n in rows]))
    counts: dict[tuple, int] = {}
    by_walk: dict[str, list] = {}
    for s, t, n in rows:
        by_walk.setdefault(s, []).append((t, n))
    for s, steps in by_walk.items():
        for ti, ni in steps:
            for tj, nj in steps:
                if 1 <= abs(ti - tj) <= 2:
                    counts[(ni, nj, 1)] = counts.get((ni, nj, 1), 0) + 1
                    key = f"neg:{s}:{ti}:{tj}:0"
                    h = int(hashlib.md5(key.encode()).hexdigest()[:15], 16)
                    neg = vocab[h % len(vocab)]
                    counts[(ni, neg, 0)] = counts.get((ni, neg, 0), 0) + 1

    want = pd.DataFrame(
        [{"center": c, "context": x, "label": l, "n": n}
         for (c, x, l), n in counts.items()]
    ).sort_values(["center", "context", "label"]).reset_index(drop=True)
    want["label"] = want["label"].astype("int64")
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(
        got[["center", "context", "label", "n"]], want
    )
    # every positive drew exactly one negative
    assert got.loc[got["label"] == 0, "n"].sum() == \
        got.loc[got["label"] == 1, "n"].sum()
