"""Test ops.graph.local_clustering against a brute-force per-node
triangle/coefficient oracle on a random graph."""

import itertools

import numpy as np
import pandas as pd

import ray.data


def _ds(df: pd.DataFrame, n_blocks: int = 3):
    return ray.data.from_pandas(
        [p for p in np.array_split(df, n_blocks) if len(p)]
    )


def test_local_clustering_matches_bruteforce():
    from fastie_ray.ops.graph import local_clustering

    rng = np.random.default_rng(43)
    edges = pd.DataFrame(
        {
            "a": rng.integers(0, 25, 120).astype(np.int64),
            "b": rng.integers(0, 25, 120).astype(np.int64),
        }
    )
    lo = edges.min(axis=1)
    hi = edges.max(axis=1)
    edges = pd.DataFrame({"a": lo, "b": hi})
    edges = edges[edges["a"] < edges["b"]].drop_duplicates().reset_index(
        drop=True
    )

    got = (
        local_clustering(_ds(edges, 3), n_buckets=4)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
        .astype({"node": "int64"})
    )

    adj: dict = {}
    for a, b in edges.itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = []
    for v in sorted(adj):
        nbrs = sorted(adj[v])
        t = sum(
            1 for x, y in itertools.combinations(nbrs, 2) if y in adj[x]
        )
        d = len(nbrs)
        coeff = (2 * t * 1_000_000) // (d * (d - 1)) if d >= 2 else 0
        rows.append((v, t, d, coeff))
    want = pd.DataFrame(
        rows, columns=["node", "n_triangles", "degree", "coeff_e6"]
    ).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), want)
    # cross-check: corner counts sum to 3x the global triangle count
    from fastie_ray.ops.graph import triangle_count

    n_tri = int(triangle_count(_ds(edges, 3), n_buckets=4)["n_triangles"][0])
    assert int(got["n_triangles"].sum()) == 3 * n_tri
