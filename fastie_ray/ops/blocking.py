"""Sorted-neighborhood blocking for entity resolution — generate
candidate string pairs for the KG linker beyond exact alias hits: sort
the distinct surface vocabulary, pair each value with its successor,
and keep pairs sharing a long common prefix (typo/variant candidates:
"acme corp" / "acme corporation").

Exchange-clean distribution without boundary stitching: a qualifying
pair shares ≥ ``min_prefix`` characters, hence its FIRST character —
and the global sort order restricted to one first-character class is
contiguous — so bucketing by first character, sorting within the
bucket, and pairing in-bucket successors yields EXACTLY the global
successor pairs that can pass the prefix filter (cross-bucket
successors share no prefix and are filtered anyway). One bucketed
exchange over the DISTINCT vocabulary (vocab-bounded, never corpus);
the in-bucket sort is a vectorized pandas sort. SQL-reproducible via
``LEAD() OVER (ORDER BY value)`` + prefix equality.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.dedup import dedup_exact

if TYPE_CHECKING:
    import ray.data


def sorted_neighborhood_pairs(
    ds: "ray.data.Dataset",
    col: str,
    min_prefix: int = 4,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """(a, b, prefix_len) candidate pairs: b is a's successor in the
    globally sorted distinct values of ``col`` and they share ≥
    ``min_prefix`` leading characters. Empty values are ignored."""

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna()
        v = v[v.str.len() > 0].drop_duplicates()
        return pd.DataFrame({"v": v})

    uniq = dedup_exact(
        ds.map_batches(distinct, batch_format="pandas"), ["v"], n_buckets
    )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        # first character IS the co-location key (see module docstring)
        df["__b"] = df["v"].str[0].map(ord).astype("int64") % 251
        return df

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one first-char class per group key; sort = the global order
        # restricted to this contiguous class
        out_frames = []
        for _, grp in g.groupby("__b"):
            v = grp["v"].sort_values(kind="mergesort").to_numpy()
            if len(v) < 2:
                continue
            a, b = v[:-1], v[1:]
            plen = np.fromiter(
                (len(_common_prefix(x, y)) for x, y in zip(a, b)),
                dtype=np.int64,
                count=len(a),
            )
            keep = plen >= min_prefix
            out_frames.append(
                pd.DataFrame(
                    {"a": a[keep], "b": b[keep], "prefix_len": plen[keep]}
                )
            )
        if not out_frames:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=object),
                    "b": pd.Series([], dtype=object),
                    "prefix_len": pd.Series([], dtype="int64"),
                }
            )
        return pd.concat(out_frames, ignore_index=True)

    return (
        uniq.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(pairs, batch_format="pandas")
    )


def _common_prefix(x: str, y: str) -> str:
    n = min(len(x), len(y))
    i = 0
    while i < n and x[i] == y[i]:
        i += 1
    return x[:i]


def _levenshtein(x: str, y: str) -> int:
    """Classic DP edit distance — candidate pairs are blocking-bounded
    (≪ corpus) and surfaces are short, so the per-pair loop is cheap."""
    if x == y:
        return 0
    if len(x) < len(y):
        x, y = y, x
    prev = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        cur = [i]
        for j, cy in enumerate(y, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy)))
        prev = cur
    return prev[-1]


def verify_pairs_edit_distance(
    pairs: "ray.data.Dataset",
    max_dist: int = 2,
    a_col: str = "a",
    b_col: str = "b",
) -> "ray.data.Dataset":
    """ER match verification: keep candidate pairs with Levenshtein
    distance ≤ ``max_dist``, emitting (a, b, edit_dist). Streaming and
    exchange-free — the expensive quadratic comparison runs only on the
    blocking-bounded candidate set, never all O(n²) pairs (the whole
    point of blocking). SQL-exact via DuckDB ``levenshtein``."""

    def verify(df: pd.DataFrame):
        import pyarrow as pa

        d = np.fromiter(
            (_levenshtein(x, y) for x, y in zip(df[a_col], df[b_col])),
            dtype=np.int64,
            count=len(df),
        )
        keep = d <= max_dist
        out = pd.DataFrame(
            {a_col: df[a_col].to_numpy()[keep], b_col: df[b_col].to_numpy()[keep],
             "edit_dist": d[keep]}
        )
        # typed Arrow out: candidate blocks are sparse and zero-row
        # pandas blocks lose their schema (NOTES fact 3/12)
        return pa.Table.from_pandas(
            out,
            schema=pa.schema(
                [(a_col, pa.string()), (b_col, pa.string()),
                 ("edit_dist", pa.int64())]
            ),
            preserve_index=False,
        )

    return pairs.map_batches(verify, batch_format="pandas")


def golden_records(
    ds: "ray.data.Dataset",
    col: str,
    min_prefix: int = 4,
    max_dist: int = 2,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """ER survivorship: collapse match CLUSTERS into golden records —
    the merge step after blocking + verification. A cluster is a
    maximal run of sort-successors that qualify (shared prefix ≥
    ``min_prefix`` AND Levenshtein ≤ ``max_dist``); since match edges
    only ever connect in-class successors (module docstring), connected
    components degenerate to gaps-and-islands runs, computable inside
    the SAME single first-char-bucketed exchange as blocking — no CC
    iteration, no second shuffle.

    Survivorship rule (deterministic): canonical = the longest member,
    ties to the lexicographically smallest; ``cluster_id`` = the
    lexicographically smallest member. Emits only clusters with ≥ 2
    members (singletons pass through a pipeline unchanged).
    SQL-reproducible via LAG + cumulative break-sum islands."""

    def distinct(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].dropna()
        v = v[v.str.len() > 0].drop_duplicates()
        return pd.DataFrame({"v": v})

    uniq = dedup_exact(
        ds.map_batches(distinct, batch_format="pandas"), ["v"], n_buckets
    )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = df["v"].str[0].map(ord).astype("int64") % 251
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].sort_values(kind="mergesort").to_numpy()
        rows = []
        run: list[str] = [v[0]] if len(v) else []
        for x, y in zip(v[:-1], v[1:]):
            ok = (
                len(_common_prefix(x, y)) >= min_prefix
                and _levenshtein(x, y) <= max_dist
            )
            if ok:
                run.append(y)
            else:
                rows.append(run)
                run = [y]
        if run:
            rows.append(run)
        out = [
            {
                "cluster_id": r[0],  # sorted run: first = lexicographic min
                "n_members": len(r),
                "canonical": min(r, key=lambda s: (-len(s), s)),
            }
            for r in rows
            if len(r) >= 2
        ]
        return pd.DataFrame(
            out,
            columns=["cluster_id", "n_members", "canonical"],
        ).astype({"n_members": "int64"}) if out else pd.DataFrame(
            {
                "cluster_id": pd.Series([], dtype=object),
                "n_members": pd.Series([], dtype="int64"),
                "canonical": pd.Series([], dtype=object),
            }
        )

    return (
        uniq.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(merge, batch_format="pandas")
    )

def ed1_pairs(
    ds: "ray.data.Dataset",
    col: str,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """ALL unordered pairs of DISTINCT strings at Levenshtein distance
    exactly 1 — the FastSS deletion-neighborhood fuzzy join (typo-level
    entity matching / id-collision audits), EXACT and complete without
    an all-pairs comparison.

    Completeness: ed(s, t) ≤ 1 ⇒ D₁(s) ∩ D₁(t) ≠ ∅ where D₁(s) =
    {s} ∪ one-char deletions (a substitution shares the common
    deletion; an insertion/deletion shares the shorter string itself).
    The converse over-generates (e.g. "ab"/"ba" share "a"), so groups
    VERIFY with exact Levenshtein.

    Scale shape: per-batch distinct-value combiner → variant emission
    ((len+1)× amplification of the DISTINCT string table, not the
    corpus), each deletion variant CARRYING ITS DELETION POSITION →
    ONE variant-bucketed raw-task exchange. The position makes
    verification pure algebra, no Levenshtein and no D₁-set
    intersections (ed(u,v)=1 is: substitution at p ⟺ u and v delete
    the SAME position p to the SAME variant — unique (w,p) per pair,
    so single emission is automatic even for repeated-char strings;
    insertion/deletion ⟺ the shared variant IS the shorter string —
    its unique shared variant). In-group work is two vectorized
    pandas self/cross merges; hot variants come from very short
    strings (the documented FastSS caveat — prefilter by length if
    the domain has them). Output (u, v), u < v."""
    from fastie_ray.state.exchange import BlockSet

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        ss = pd.unique(df[col].astype(str))
        out_v, out_s, out_p = [], [], []
        for s in ss:
            out_v.append(s)
            out_s.append(s)
            out_p.append(-1)
            for i in range(len(s)):
                out_v.append(s[:i] + s[i + 1:])
                out_s.append(s)
                out_p.append(i)
        return pd.DataFrame(
            {"variant": out_v, "s": out_s,
             "pos": pd.Series(out_p, dtype="int64")}
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # cross-batch duplicate strings re-emit identical variant rows
        g = g.drop_duplicates()
        dele = g[g["pos"] >= 0]
        selfr = g.loc[g["pos"] < 0, ["variant"]]
        # insertion/deletion pairs: longer string × the variant string
        # itself (unique shared variant ⇒ emitted once); dedupe the
        # repeated-char case (several positions → same variant)
        cross = dele.merge(selfr, on="variant")[["variant", "s"]]
        cross = cross.drop_duplicates()
        # substitution pairs: same (variant, deletion position)
        eq = dele.merge(dele, on=["variant", "pos"])
        eq = eq[eq["s_x"] < eq["s_y"]]
        cu = np.where(
            cross["s"].to_numpy() < cross["variant"].to_numpy(),
            cross["s"].to_numpy(), cross["variant"].to_numpy(),
        )
        cv = np.where(
            cross["s"].to_numpy() < cross["variant"].to_numpy(),
            cross["variant"].to_numpy(), cross["s"].to_numpy(),
        )
        return pd.DataFrame(
            {
                "u": pd.Series(
                    np.concatenate([cu, eq["s_x"].to_numpy()]), dtype=object
                ),
                "v": pd.Series(
                    np.concatenate([cv, eq["s_y"].to_numpy()]), dtype=object
                ),
            }
        )

    return (
        BlockSet.from_dataset(ds)
        .exchange(["variant"], pairs, n_buckets=n_buckets, map_fn=variants)
        .to_dataset()
    )

def ed1_lookup(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    left_col: str,
    right_col: str,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Typo-tolerant DICTIONARY lookup — all (query, entry) pairs of
    DISTINCT left strings × DISTINCT right strings at Levenshtein
    distance ≤ 1 (including exact matches): the entity-linking /
    alias-resolution companion to ``ed1_pairs`` (self-join). Same
    FastSS deletion-neighborhood machinery as ``ed1_pairs``: both
    sides emit their D₁ variants (each deletion carrying its deletion
    POSITION) into ONE variant-bucketed raw-task exchange, and
    verification is pure algebra — ed=0 ⟺ both self rows meet at the
    string itself; substitution (ed=1, equal length) ⟺ same
    (variant, position) across sides; insertion/deletion (ed=1) ⟺
    one side's self row meets the other side's deletion row — each
    pair's witness is unique, so emission is single with no dedup
    exchange and no Levenshtein. Returns (query, entry, edit_dist)."""
    from fastie_ray.state.exchange import BlockSet

    def variants(col: str, side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            ss = pd.unique(df[col].astype(str))
            out_v, out_s, out_p = [], [], []
            for s in ss:
                out_v.append(s)
                out_s.append(s)
                out_p.append(-1)
                for i in range(len(s)):
                    out_v.append(s[:i] + s[i + 1:])
                    out_s.append(s)
                    out_p.append(i)
            return pd.DataFrame(
                {"variant": out_v, "s": out_s,
                 "pos": pd.Series(out_p, dtype="int64"), "side": side}
            )

        return fn

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates()
        l_self = g.loc[(g["side"] == "l") & (g["pos"] < 0), ["variant", "s"]]
        r_self = g.loc[(g["side"] == "r") & (g["pos"] < 0), ["variant", "s"]]
        l_del = g.loc[(g["side"] == "l") & (g["pos"] >= 0),
                      ["variant", "s", "pos"]]
        r_del = g.loc[(g["side"] == "r") & (g["pos"] >= 0),
                      ["variant", "s", "pos"]]
        frames = []
        # ed=0: exact matches meet at their own self variant
        ex = l_self.merge(r_self, on="variant")
        if len(ex):
            frames.append(
                pd.DataFrame({"query": ex["s_x"], "entry": ex["s_y"],
                              "edit_dist": np.int64(0)})
            )
        # ed=1 substitution: same (variant, deletion position)
        sub = l_del.merge(r_del, on=["variant", "pos"])
        sub = sub[sub["s_x"] != sub["s_y"]]
        if len(sub):
            frames.append(
                pd.DataFrame({"query": sub["s_x"], "entry": sub["s_y"],
                              "edit_dist": np.int64(1)})
            )
        # ed=1 insertion/deletion: longer query × entry-as-variant,
        # and query-as-variant × longer entry (dedupe repeated-char
        # multi-position emissions)
        c1 = l_del.merge(r_self, on="variant")[["s_x", "variant"]]
        c1 = c1.drop_duplicates()
        if len(c1):
            frames.append(
                pd.DataFrame({"query": c1["s_x"], "entry": c1["variant"],
                              "edit_dist": np.int64(1)})
            )
        c2 = l_self.merge(r_del, on="variant")[["variant", "s_y"]]
        c2 = c2.drop_duplicates()
        if len(c2):
            frames.append(
                pd.DataFrame({"query": c2["variant"], "entry": c2["s_y"],
                              "edit_dist": np.int64(1)})
            )
        if not frames:
            return pd.DataFrame(
                {"query": pd.Series([], dtype=object),
                 "entry": pd.Series([], dtype=object),
                 "edit_dist": pd.Series([], dtype="int64")}
            )
        return pd.concat(frames, ignore_index=True)

    tagged = BlockSet.from_dataset(left).map(variants(left_col, "l")).union(
        BlockSet.from_dataset(right).map(variants(right_col, "r"))
    )
    return tagged.exchange(["variant"], pairs, n_buckets=n_buckets).to_dataset()
