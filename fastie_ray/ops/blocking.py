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
    corpus) → ONE variant-bucketed exchange. A pair sharing several
    variants would be emitted by several groups, so each group
    recomputes min(D₁(u) ∩ D₁(v)) FROM THE PAIR ITSELF and emits only
    in that canonical variant's group — single emission, no dedup
    exchange (the canonical-chunk rule at the variant level). In-group
    cost is density²; hot variants come from very short strings (the
    documented FastSS caveat — prefilter by length if the domain has
    them). Output (u, v), u < v."""
    import pyarrow as pa

    def variants(df: pd.DataFrame) -> pd.DataFrame:
        ss = pd.unique(df[col].astype(str))
        out_v, out_s = [], []
        for s in ss:
            vs = {s}
            vs.update(s[:i] + s[i + 1:] for i in range(len(s)))
            out_v.extend(vs)
            out_s.extend([s] * len(vs))
        return pd.DataFrame({"variant": out_v, "s": out_s})

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["variant"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    schema = pa.schema([("u", pa.string()), ("v", pa.string())])

    def pairs(g: pd.DataFrame) -> pa.Table:
        rows_u, rows_v = [], []
        for variant, grp in g.groupby("variant", sort=False):
            ss = sorted(set(grp["s"]))
            for i in range(len(ss)):
                for j in range(i + 1, len(ss)):
                    u, v = ss[i], ss[j]
                    if abs(len(u) - len(v)) > 1 or _levenshtein(u, v) != 1:
                        continue
                    du = {u}
                    du.update(u[:p] + u[p + 1:] for p in range(len(u)))
                    dv = {v}
                    dv.update(v[:p] + v[p + 1:] for p in range(len(v)))
                    if min(du & dv) == variant:
                        rows_u.append(u)
                        rows_v.append(v)
        return pa.Table.from_pandas(
            pd.DataFrame({"u": rows_u, "v": rows_v}),
            preserve_index=False,
            schema=schema,
        )

    # cross-batch duplicate strings collapse inside the variant groups
    # (pairs are over the distinct set), so no global distinct pass is
    # needed before emission
    return (
        ds.map_batches(variants, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: pairs(g.drop(columns="__b")), batch_format="pandas"
        )
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
    FastSS deletion-neighborhood machinery: both sides emit their D₁
    variants into ONE variant-bucketed exchange; a pair sharing
    several variants is emitted only in its min shared variant's group
    (recomputed from the pair itself — single emission, no dedup
    exchange); in-group exact Levenshtein verification. Returns
    (query, entry, edit_dist)."""
    import pyarrow as pa

    def variants(col: str, side: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            ss = pd.unique(df[col].astype(str))
            out_v, out_s = [], []
            for s in ss:
                vs = {s}
                vs.update(s[:i] + s[i + 1:] for i in range(len(s)))
                out_v.extend(vs)
                out_s.extend([s] * len(vs))
            return pd.DataFrame(
                {"variant": out_v, "s": out_s, "side": side}
            )

        return fn

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["variant"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    schema = pa.schema(
        [("query", pa.string()), ("entry", pa.string()),
         ("edit_dist", pa.int64())]
    )

    def pairs(g: pd.DataFrame) -> pa.Table:
        rows = []
        for variant, grp in g.groupby("variant", sort=False):
            ls = sorted(set(grp.loc[grp["side"] == "l", "s"]))
            rs = sorted(set(grp.loc[grp["side"] == "r", "s"]))
            for q in ls:
                dq = {q}
                dq.update(q[:p] + q[p + 1:] for p in range(len(q)))
                for e in rs:
                    if abs(len(q) - len(e)) > 1:
                        continue
                    d = _levenshtein(q, e)
                    if d > 1:
                        continue
                    de = {e}
                    de.update(e[:p] + e[p + 1:] for p in range(len(e)))
                    if min(dq & de) == variant:
                        rows.append((q, e, d))
        return pa.Table.from_pandas(
            pd.DataFrame(rows, columns=["query", "entry", "edit_dist"]),
            preserve_index=False,
            schema=schema,
        )

    tagged = left.map_batches(
        variants(left_col, "l"), batch_format="pandas"
    ).union(right.map_batches(variants(right_col, "r"), batch_format="pandas"))
    return (
        tagged.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(
            lambda g: pairs(g.drop(columns="__b")), batch_format="pandas"
        )
    )
