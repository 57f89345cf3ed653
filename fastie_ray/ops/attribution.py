"""Training-data attribution — the memorization audit an LLM-data
pipeline runs over suspect outputs: for each SAMPLE document, which
OTHER corpus document shares the most 8-gram evidence (and how much of
the sample that covers). The canonical use: a generated text comes
back from an eval, and you need the top candidate training document it
may have been memorized from, at corpus scale.

No reference counterpart (the reference is an IE stack); this is one
of the beyond-reference LLM-pipeline operators the brief calls for.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


def memorization_attribution(
    ds: "ray.data.Dataset",
    sample_mod: int = 61,
    shingle: int = 8,
    max_df: int = 50,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Top-1 n-gram attribution for sample docs (``doc_id %
    sample_mod == 0``): over DISTINCT overlapping ``shingle``-token
    gram hashes per doc, count shared grams between each sample and
    every OTHER doc, and keep the argmax per sample (ties broken by
    smaller match_id). Grams occurring in more than ``max_df`` distinct
    docs are excluded FIRST — stopword-run grams carry no attribution
    evidence and their postings explode the pair join (the same df-cap
    discipline ``decontaminate`` uses). Emits (sample_id, match_id,
    shared, sample_grams, containment_e6 = ⌊1e6·shared /
    sample_grams⌋); samples with zero sharable grams emit nothing.

    Scale shape: one gram-bucketed exchange builds per-gram postings
    and applies the df cap INSIDE the bucket (df is computable there —
    same gram, same bucket), emitting (sample, other) pair partials
    only for grams a sample actually contains; one sample-bucketed
    exchange sums pair counts and argmaxes. ``sample_grams`` rides the
    gram exchange as a per-sample count partial — nothing driver-side,
    no broadcast, postings bounded by max_df."""

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids, keys = [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = text.split()
            seen = set()
            for i in range(max(0, len(toks) - shingle + 1)):
                w = " ".join(toks[i:i + shingle])
                h = hashlib.md5(w.encode()).hexdigest()[:16]
                if h not in seen:
                    seen.add(h)
                    doc_ids.append(doc_id)
                    keys.append(h)
        return pd.DataFrame({
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "gkey": keys,
        })

    def add_gb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["gkey"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def pair_partials(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        # df cap inside the bucket (all rows of a gram are here)
        df_ct = g.groupby("gkey")["doc_id"].transform("size")
        g = g[df_ct <= max_df]
        is_sample = (g["doc_id"] % sample_mod) == 0
        samples = g[is_sample]
        if len(samples) == 0:
            return pd.DataFrame({
                "sample_id": pd.Series([], dtype="int64"),
                "match_id": pd.Series([], dtype="int64"),
                "shared": pd.Series([], dtype="int64"),
                "sample_grams": pd.Series([], dtype="int64"),
            })
        # per-sample capped-gram count partial (match_id -1 sentinel)
        sg = samples.groupby("doc_id", as_index=False).size()
        sg = pd.DataFrame({
            "sample_id": sg["doc_id"], "match_id": np.int64(-1),
            "shared": np.int64(0), "sample_grams": sg["size"],
        })
        # (sample, other) shared-gram counts via the gram join
        j = samples.merge(g, on="gkey", suffixes=("_s", "_o"))
        j = j[j["doc_id_s"] != j["doc_id_o"]]
        pairs = j.groupby(
            ["doc_id_s", "doc_id_o"], as_index=False
        ).size().rename(columns={
            "doc_id_s": "sample_id", "doc_id_o": "match_id",
            "size": "shared",
        })
        pairs["sample_grams"] = np.int64(0)
        out = pd.concat([sg, pairs], ignore_index=True)
        return out.astype({
            "sample_id": "int64", "match_id": "int64",
            "shared": "int64", "sample_grams": "int64",
        })

    def add_sb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        df["__b"] = (
            df["sample_id"].to_numpy() % n_buckets
        ).astype(np.int64)
        return df

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        totals = g.groupby("sample_id")["sample_grams"].sum()
        pairs = (
            g[g["match_id"] >= 0]
            .groupby(["sample_id", "match_id"], as_index=False)["shared"]
            .sum()
        )
        if len(pairs) == 0:
            return pd.DataFrame({
                "sample_id": pd.Series([], dtype="int64"),
                "match_id": pd.Series([], dtype="int64"),
                "shared": pd.Series([], dtype="int64"),
                "sample_grams": pd.Series([], dtype="int64"),
                "containment_e6": pd.Series([], dtype="int64"),
            })
        top = pairs.sort_values(
            ["sample_id", "shared", "match_id"],
            ascending=[True, False, True],
        ).groupby("sample_id", as_index=False).first()
        top["sample_grams"] = (
            totals.reindex(top["sample_id"]).to_numpy().astype("int64")
        )
        top["containment_e6"] = (
            top["shared"] * 1_000_000 // top["sample_grams"]
        )
        return top.astype("int64")

    return (
        ds.map_batches(grams, batch_format="pandas")
        .map_batches(add_gb, batch_format="pandas")
        .groupby("__b")
        .map_groups(pair_partials, batch_format="pandas")
        .map_batches(add_sb, batch_format="pandas")
        .groupby("__b")
        .map_groups(argmax, batch_format="pandas")
    )
