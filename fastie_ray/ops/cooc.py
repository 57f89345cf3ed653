"""Token co-occurrence mining: top-k token pairs by document
co-occurrence count — the word-association / phrase-discovery pass of
corpus analysis (PMI numerators, collocation candidates).

Pair blow-up control: per document only the first ``per_doc_cap``
DISTINCT tokens in lexicographic order participate (C(cap, 2) pairs
per doc, a constant), so corpus pair volume is O(docs), never
O(docs × vocab²). Pair generation is a vectorized per-batch pandas
self-merge on doc_id (explode → merge → ``tok_a < tok_b``), counted by
a per-batch combiner; totals finish in ONE hash-bucketed exchange with
per-bucket local top-k, and the driver merges only ``buckets × k``
candidate rows.

Deterministic (cap is lexicographic, ordering is (n DESC, pair ASC))
and SQL-reproducible: ``row_number() OVER (PARTITION BY doc ORDER BY
tok) <= cap`` + self-join + GROUP BY + ORDER/LIMIT.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = r"[A-Za-z0-9]+"


def cooc_pairs(
    ds: "ray.data.Dataset",
    k: int = 100,
    per_doc_cap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Top-``k`` (tok_a, tok_b, n_docs) pairs; ties broken by pair."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = (
            pd.DataFrame(
                {
                    "doc": df[id_col].to_numpy(),
                    "tok": df[text_col].str.lower().str.findall(_TOKEN_RE),
                }
            )
            .explode("tok")
            .dropna(subset=["tok"])
            .drop_duplicates()
            .sort_values(["doc", "tok"])
        )
        toks = toks[toks.groupby("doc", sort=False).cumcount() < per_doc_cap]
        pairs = toks.merge(toks, on="doc", suffixes=("_a", "_b"))
        pairs = pairs[pairs["tok_a"] < pairs["tok_b"]]
        return pairs.groupby(["tok_a", "tok_b"], as_index=False).agg(
            n_docs=("doc", "count")
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df["tok_a"] + "\x00" + df["tok_b"], index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["tok_a", "tok_b"], as_index=False
        )["n_docs"].sum()
        return out.sort_values(
            ["n_docs", "tok_a", "tok_b"], ascending=[False, True, True]
        ).head(k)

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(local_topk, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["n_docs", "tok_a", "tok_b"], ascending=[False, True, True]
    ).head(k)
    cand["n_docs"] = cand["n_docs"].astype("int64")
    return cand.reset_index(drop=True)
