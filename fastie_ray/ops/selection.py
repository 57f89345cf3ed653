"""Greedy coverage maximization — submodular data selection (the
facility-location / maximum-coverage pick behind data-efficient
training-set curation: choose k documents that together cover the most
distinct vocabulary). Greedy is the classic (1 − 1/e)-approximation
and, with a deterministic (gain DESC, doc ASC) tie-break, every round
is bit-reproducible — the SQL oracle unrolls the same k rounds.

Scale shape per round (k is small by definition):

- marginal gains = distinct (doc, token) pairs ANTI-joined against the
  covered-token set (one task exchange bucketed on token — covered
  tokens never ship as a driver set; open-vocabulary safe), then a
  doc-bucketed count exchange with per-bucket local argmax, driver
  merging buckets × 1 candidate rows;
- the winner's tokens move into the covered set via a semi join (token
  rows of one doc — tiny);
- rounds stop early when no document has uncovered tokens left.

The (doc, token) table is materialized ONCE (NOTES fact 19) and is the
only corpus-sized structure; covered grows by ≤ one doc's vocabulary
per round."""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.join import hash_join

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = r"[A-Za-z0-9]+"


def greedy_coverage(
    ds: "ray.data.Dataset",
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> pd.DataFrame:
    """Pick ``k`` docs greedily maximizing newly-covered distinct
    tokens. Returns (round, doc_id, gain) — ``gain`` is the number of
    tokens the pick added. Deterministic: ties break on smallest id."""
    import ray.data

    def toks_of(df: pd.DataFrame) -> pd.DataFrame:
        t = (
            pd.DataFrame(
                {
                    "doc": df[id_col].astype("int64"),
                    "tok": df[text_col].str.lower().str.findall(_TOKEN_RE),
                }
            )
            .explode("tok")
            .dropna(subset=["tok"])
            .drop_duplicates()
        )
        return t

    toks = (
        ds.map_batches(toks_of, batch_format="pandas")
        .repartition(n_buckets)
        .materialize()
    )
    covered = None  # Dataset of (tok) rows
    picks = []

    def add_db(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["doc"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def local_best(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("doc", as_index=False)["n"].sum()
        out = out.sort_values(["n", "doc"], ascending=[False, True]).head(1)
        out["n"] = out["n"].astype("int64")
        return out

    for rnd in range(1, k + 1):
        if covered is None:
            remaining = toks
        else:
            remaining = hash_join(
                toks, covered, on="tok", how="anti",
                left_cols=["doc", "tok"], n_buckets=n_buckets,
            )
        cands = (
            remaining.map_batches(
                lambda df: df.groupby("doc", as_index=False).agg(
                    n=("tok", "count")
                ),
                batch_format="pandas",
            )
            .map_batches(add_db, batch_format="pandas")
            .groupby("__b")
            .map_groups(local_best, batch_format="pandas")
            .to_pandas()
        )
        if len(cands) == 0:
            break
        cands = cands.sort_values(["n", "doc"], ascending=[False, True])
        doc, gain = int(cands["doc"].iloc[0]), int(cands["n"].iloc[0])
        picks.append((rnd, doc, gain))
        new_toks = toks.map_batches(
            lambda df, d=doc: df.loc[df["doc"] == d, ["tok"]],
            batch_format="pandas",
        )
        covered = (
            new_toks if covered is None else covered.union(new_toks)
        )
        covered = (
            covered.map_batches(
                lambda df: df.drop_duplicates(), batch_format="pandas"
            )
            .repartition(2)
            .materialize()
        )

    return pd.DataFrame(
        picks, columns=["round", "doc_id", "gain"]
    ).astype("int64")
