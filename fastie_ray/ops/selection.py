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


def token_budget_select(
    ds: "ray.data.Dataset",
    budget: int,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Per-group token-budget selection: order each group's documents
    by a deterministic md5 shuffle key and keep docs while the group's
    RUNNING token total stays ≤ ``budget`` — the mixture-allocation
    step that turns "give every source at most B tokens" into a
    concrete doc set (docs are taken whole; the first doc that would
    cross the budget is dropped along with everything after it in
    shuffle order).

    Distributed grouped prefix sum without a sort barrier (the
    ``pack_offsets`` trick re-keyed): the md5 key's FIRST hex digit is
    an ordered coarse range (hex order == string order), per-(group,
    range) token sums prefix-sum to range offsets on a groups × 16
    driver table, and each (group, range) task sorts only its own
    slice, adds its offset and filters. ONE exchange; text never
    ships — only (id, group, n_tokens, key) rows. Returns
    (``id_col``, group, n_tokens, cum_tokens) for selected docs."""
    import hashlib

    import ray

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        rk = df[id_col].map(
            lambda i: hashlib.md5(f"sel:{i}".encode()).hexdigest()
        )
        out = pd.DataFrame(
            {
                id_col: df[id_col].astype("int64"),
                "g": df[group_col],
                "n_tokens": df[text_col].str.count(_TOKEN_RE).astype(
                    "int64"
                ),
                "rk": rk,
            }
        )
        out["rid"] = rk.str.slice(0, 1).map(
            lambda c: int(c, 16)
        ).astype("int64")
        return out

    keyed = ds.map_batches(counts, batch_format="pandas").materialize()

    sums = (
        keyed.map_batches(
            lambda df: df.groupby(["g", "rid"], as_index=False)[
                "n_tokens"
            ].sum(),
            batch_format="pandas",
        )
        .to_pandas()
        .groupby(["g", "rid"], as_index=False)["n_tokens"]
        .sum()
        .sort_values(["g", "rid"])
    )
    sums["off"] = (
        sums.groupby("g")["n_tokens"].cumsum() - sums["n_tokens"]
    )
    offs = {
        (r["g"], int(r["rid"])): int(r["off"]) for _, r in sums.iterrows()
    }
    offs_ref = ray.put(offs)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(
            df["g"].astype(str) + "|" + df["rid"].astype(str), index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        om = ray.get(offs_ref)
        rows = []
        for (grp, rid), sub in g.drop(columns="__b").groupby(
            ["g", "rid"], sort=False
        ):
            sub = sub.sort_values(["rk", id_col])
            cum = sub["n_tokens"].cumsum() + om[(grp, int(rid))]
            keep = cum <= budget
            out = sub.loc[keep, [id_col, "g", "n_tokens"]].copy()
            out["cum_tokens"] = cum[keep].astype("int64")
            rows.append(out)
        res = pd.concat(rows, ignore_index=True) if rows else pd.DataFrame(
            columns=[id_col, "g", "n_tokens", "cum_tokens"]
        )
        return res.rename(columns={"g": group_col})

    return (
        keyed.map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(scan, batch_format="pandas")
    )


def preference_pairs(
    ds: "ray.data.Dataset",
    lang_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_tokens: int = 64,
    punct_weight: int = 2,
    n_buckets: int = 8,
) -> "ray.data.Dataset":
    """DPO-style preference-pair construction: per (lang, length
    bucket) group, pair the best-quality document (chosen) with the
    worst (rejected) under the integer quality score

        score = mean_token_len_e6 − punct_weight · punct_ratio_e6

    (the ``quality_batch`` signals — floor-scaled ints, so the SQL
    oracle reproduces every comparison exactly). Ties break on min
    ``doc_id``; groups with < 2 docs or zero score gap emit nothing.
    Output: (lang, len_bucket, chosen_id, rejected_id, gap_e6).

    Scale shape: the classic combiner. Each block reduces every group
    it sees to TWO candidate rows (local best + local worst); one
    (lang, len_bucket)-bucketed exchange then reduces blocks × 2
    candidates per group — corpus rows never shuffle, and the exchange
    payload is O(groups · blocks), independent of corpus size."""
    from fastie_ray.ops.text_analysis import quality_batch

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"lang": pd.Series([], dtype=object),
                 "len_bucket": pd.Series([], dtype="int64"),
                 "doc_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="int64")}
            )
        q = quality_batch(df.rename(columns={text_col: "text"}))
        s = pd.DataFrame(
            {
                "lang": df[lang_col].to_numpy(),
                "len_bucket": (q["n_tokens"] // bucket_tokens).astype("int64"),
                "doc_id": df[id_col].astype("int64").to_numpy(),
                "score": (
                    q["mean_token_len_e6"]
                    - punct_weight * q["punct_ratio_e6"]
                ).astype("int64"),
            }
        )
        best = s.sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).groupby(["lang", "len_bucket"], dropna=False).head(1)
        worst = s.sort_values(
            ["score", "doc_id"], ascending=[True, True]
        ).groupby(["lang", "len_bucket"], dropna=False).head(1)
        return pd.concat([best, worst], ignore_index=True)

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df["lang"], index=False
        ).to_numpy() ^ pd.util.hash_pandas_object(
            df["len_bucket"], index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__b")
        out = []
        for (lang, lb), grp in g.groupby(["lang", "len_bucket"], dropna=False):
            best = grp.sort_values(
                ["score", "doc_id"], ascending=[False, True]
            ).iloc[0]
            worst = grp.sort_values(
                ["score", "doc_id"], ascending=[True, True]
            ).iloc[0]
            if best["doc_id"] == worst["doc_id"] or best["score"] <= worst["score"]:
                continue
            out.append((lang, lb, int(best["doc_id"]), int(worst["doc_id"]),
                        int(best["score"] - worst["score"])))
        return pd.DataFrame(
            out, columns=["lang", "len_bucket", "chosen_id",
                          "rejected_id", "gap_e6"],
        ).astype({"len_bucket": "int64", "chosen_id": "int64",
                  "rejected_id": "int64", "gap_e6": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )
