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


def assoc_rules(
    ds: "ray.data.Dataset",
    min_support: int = 2,
    min_conf_e6: int = 100_000,
    per_doc_cap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Size-2 association rules (market-basket mining, Agrawal &
    Srikant's Apriori restricted to pairs) over per-document distinct
    token sets: for every ordered rule a→b with pair-document support
    ≥ ``min_support`` and confidence ≥ ``min_conf_e6``/1e6, emit

        (antecedent, consequent, support,
         conf_e6 = ⌊support·10⁶ / n_docs(a)⌋,
         lift_e6 = ⌊support·N·10⁶ / (n_docs(a)·n_docs(b))⌋)

    — integer floor arithmetic end-to-end, so the SQL oracle matches
    exactly. The same lexicographic ``per_doc_cap`` as ``cooc_pairs``
    bounds pair volume at O(docs); token doc-counts use the SAME capped
    token set so support/confidence are mutually consistent.

    Scale shape: pair counts and token counts are each a per-batch
    combiner + ONE bucketed exchange; the rule table (support-pruned)
    then picks up n_docs(a) and n_docs(b) via two task-based hash
    joins against the token-count table — open-vocabulary safe (no
    driver-side vocab dict; web-scale token vocabularies are not
    bounded). N is a driver scalar (one count aggregate)."""
    import ray

    def capped_toks(df: pd.DataFrame) -> pd.DataFrame:
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
        return toks[toks.groupby("doc", sort=False).cumcount() < per_doc_cap]

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = capped_toks(df)
        pairs = toks.merge(toks, on="doc", suffixes=("_a", "_b"))
        pairs = pairs[pairs["tok_a"] < pairs["tok_b"]]
        return pairs.groupby(["tok_a", "tok_b"], as_index=False).agg(
            support=("doc", "count")
        )

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        return capped_toks(df).groupby("tok", as_index=False).agg(
            n_docs=("doc", "count")
        )

    def add_pb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df["tok_a"] + "\x00" + df["tok_b"], index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def add_tb(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["tok"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def pair_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["tok_a", "tok_b"], as_index=False
        )["support"].sum()
        # support prune INSIDE the exchange — below-threshold pairs
        # never ship again
        out = out[out["support"] >= min_support]
        out["support"] = out["support"].astype("int64")
        return out

    def tok_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("tok", as_index=False)[
            "n_docs"
        ].sum()
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    pairs = (
        ds.map_batches(pair_partial, batch_format="pandas")
        .map_batches(add_pb, batch_format="pandas")
        .groupby("__b")
        .map_groups(pair_final, batch_format="pandas")
    )
    toks = (
        ds.map_batches(tok_partial, batch_format="pandas")
        .map_batches(add_tb, batch_format="pandas")
        .groupby("__b")
        .map_groups(tok_final, batch_format="pandas")
        .materialize()  # consumed by two joins (NOTES fact 19)
    )
    n_total = int(
        ds.map_batches(
            lambda df: pd.DataFrame({"n": [np.int64(len(df))]}),
            batch_format="pandas",
        )
        .to_pandas()["n"]
        .sum()
    )

    from fastie_ray.ops.join import hash_join

    # both directions of each pair are candidate rules
    def directed(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame(
            {
                "antecedent": df["tok_a"],
                "consequent": df["tok_b"],
                "support": df["support"],
            }
        )
        rev = pd.DataFrame(
            {
                "antecedent": df["tok_b"],
                "consequent": df["tok_a"],
                "support": df["support"],
            }
        )
        return pd.concat([fwd, rev], ignore_index=True)

    rules = pairs.map_batches(directed, batch_format="pandas")
    rules = hash_join(
        rules,
        toks.map_batches(
            lambda df: df.rename(columns={"tok": "antecedent", "n_docs": "n_ant"}),
            batch_format="pandas",
        ),
        on="antecedent",
        left_cols=["antecedent", "consequent", "support"],
        right_cols=["antecedent", "n_ant"],
        n_buckets=n_buckets,
    )
    rules = hash_join(
        rules,
        toks.map_batches(
            lambda df: df.rename(columns={"tok": "consequent", "n_docs": "n_con"}),
            batch_format="pandas",
        ),
        on="consequent",
        left_cols=["antecedent", "consequent", "support", "n_ant"],
        right_cols=["consequent", "n_con"],
        n_buckets=n_buckets,
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        sup = df["support"].astype("int64")
        na = df["n_ant"].astype("int64")
        nc = df["n_con"].astype("int64")
        conf = sup * np.int64(1_000_000) // na
        lift = sup * np.int64(n_total) * np.int64(1_000_000) // (na * nc)
        out = pd.DataFrame(
            {
                "antecedent": df["antecedent"],
                "consequent": df["consequent"],
                "support": sup,
                "conf_e6": conf.astype("int64"),
                "lift_e6": lift.astype("int64"),
            }
        )
        return out[out["conf_e6"] >= min_conf_e6]

    return rules.map_batches(score, batch_format="pandas")

def frequent_triples(
    ds: "ray.data.Dataset",
    min_support: int = 5,
    per_doc_cap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """Apriori LEVEL-3: all token triples {a < b < c} whose document
    support ≥ ``min_support`` — the itemset-mining step above
    ``assoc_rules``' pairs (recommendation bundles, co-topic
    discovery). Same per-doc lexicographic ``per_doc_cap`` and
    tokenizer as ``cooc_pairs``, so levels are mutually consistent.

    Apriori shape (the pruning IS the scale story — counting all
    C(cap,3) triples per doc against an unpruned key space would
    explode the exchange): one pair-count exchange yields the frequent
    PAIRS; the support-pruned L2 table is driver-merged (pruned ≪
    vocab², the broadcast-candidate contract of ``heavy_hitters``) and
    candidate triples are those whose THREE sub-pairs are all
    frequent; the candidate key set broadcasts via ``ray.put`` and the
    second pass counts ONLY candidate triples (per-batch combiner →
    one bucketed exchange). Returns (item_a, item_b, item_c,
    support)."""
    import ray

    def _capped_tokens(df: pd.DataFrame) -> pd.DataFrame:
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
        return toks[
            toks.groupby("doc", sort=False).cumcount() < per_doc_cap
        ]

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _capped_tokens(df)
        pairs = toks.merge(toks, on="doc", suffixes=("_a", "_b"))
        pairs = pairs[pairs["tok_a"] < pairs["tok_b"]]
        return pairs.groupby(["tok_a", "tok_b"], as_index=False).agg(
            n=("doc", "count")
        )

    def add_bp(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df["tok_a"] + "\x00" + df["tok_b"], index=False
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def pair_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["tok_a", "tok_b"], as_index=False
        )["n"].sum()
        return out[out["n"] >= min_support][["tok_a", "tok_b"]]

    l2 = (
        ds.map_batches(pair_partial, batch_format="pandas")
        .map_batches(add_bp, batch_format="pandas")
        .groupby("__b")
        .map_groups(pair_final, batch_format="pandas")
        .to_pandas()
    )
    pairs = set(map(tuple, l2.itertuples(index=False)))
    # Apriori candidate generation + subset prune, all on the pruned L2
    by_first: dict = {}
    for a, b in pairs:
        by_first.setdefault(a, []).append(b)
    cands = set()
    for a, bs in by_first.items():
        bs = sorted(bs)
        for i in range(len(bs)):
            for j in range(i + 1, len(bs)):
                if (bs[i], bs[j]) in pairs:
                    cands.add((a, bs[i], bs[j]))
    cand_ref = ray.put(cands)

    def tri_partial(df: pd.DataFrame) -> pd.DataFrame:
        cs = ray.get(cand_ref)
        if not cs:
            return pd.DataFrame(
                {"item_a": pd.Series([], dtype=object),
                 "item_b": pd.Series([], dtype=object),
                 "item_c": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        items = {t for c in cs for t in c}
        toks = _capped_tokens(df)
        toks = toks[toks["tok"].isin(items)]
        t2 = toks.merge(toks, on="doc", suffixes=("_a", "_b"))
        t2 = t2[t2["tok_a"] < t2["tok_b"]]
        t3 = t2.merge(
            toks.rename(columns={"tok": "tok_c"}), on="doc"
        )
        t3 = t3[t3["tok_b"] < t3["tok_c"]]
        key = pd.Series(
            list(zip(t3["tok_a"], t3["tok_b"], t3["tok_c"])),
            index=t3.index,
        )
        t3 = t3[key.isin(cs).to_numpy()] if len(t3) else t3
        out = t3.groupby(
            ["tok_a", "tok_b", "tok_c"], as_index=False
        ).agg(n=("doc", "count"))
        out.columns = ["item_a", "item_b", "item_c", "n"]
        return out

    def add_bt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(
            df["item_a"] + "\x00" + df["item_b"] + "\x00" + df["item_c"],
            index=False,
        ).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def tri_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["item_a", "item_b", "item_c"], as_index=False
        )["n"].sum()
        out = out[out["n"] >= min_support].rename(columns={"n": "support"})
        out["support"] = out["support"].astype("int64")
        return out

    return (
        ds.map_batches(tri_partial, batch_format="pandas")
        .map_batches(add_bt, batch_format="pandas")
        .groupby("__b")
        .map_groups(tri_final, batch_format="pandas")
    )
