"""Frequency-ranked vocabulary building — the tokenizer/embedding
prep step (word2vec vocab, fastText cutoffs, the count pass every
tokenizer trainer runs before merges; complements ``ops/bpe`` which
learns merges ON such counts).

Scale shape: token counts are a per-batch combiner + ONE
token-bucketed exchange with the ``min_count`` cutoff applied INSIDE
the exchange (sub-threshold tail tokens — the vast majority of a
web-scale vocabulary — never ship again); ids then come from
``ops.rank.global_rank`` by (count DESC, token ASC), which assigns
``ROW_NUMBER``-exact ranks without a global sort barrier (coarse
count-range histogram + driver prefix scan + one bucketed exchange).
Filtering before ranking is id-exact: every kept token outcounts every
dropped one, so kept ranks are contiguous from 0.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

from fastie_ray.ops.rank import global_rank

if TYPE_CHECKING:
    import ray.data

_TOKEN_RE = r"[A-Za-z0-9]+"


def build_vocab(
    ds: "ray.data.Dataset",
    min_count: int = 5,
    text_col: str = "text",
    range_size: int = 64,
    n_buckets: int = 16,
) -> "ray.data.Dataset":
    """(token, n, token_id) for every token with ≥ ``min_count`` total
    occurrences (raw occurrences, lowercased ``[A-Za-z0-9]+`` tokens);
    ``token_id`` is the 0-based rank by (n DESC, token ASC)."""

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = (
            df[text_col].str.lower().str.findall(_TOKEN_RE).explode().dropna()
        )
        vc = toks.value_counts()
        return pd.DataFrame(
            {"token": vc.index.astype(object), "n": vc.to_numpy(np.int64)}
        )

    def add_b(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        if len(df) == 0:
            df["__b"] = np.array([], dtype=np.int64)
            return df
        h = pd.util.hash_pandas_object(df["token"], index=False).to_numpy()
        df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return df

    def count_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby("token", as_index=False)["n"].sum()
        out = out[out["n"] >= min_count]
        out["n"] = out["n"].astype("int64")
        return out

    counts = (
        ds.map_batches(count_partial, batch_format="pandas")
        .map_batches(add_b, batch_format="pandas")
        .groupby("__b")
        .map_groups(count_final, batch_format="pandas")
    )

    ranked = global_rank(
        counts,
        key_col="n",
        tie_col="token",
        descending=True,
        range_size=range_size,
        n_buckets=n_buckets,
        keep_cols=["token", "n"],
        rank_col="__rank",
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "token": df["token"],
                "n": df["n"].astype("int64"),
                "token_id": (df["__rank"] - 1).astype("int64"),
            }
        )

    return ranked.map_batches(finish, batch_format="pandas")
