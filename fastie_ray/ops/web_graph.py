"""Web-link-graph extraction over the raw ``html`` column — the
Common-Crawl host-graph / anchor-text pass (host-level in-link ranks,
anchor-text corpora for IR) that no other stage touches: every other
consumer of pages drops ``html`` after text recovery.

Shape at 100 TB:

- ``extract_links`` is a stateless ``map_batches`` over zero-copy Arrow
  batches: one compiled-regex scan per html page, emitting
  ``(src_url, dst_host, href, anchor)`` rows. No shuffle; link rows are
  a small multiple of page rows.
- ``host_links`` / ``anchor_texts`` aggregate with the per-batch
  combiner → one hash-bucketed exchange pattern: each batch pre-reduces
  to (host[, anchor]) partials (src-distinctness is batch-local because
  every page's links live in one batch), so the exchange carries
  combiner rows bounded by batches × hosts-per-batch, never raw links.
  The real-web host domain (~10^8) shuffles fine at this payload.

The synthetic corpus plants links deterministically
(``fastie_ray.synth.planted_links``: pure modular arithmetic on the doc
id), so a DuckDB oracle reproduces both aggregates exactly.
"""

from __future__ import annotations

import html as _html
import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:
    import ray.data

# href then anchor body; anchors never contain '<' in the wild corpus
# we parse (and nested markup inside <a> is out of scope for this pass).
_A_RE = re.compile(rb'<a\s+href="([^"]+)"[^>]*>(.*?)</a>', re.S)
_HOST_RE = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]+)", re.I)


def host_of(url: str) -> str:
    m = _HOST_RE.match(url)
    return m.group(1).lower() if m else ""


def _links_batch(batch: pa.Table) -> pa.Table:
    srcs: list[str] = []
    hosts: list[str] = []
    hrefs: list[str] = []
    anchors: list[str] = []
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    for url, raw in zip(urls, htmls):
        if raw is None:
            continue
        for href_b, anchor_b in _A_RE.findall(raw):
            href = href_b.decode("utf-8", "replace")
            srcs.append(url)
            hosts.append(host_of(href))
            hrefs.append(href)
            anchors.append(_html.unescape(anchor_b.decode("utf-8", "replace")))
    return pa.table(
        {
            "src_url": pa.array(srcs, pa.string()),
            "dst_host": pa.array(hosts, pa.string()),
            "href": pa.array(hrefs, pa.string()),
            "anchor": pa.array(anchors, pa.string()),
        }
    )


def extract_links(pages: "ray.data.Dataset") -> "ray.data.Dataset":
    """pages → (src_url, dst_host, href, anchor); pages without html
    emit nothing (link structure only exists in markup)."""
    return pages.map_batches(_links_batch, batch_format="pyarrow")


def _bucket(df: pd.DataFrame, key: pd.Series, n_buckets: int) -> pd.DataFrame:
    df = df.copy()
    if len(df) == 0:
        df["__b"] = np.array([], dtype=np.int64)
        return df
    h = pd.util.hash_pandas_object(key, index=False).to_numpy()
    df["__b"] = (h % np.uint64(n_buckets)).astype(np.int64)
    return df


def host_links(pages: "ray.data.Dataset", n_buckets: int = 16) -> pd.DataFrame:
    """Host-level in-link stats: (dst_host, n_links, n_pages), sorted by
    host. ``n_pages`` is the count of distinct linking pages — exact,
    because each page's links are emitted within one batch, so the
    per-batch (src,host)-distinct partial is globally distinct."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = _links_batch(batch).to_pandas()
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "dst_host": pd.Series([], dtype=str),
                    "n_links": pd.Series([], dtype=np.int64),
                    "n_pages": pd.Series([], dtype=np.int64),
                }
            )
        g = df.groupby("dst_host")
        out = pd.DataFrame(
            {
                "n_links": g.size(),
                "n_pages": g["src_url"].nunique(),
            }
        ).reset_index()
        out["n_links"] = out["n_links"].astype(np.int64)
        out["n_pages"] = out["n_pages"].astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop(columns="__b")
            .groupby("dst_host", as_index=False)[["n_links", "n_pages"]]
            .sum()
        )

    out = (
        pages.map_batches(partial, batch_format="pyarrow")
        .map_batches(lambda d: _bucket(d, d["dst_host"], n_buckets), batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "dst_host": pd.Series([], dtype=str),
                "n_links": pd.Series([], dtype="int64"),
                "n_pages": pd.Series([], dtype="int64"),
            }
        )
    out["n_links"] = out["n_links"].astype("int64")
    out["n_pages"] = out["n_pages"].astype("int64")
    return out.sort_values("dst_host").reset_index(drop=True)


def anchor_texts(pages: "ray.data.Dataset", n_buckets: int = 16) -> pd.DataFrame:
    """Anchor-text corpus: (dst_host, anchor, n) link counts per host ×
    anchor string, sorted by (dst_host, anchor) — the IR-side artifact
    (anchor text is a strong relevance signal for the *target*)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = _links_batch(batch).to_pandas()
        out = df.groupby(["dst_host", "anchor"], as_index=False).agg(
            n=("href", "count")
        )
        out["n"] = out["n"].astype(np.int64) if len(out) else pd.Series([], dtype=np.int64)
        return out[["dst_host", "anchor", "n"]]

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.drop(columns="__b")
            .groupby(["dst_host", "anchor"], as_index=False)["n"]
            .sum()
        )

    out = (
        pages.map_batches(partial, batch_format="pyarrow")
        .map_batches(
            lambda d: _bucket(
                d,
                d["dst_host"] + "\x00" + d["anchor"] if len(d) else d["dst_host"],
                n_buckets,
            ),
            batch_format="pandas",
        )
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    if len(out) == 0:
        return pd.DataFrame(
            {
                "dst_host": pd.Series([], dtype=str),
                "anchor": pd.Series([], dtype=str),
                "n": pd.Series([], dtype="int64"),
            }
        )
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["dst_host", "anchor"]).reset_index(drop=True)


def host_cocitation(
    pages: "ray.data.Dataset", k: int = 100, n_buckets: int = 16
) -> pd.DataFrame:
    """Co-citation pairs: two hosts are similar when the same pages
    link to BOTH (the classic link-graph similarity signal). Per page,
    enumerate its distinct dst-host pairs (bounded: a page carries few
    links); count pairs with a per-batch combiner; finish with one
    pair-bucketed exchange + per-bucket top-k, driver merges
    buckets × k rows. Returns top-``k`` (host_a, host_b, n_pages),
    host_a < host_b, ties broken lexicographically."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = _links_batch(batch).to_pandas()
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "host_a": pd.Series([], dtype=str),
                    "host_b": pd.Series([], dtype=str),
                    "n_pages": pd.Series([], dtype=np.int64),
                }
            )
        d = df[["src_url", "dst_host"]].drop_duplicates()
        pairs = d.merge(d, on="src_url", suffixes=("_a", "_b"))
        pairs = pairs[pairs["dst_host_a"] < pairs["dst_host_b"]]
        out = pairs.groupby(
            ["dst_host_a", "dst_host_b"], as_index=False
        ).agg(n_pages=("src_url", "count"))
        out.columns = ["host_a", "host_b", "n_pages"]
        out["n_pages"] = out["n_pages"].astype(np.int64)
        return out

    def local_topk(g: pd.DataFrame) -> pd.DataFrame:
        out = g.drop(columns="__b").groupby(
            ["host_a", "host_b"], as_index=False
        )["n_pages"].sum()
        return out.sort_values(
            ["n_pages", "host_a", "host_b"], ascending=[False, True, True]
        ).head(k)

    cand = (
        pages.map_batches(partial, batch_format="pyarrow")
        .map_batches(
            lambda d: _bucket(
                d,
                d["host_a"] + "\x00" + d["host_b"] if len(d) else d["host_a"],
                n_buckets,
            ),
            batch_format="pandas",
        )
        .groupby("__b")
        .map_groups(local_topk, batch_format="pandas")
        .to_pandas()
    )
    if len(cand) == 0:
        return pd.DataFrame(
            {
                "host_a": pd.Series([], dtype=str),
                "host_b": pd.Series([], dtype=str),
                "n_pages": pd.Series([], dtype="int64"),
            }
        )
    out = cand.sort_values(
        ["n_pages", "host_a", "host_b"], ascending=[False, True, True]
    ).head(k)
    out["n_pages"] = out["n_pages"].astype("int64")
    return out.reset_index(drop=True)
