"""Web link-graph extraction (ops/web_graph) over the raw html column."""

import pandas as pd
import pyarrow as pa

from fastie_ray.ops.web_graph import (
    _links_batch,
    anchor_texts,
    extract_links,
    host_links,
    host_of,
)
from fastie_ray.stages.extract import html_to_text
from fastie_ray.synth import planted_links, wrap_html


def test_planted_links_plan():
    # doc 10: n_links = 2 + 10%3 = 3; hosts pair up by j//2
    links = planted_links("https://example.org/en/000010")
    assert len(links) == 3
    hosts = [href.split("/")[2] for href, _ in links]
    assert hosts[0] == hosts[1]  # j=0,1 share (10*31+0)%97
    assert hosts[2] != hosts[0]
    assert links[0][1].startswith("ref ") and links[1][1].startswith("see ")


def test_nav_block_preserves_text_byte_identity():
    text = "para one\npara <two> & more"
    raw = wrap_html(text, "https://example.org/en/000003")
    assert b"<nav>" in raw and b"<a href=" in raw
    assert html_to_text(raw) == text


def test_links_batch_matches_plan():
    url = "https://example.org/zh/000017"
    batch = pa.table(
        {
            "url": pa.array([url, "https://example.org/en/000001"]),
            "html": pa.array([wrap_html("t", url), None], pa.binary()),
        }
    )
    out = _links_batch(batch).to_pandas()
    want = planted_links(url)
    assert len(out) == len(want)  # text-only row emits nothing
    assert list(out["href"]) == [h for h, _ in want]
    assert list(out["anchor"]) == [a for _, a in want]
    assert (out["src_url"] == url).all()
    assert list(out["dst_host"]) == [host_of(h) for h, _ in want]


def test_host_of():
    assert host_of("https://H07.Example.NET/d/x?q=1") == "h07.example.net"
    assert host_of("not a url") == ""


def _tiny_pages(n=40):
    import ray.data

    rows = []
    for d in range(n):
        url = f"https://example.org/en/{d:06d}"
        html_only = d % 7 == 3
        rows.append(
            {
                "url": url,
                "html": wrap_html(f"text {chr(65 + d % 26)}", url) if html_only else None,
                "text": None if html_only else "plain",
            }
        )
    tbl = pa.table(
        {
            "url": pa.array([r["url"] for r in rows]),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows]),
        }
    )
    return ray.data.from_arrow(tbl).repartition(4)


def _expected_links(n=40):
    rows = []
    for d in range(n):
        if d % 7 != 3:
            continue
        for j, (href, anchor) in enumerate(
            planted_links(f"https://example.org/en/{d:06d}")
        ):
            rows.append({"doc": d, "j": j, "host": host_of(href), "anchor": anchor})
    return pd.DataFrame(rows)


def test_host_links_and_anchors_aggregate(ray_session):
    pages = _tiny_pages()
    exp = _expected_links()
    want_hosts = (
        exp.groupby("host")
        .agg(n_links=("j", "size"), n_pages=("doc", "nunique"))
        .reset_index()
        .rename(columns={"host": "dst_host"})
        .sort_values("dst_host")
        .reset_index(drop=True)
    )
    got = host_links(pages, n_buckets=4)
    pd.testing.assert_frame_equal(
        got, want_hosts.astype({"n_links": "int64", "n_pages": "int64"})
    )
    # some page must link one host twice (j//2 pairing) for the stat to
    # be non-trivial
    assert (got["n_links"] > got["n_pages"]).any()

    want_anch = (
        exp.groupby(["host", "anchor"])
        .size()
        .reset_index(name="n")
        .rename(columns={"host": "dst_host"})
        .sort_values(["dst_host", "anchor"])
        .reset_index(drop=True)
    )
    got_a = anchor_texts(pages, n_buckets=4)
    pd.testing.assert_frame_equal(got_a, want_anch.astype({"n": "int64"}))

    # the streaming extractor agrees with the aggregate totals
    raw = extract_links(pages).to_pandas()
    assert len(raw) == int(want_hosts["n_links"].sum())


def test_host_cocitation_pairs(ray_session):
    from fastie_ray.ops.web_graph import host_cocitation

    pages = _tiny_pages()
    exp = _expected_links()
    d = exp[["doc", "host"]].drop_duplicates()
    pairs = d.merge(d, on="doc", suffixes=("_a", "_b"))
    pairs = pairs[pairs["host_a"] < pairs["host_b"]]
    want = (
        pairs.groupby(["host_a", "host_b"]).size().reset_index(name="n_pages")
        .sort_values(["n_pages", "host_a", "host_b"], ascending=[False, True, True])
        .reset_index(drop=True)
    )
    got = host_cocitation(pages, k=1000, n_buckets=4)
    pd.testing.assert_frame_equal(got, want.astype({"n_pages": "int64"}))
