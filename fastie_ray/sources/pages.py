"""Derive the Common-Crawl-style pages table (BASELINE.json input_hint)
deterministically from the driver's ``documents.parquet``.

Each document becomes one page:

- ``url   = https://example.org/{lang}/{doc_id:06d}``
- ``warc_ts = EPOCH + doc_id seconds``
- ``text  = documents.text + ' '*pad + fact_sentence``, where ``pad``
  right-pads the original text to the next multiple of 510 chars
  (``max_length - 2``) so the injected fact sentence starts exactly at
  a chunk boundary and is NEVER split by the chunker — making the full
  extraction path (byte-identity, chunk offsets, mention spans,
  triples) expressible as ANSI SQL over ``documents`` for the DuckDB
  oracle (see ``__ray_entry__.oracle_sql``);
- ``fact_sentence = facts[doc_id % n_facts]`` rendered in the fixed
  English template (Chinese entity names still occur inside);
- every 7th page (doc_id % 7 == 3) arrives **html-only** (text null,
  html = deterministic wrapping) to exercise extraction.

``documents.text`` is digit-free while every entity surface carries a
4-digit tag, so the original text can never produce gazetteer hits —
extraction output is exactly the injected plan.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa

from fastie_ray.synth import EPOCH_US, PREDICATES, World, wrap_html

if TYPE_CHECKING:
    import ray.data

CHUNK_W = 510  # max_length - 2, reference decode_utils.py:132-137


def fact_sentence(fact) -> str:
    phrase = PREDICATES[fact.predicate][2]
    return f"{fact.subj.name}{phrase}{fact.obj.name}. "


def page_text(doc_text: str, doc_id: int, world: World) -> str:
    fact = world.facts[doc_id % len(world.facts)]
    pad = (CHUNK_W - (len(doc_text) % CHUNK_W)) % CHUNK_W
    return doc_text + " " * pad + fact_sentence(fact)


def pages_from_documents(
    sf_dir: str, world: World, override_num_blocks: int | None = None
) -> "ray.data.Dataset":
    """documents.parquet → pages (url, warc_ts, html, text, lang)."""
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"],
        override_num_blocks=override_num_blocks,
    )
    facts = world.facts  # captured; small (vocab-bounded)

    def to_pages(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        urls, tss, htmls, out_texts = [], [], [], []
        for d, t, lg in zip(doc_ids, texts, langs):
            fact = facts[d % len(facts)]
            pad = (CHUNK_W - (len(t) % CHUNK_W)) % CHUNK_W
            full = t + " " * pad + fact_sentence(fact)
            url = f"https://example.org/{lg}/{d:06d}"
            urls.append(url)
            tss.append(EPOCH_US + d * 1_000_000)
            if d % 7 == 3:
                htmls.append(wrap_html(full, url))
                out_texts.append(None)
            else:
                htmls.append(None)
                out_texts.append(full)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(out_texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            }
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


# ---------------------------------------------------------------- SQL oracle helpers


def _q(s: str) -> str:
    return s.replace("'", "''")


def facts_cte(world: World) -> str:
    """Inline VALUES table mirroring the injection plan, for DuckDB.

    Columns: i, predicate, subject, object, sentence, sub_label,
    obj_label, sub_len, pre_len, obj_len.
    """
    rows = []
    for i, f in enumerate(world.facts):
        phrase = PREDICATES[f.predicate][2]
        sent = fact_sentence(f)
        rows.append(
            "({i}, '{p}', '{s}', '{o}', '{sent}', '{sl}', '{ol}', {sn}, {pn}, {on_})".format(
                i=i,
                p=_q(f.predicate),
                s=_q(f.subj.name),
                o=_q(f.obj.name),
                sent=_q(sent),
                sl=f.subj.label,
                ol=f.obj.label,
                sn=len(f.subj.name),
                pn=len(phrase),
                on_=len(f.obj.name),
            )
        )
    return (
        "facts(i, predicate, subject, object, sentence, sub_label, obj_label, "
        "sub_len, pre_len, obj_len) AS (VALUES " + ", ".join(rows) + ")"
    )


URL_SQL = "'https://example.org/' || lang || '/' || lpad(CAST(doc_id AS VARCHAR), 6, '0')"
BASE_SQL = "CAST(ceil(length(text) / 510.0) * 510 AS INTEGER)"
PAGE_TEXT_SQL = (
    "text || repeat(' ', (510 - (length(text) % 510)) % 510) || f.sentence"
)
