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
    sf_dir: str,
    world: World,
    override_num_blocks: int | None = None,
    repeat: int = 1,
    replica: int = 0,
) -> "ray.data.Dataset":
    """documents.parquet → pages (url, warc_ts, html, text, lang).

    ``repeat > 1`` emits that many deterministic replicas of the corpus
    with distinct urls (``…/rNN/``) — the bench's way of scaling the
    stream so compute dominates fixed scheduling costs, standing in for
    a larger shard list at constant per-page work. ``replica`` selects
    which single replica to render when ``repeat == 1`` (replica 1+ is
    the "new crawl increment" of the incremental-maintenance query)."""
    import ray.data

    facts = world.facts  # captured; small (vocab-bounded)

    if repeat == 1:
        ds = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "lang"],
            override_num_blocks=override_num_blocks,
        )

        def to_pages(batch: pa.Table) -> pa.Table:
            return _pages_table(batch, facts, replica)

        return ds.map_batches(to_pages, batch_format="pyarrow")

    # repeat > 1: a sharded source — one independent task per replica,
    # the shard-list shape of a real multi-file corpus. Without this,
    # the single parquet file yields ONE read task and the Nx expansion
    # happens inside a handful of downstream bundles, starving the
    # scorer actor pool (observed: 3 of 16 actors busy). Task count =
    # repeat, sized so each task is chunky (~5k pages): Ray Data's
    # driver event loop costs 10-20 ms per task, so thousands of tiny
    # tasks serialize on the scheduler, not the work.
    # Task count is capped at n_shards (each shard renders a contiguous
    # slice of replicas) so driver-side scheduling cost stays CONSTANT
    # as repeat grows — Ray Data's event loop costs 10-20 ms per task,
    # so task count must track cluster size, not data size.
    path = f"{sf_dir}/documents.parquet"
    n_shards = min(repeat, 128)
    per_shard = repeat // n_shards
    extra = repeat % n_shards
    idx = ray.data.range(n_shards, override_num_blocks=n_shards)

    def gen_shard(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        src = pq.read_table(path, columns=["doc_id", "text", "lang"])
        ids = batch["id"].to_pylist() if isinstance(batch, pa.Table) else list(batch["id"])
        tbls = []
        for i in ids:
            i = int(i)
            lo = i * per_shard + min(i, extra)
            hi = lo + per_shard + (1 if i < extra else 0)
            tbls.extend(_pages_table(src, facts, r) for r in range(lo, hi))
        return pa.concat_tables(tbls)

    return idx.map_batches(gen_shard, batch_size=1, batch_format="pyarrow")


def _pages_table(batch: pa.Table, facts, replica: int) -> pa.Table:
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    urls, tss, htmls, out_texts = [], [], [], []
    for d, t, lg in zip(doc_ids, texts, langs):
        fact = facts[d % len(facts)]
        pad = (CHUNK_W - (len(t) % CHUNK_W)) % CHUNK_W
        full = t + " " * pad + fact_sentence(fact)
        url = (
            f"https://example.org/{lg}/{d:06d}"
            if replica == 0
            else f"https://example.org/r{replica:02d}/{lg}/{d:06d}"
        )
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
