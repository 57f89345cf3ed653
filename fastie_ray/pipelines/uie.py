"""UIE-style schema-tree extraction as an ITERATIVE Ray Data pipeline
(SURVEY §2.4 J3 / §2.3 A14).

Reference: ``fastie/models/uie/decode_utils.py`` — a runtime schema
(``set_schema``, 215-218; ``SchemaTree`` 525-573) is traversed level
by level (220-323): level-k extracted spans become prefixes of
level-k+1 prompts (``prefix[k].append(result + "的")``, 234-271), and
inputs with no parent results drop out (semi-join, 249-250). Per-level
span decode is threshold-scan + nearest pairing
(``get_bool_ids_greater_than`` 90-115, ``get_span`` 38-87) — those
exact kernels (``fastie_ray.kernels.uie_span``) run here.

Ray Data restatement: each schema level is ONE actor-pool
``map_batches`` pass over a dataset of (chunk, prompt) rows; the
"join parent results back to texts" is avoided by carrying the chunk
text through result rows (levels are bounded and results are sparse —
the semi-join keeps only chunks with parent hits). At corpus scale
with deep schemas, replace the carried text with a bucketed hash join
on (url, chunk_id), the same shape as ``_bucketed_groupby``.

Default schema over the synthetic world: roots = subject labels,
children = the predicates whose subject has that label; level-2
prompts are ``f"{subject}的{predicate}"`` asking for the object span.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

import numpy as np
import pyarrow as pa

from fastie_ray.kernels.uie_span import get_bool_ids_greater_than, get_span
from fastie_ray.ops.dedup import dedup_exact
from fastie_ray.stages.chunk import chunk_pages
from fastie_ray.stages.extract import extract_text
from fastie_ray.stages.scorers import _ScorerBase
from fastie_ray.synth import PREDICATES

if TYPE_CHECKING:
    import ray.data

DEFAULT_SCHEMA: dict[str, list[str]] = {}
for _p, (_sl, _ol, _ph) in sorted(PREDICATES.items()):
    DEFAULT_SCHEMA.setdefault(_sl, []).append(_p)


class UieSpanScorer(_ScorerBase):
    """Prompt-conditioned start/end pointer scorer: one actor-pool pass
    per schema level. Root prompts are label names (extract mentions of
    that label); child prompts are ``{parent}的{predicate}`` (extract
    the object of that relation for that subject). Decode is the
    reference path: probability rows → ``get_bool_ids_greater_than`` →
    ``get_span`` → offset-mapped char spans."""

    def _hits(self, dashed: str):
        """Per-batch memo: each chunk text appears once per PROMPT row,
        so the regex scans would otherwise repeat per prompt."""
        cached = self._cache.get(dashed)
        if cached is None:
            cached = (self.feat.mention_hits(dashed), self.feat.relation_hits(dashed))
            self._cache[dashed] = cached
        return cached

    def _prompt_probs(self, prompt: str, dashed: str, seq_len: int):
        starts = np.zeros(seq_len, dtype=np.float32)
        ends = np.zeros(seq_len, dtype=np.float32)
        mhits, rhits = self._hits(dashed)
        if "的" in prompt:
            parent, pred = prompt.rsplit("的", 1)
            pid = self.feat.pred2id.get(pred)
            if pid is None:
                return starts, ends
            from fastie_ray.functions.textnorm import space_to_dash

            parent_d = space_to_dash(parent)
            for r in rhits:
                if r.pred_id != pid:
                    continue
                if dashed[r.s_cs : r.s_ce] != parent_d:
                    continue
                if r.o_ce < seq_len - 1:
                    starts[r.o_cs + 1] = 1.0
                    ends[r.o_ce] = 1.0
        else:
            lid = self.feat.label2id.get(prompt)
            if lid is None:
                return starts, ends
            for h in mhits:
                if h.label_id == lid and h.ce < seq_len - 1 and h.cs + 1 > 0:
                    starts[h.cs + 1] = 1.0
                    ends[h.ce] = 1.0
        return starts, ends

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._cache: dict[str, tuple] = {}  # reset per batch (bounded)
        urls = batch["url"].to_pylist()
        cids = batch["chunk_id"].to_pylist()
        offs = batch["chunk_offset"].to_pylist()
        texts = batch["chunk_text"].to_pylist()
        prompts = batch["prompt"].to_pylist()
        levels = batch["level"].to_pylist()

        rows = {k: [] for k in
                ("url", "chunk_id", "chunk_offset", "chunk_text", "level",
                 "prompt", "argument", "start", "end")}
        for url, cid, coff, text, prompt, level in zip(
            urls, cids, offs, texts, prompts, levels
        ):
            dashed, seq_len, mapping = self._seq(text)
            s_probs, e_probs = self._prompt_probs(prompt, dashed, seq_len)
            s_ids = get_bool_ids_greater_than(s_probs, 0.5)
            e_ids = get_bool_ids_greater_than(e_probs, 0.5)
            for ts, te in sorted(get_span(s_ids, e_ids)):
                cs, ce = mapping[ts][0], mapping[te][1]
                rows["url"].append(url)
                rows["chunk_id"].append(cid)
                rows["chunk_offset"].append(coff)
                rows["chunk_text"].append(text)
                rows["level"].append(level)
                rows["prompt"].append(prompt)
                rows["argument"].append(text[cs:ce])
                rows["start"].append(cs)
                rows["end"].append(ce)
        return pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "chunk_id": pa.array(np.asarray(rows["chunk_id"], dtype=np.int32)),
                "chunk_offset": pa.array(np.asarray(rows["chunk_offset"], dtype=np.int32)),
                "chunk_text": pa.array(rows["chunk_text"], pa.string()),
                "level": pa.array(np.asarray(rows["level"], dtype=np.int32)),
                "prompt": pa.array(rows["prompt"], pa.string()),
                "argument": pa.array(rows["argument"], pa.string()),
                "start": pa.array(np.asarray(rows["start"], dtype=np.int32)),
                "end": pa.array(np.asarray(rows["end"], dtype=np.int32)),
            }
        )


def uie_extract(
    pages: "ray.data.Dataset",
    schema: dict[str, list[str]] | None = None,
    world_ref=None,
    concurrency: int = 4,
    n_buckets: int = 32,
    **scorer_kw: Any,
) -> "ray.data.Dataset":
    """pages → (url, level, prompt, argument, start, end) rows across
    all schema levels — the schema-tree traversal as a bounded loop of
    datasets (one actor-pool pass per level, J3 semi-join between)."""
    schema = schema or DEFAULT_SCHEMA
    roots = sorted(schema)

    chunks = chunk_pages(extract_text(pages))

    def seed_prompts(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tbls = []
        for root in roots:
            tbls.append(
                batch.append_column("prompt", pa.array([root] * n, pa.string()))
                .append_column("level", pa.array(np.ones(n, dtype=np.int32)))
            )
        return pa.concat_tables(tbls)

    level_in = chunks.map_batches(seed_prompts, batch_format="pyarrow")

    def run_level(ds_in):
        return ds_in.map_batches(
            UieSpanScorer,
            fn_constructor_kwargs={"world_ref": world_ref, **scorer_kw},
            batch_format="pyarrow",
            concurrency=concurrency,
        )

    # materialize level-1: its lineage would otherwise execute THREE
    # times (fan-out branch + union branch re-run the scorer pool), and
    # concurrent actor pools can starve a small cluster. Level results
    # are sparse (hits only), so this is a small barrier by design —
    # the reference's per-level boundary (decode_utils.py:309-321).
    lvl1 = run_level(level_in).materialize()

    # child prompts: every level-1 result fans out to its schema
    # children (prefix = result + "的"); chunks with no parent result
    # dropped implicitly (no rows) — the reference's semi-join.
    children = {root: sorted(schema[root]) for root in roots}

    def fan_out(batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in
                ("url", "chunk_id", "chunk_offset", "chunk_text", "prompt", "level")}
        cols = {c: batch[c].to_pylist() for c in
                ("url", "chunk_id", "chunk_offset", "chunk_text", "prompt", "argument")}
        for i in range(batch.num_rows):
            root = cols["prompt"][i]
            arg = cols["argument"][i]
            for pred in children.get(root, []):
                rows["url"].append(cols["url"][i])
                rows["chunk_id"].append(cols["chunk_id"][i])
                rows["chunk_offset"].append(cols["chunk_offset"][i])
                rows["chunk_text"].append(cols["chunk_text"][i])
                rows["prompt"].append(f"{arg}的{pred}")
                rows["level"].append(2)
        return pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "chunk_id": pa.array(np.asarray(rows["chunk_id"], dtype=np.int32)),
                "chunk_offset": pa.array(np.asarray(rows["chunk_offset"], dtype=np.int32)),
                "chunk_text": pa.array(rows["chunk_text"], pa.string()),
                "prompt": pa.array(rows["prompt"], pa.string()),
                "level": pa.array(np.asarray(rows["level"], dtype=np.int32)),
            }
        )

    lvl2 = run_level(lvl1.map_batches(fan_out, batch_format="pyarrow"))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        off = pc.cast(batch["chunk_offset"], pa.int32())
        return pa.table(
            {
                "url": batch["url"],
                "level": batch["level"],
                "prompt": batch["prompt"],
                "argument": batch["argument"],
                "start": pc.add(batch["start"], off),
                "end": pc.add(batch["end"], off),
            }
        )

    out = lvl1.union(lvl2).map_batches(finish, batch_format="pyarrow")
    return dedup_exact(
        out, ["url", "level", "prompt", "argument", "start", "end"], n_buckets
    )
