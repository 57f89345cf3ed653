"""UIE-style schema-tree extraction (SURVEY §2.4 J3 / §2.3 A14/G5).

Reference: ``fastie/models/uie/decode_utils.py`` — a runtime schema
(``set_schema`` 215-218, ``SchemaTree``/``_build_tree`` 525-573) is
traversed level by level (``_multi_stage_predict`` 220-323): level-k
extracted spans become prefixes of level-k+1 prompts
(``prefix[k].append(result + "的")``, 234-271; prompt = prefix +
node.name for Chinese), inputs with no parent results drop out
(semi-join, 249-250), and classification prompts (bracketed option
lists, 252-259) are majority-voted across a document's chunks
(``_auto_joiner`` 486-507 → ``functions.uie_prep.cls_majority_vote``).
Per-level span decode is threshold-scan + nearest pairing
(``get_bool_ids_greater_than`` 90-115, ``get_span`` 38-87) — those
exact kernels (``fastie_ray.kernels.uie_span``) run here.

Ray Data restatement — and why there is NO per-level dataset loop:
the reference traversal is **document-local**. ``input_map`` /
``prefix`` / ``parent_relations`` are all indexed by input text
(decode_utils.py:237-246, 312-317): a parent result extracted from doc
d only ever generates child prompts evaluated on doc d's own chunks,
never on another document. So the whole multi-stage traversal runs
inside ONE actor-pool ``map_batches`` over extracted documents —
``UieDocScorer`` chunks each doc in-actor (``stages.chunk.split_text``,
the ported ``auto_splitter``), walks the schema tree level-
synchronously across the docs of the batch (so a transformer backend
would still see full micro-batches of (chunk, prompt) pairs per
level), and emits doc-level result rows. Zero shuffles, zero joins,
zero materialize barriers, and no ``chunk_text`` in any shuffled
dataset — the only exchange in the pipeline is the final bucketed
output dedup. At 100 TB this is embarrassingly parallel and streams.

Default schema over the synthetic world: roots = subject labels,
children = the predicates whose subject has that label; level-2
prompts are ``f"{subject}的{predicate}"`` asking for the object span.
Schemas may nest arbitrarily deep (dict values are child subtrees,
reference ``_build_tree`` semantics) and may contain classification
nodes (``name[optA,optB]``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any

import numpy as np
import pyarrow as pa

from fastie_ray.functions.uie_prep import cls_majority_vote
from fastie_ray.kernels.uie_span import get_bool_ids_greater_than, get_span
from fastie_ray.ops.dedup import dedup_exact
from fastie_ray.stages.chunk import split_text
from fastie_ray.stages.extract import extract_text
from fastie_ray.stages.scorers import _ScorerBase
from fastie_ray.synth import PREDICATES

if TYPE_CHECKING:
    import ray.data

DEFAULT_SCHEMA: dict[str, list[str]] = {}
for _p, (_sl, _ol, _ph) in sorted(PREDICATES.items()):
    DEFAULT_SCHEMA.setdefault(_sl, []).append(_p)

_CLS_OPT_RE = re.compile(r"\[(.*?)\]$")


@dataclass
class SchemaNode:
    name: str
    children: list[int] = field(default_factory=list)


def build_schema_nodes(schema) -> tuple[list[SchemaNode], list[int]]:
    """Flatten a reference-style schema (str | list | dict, nested —
    ``decode_utils.py:_build_tree`` 552-573) into an indexed node list
    plus root ids. Dict values are child subtrees; list items are
    siblings."""
    nodes: list[SchemaNode] = []

    def add(spec, parent: int | None) -> list[int]:
        ids: list[int] = []
        if isinstance(spec, str):
            nodes.append(SchemaNode(spec))
            ids.append(len(nodes) - 1)
        elif isinstance(spec, list):
            for item in spec:
                ids.extend(add(item, parent))
        elif isinstance(spec, dict):
            for name, sub in sorted(spec.items()):
                nodes.append(SchemaNode(name))
                nid = len(nodes) - 1
                ids.append(nid)
                nodes[nid].children = add(sub, nid)
        else:
            raise TypeError(f"invalid schema node: {spec!r}")
        return ids

    roots = add(schema, None)
    return nodes, roots


class UieDocScorer(_ScorerBase):
    """One actor call = the full schema-tree traversal for a batch of
    documents. Chunking happens in-actor (reference chunks per level
    inside ``_single_stage_predict``; we chunk once at the fixed
    ``max_length - 2`` width, the shape the driver oracle encodes).
    Span results carry doc-level offsets (chunk offset pre-added — the
    ``_auto_joiner`` offset accumulation, decode_utils.py:508-524);
    classification results are majority-voted across the doc's chunks
    (start = end = -1, G5)."""

    def __init__(self, *args, schema=None, **kw):
        super().__init__(*args, **kw)
        self.nodes, self.roots = build_schema_nodes(schema or DEFAULT_SCHEMA)

    # ---- per-(prompt, chunk) scoring ---------------------------------

    def _chunk_spans(self, prompt: str, dashed: str, seq_len: int):
        """CHAR spans for one (prompt, chunk) → reference decode:
        threshold scan + nearest-end pairing (``get_bool_ids_greater_
        than`` + ``get_span``) over start/end probability rows. Under
        ``backend="hf"`` the rows live in SUBWORD-token space (hits
        projected via ``char_to_token``, spans mapped back through the
        encoding's offset_mapping) — the shape a transformer UIE
        checkpoint produces; the default char path is the identity
        mapping of the char tokenizer."""
        char_hits: list[tuple[int, int]] = []  # (cs, ce) char spans
        mhits, rhits = self._hits(dashed)
        if "的" in prompt:
            parent, pred = prompt.rsplit("的", 1)
            pid = self.feat.pred2id.get(pred)
            if pid is not None:
                from fastie_ray.functions.textnorm import space_to_dash

                parent_d = space_to_dash(parent)
                for r in rhits:
                    if r.pred_id != pid:
                        continue
                    if dashed[r.s_cs : r.s_ce] != parent_d:
                        continue
                    char_hits.append((r.o_cs, r.o_ce))
        else:
            lid = self.feat.label2id.get(prompt)
            if lid is not None:
                char_hits = [
                    (h.cs, h.ce) for h in mhits if h.label_id == lid
                ]

        if self.backend == "hf":
            enc = self._cache.setdefault(
                ("__enc__", dashed), None
            ) or self.dense.tokenizer.encode(dashed)
            self._cache[("__enc__", dashed)] = enc
            L = enc.seq_len
            starts = np.zeros(L, dtype=np.float32)
            ends = np.zeros(L, dtype=np.float32)
            for cs, ce in char_hits:
                h, t = enc.char_to_token(cs), enc.char_to_token(ce - 1)
                if h is not None and t is not None:
                    starts[h] = 1.0
                    ends[t] = 1.0
            s_ids = get_bool_ids_greater_than(starts, 0.5)
            e_ids = get_bool_ids_greater_than(ends, 0.5)
            return sorted(
                (enc.offsets[ts][0], enc.offsets[te][1])
                for ts, te in get_span(s_ids, e_ids)
            )

        starts = np.zeros(seq_len, dtype=np.float32)
        ends = np.zeros(seq_len, dtype=np.float32)
        for cs, ce in char_hits:
            if ce < seq_len - 1:
                starts[cs + 1] = 1.0
                ends[ce] = 1.0
        s_ids = get_bool_ids_greater_than(starts, 0.5)
        e_ids = get_bool_ids_greater_than(ends, 0.5)
        return sorted((ts - 1, te) for ts, te in get_span(s_ids, e_ids))

    def _cls_predict(self, options: list[str], text: str) -> list[dict]:
        """Deterministic classification stand-in (the role of the
        prompt-region span decode, decode_utils.py:330-346): pick the
        option with the most occurrences in the chunk (tie → first
        listed, no occurrences → no prediction), probability =
        share of option mentions. A transformer backend replaces this
        with prompt-span scores; the voting downstream is identical."""
        counts = [text.count(o) for o in options]
        total = sum(counts)
        if total == 0:
            return []
        best = int(np.argmax(counts))
        return [{"text": options[best], "probability": counts[best] / total}]

    def _hits(self, dashed: str):
        cached = self._cache.get(dashed)
        if cached is None:
            cached = (self.feat.mention_hits(dashed), self.feat.relation_hits(dashed))
            self._cache[dashed] = cached
        return cached

    # ---- traversal ---------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._cache: dict[str, tuple] = {}  # per-batch memo of chunk hits
        from fastie_ray.functions.textnorm import space_to_dash

        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()

        rows = {k: [] for k in ("url", "level", "prompt", "argument", "start", "end")}

        def emit(url, level, prompt, argument, start, end):
            rows["url"].append(url)
            rows["level"].append(level)
            rows["prompt"].append(prompt)
            rows["argument"].append(argument)
            rows["start"].append(start)
            rows["end"].append(end)

        # pre-chunk every doc once
        docs = []
        for url, text in zip(urls, texts):
            chunks = split_text(text, self.max_length - 2)
            offs = np.cumsum([0] + [len(c) for c in chunks[:-1]]).tolist()
            dashed = [space_to_dash(c) for c in chunks]
            docs.append((url, chunks, offs, dashed))

        # frontier rows: (doc_idx, node_id, prompt) — level-synchronous
        # across the batch's docs so a model backend batches per level.
        frontier = [
            (di, nid, self.nodes[nid].name)
            for di in range(len(docs))
            for nid in self.roots
        ]
        level = 1
        while frontier:
            nxt: list[tuple[int, int, str]] = []
            for di, nid, prompt in frontier:
                url, chunks, offs, dashed = docs[di]
                node = self.nodes[nid]
                args: list[str] = []
                copt = _CLS_OPT_RE.search(prompt)
                if copt is not None:
                    opts = [o.strip() for o in re.split("[,，]", copt.group(1))]
                    voted = cls_majority_vote(
                        [self._cls_predict(opts, c) for c in chunks]
                    )
                    for r in voted:
                        emit(url, level, prompt, r["text"], -1, -1)
                        args.append(r["text"])
                else:
                    for chunk, off, dsh in zip(chunks, offs, dashed):
                        seq_len = min(len(chunk), self.max_length - 2) + 2
                        for cs, ce in self._chunk_spans(prompt, dsh, seq_len):
                            emit(url, level, prompt, chunk[cs:ce], cs + off, ce + off)
                            args.append(chunk[cs:ce])
                if node.children and args:
                    for child in node.children:
                        for arg in dict.fromkeys(args):  # dedup, keep order
                            nxt.append(
                                (di, child, f"{arg}的{self.nodes[child].name}")
                            )
            frontier = nxt
            level += 1

        return pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "level": pa.array(np.asarray(rows["level"], dtype=np.int32)),
                "prompt": pa.array(rows["prompt"], pa.string()),
                "argument": pa.array(rows["argument"], pa.string()),
                "start": pa.array(np.asarray(rows["start"], dtype=np.int32)),
                "end": pa.array(np.asarray(rows["end"], dtype=np.int32)),
            }
        )


def uie_extract(
    pages: "ray.data.Dataset",
    schema: dict | list | str | None = None,
    world_ref=None,
    concurrency: int = 4,
    n_buckets: int = 32,
    batch_size: int | None = None,
    **scorer_kw: Any,
) -> "ray.data.Dataset":
    """pages → (url, level, prompt, argument, start, end) rows across
    all schema levels (cls rows carry start = end = -1). One streaming
    actor-pool pass — the schema traversal is doc-local (see module
    docstring) — followed by the output dedup's bucketed shuffle."""
    scored = extract_text(pages).map_batches(
        UieDocScorer,
        fn_constructor_kwargs={
            "world_ref": world_ref,
            "schema": schema or DEFAULT_SCHEMA,
            **scorer_kw,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return dedup_exact(
        scored, ["url", "level", "prompt", "argument", "start", "end"], n_buckets
    )


def extract_nested(scorer: UieDocScorer, text: str) -> dict:
    """Reference-shaped nested results for ONE document
    (``decode_utils.py:_multi_stage_predict`` output: ``{node_name:
    [{text, start, end, probability, relations: {child: [...]}}]}``) —
    the serving format. Runs the same chunk-local scoring as the batch
    traversal; used by the request-facing endpoint where per-doc
    latency, not throughput, matters."""
    from fastie_ray.functions.textnorm import space_to_dash

    scorer._cache = {}
    chunks = split_text(text, scorer.max_length - 2)
    offs = np.cumsum([0] + [len(c) for c in chunks[:-1]]).tolist()
    dashed = [space_to_dash(c) for c in chunks]

    def run_node(prompt: str) -> list[dict]:
        copt = _CLS_OPT_RE.search(prompt)
        if copt is not None:
            opts = [o.strip() for o in re.split("[,，]", copt.group(1))]
            return [
                dict(r) for r in cls_majority_vote(
                    [scorer._cls_predict(opts, c) for c in chunks]
                )
            ]
        out = []
        for chunk, off, dsh in zip(chunks, offs, dashed):
            seq_len = min(len(chunk), scorer.max_length - 2) + 2
            for cs, ce in scorer._chunk_spans(prompt, dsh, seq_len):
                out.append(
                    {
                        "text": chunk[cs:ce],
                        "start": cs + off,
                        "end": ce + off,
                        "probability": 1.0,
                    }
                )
        return out

    def traverse(nid: int, prompt: str) -> list[dict]:
        results = run_node(prompt)
        node = scorer.nodes[nid]
        if node.children:
            for r in results:
                relations: dict[str, list] = {}
                for child in node.children:
                    sub = traverse(
                        child, f"{r['text']}的{scorer.nodes[child].name}"
                    )
                    if sub:
                        relations[scorer.nodes[child].name] = sub
                if relations:
                    r["relations"] = relations
        return results

    out: dict[str, list] = {}
    for rid in scorer.roots:
        res = traverse(rid, scorer.nodes[rid].name)
        if res:
            out[scorer.nodes[rid].name] = res
    return out
