"""Stateful scorer stages — the actor-pool pattern (SURVEY §2.3).

Each class mirrors the reference serving shape (litserve ``setup()``
loads the model once per worker, ``server.py:22-32``): expensive state
(gazetteer regexes ≈ tokenizer+weights) is built in ``__init__`` —
once per actor — and ``__call__`` scores one Arrow batch of chunks.

Pass them to ``ds.map_batches(Cls, concurrency=N, batch_size=B,
fn_constructor_kwargs=...)``. The world can be broadcast once with
``ray.put`` and handed to the constructor as an ObjectRef (resolved
here with ``ray.get``), or rebuilt deterministically from the seed.

Scoring = deterministic featurizer (sparse logits) + the reference
decode kernels. A transformer backend would keep the identical decode
and batch plumbing and only replace hit generation.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from fastie_ray.featurizer import GazetteerFeaturizer
from fastie_ray.functions.textnorm import space_to_dash
from fastie_ray.kernels.bio_ner import decode_bio
from fastie_ray.kernels.casrel_re import decode_casrel_sparse
from fastie_ray.kernels.gp_ner import decode_gp_sparse
from fastie_ray.kernels.gplinker_re import decode_gplinker_sparse
from fastie_ray.kernels.onerel_re import decode_onerel_sparse
from fastie_ray.kernels.span_ner import decode_span
from fastie_ray.synth import World, build_world

if TYPE_CHECKING:
    import ray.data


class CharOffsetMapping:
    """Allocation-free offset_mapping for the char tokenizer: CLS/SEP →
    (0,0), char token i → (i-1, i). Indistinguishable (by __getitem__)
    from the materialized HF-style list."""

    __slots__ = ("last",)

    def __init__(self, seq_len: int):
        self.last = seq_len - 1

    def __getitem__(self, i: int) -> tuple[int, int]:
        if i == 0 or i >= self.last:
            return (0, 0)
        return (i - 1, i)


def _resolve_world(world_ref, seed: int, n_entities: int, n_facts: int) -> World:
    if world_ref is not None:
        import ray

        return ray.get(world_ref) if isinstance(world_ref, ray.ObjectRef) else world_ref
    return build_world(n_entities=n_entities, n_facts=n_facts, seed=seed)


class _ScorerBase:
    def __init__(
        self,
        world_ref=None,
        seed: int = 42,
        n_entities: int = 200,
        n_facts: int = 400,
        max_length: int = 512,
        backend: str = "default",
        ner_backend: str | None = None,
        rel_backend: str | None = None,
        hf_model: str | None = None,
    ):
        world = _resolve_world(world_ref, seed, n_entities, n_facts)
        self.feat = GazetteerFeaturizer(world)
        self.max_length = max_length
        self.backend = backend
        self.ner_backend = ner_backend or backend
        self.rel_backend = rel_backend or backend
        if "hf" in (self.ner_backend, self.rel_backend):
            # HF-transformer path (VERDICT r1 #1): subword tokenization
            # with real offset mappings + dense logits into the dense
            # decode kernels; TorchDenseBackend when hf_model is given
            # AND torch imports, DeterministicDenseBackend otherwise.
            from fastie_ray.hf_backend import resolve_dense_backend

            self.dense = resolve_dense_backend(
                self.feat, max_length=max_length, model_name_or_path=hf_model
            )

    def _seq(self, text: str) -> tuple[str, int, CharOffsetMapping]:
        dashed = space_to_dash(text)
        seq_len = min(len(text), self.max_length - 2) + 2
        return dashed, seq_len, CharOffsetMapping(seq_len)

    def _decode_mentions(self, dashed, seq_len, text, mapping):
        """Dispatch across the NER decode families (SURVEY §2.3 A1/A3/A4):
        same featurizer scores, different reference decode semantics —
        all must produce identical mention sets on flat (non-nested)
        corpora, which the parity tests assert."""
        if self.ner_backend in ("default", "gp"):
            hits = (
                (h.label_id, h.cs + 1, h.ce, 1.0)
                for h in self.feat.mention_hits(dashed)
            )
            return decode_gp_sparse(hits, seq_len, text, mapping, self.feat.id2label)
        if self.ner_backend == "bio":
            tags = self.feat.bio_tags(dashed, seq_len)
            return decode_bio(tags, text, mapping)
        if self.ner_backend == "span":
            starts, ends, id2l = self.feat.span_labels(dashed, seq_len)
            return decode_span(starts, ends, seq_len, text, mapping, id2l)
        if self.ner_backend == "w2ner":
            from fastie_ray.kernels.w2ner import decode_w2ner_sparse

            # word-grid indices are raw char positions (no CLS shift);
            # id2label shifted by +2 mirrors the grid tag space
            nnw, thw = self.feat.w2ner_inputs(dashed, seq_len - 2)
            id2l = {i + 2: lb for i, lb in self.feat.id2label.items()}
            return decode_w2ner_sparse(nnw, thw, seq_len - 2, text, id2l)
        if self.ner_backend == "tplinker":
            from fastie_ray.kernels.tplinker import decode_tplinker_ner

            spots = self.feat.tplinker_ner_inputs(dashed)
            return decode_tplinker_ner(
                spots, seq_len, text, mapping, self.feat.id2label
            )
        if self.ner_backend == "cnn":
            # word-grid span candidates + greedy clash filter (A6,
            # modeling_cnn.py:251-273); word indices are raw char
            # positions, text sliced directly — no offset mapping.
            from fastie_ray.kernels.cnn_ner import decode_cnn_sparse

            hits = self.feat.cnn_inputs(dashed)
            return decode_cnn_sparse(hits, seq_len - 2, text, self.feat.id2label)
        if self.ner_backend == "hf":
            # dense transformer shape: subword offset_mapping (multi-char
            # entries) + [C, L, L] logits → the line-for-line dense decode
            # (modeling_gp.py:145-170). seq_len/mapping args are the char-
            # tokenizer's and are ignored; the encoding carries its own.
            from fastie_ray.kernels.gp_ner import decode_gp_dense

            enc, logits = self.dense.ner_forward(dashed)
            # decode with the CHECKPOINT's label vocab when the backend
            # carries one (TrainedHeadBackend trained on a different
            # label set/order than the serving featurizer) — falling
            # back to the featurizer's map only for label-less backends.
            # Mirrors ee_forward, which already returns its label map.
            id2l = getattr(self.dense, "id2label", None) or self.feat.id2label
            return decode_gp_dense(
                logits, enc.seq_len, text, enc.offsets, id2l
            )
        raise ValueError(f"unknown NER backend: {self.ner_backend}")

    def _decode_triples(self, dashed, seq_len, text, mapping):
        """Dispatch across the RE decode families (A7 GPLinker, A8
        CasRel, A9 OneRel) — identical triple sets on flat corpora."""
        if self.rel_backend == "tplinker":
            from fastie_ray.kernels.tplinker import decode_tplinker_re

            spots = self.feat.tplinker_re_inputs(dashed)
            return decode_tplinker_re(
                spots, seq_len, text, mapping, self.feat.tplinker_re_tags
            )
        if self.rel_backend in ("default", "gplinker", "pfn"):
            # PFN decode is structurally identical to GPLinker over
            # sigmoid probabilities (kernels.pfn_re); the featurizer's
            # unit-score hits clear both thresholds, so the sparse
            # production path is shared.
            if not self.feat.has_relation_phrase(dashed):
                # no phrase → no head/tail hits → the product-∩ decode
                # is empty regardless of spans; skip the mention scan
                return []
            mhits = self.feat.mention_hits(dashed)
            spans = [(h.cs + 1, h.ce) for h in mhits]
            rhits = self.feat.relation_hits(dashed)
            return decode_gplinker_sparse(
                spans, spans,
                [(r.pred_id, r.s_cs + 1, r.o_cs + 1) for r in rhits],
                [(r.pred_id, r.s_ce, r.o_ce) for r in rhits],
                seq_len, text, mapping, self.feat.id2predicate,
            )
        if self.rel_backend == "casrel":
            s_starts, s_ends, obj_hits = self.feat.casrel_inputs(dashed)
            return decode_casrel_sparse(
                s_starts, s_ends, obj_hits, seq_len, text, mapping,
                self.feat.id2predicate,
            )
        if self.rel_backend == "onerel":
            hb_tb, hb_te, he_te = self.feat.onerel_inputs(dashed)
            return decode_onerel_sparse(
                hb_tb, hb_te, he_te, seq_len, text, mapping,
                self.feat.id2predicate,
            )
        if self.rel_backend == "grte":
            # argmaxed table-filling tag pairs (A12,
            # modeling_grte.py:167-232) in CLS-shifted token space.
            from fastie_ray.kernels.grte_re import decode_grte_sparse

            cells = self.feat.grte_inputs(dashed)
            return decode_grte_sparse(
                cells, seq_len, text, mapping, self.feat.id2predicate
            )
        if self.rel_backend == "hf":
            # three dense GPLinker heads under the subword encoding →
            # line-for-line dense decode (modeling_gplinker.py:164-213).
            from fastie_ray.kernels.gplinker_re import decode_gplinker_dense

            enc, entity, head, tail = self.dense.rel_forward(dashed)
            # checkpoint predicate vocab wins over the featurizer's
            # (same rationale as the NER hf branch above).
            id2p = (
                getattr(self.dense, "id2predicate", None)
                or self.feat.id2predicate
            )
            return decode_gplinker_dense(
                entity, head, tail, enc.seq_len, text, enc.offsets, id2p,
            )
        raise ValueError(f"unknown RE backend: {self.rel_backend}")


class NerScorer(_ScorerBase):
    """chunks → chunk-local mentions. Backends: ``gp`` (GlobalPointer
    decode A1, default), ``bio`` (CRF chunking A3), ``span``
    (start/end pointer pairing A4), ``w2ner`` (sparse word-grid walk
    A2), ``tplinker`` (shaking spots A5), ``cnn`` (biaffine span +
    clash filter A6), ``hf`` (subword tokenization + dense-logit
    decode — the transformer shape, M9/A16).

    ``emit="doc_mentions_ctx"`` folds the chunk→doc rejoin into the
    scorer call (same co-location contract as
    ``rejoin_mentions_local``) and carries each mention's chunk-local
    KWIC context windows (``context_chars`` on each side, clamped to
    the chunk) — the disambiguation-context shape an entity-linking
    reranker consumes. Contexts can only be computed HERE: the chunk
    text never leaves the scorer task."""

    def __init__(self, *a, emit: str = "chunk", context_chars: int = 40, **kw):
        super().__init__(*a, **kw)
        if emit not in ("chunk", "doc_mentions_ctx"):
            raise ValueError(f"unknown emit mode: {emit!r}")
        self.emit = emit
        self.context_chars = context_chars

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        cids = batch["chunk_id"].to_pylist()
        offs = batch["chunk_offset"].to_pylist()
        texts = batch["chunk_text"].to_pylist()

        if self.emit == "doc_mentions_ctx":
            w = self.context_chars
            seen: set = set()
            out = {k: [] for k in
                   ("url", "label", "start", "end", "mention", "left_ctx",
                    "right_ctx")}
            for url, coff, text in zip(urls, offs, texts):
                dashed, seq_len, mapping = self._seq(text)
                for label, cs, ce, mention in self._decode_mentions(
                    dashed, seq_len, text, mapping
                ):
                    k = (url, label, cs + coff, ce + coff, mention)
                    if k in seen:
                        continue
                    seen.add(k)
                    out["url"].append(url)
                    out["label"].append(label)
                    out["start"].append(cs + coff)
                    out["end"].append(ce + coff)
                    out["mention"].append(mention)
                    out["left_ctx"].append(text[max(0, cs - w):cs])
                    out["right_ctx"].append(text[ce:ce + w])
            return pa.table(
                {
                    "url": pa.array(out["url"], pa.string()),
                    "label": pa.array(out["label"], pa.string()),
                    "start": pa.array(np.asarray(out["start"], dtype=np.int32)),
                    "end": pa.array(np.asarray(out["end"], dtype=np.int32)),
                    "mention": pa.array(out["mention"], pa.string()),
                    "left_ctx": pa.array(out["left_ctx"], pa.string()),
                    "right_ctx": pa.array(out["right_ctx"], pa.string()),
                }
            )

        o_url, o_cid, o_off, o_lab, o_s, o_e, o_m = [], [], [], [], [], [], []
        for url, cid, coff, text in zip(urls, cids, offs, texts):
            dashed, seq_len, mapping = self._seq(text)
            ents = self._decode_mentions(dashed, seq_len, text, mapping)
            for label, cs, ce, mention in ents:
                o_url.append(url)
                o_cid.append(cid)
                o_off.append(coff)
                o_lab.append(label)
                o_s.append(cs)
                o_e.append(ce)
                o_m.append(mention)
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "chunk_id": pa.array(np.asarray(o_cid, dtype=np.int32)),
                "chunk_offset": pa.array(np.asarray(o_off, dtype=np.int32)),
                "label": pa.array(o_lab, pa.string()),
                "start": pa.array(np.asarray(o_s, dtype=np.int32)),
                "end": pa.array(np.asarray(o_e, dtype=np.int32)),
                "mention": pa.array(o_m, pa.string()),
            }
        )


class RelScorer(_ScorerBase):
    """chunks → chunk-level (predicate, subject, object) triples.
    Backends: ``gplinker`` (product-∩ decode A7, default), ``casrel``
    (cascade pointer A8), ``onerel`` (tag-cube A9), ``tplinker``
    (handshaking A10), ``pfn`` (A11), ``grte`` (table-filling tag
    pairs A12), ``hf`` (subword + dense GPLinker heads, M9/A16).

    ``emit="doc_triples"`` folds the chunk→doc set union INTO the
    scorer call (a per-url seen-set while appending): output is the
    deduplicated (url, predicate, subject, object) table directly —
    zero downstream operators on the fused headline path. Valid under
    the same co-location contract as ``rejoin_triples_local``
    (``stages/rejoin.py``)."""

    def __init__(self, *a, emit: str = "chunk", **kw):
        super().__init__(*a, **kw)
        if emit not in ("chunk", "doc_triples"):
            raise ValueError(f"unknown emit mode: {emit!r}")
        self.emit = emit

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        cids = batch["chunk_id"].to_pylist()
        offs = batch["chunk_offset"].to_pylist()
        texts = batch["chunk_text"].to_pylist()

        if self.emit == "doc_triples":
            seen: set = set()
            o_url, o_p, o_s, o_o = [], [], [], []
            for url, text in zip(urls, texts):
                dashed, seq_len, mapping = self._seq(text)
                for p, s, o in self._decode_triples(dashed, seq_len, text, mapping):
                    k = (url, p, s, o)
                    if k in seen:
                        continue
                    seen.add(k)
                    o_url.append(url)
                    o_p.append(p)
                    o_s.append(s)
                    o_o.append(o)
            return pa.table(
                {
                    "url": pa.array(o_url, pa.string()),
                    "predicate": pa.array(o_p, pa.string()),
                    "subject": pa.array(o_s, pa.string()),
                    "object": pa.array(o_o, pa.string()),
                }
            )

        o_url, o_cid, o_off, o_p, o_s, o_o = [], [], [], [], [], []
        for url, cid, coff, text in zip(urls, cids, offs, texts):
            dashed, seq_len, mapping = self._seq(text)
            spoes = self._decode_triples(dashed, seq_len, text, mapping)
            for p, s, o in spoes:
                o_url.append(url)
                o_cid.append(cid)
                o_off.append(coff)
                o_p.append(p)
                o_s.append(s)
                o_o.append(o)
        return pa.table(
            {
                "url": pa.array(o_url, pa.string()),
                "chunk_id": pa.array(np.asarray(o_cid, dtype=np.int32)),
                "chunk_offset": pa.array(np.asarray(o_off, dtype=np.int32)),
                "predicate": pa.array(o_p, pa.string()),
                "subject": pa.array(o_s, pa.string()),
                "object": pa.array(o_o, pa.string()),
            }
        )


def score_mentions(
    ds_chunks: "ray.data.Dataset",
    world_ref=None,
    concurrency: int = 4,
    batch_size: int | None = None,
    **kw,
) -> "ray.data.Dataset":
    return ds_chunks.map_batches(
        NerScorer,
        fn_constructor_kwargs={"world_ref": world_ref, **kw},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def score_relations(
    ds_chunks: "ray.data.Dataset",
    world_ref=None,
    concurrency: int = 4,
    batch_size: int | None = None,
    **kw,
) -> "ray.data.Dataset":
    return ds_chunks.map_batches(
        RelScorer,
        fn_constructor_kwargs={"world_ref": world_ref, **kw},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class JointScorer(_ScorerBase):
    """One pass over chunks emitting BOTH mention rows (kind='m') and
    triple rows (kind='r') into a union-typed table. Halves the number
    of scans over the (input-sized) chunk stream: downstream splits by
    ``kind`` on the materialized (small) scored output instead of
    re-executing the page scan per output table."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        cids = batch["chunk_id"].to_pylist()
        offs = batch["chunk_offset"].to_pylist()
        texts = batch["chunk_text"].to_pylist()

        rows = {
            "url": [], "chunk_id": [], "chunk_offset": [], "kind": [],
            "label": [], "start": [], "end": [], "mention": [],
            "predicate": [], "subject": [], "object": [],
        }

        def emit(url, cid, coff, kind, label=None, start=-1, end=-1,
                 mention=None, predicate=None, subject=None, obj=None):
            rows["url"].append(url)
            rows["chunk_id"].append(cid)
            rows["chunk_offset"].append(coff)
            rows["kind"].append(kind)
            rows["label"].append(label)
            rows["start"].append(start)
            rows["end"].append(end)
            rows["mention"].append(mention)
            rows["predicate"].append(predicate)
            rows["subject"].append(subject)
            rows["object"].append(obj)

        for url, cid, coff, text in zip(urls, cids, offs, texts):
            dashed, seq_len, mapping = self._seq(text)
            ents = self._decode_mentions(dashed, seq_len, text, mapping)
            for label, cs, ce, mention in ents:
                emit(url, cid, coff, "m", label=label, start=cs, end=ce, mention=mention)
            spoes = self._decode_triples(dashed, seq_len, text, mapping)
            for p, s, o in spoes:
                emit(url, cid, coff, "r", predicate=p, subject=s, obj=o)

        return pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "chunk_id": pa.array(np.asarray(rows["chunk_id"], dtype=np.int32)),
                "chunk_offset": pa.array(np.asarray(rows["chunk_offset"], dtype=np.int32)),
                "kind": pa.array(rows["kind"], pa.string()),
                "label": pa.array(rows["label"], pa.string()),
                "start": pa.array(np.asarray(rows["start"], dtype=np.int32)),
                "end": pa.array(np.asarray(rows["end"], dtype=np.int32)),
                "mention": pa.array(rows["mention"], pa.string()),
                "predicate": pa.array(rows["predicate"], pa.string()),
                "subject": pa.array(rows["subject"], pa.string()),
                "object": pa.array(rows["object"], pa.string()),
            }
        )


def score_joint(
    ds_chunks: "ray.data.Dataset",
    world_ref=None,
    concurrency: int = 4,
    batch_size: int | None = None,
    **kw,
):
    """chunks → union table of mention + triple rows (split by `kind`)."""
    return ds_chunks.map_batches(
        JointScorer,
        fn_constructor_kwargs={"world_ref": world_ref, **kw},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def split_scored(ds_scored):
    """Split a JointScorer output into (mentions, triples) datasets with
    the per-kind schemas. Call on a MATERIALIZED scored dataset to avoid
    re-executing the scoring scan twice."""
    import pyarrow.compute as pc

    mentions = ds_scored.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "m")).select(
            ["url", "chunk_id", "chunk_offset", "label", "start", "end", "mention"]
        ),
        batch_format="pyarrow",
    )
    triples = ds_scored.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "r")).select(
            ["url", "chunk_id", "chunk_offset", "predicate", "subject", "object"]
        ),
        batch_format="pyarrow",
    )
    return mentions, triples


class EventScorer(_ScorerBase):
    """chunks → chunk-level event-argument rows (GPLinker-EE decode
    semantics A13: threshold argus + link set + clique_search grouping,
    trigger-less cliques dropped). One row per (event, argument).

    ``emit="doc_events"`` folds the chunk→doc rejoin INTO the scorer
    call: offsets are rebased by ``chunk_offset`` while appending and
    the per-url set union is a seen-set — output is the deduplicated
    (url, event_type, role, argument, start, end) table directly, same
    co-location contract as ``rejoin_events_local``."""

    def __init__(self, *a, emit: str = "chunk", **kw):
        super().__init__(*a, **kw)
        if emit not in ("chunk", "doc_events"):
            raise ValueError(f"unknown emit mode: {emit!r}")
        self.emit = emit

    def __call__(self, batch: pa.Table) -> pa.Table:
        from fastie_ray.kernels.event_ee import decode_event_sparse

        urls = batch["url"].to_pylist()
        cids = batch["chunk_id"].to_pylist()
        offs = batch["chunk_offset"].to_pylist()
        texts = batch["chunk_text"].to_pylist()

        rows = {k: [] for k in
                ("url", "chunk_id", "chunk_offset", "event_type", "role",
                 "argument", "start", "end")}
        for url, cid, coff, text in zip(urls, cids, offs, texts):
            dashed, seq_len, mapping = self._seq(text)
            if self.backend == "hf":
                # dense GPLinker-EE heads under the subword encoding →
                # line-for-line dense decode (modeling_gplinker.py:176-218)
                from fastie_ray.kernels.event_ee import decode_event_dense

                enc, argu, head, tail, id2l = self.dense.ee_forward(dashed)
                events = decode_event_dense(
                    argu, head, tail, enc.seq_len, text, enc.offsets, id2l
                )
            else:
                argus, links = self.feat.event_hits(dashed)
                events = decode_event_sparse(argus, links, seq_len, text, mapping)
            for ev in events:
                for et, role, arg, cs, ce in ev:
                    rows["url"].append(url)
                    rows["chunk_id"].append(cid)
                    rows["chunk_offset"].append(coff)
                    rows["event_type"].append(et)
                    rows["role"].append(role)
                    rows["argument"].append(arg)
                    rows["start"].append(cs)
                    rows["end"].append(ce)
        if self.emit == "doc_events":
            seen: set = set()
            out = {k: [] for k in
                   ("url", "event_type", "role", "argument", "start", "end")}
            for url, coff, et, role, arg, cs, ce in zip(
                rows["url"], rows["chunk_offset"], rows["event_type"],
                rows["role"], rows["argument"], rows["start"], rows["end"],
            ):
                k = (url, et, role, arg, cs + coff, ce + coff)
                if k in seen:
                    continue
                seen.add(k)
                out["url"].append(url)
                out["event_type"].append(et)
                out["role"].append(role)
                out["argument"].append(arg)
                out["start"].append(cs + coff)
                out["end"].append(ce + coff)
            return pa.table(
                {
                    "url": pa.array(out["url"], pa.string()),
                    "event_type": pa.array(out["event_type"], pa.string()),
                    "role": pa.array(out["role"], pa.string()),
                    "argument": pa.array(out["argument"], pa.string()),
                    "start": pa.array(np.asarray(out["start"], dtype=np.int32)),
                    "end": pa.array(np.asarray(out["end"], dtype=np.int32)),
                }
            )
        return pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "chunk_id": pa.array(np.asarray(rows["chunk_id"], dtype=np.int32)),
                "chunk_offset": pa.array(np.asarray(rows["chunk_offset"], dtype=np.int32)),
                "event_type": pa.array(rows["event_type"], pa.string()),
                "role": pa.array(rows["role"], pa.string()),
                "argument": pa.array(rows["argument"], pa.string()),
                "start": pa.array(np.asarray(rows["start"], dtype=np.int32)),
                "end": pa.array(np.asarray(rows["end"], dtype=np.int32)),
            }
        )


def score_events(
    ds_chunks: "ray.data.Dataset",
    world_ref=None,
    concurrency: int = 4,
    batch_size: int | None = None,
    **kw,
) -> "ray.data.Dataset":
    return ds_chunks.map_batches(
        EventScorer,
        fn_constructor_kwargs={"world_ref": world_ref, **kw},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
