"""Deterministic featurizer — the sandbox stand-in for transformer scorers.

Produces *score hits* (sparse logits) from text, playing the role of the
GlobalPointer / GPLinker forward passes: mention hits where a gazetteer
surface occurs, relation head/tail hits where a
``{subject}{predicate-phrase}{object}`` assertion occurs. The decode
kernels (``fastie_ray.kernels``) then run the exact reference decode
semantics over these scores — so pipeline correctness (chunking,
space→dash, offset mapping, rejoin, dedup) is exercised on the same
code path a real model would use, without torch weights (SURVEY §7.0).

Everything matches on DASHED text (``space_to_dash``), mirroring the
reference's ``infer_inputs = [t.replace(" ", "-")]``
(``global_pointer/decode_utils.py:138``); char positions are therefore
valid in the ORIGINAL text, which is what gets sliced.

The regex alternations are compiled once per scorer actor
(``__init__``), not per batch.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from fastie_ray.functions.textnorm import space_to_dash
from fastie_ray.synth import LABELS, PREDICATES, World


@dataclass(frozen=True)
class MentionHit:
    label_id: int
    cs: int  # char start in chunk text
    ce: int  # char end (exclusive)


@dataclass(frozen=True)
class RelationHit:
    pred_id: int
    s_cs: int
    s_ce: int
    o_cs: int
    o_ce: int


class GazetteerFeaturizer:
    """Shared by NerScorer and RelScorer; one instance per actor."""

    def __init__(self, world: World):
        self.label2id = {lb: i for i, lb in enumerate(sorted(LABELS))}
        self.id2label = {i: lb for lb, i in self.label2id.items()}
        preds = sorted(PREDICATES)
        self.pred2id = {p: i for i, p in enumerate(preds)}
        self.id2predicate = {i: p for p, i in self.pred2id.items()}

        gaz = world.gazetteer  # surface → label
        self._surface_label: dict[str, int] = {
            space_to_dash(s): self.label2id[lb] for s, lb in gaz.items()
        }
        # longest-first alternation so regex prefers the full surface
        alts = sorted(self._surface_label, key=len, reverse=True)
        alt = "|".join(re.escape(s) for s in alts)
        self._mention_re = re.compile(f"({alt})")
        self._rel_res: list[tuple[int, re.Pattern]] = []
        for p in preds:
            s_lb, o_lb, phrase = PREDICATES[p]
            # per-predicate alternations restricted to compatible labels
            subj_surfaces = [s for s in alts if self._surface_label[s] == self.label2id[s_lb]]
            obj_surfaces = [s for s in alts if self._surface_label[s] == self.label2id[o_lb]]
            pat = (
                f"({'|'.join(re.escape(s) for s in subj_surfaces)})"
                f"{re.escape(space_to_dash(phrase))}"
                f"({'|'.join(re.escape(s) for s in obj_surfaces)})"
            )
            self._rel_res.append((self.pred2id[p], re.compile(pat)))
        # every relation pattern contains its predicate phrase as a
        # mandatory literal — a C-speed substring test over the chunk
        # prunes whole regex scans on phrase-free chunks (most of a
        # real crawl) with exactly-equal output
        self._dash_phrases = [
            space_to_dash(PREDICATES[p][2]) for p in preds
        ]

    # ---- "forward passes" -------------------------------------------------

    def mention_hits(self, dashed_text: str) -> list[MentionHit]:
        return [
            MentionHit(self._surface_label[m.group(1)], m.start(1), m.end(1))
            for m in self._mention_re.finditer(dashed_text)
        ]

    def has_relation_phrase(self, dashed_text: str) -> bool:
        return any(ph in dashed_text for ph in self._dash_phrases)

    def relation_hits(self, dashed_text: str) -> list[RelationHit]:
        out: list[RelationHit] = []
        for (pid, rx), ph in zip(self._rel_res, self._dash_phrases):
            if ph not in dashed_text:
                continue
            for m in rx.finditer(dashed_text):
                out.append(
                    RelationHit(pid, m.start(1), m.end(1), m.start(2), m.end(2))
                )
        return out

    # ---- alternate-decoder adapters (sparse; production) ------------------

    def casrel_inputs(
        self, dashed_text: str
    ) -> tuple[set[int], set[int], dict[tuple[int, int], list[tuple[int, int, int]]]]:
        """Sparse CasRel inputs (kernels.casrel_re.decode_casrel_sparse):
        subject start/end token positions + per-subject object hits —
        the role of the subject tagger + conditional object tagger
        (``modeling_casrel.py:157-245``)."""
        subj_starts: set[int] = set()
        subj_ends: set[int] = set()
        object_hits: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
        for r in self.relation_hits(dashed_text):
            s = (r.s_cs + 1, r.s_ce)
            subj_starts.add(s[0])
            subj_ends.add(s[1])
            object_hits.setdefault(s, []).append((r.pred_id, r.o_cs + 1, r.o_ce))
        return subj_starts, subj_ends, object_hits

    def onerel_inputs(
        self, dashed_text: str
    ) -> tuple[list, list, list]:
        """Sparse OneRel tag hits (kernels.onerel_re.decode_onerel_sparse):
        HB-TB / HB-TE / HE-TE triples per relation assertion
        (``modeling_onerel.py:145-187``)."""
        hb_tb, hb_te, he_te = [], [], []
        for r in self.relation_hits(dashed_text):
            s_h, s_t, o_h, o_t = r.s_cs + 1, r.s_ce, r.o_cs + 1, r.o_ce
            hb_tb.append((r.pred_id, s_h, o_h))
            hb_te.append((r.pred_id, s_h, o_t))
            he_te.append((r.pred_id, s_t, o_t))
        return hb_tb, hb_te, he_te

    def bio_tags(self, dashed_text: str, seq_len: int) -> list[str]:
        """BIO tag sequence over token positions (CLS=0 tagged 'O') —
        the Viterbi-output shape consumed by the CRF chunker
        (``crf/decode_utils.py:24-54``)."""
        tags = ["O"] * seq_len
        for h in self.mention_hits(dashed_text):
            tok_h, tok_t = h.cs + 1, h.ce
            if tok_t >= seq_len - 1 or tok_h == 0:
                continue
            label = self.id2label[h.label_id]
            tags[tok_h] = f"B-{label}"
            for i in range(tok_h + 1, tok_t + 1):
                tags[i] = f"I-{label}"
        return tags

    def span_labels(
        self, dashed_text: str, seq_len: int
    ) -> tuple[list[int], list[int], dict[int, str]]:
        """Start/end argmax label sequences for the span-pointer decoder
        (``modeling_span.py:133-168``); label ids are 1-based (0=none)."""
        starts = [0] * seq_len
        ends = [0] * seq_len
        id2label_1 = {i + 1: lb for i, lb in self.id2label.items()}
        for h in self.mention_hits(dashed_text):
            tok_h, tok_t = h.cs + 1, h.ce
            if tok_t >= seq_len - 1 or tok_h == 0:
                continue
            starts[tok_h] = h.label_id + 1
            ends[tok_t] = h.label_id + 1
        return starts, ends, id2label_1

    def tplinker_ner_inputs(self, dashed_text: str) -> list[tuple[int, int, int]]:
        """Sparse TPLinker-NER spots (pos1, pos2, tag=label_id), the
        shaking-matrix nonzeros (``ner tplinker modeling:174-191``)."""
        return [(h.cs + 1, h.ce, h.label_id) for h in self.mention_hits(dashed_text)]

    @property
    def tplinker_re_tags(self) -> dict[int, str]:
        """Handshaking tag vocabulary: ``{ent}=EH2ET`` per label plus
        ``{rel}=SH2OH/OH2SH/ST2OT/OT2ST`` per predicate."""
        if not hasattr(self, "_tpl_tags"):
            tags = [f"{lb}=EH2ET" for lb in sorted(self.label2id)]
            for p in sorted(self.pred2id):
                tags += [f"{p}=SH2OH", f"{p}=OH2SH", f"{p}=ST2OT", f"{p}=OT2ST"]
            self._tpl_tags = {i: t for i, t in enumerate(tags)}
            self._tpl_tag2id = {t: i for i, t in self._tpl_tags.items()}
        return self._tpl_tags

    def tplinker_re_inputs(self, dashed_text: str) -> list[tuple[int, int, int]]:
        """Sparse TPLinker-RE spots: entity EH2ET spots + orientation-
        normalized head/tail link spots (pos1 <= pos2 always — the
        upper-triangular shaking constraint; reversed pairs use the
        OH2SH / OT2ST tags, ``re tplinker modeling:195-216``)."""
        self.tplinker_re_tags  # build vocab
        spots = []
        for h in self.mention_hits(dashed_text):
            tag = self._tpl_tag2id[f"{self.id2label[h.label_id]}=EH2ET"]
            spots.append((h.cs + 1, h.ce, tag))
        for r in self.relation_hits(dashed_text):
            pred = self.id2predicate[r.pred_id]
            s_h, s_t, o_h, o_t = r.s_cs + 1, r.s_ce, r.o_cs + 1, r.o_ce
            if s_h <= o_h:
                spots.append((s_h, o_h, self._tpl_tag2id[f"{pred}=SH2OH"]))
            else:
                spots.append((o_h, s_h, self._tpl_tag2id[f"{pred}=OH2SH"]))
            if s_t <= o_t:
                spots.append((s_t, o_t, self._tpl_tag2id[f"{pred}=ST2OT"]))
            else:
                spots.append((o_t, s_t, self._tpl_tag2id[f"{pred}=OT2ST"]))
        return spots

    def w2ner_inputs(
        self, dashed_text: str, max_words: int
    ) -> tuple[list[tuple[int, int]], list[tuple[int, int, int]]]:
        """Sparse W2NER grid hits over WORD (=char) indices: NNW chain
        edges along each mention plus one THW (head, tail, label_id+2)
        per mention — label ids shifted by 2 because grid value 1 is the
        NNW tag (``modeling_w2ner.py:207-224``)."""
        nnw: list[tuple[int, int]] = []
        thw: list[tuple[int, int, int]] = []
        for h in self.mention_hits(dashed_text):
            if h.ce > max_words:
                continue
            for i in range(h.cs, h.ce - 1):
                nnw.append((i, i + 1))
            thw.append((h.cs, h.ce - 1, h.label_id + 2))
        return nnw, thw

    def cnn_inputs(self, dashed_text: str) -> list[tuple[int, int, int, float]]:
        """Sparse CNN-NER span hits over WORD (=char) indices, inclusive
        ends, unit confidence — the post-symmetrization cells above the
        0.5 threshold (``modeling_cnn.py:251-273``; word-indexed like
        ``w2ner_inputs``, the reference slices text directly)."""
        return [
            (h.label_id, h.cs, h.ce - 1, 1.0) for h in self.mention_hits(dashed_text)
        ]

    def grte_inputs(self, dashed_text: str) -> list[tuple[int, int, int, int]]:
        """Sparse GRTE table cells (s, e, pred_id, tag) in CLS-shifted
        token space — the head/tail marker pairs the argmaxed ``[L, L,
        R]`` table carries per relation assertion (``modeling_grte.py:
        167-232``): SS for single/single, MSH+MST / SMH+SMT / MMH+MMT
        for the multi-token combinations."""
        cells: list[tuple[int, int, int, int]] = []
        for r in self.relation_hits(dashed_text):
            s_h, s_t = r.s_cs + 1, r.s_ce
            o_h, o_t = r.o_cs + 1, r.o_ce
            single_s, single_o = s_h == s_t, o_h == o_t
            if single_s and single_o:
                cells.append((s_h, o_h, r.pred_id, 1))  # SS
            elif not single_s and single_o:
                cells.append((s_h, o_h, r.pred_id, 2))  # MSH
                cells.append((s_t, o_h, r.pred_id, 3))  # MST
            elif single_s and not single_o:
                cells.append((s_h, o_h, r.pred_id, 4))  # SMH
                cells.append((s_h, o_t, r.pred_id, 5))  # SMT
            else:
                cells.append((s_h, o_h, r.pred_id, 6))  # MMH
                cells.append((s_t, o_t, r.pred_id, 7))  # MMT
        return cells

    def event_hits(
        self, dashed_text: str
    ) -> tuple[list[tuple[str, str, int, int]], set[tuple[int, int, int, int]]]:
        """Sparse GPLinker-EE inputs (kernels.event_ee.decode_event_sparse):
        each relation assertion becomes one event — trigger = the
        connective phrase span, subject/object = argument roles — with a
        fully-linked (complete-subgraph) link set per assertion, the
        shape ``modeling_gplinker.py:176-218`` decodes."""
        from fastie_ray.kernels.event_ee import TRIGGER_ROLE

        argus: list[tuple[str, str, int, int]] = []
        links: set[tuple[int, int, int, int]] = set()
        for r in self.relation_hits(dashed_text):
            et = self.id2predicate[r.pred_id]
            group = [
                (et, TRIGGER_ROLE, r.s_ce + 1, r.o_cs),
                (et, "subject", r.s_cs + 1, r.s_ce),
                (et, "object", r.o_cs + 1, r.o_ce),
            ]
            argus.extend(group)
            for a in group:
                for b in group:
                    if a is not b:
                        links.add((a[2], a[3], b[2], b[3]))
        return argus, links

    # ---- dense logits (test oracle only; O(L^2) memory) -------------------

    def ner_logits_dense(self, dashed_text: str, max_length: int = 512):
        import numpy as np

        L = min(len(dashed_text), max_length - 2) + 2
        logits = np.full((len(self.id2label), L, L), -1.0, dtype=np.float32)
        for h in self.mention_hits(dashed_text):
            tok_h, tok_t = h.cs + 1, h.ce
            if tok_t < L:
                logits[h.label_id, tok_h, tok_t] = 1.0
        return logits

    def rel_logits_dense(self, dashed_text: str, max_length: int = 512):
        import numpy as np

        L = min(len(dashed_text), max_length - 2) + 2
        P = len(self.id2predicate)
        entity = np.full((2, L, L), -1.0, dtype=np.float32)
        head = np.full((P, L, L), -1.0, dtype=np.float32)
        tail = np.full((P, L, L), -1.0, dtype=np.float32)
        for h in self.mention_hits(dashed_text):
            tok_h, tok_t = h.cs + 1, h.ce
            if tok_t < L:
                entity[0, tok_h, tok_t] = 1.0  # subject channel
                entity[1, tok_h, tok_t] = 1.0  # object channel
        for r in self.relation_hits(dashed_text):
            s_h, s_t = r.s_cs + 1, r.s_ce
            o_h, o_t = r.o_cs + 1, r.o_ce
            if s_t < L and o_t < L:
                head[r.pred_id, s_h, o_h] = 1.0
                tail[r.pred_id, s_t, o_t] = 1.0
        return entity, head, tail
