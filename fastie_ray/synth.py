"""Deterministic synthetic corpus (FIXTURES.md F1–F5) — no external data.

Everything is a pure function of (seed, sizes): the entity/relation
"world" is generated once from the seed, and every page is generated
from a per-url RNG (``key_rng``), so row content is independent of
generation order, batch layout and partitioning (FIXTURES.md
"Synthesis rules").

Gold labels are generated *jointly* with the text: fact sentences are
rendered from the world's relation KB at known character offsets, so
the reference decode and the engine decode can be compared span-exactly
(the P/R ≥ 0.95 gate of BASELINE.json).

Design constraints baked in:
- entity surface forms are pairwise non-substring (4-digit id infix,
  digit-free filler words) so gazetteer matching is unambiguous;
- surfaces include spaces (exercises the space→dash invariant, SURVEY
  §2.2 M2) and Chinese text + 。！？ punctuation (sentence splitter,
  UTF-8 multi-byte offsets);
- document lengths straddle the 510-char chunk boundary
  (``max_length - 2``), with a long tail so multi-chunk rejoin and
  boundary-loss behavior are exercised;
- entity popularity is power-law (head-entity skew for the salted
  canonicalization groupby).
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass, field
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from fastie_ray.functions.hashing import hash_embed, key_rng

if TYPE_CHECKING:
    import ray.data

SEED = 42
EPOCH_US = 1_700_000_000_000_000  # deterministic warc_ts base (2023-11-14T22:13:20Z)

# sorted label vocabulary — id2label is sorted() in the reference
# (modeling_gp.py:96); keep sorted here too.
LABELS = ["EVT", "LOC", "ORG", "PER", "PROD"]

# predicate → (subject label, object label, connective phrase)
PREDICATES = {
    "founded_by": ("ORG", "PER", " was founded by "),
    "located_in": ("ORG", "LOC", "位于"),
    "part_of": ("ORG", "ORG", " is part of "),
    "produces": ("ORG", "PROD", " produces "),
    "works_for": ("PER", "ORG", " works for "),
}

_PER_FIRST = ["Avery", "Brin", "Cato", "Dora", "Ewan", "Fei", "Galen", "Hoshi"]
_PER_LAST = ["Quon", "Reyes", "Sato", "Torv", "Usman", "Voss", "Wren", "Xiang"]
_ORG_BASE = ["Helix", "Kestrel", "Lumen", "Mistral", "Nimbus", "Onyx", "Pryce", "Quanta"]
_LOC_BASE = ["Arling", "Brevik", "Coruna", "Dunmore", "Elsmere", "Fenwick"]
_PROD_BASE = ["Widget", "Gadget", "Module", "Sensor", "Router", "Turbine"]
_EVT_BASE = ["Expo", "Summit", "Forum", "Gala", "Congress", "Symposium"]

_FILLER = (
    "the quick lattice hums while distant rivers braid through quiet valleys and "
    "morning light settles over terraced fields where farmers mend their nets and "
    "children trade painted stones beside the old mill"
).split()
_FILLER_ZH = list("春江潮水连海平明月共潮生滟滟随波千万里何处无月明")


@dataclass
class Entity:
    entity_id: str
    name: str
    label: str


@dataclass
class Fact:
    predicate: str
    subj: Entity
    obj: Entity

    def sentence(self, lang: str) -> str:
        phrase = PREDICATES[self.predicate][2]
        end = "。" if lang == "zh" else ". "
        return f"{self.subj.name}{phrase}{self.obj.name}{end}"


@dataclass
class World:
    entities: list[Entity]
    facts: list[Fact]
    by_label: dict[str, list[Entity]] = field(default_factory=dict)

    @property
    def gazetteer(self) -> dict[str, str]:
        """surface name → label (surfaces are unique, non-substring)."""
        return {e.name: e.label for e in self.entities}


def _entity_name(label: str, i: int, rng: np.random.Generator) -> str:
    tag = f"{i:04d}"
    if label == "PER":
        return f"{rng.choice(_PER_FIRST)} {rng.choice(_PER_LAST)}{tag}"
    if label == "ORG":
        if rng.random() < 0.3:
            return f"华讯{tag}集团"
        return f"{rng.choice(_ORG_BASE)} Group{tag}"
    if label == "LOC":
        if rng.random() < 0.3:
            return f"临江{tag}市"
        return f"{rng.choice(_LOC_BASE)} City{tag}"
    if label == "PROD":
        return f"{rng.choice(_PROD_BASE)} X{tag}"
    return f"{rng.choice(_EVT_BASE)} {tag}"


def build_world(n_entities: int = 200, n_facts: int = 400, seed: int = SEED) -> World:
    rng = np.random.default_rng(seed)
    entities: list[Entity] = []
    by_label: dict[str, list[Entity]] = {lb: [] for lb in LABELS}
    for i in range(n_entities):
        label = LABELS[i % len(LABELS)]
        e = Entity(entity_id=f"E{i:06d}", name=_entity_name(label, i, rng), label=label)
        entities.append(e)
        by_label[label].append(e)

    preds = sorted(PREDICATES)
    facts: list[Fact] = []
    seen: set[tuple[str, str, str]] = set()
    while len(facts) < n_facts:
        p = preds[int(rng.integers(len(preds)))]
        s_lb, o_lb, _ = PREDICATES[p]
        # power-law entity popularity → head-entity skew downstream
        subj = _powerlaw_choice(by_label[s_lb], rng)
        obj = _powerlaw_choice(by_label[o_lb], rng)
        if subj.name == obj.name:
            continue
        k = (subj.entity_id, p, obj.entity_id)
        if k in seen:
            continue
        seen.add(k)
        facts.append(Fact(predicate=p, subj=subj, obj=obj))
    return World(entities=entities, facts=facts, by_label=by_label)


def _powerlaw_choice(pool: list, rng: np.random.Generator, alpha: float = 2.0):
    u = rng.random()
    return pool[int(len(pool) * u**alpha) % len(pool)]


# ---------------------------------------------------------------- pages


def doc_url(doc_id: int, lang: str) -> str:
    return f"https://example.org/{lang}/{doc_id:06d}"


def planted_links(url: str) -> list[tuple[str, str]]:
    """Deterministic out-links for an html page: ``(href, anchor)`` pairs.

    Pure modular arithmetic on the doc id (the trailing digits of the
    url path) so a DuckDB oracle can reproduce the plan exactly:

    - ``n_links = 2 + doc_id % 3`` (2–4 anchors)
    - link *j* targets host ``h{(doc_id*31 + (j//2)*17) % 97:02d}.example.net``
      (consecutive j share a host, so link count > distinct-page count)
    - anchor text alternates ``ref``/``see`` + the host tag.
    """
    tail = url.rsplit("/", 1)[-1]
    did = int(tail) if tail.isdigit() else 0
    out = []
    for j in range(2 + did % 3):
        h = (did * 31 + (j // 2) * 17) % 97
        href = f"https://h{h:02d}.example.net/d/{did:06d}-{j}"
        anchor = f"{'ref' if j % 2 == 0 else 'see'} h{h:02d}"
        out.append((href, anchor))
    return out


def wrap_html(text: str, url: str) -> bytes:
    paras = "".join(f"<p>{_html.escape(p)}</p>" for p in text.split("\n"))
    nav = "".join(
        f'<a href="{href}">{_html.escape(anchor)}</a>'
        for href, anchor in planted_links(url)
    )
    # The <nav> block sits OUTSIDE every <p>, so html_to_text (which
    # collects only <p> bodies) is unchanged — byte-identity per url holds.
    return (
        f"<html><head><title>{_html.escape(url)}</title></head>"
        f"<body><nav>{nav}</nav>{paras}</body></html>"
    ).encode("utf-8")


_LANGS = ["en", "en", "en", "zh", "zh", "de", "fr", "es"]


def gen_doc(doc_id: int, world: World, seed: int = SEED) -> dict:
    """One page + its gold annotations. Pure function of (doc_id, world, seed)."""
    rng = key_rng(f"doc:{doc_id}", seed=seed)
    lang = _LANGS[int(rng.integers(len(_LANGS)))]
    url = doc_url(doc_id, lang)
    # length plan: 80% short (one chunk), 20% long (2–3 chunks)
    target_len = int(rng.integers(80, 480)) if rng.random() < 0.8 else int(rng.integers(600, 1500))

    parts: list[str] = []
    pos = 0
    gold_entities: list[dict] = []
    gold_triples: list[dict] = []
    filler = _FILLER_ZH if lang == "zh" else _FILLER

    while pos < target_len:
        if rng.random() < 0.55:  # fact sentence from the KB (power-law pick)
            fact = _powerlaw_choice(world.facts, rng)
            phrase = PREDICATES[fact.predicate][2]
            end = "。" if lang == "zh" else ". "
            s_start = pos
            s_end = s_start + len(fact.subj.name)
            o_start = s_end + len(phrase)
            o_end = o_start + len(fact.obj.name)
            sent = f"{fact.subj.name}{phrase}{fact.obj.name}{end}"
            gold_entities.append(
                {"url": url, "entity": fact.subj.name, "start_offset": s_start,
                 "end_offset": s_end, "label": fact.subj.label}
            )
            gold_entities.append(
                {"url": url, "entity": fact.obj.name, "start_offset": o_start,
                 "end_offset": o_end, "label": fact.obj.label}
            )
            gold_triples.append(
                {"url": url, "predicate": fact.predicate,
                 "subject": fact.subj.name, "object": fact.obj.name}
            )
        else:  # filler sentence, digit-free → no gazetteer hits
            n = int(rng.integers(4, 12))
            words = [filler[int(rng.integers(len(filler)))] for _ in range(n)]
            if lang == "zh":
                sent = "".join(words) + "。"
            else:
                sent = " ".join(words) + ". "
        parts.append(sent)
        pos += len(sent)

    text = "".join(parts)
    html_only = doc_id % 7 == 3
    return {
        "url": url,
        "warc_ts": EPOCH_US + doc_id * 1_000_000,
        "html": wrap_html(text, url) if html_only else None,
        "text": None if html_only else text,
        "lang": lang,
        "_gold_text": text,
        "_gold_entities": gold_entities,
        "_gold_triples": gold_triples,
    }


def synth_pages_table(
    n_docs: int, world: World | None = None, seed: int = SEED
) -> tuple[pa.Table, pa.Table, pa.Table, pa.Table]:
    """Driver-side generation (small scale): returns
    (pages, gold_text, gold_entities, gold_triples) Arrow tables."""
    world = world or build_world(seed=seed)
    rows = [gen_doc(i, world, seed) for i in range(n_docs)]
    pages = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
            "html": pa.array([r["html"] for r in rows], pa.binary()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
            "lang": pa.array([r["lang"] for r in rows], pa.string()),
        }
    )
    gold_text = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], pa.string()),
            "text": pa.array([r["_gold_text"] for r in rows], pa.string()),
        }
    )
    ge = [g for r in rows for g in r["_gold_entities"]]
    gt = [g for r in rows for g in r["_gold_triples"]]
    gold_entities = pa.table(
        {
            "url": pa.array([g["url"] for g in ge], pa.string()),
            "entity": pa.array([g["entity"] for g in ge], pa.string()),
            "start_offset": pa.array([g["start_offset"] for g in ge], pa.int32()),
            "end_offset": pa.array([g["end_offset"] for g in ge], pa.int32()),
            "label": pa.array([g["label"] for g in ge], pa.string()),
        }
    )
    gold_triples = pa.table(
        {
            "url": pa.array([g["url"] for g in gt], pa.string()),
            "predicate": pa.array([g["predicate"] for g in gt], pa.string()),
            "subject": pa.array([g["subject"] for g in gt], pa.string()),
            "object": pa.array([g["object"] for g in gt], pa.string()),
        }
    )
    return pages, gold_text, gold_entities, gold_triples


def synth_pages_dataset(
    n_docs: int, seed: int = SEED, n_entities: int = 200, n_facts: int = 400
) -> "ray.data.Dataset":
    """Streaming generation for bench scale: ray.data.range → map_batches.
    Each task rebuilds the (small) world from the seed — cheap, and keeps
    the generator shared-nothing."""
    import ray.data

    def gen_batch(batch: dict) -> pa.Table:
        world = _cached_world(n_entities, n_facts, seed)
        rows = [gen_doc(int(i), world, seed) for i in batch["id"]]
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
                "lang": pa.array([r["lang"] for r in rows], pa.string()),
            }
        )

    return ray.data.range(n_docs).map_batches(gen_batch, batch_format="numpy", batch_size=512)


_WORLD_CACHE: dict[tuple, World] = {}


def _cached_world(n_entities: int, n_facts: int, seed: int) -> World:
    k = (n_entities, n_facts, seed)
    if k not in _WORLD_CACHE:
        _WORLD_CACHE[k] = build_world(n_entities, n_facts, seed)
    return _WORLD_CACHE[k]


# ---------------------------------------------------------------- alias dict


def alias_table(world: World, dim: int = 32, seed: int = SEED) -> pa.Table:
    """F5 alias dictionary: canonical name + deterministic variants."""
    alias, eid, cname, emb = [], [], [], []
    seen: set[str] = set()
    for e in world.entities:
        variants = [e.name, e.name.lower(), e.name.replace(" ", "")]
        vec = hash_embed(e.name, dim=dim, seed=seed).tolist()
        for v in variants:
            if v in seen:
                continue
            seen.add(v)
            alias.append(v)
            eid.append(e.entity_id)
            cname.append(e.name)
            emb.append(vec)
    return pa.table(
        {
            "alias": pa.array(alias, pa.string()),
            "entity_id": pa.array(eid, pa.string()),
            "canonical_name": pa.array(cname, pa.string()),
            "embedding": pa.array(emb, pa.list_(pa.float32(), dim)),
        }
    )
