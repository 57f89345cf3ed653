"""Request-facing serving endpoint (SURVEY §2.3 A16; VERDICT r1
missing #3).

Reference: ``fastie/api/app.py:65-95`` (FastAPI ``POST /v1/ie`` —
request ``{texts, ie_schema, batch_size, max_length}``, response
``{id, object, created, model, labels}``) and ``server.py:22-57``
(litserve: ``setup()`` loads the model once per worker, ``predict()``
runs ``model.predict``). FastAPI/litserve/uvicorn aren't in this
container, so the HTTP layer is stdlib ``http.server`` — the protocol
fields and label shapes match the reference:

- NER labels: per doc ``{label: [{start, end, text}]}``
  (``global_pointer/decode_utils.py:109-115`` set2json);
- REL labels: per doc ``{predicate: [{subject, object}]}``
  (``gplinker/decode_utils.py:114-121``);
- EVENT labels: per doc event list with subset dedup
  (``kernels.event_ee.events_to_json``);
- UIE labels: per doc flat result rows ``{level, prompt, text, start,
  end}`` (the engine's native shape; the reference nests by relation).

This is the one place the engine uses RAW Ray actors instead of a
Dataset: serving is request-driven, latency-bound, and has no dataset
to stream — the actor pool is the litserve ``workers_per_device``
analogue (one ``IEWorker`` per worker, model state built once in
``__init__``, round-robin dispatch per request).
"""

from __future__ import annotations

import itertools
import json
import secrets
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from fastie_ray.stages.chunk import split_text

TASKS = ("ner", "rel", "event", "uie")


def ner_set2json(labels: set) -> dict[str, list[dict[str, Any]]]:
    res: dict[str, list[dict[str, Any]]] = {}
    for _type, _start, _end, _ent in sorted(labels):
        res.setdefault(_type, []).append({"start": _start, "end": _end, "text": _ent})
    return res


def rel_set2json(labels: set) -> dict[str, list[dict[str, Any]]]:
    res: dict[str, list[dict[str, Any]]] = {}
    for _type, _sub, _obj in sorted(labels):
        res.setdefault(_type, []).append({"subject": _sub, "object": _obj})
    return res


class _IEWorkerImpl:
    """Per-worker state + per-request predict — the litserve ``setup``/
    ``predict`` pair. Plain class so it is unit-testable without Ray;
    wrapped in ``ray.remote`` by ``start_pool``."""

    def __init__(self, task: str, world=None, max_length: int = 512, **scorer_kw):
        assert task in TASKS, f"task must be one of {TASKS}"
        self.task = task
        self.max_length = max_length
        if task == "uie":
            from fastie_ray.pipelines.uie import UieDocScorer

            self.scorer = UieDocScorer(
                world_ref=world, max_length=max_length, **scorer_kw
            )
        else:
            from fastie_ray.stages.scorers import (
                EventScorer,
                NerScorer,
                RelScorer,
            )

            cls = {"ner": NerScorer, "rel": RelScorer, "event": EventScorer}[task]
            self.scorer = cls(world_ref=world, max_length=max_length, **scorer_kw)

    def predict(self, texts: list[str] | str, schema=None) -> list[Any]:
        if isinstance(texts, str):
            texts = [texts]
        if self.task == "uie":
            return self._predict_uie(texts, schema)
        out = []
        for text in texts:
            chunks = split_text(text, self.max_length - 2)
            off = 0
            if self.task == "ner":
                acc: set = set()
                for c in chunks:
                    dashed, seq_len, mapping = self.scorer._seq(c)
                    for lb, cs, ce, m in self.scorer._decode_mentions(
                        dashed, seq_len, c, mapping
                    ):
                        acc.add((lb, cs + off, ce + off, m))
                    off += len(c)
                out.append(ner_set2json(acc))
            elif self.task == "rel":
                acc = set()
                for c in chunks:
                    dashed, seq_len, mapping = self.scorer._seq(c)
                    acc |= set(
                        self.scorer._decode_triples(dashed, seq_len, c, mapping)
                    )
                out.append(rel_set2json(acc))
            else:  # event
                from fastie_ray.kernels.event_ee import (
                    decode_event_sparse,
                    events_to_json,
                )

                doc_events: set = set()
                for c in chunks:
                    dashed, seq_len, mapping = self.scorer._seq(c)
                    argus, links = self.scorer.feat.event_hits(dashed)
                    for ev in decode_event_sparse(argus, links, seq_len, c, mapping):
                        doc_events.add(
                            tuple(
                                (et, role, arg, cs + off, ce + off)
                                for et, role, arg, cs, ce in ev
                            )
                        )
                    off += len(c)
                out.append(events_to_json(sorted(doc_events)))
        return out

    def _predict_uie(self, texts: list[str], schema) -> list[Any]:
        # reference-shaped nested results ({node: [{text, start, end,
        # probability, relations: {...}}]}, decode_utils.py:220-323)
        from fastie_ray.pipelines.uie import build_schema_nodes, extract_nested

        if schema is not None:
            self.scorer.nodes, self.scorer.roots = build_schema_nodes(schema)
        return [extract_nested(self.scorer, t) for t in texts]


def start_pool(task: str, n_workers: int = 2, world=None, **kw):
    """n litserve-style workers as Ray actors; returns handles."""
    import ray

    Worker = ray.remote(_IEWorkerImpl)
    world_ref = ray.put(world) if world is not None else None
    return [
        Worker.options(num_cpus=1).remote(task, world=world_ref, **kw)
        for _ in range(n_workers)
    ]


def webui_html(task: str, title: str | None = None) -> str:
    """The WebUI page (reference ``fastie/webui/interface.py``: a
    gradio ``gr.Interface(textbox → gr.Json)`` playground; gradio is
    not in this container, so the same flow is one static HTML page —
    textarea (+ schema box for UIE) → ``POST /v1/ie`` → pretty-printed
    JSON result with inline entity highlights)."""
    title = title or "Fast Information Extraction Demo"
    schema_box = (
        '<label>Schema (JSON, UIE only)</label>'
        '<textarea id="schema" rows="3" placeholder=\'["person", '
        '{"organization": ["founder"]}]\'></textarea>'
        if task == "uie" else ""
    )
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: sans-serif; max-width: 56rem; margin: 2rem auto; }}
 textarea {{ width: 100%; font-size: 1rem; }}
 pre {{ background: #f6f6f6; padding: 1rem; overflow-x: auto; }}
 .hl {{ background: #ffe08a; border-radius: 3px; padding: 0 2px; }}
 button {{ font-size: 1rem; padding: .4rem 1.2rem; margin: .6rem 0; }}
</style></head><body>
<h1>{title}</h1>
<p>task: <b>{task}</b> — enter one sentence per line.</p>
<textarea id="texts" rows="5" placeholder="Enter sentence here..."></textarea>
{schema_box}
<br><button onclick="run()">Extract</button>
<div id="marked"></div>
<pre id="out">Result appears here.</pre>
<script>
async function run() {{
  const texts = document.getElementById('texts').value.split('\\n')
      .map(s => s.trim()).filter(s => s.length);
  const body = {{texts: texts}};
  const sEl = document.getElementById('schema');
  if (sEl && sEl.value.trim()) body.ie_schema = JSON.parse(sEl.value);
  const r = await fetch('/v1/ie', {{method: 'POST',
      headers: {{'Content-Type': 'application/json'}},
      body: JSON.stringify(body)}});
  const j = await r.json();
  document.getElementById('out').textContent = JSON.stringify(j, null, 2);
  const marked = document.getElementById('marked');
  marked.innerHTML = '';
  (j.labels || []).forEach((doc, i) => {{
    let spans = [];
    Object.values(doc || {{}}).forEach(v => (Array.isArray(v) ? v : [])
        .forEach(e => {{ if (e && e.start != null) spans.push(e); }}));
    spans.sort((a, b) => a.start - b.start);
    // build with text nodes, never innerHTML over user text — input
    // containing markup must render inert, not execute (ADVICE r4)
    let t = texts[i] || '', pos = 0;
    const p = document.createElement('p');
    spans.forEach(e => {{ if (e.start >= pos) {{
        p.appendChild(document.createTextNode(t.slice(pos, e.start)));
        const hl = document.createElement('span');
        hl.className = 'hl';
        hl.textContent = t.slice(e.start, e.end);
        p.appendChild(hl);
        pos = e.end; }} }});
    p.appendChild(document.createTextNode(t.slice(pos)));
    marked.appendChild(p);
  }});
}}
</script></body></html>"""


def make_handler(task: str, workers, api_key: str | None = None,
                 webui: bool = False):
    """POST /v1/ie handler with the reference protocol envelope
    (``api/protocol.py:25-60``): request {texts, ie_schema, batch_size,
    max_length}, response {id, object, created, model, labels}."""
    import ray

    rr = itertools.cycle(range(len(workers)))
    obj_name = {
        "ner": "named-entity-recognition",
        "rel": "relation-extraction",
        "event": "event-extraction",
        "uie": "uie",
    }[task]

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if not webui or self.path not in ("/", "/index.html"):
                self.send_error(404)
                return
            body = webui_html(task).encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/v1/ie":
                self.send_error(404)
                return
            if api_key is not None:
                auth = self.headers.get("Authorization", "")
                if auth != f"Bearer {api_key}":
                    self.send_error(401, "Invalid API key.")
                    return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                texts = req["texts"]
                w = workers[next(rr)]
                labels = ray.get(w.predict.remote(texts, req.get("ie_schema")))
            except Exception as e:  # bad request
                self.send_error(400, str(e))
                return
            body = json.dumps(
                {
                    "id": f"{task}-{secrets.token_hex(12)}",
                    "object": obj_name,
                    "created": int(time.time()),
                    "model": f"fastie_ray/{task}",
                    "labels": labels,
                },
                ensure_ascii=False,
            ).encode("utf-8")
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve(
    task: str = "rel",
    host: str = "127.0.0.1",
    port: int = 8000,
    n_workers: int = 2,
    world=None,
    api_key: str | None = None,
    webui: bool = False,
    **kw,
) -> ThreadingHTTPServer:
    """Build the pool + HTTP server (caller owns the Ray session and
    calls ``serve_forever`` / ``shutdown``). ``webui=True`` also serves
    the playground page on GET / (the gradio-interface analogue)."""
    workers = start_pool(task, n_workers=n_workers, world=world, **kw)
    return ThreadingHTTPServer(
        (host, port), make_handler(task, workers, api_key, webui=webui)
    )
