"""Serving endpoint (A16): worker predict semantics + the HTTP
protocol envelope of ``api/app.py:65-95`` / ``api/protocol.py``."""

import json
import threading
import urllib.request

from fastie_ray.serve import _IEWorkerImpl, make_handler, ner_set2json, serve
from fastie_ray.synth import build_world


def _world_and_fact():
    w = build_world()
    return w, w.facts[0]


def test_worker_ner_set2json_shape():
    w, f = _world_and_fact()
    text = "lead. " + f.sentence("en") + " tail."
    out = _IEWorkerImpl("ner", world=w).predict([text])
    assert len(out) == 1
    labels = out[0]
    ents = {e["text"] for lst in labels.values() for e in lst}
    assert f.subj.name in ents and f.obj.name in ents
    for lst in labels.values():
        for e in lst:
            assert text[e["start"] : e["end"]] == e["text"]


def test_worker_rel_and_event_and_multichunk_offsets():
    w, f = _world_and_fact()
    pad = "z" * 600  # push the fact into the second chunk
    text = pad + f.sentence("en")
    rel = _IEWorkerImpl("rel", world=w).predict([text])[0]
    assert rel == {f.predicate: [{"subject": f.subj.name, "object": f.obj.name}]}
    ev = _IEWorkerImpl("event", world=w).predict([text])[0]
    assert len(ev) == 1 and ev[0]["event_type"] == f.predicate
    roles = {a["role"]: a["argument"] for a in ev[0]["arguments"]}
    assert roles == {"subject": f.subj.name, "object": f.obj.name}


def test_worker_uie_with_schema_nested():
    w, f = _world_and_fact()
    text = f.sentence("en")
    out = _IEWorkerImpl("uie", world=w).predict(
        [text], schema={f.subj.label: [f.predicate]}
    )[0]
    # reference nested shape: root results carry child results under
    # "relations" keyed by the child node name
    assert f.subj.label in out
    subj = next(r for r in out[f.subj.label] if r["text"] == f.subj.name)
    assert text[subj["start"] : subj["end"]] == f.subj.name
    rel = subj["relations"][f.predicate]
    assert rel[0]["text"] == f.obj.name
    assert text[rel[0]["start"] : rel[0]["end"]] == f.obj.name


def test_http_endpoint_roundtrip(ray_session):
    w, f = _world_and_fact()
    httpd = serve(task="rel", port=0, n_workers=1, world=w)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/ie",
            data=json.dumps({"texts": [f.sentence("en")]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = json.loads(resp.read())
        assert body["object"] == "relation-extraction"
        assert body["model"] == "fastie_ray/rel"
        assert body["labels"] == [
            {f.predicate: [{"subject": f.subj.name, "object": f.obj.name}]}
        ]
        assert body["id"].startswith("rel-") and "created" in body
    finally:
        httpd.shutdown()


def test_ner_set2json_sorted_groups():
    labels = {("PER", 0, 3, "abc"), ("PER", 5, 8, "def"), ("ORG", 1, 2, "x")}
    out = ner_set2json(labels)
    assert list(out["PER"][0].keys()) == ["start", "end", "text"]
    assert [e["start"] for e in out["PER"]] == [0, 5]
    assert set(out) == {"PER", "ORG"}


def test_demo_cli_render_and_predict():
    """demo_ie's render + the serve worker agree with the reference
    webui flow (text in → labeled extraction out)."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "demo_ie",
        pathlib.Path(__file__).resolve().parent.parent
        / "scripts" / "demo_ie.py",
    )
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    from fastie_ray.serve import _IEWorkerImpl
    from fastie_ray.synth import build_world

    w = build_world()
    f = w.facts[0]
    text = f"{f.subj.name} {'produces' if f.predicate=='produces' else 'works for'} {f.obj.name} ."
    worker = _IEWorkerImpl(task="rel", world=w)
    out = worker.predict([text])[0]
    rendered = demo.render("rel", text, out)
    assert f.subj.name in rendered and f.obj.name in rendered


def test_webui_playground_page(ray_session):
    """--webui parity surface (reference fastie/webui/interface.py):
    GET / serves the playground HTML, the JSON endpoint keeps working
    through the same handler, and without webui GET stays 404."""
    w, f = _world_and_fact()
    httpd = serve(task="ner", port=0, n_workers=1, world=w, webui=True)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=60
        ) as resp:
            html = resp.read().decode()
        assert "Fast Information Extraction Demo" in html
        assert "/v1/ie" in html and "task: <b>ner</b>" in html
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/ie",
            data=json.dumps({"texts": [f.sentence("en")]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            body = json.loads(resp.read())
        assert body["object"] == "named-entity-recognition"
        assert any(body["labels"][0].values())
    finally:
        httpd.shutdown()

    httpd2 = serve(task="ner", port=0, n_workers=1, world=w)
    port2 = httpd2.server_address[1]
    t2 = threading.Thread(target=httpd2.serve_forever, daemon=True)
    t2.start()
    try:
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port2}/", timeout=60)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd2.shutdown()
