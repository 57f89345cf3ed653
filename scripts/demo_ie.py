"""Interactive / one-shot IE demo — the text-mode analogue of the
reference WebUI (``fastie/webui/interface.py``: textbox in, extracted
entities/relations/events rendered out), without the gradio
dependency this container can't install. Same worker path as the
serving endpoint (``fastie_ray.serve._IEWorkerImpl``), so what the
demo prints is exactly what ``POST /v1/ie`` returns.

    python scripts/demo_ie.py --task rel \
        "Fei Reyes0003 works for Pryce Group0137 ."
    echo "text" | python scripts/demo_ie.py --task ner
    python scripts/demo_ie.py --task uie --interactive

The default backend is the deterministic synth-world scorer, so use
entity names from ``fastie_ray.synth.build_world()`` (as the tests
and serving endpoint do); with a real model backend any text works.

Owns the Ray session (the library never calls ray.init)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def render(task: str, text: str, result) -> str:
    lines = [f"text: {text!r}", f"task: {task}"]
    if isinstance(result, dict):
        for key, items in sorted(result.items()):
            lines.append(f"  {key}:")
            for it in items:
                lines.append(f"    - {json.dumps(it, ensure_ascii=False)}")
    elif isinstance(result, (set, frozenset)):
        for it in sorted(result, key=repr):
            lines.append(f"  - {it}")
    else:
        lines.append(f"  {json.dumps(result, ensure_ascii=False, default=repr)}")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="rel",
                    choices=["ner", "rel", "event", "uie"])
    ap.add_argument("--schema", default=None,
                    help="JSON UIE schema (uie task only)")
    ap.add_argument("--interactive", action="store_true")
    ap.add_argument("text", nargs="*", help="input text(s)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        from fastie_ray.serve import _IEWorkerImpl
        from fastie_ray.synth import build_world

        worker = _IEWorkerImpl(task=args.task, world=build_world())
        schema = json.loads(args.schema) if args.schema else None

        def run_one(text: str) -> None:
            out = worker.predict([text], schema=schema)[0]
            print(render(args.task, text, out))
            print()

        if args.interactive:
            print("enter text (blank line to quit):")
            for line in sys.stdin:
                line = line.strip()
                if not line:
                    break
                run_one(line)
        elif args.text:
            for t in args.text:
                run_one(t)
        else:
            data = sys.stdin.read().strip()
            if data:
                run_one(data)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
