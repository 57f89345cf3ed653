"""Run the IE serving endpoint (reference ``server.py`` analogue).

    python scripts/serve_ie.py --task rel --port 8000 --workers 2

POST /v1/ie with ``{"texts": [...], "ie_schema": ...}`` →
``{"id", "object", "created", "model", "labels"}``. Pass ``--webui``
to also serve the browser playground on GET / (the reference
``fastie/webui/interface.py`` gradio demo, gradio-free). This script
owns the Ray session (the library never calls ray.init)."""

from __future__ import annotations

import argparse
import os
import sys

# repo root importable when launched as `python scripts/serve_ie.py`
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="rel", choices=["ner", "rel", "event", "uie"])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--api-key", default=None)
    ap.add_argument("--webui", action="store_true",
                    help="serve the playground page on GET /")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        from fastie_ray.serve import serve
        from fastie_ray.synth import build_world

        httpd = serve(
            task=args.task,
            host=args.host,
            port=args.port,
            n_workers=args.workers,
            world=build_world(),
            api_key=args.api_key,
            webui=args.webui,
        )
        print(f"Serving {args.task} on http://{args.host}:{args.port}/v1/ie")
        if args.webui:
            print(f"WebUI on http://{args.host}:{args.port}/")
        httpd.serve_forever()
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
