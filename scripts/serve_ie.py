"""Run the IE serving endpoint (reference ``server.py`` analogue).

    python scripts/serve_ie.py --task rel --port 8000 --workers 2

POST /v1/ie with ``{"texts": [...], "ie_schema": ...}`` →
``{"id", "object", "created", "model", "labels"}``. This script owns
the Ray session (the library never calls ray.init)."""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="rel", choices=["ner", "rel", "event", "uie"])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--api-key", default=None)
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
        )
        print(f"Serving {args.task} on http://{args.host}:{args.port}/v1/ie")
        httpd.serve_forever()
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
