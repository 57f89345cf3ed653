"""Real-checkpoint transformer scoring (VERDICT r1 #1 / r2 #6): runs
ONLY where torch + transformers + a trained FastIE checkpoint exist —
skip-marked everywhere else (this container ships neither torch nor
weights, so the parity surface stays warm without pretending to run).

Point FASTIE_TORCH_CHECKPOINT at a checkpoint directory saved by the
reference trainer (fastie/train/trainer.py — encoder + head weights +
tokenizer files side by side) and the test drives
``TorchDenseBackend`` over the checked-in cmeee dev set
(/root/reference/examples/named_entity_recognition/datasets/cmeee),
asserting (1) the subword offset contract the dense kernels consume
and (2), when the reference ``fastie`` package is importable, span
parity between ``kernels.gp_ner.decode_gp_dense`` and
``model.predict`` (reference fastie/api/app.py:88-91)."""

import json
import os

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

CKPT = os.environ.get("FASTIE_TORCH_CHECKPOINT")
DEV = "/root/reference/examples/named_entity_recognition/datasets/cmeee/dev.json"

pytestmark = pytest.mark.skipif(
    not (CKPT and os.path.isdir(CKPT) and os.path.exists(DEV)),
    reason="needs FASTIE_TORCH_CHECKPOINT + the reference cmeee dev set",
)


def _dev_texts(n=16):
    with open(DEV) as f:
        rows = [json.loads(line) for line in f][:n]
    return [r["text"] for r in rows]


def test_subword_offsets_feed_dense_kernels():
    from fastie_ray.hf_backend import TorchDenseBackend

    be = TorchDenseBackend(CKPT)
    for text in _dev_texts():
        enc = be.encode(text)
        # every non-special token's offsets index into the text, and
        # char2tok inverts them — the exact contract decode_gp_dense's
        # span→char projection relies on
        for ti, (s, e) in enumerate(enc.offsets):
            if (s, e) == (0, 0):
                continue
            assert 0 <= s < e <= len(text)
            assert all(enc.char2tok[c] == ti for c in range(s, e))


def test_dense_decode_matches_reference_predict():
    fastie = pytest.importorskip("fastie")
    from fastie_ray.hf_backend import TorchDenseBackend
    from fastie_ray.kernels.gp_ner import decode_gp_dense

    be = TorchDenseBackend(CKPT)
    model = fastie.AutoModel.from_pretrained(CKPT)  # reference loader
    for text in _dev_texts():
        enc, logits = be.ner_forward(text)
        got = {
            (lab, s, e)
            for lab, s, e, _ in decode_gp_dense(logits, enc, text, be.labels)
        }
        want = {
            (p["label"], p["start"], p["end"])
            for p in model.predict([text])[0]
        }
        assert got == want
