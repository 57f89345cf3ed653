"""Distributed extraction-head training — the ExtractionTrainer
analogue (reference: ``fastie/train/tuner.py:100-186`` wiring,
``fastie/train/trainer.py:50-88`` FGM adversarial hook,
``trainer.py:237-322`` streaming eval loop) re-expressed as Ray Data
passes, torch-free.

Model: a frozen deterministic token-embedding backbone (the sandbox
stand-in for a pretrained encoder — same role the frozen BERT layers
play when only the task head is tuned) + trainable GlobalPointer-family
span-scoring channels with per-channel RoPE / triangle masking, all
numpy. Three task heads:

- NER (``ner_task``): one GP channel per entity label with RoPE and
  the upper-triangle mask (``modeling_gp.py:68-132``);
- GPLinker relation extraction (``rel_task``): the reference's three
  EGP heads (``modeling_gplinker.py:65-110``) flattened to
  2 + 2·P channels — subject/object entity channels (RoPE, tril) plus
  per-predicate head-pair and tail-pair link channels (no RoPE, no
  tril, exactly like the reference's ``RoPE=False, tril_mask=False``
  heads);
- GPLinker event extraction (``ee_task``): R ``event_type@role``
  argument channels + the two (min, max)-normalized link channels
  (``event_extraction/gplinker/modeling_gplinker.py:60-156``).

Trained checkpoints are self-describing (``save_trained_head``) and
plug into the production scorers through
``hf_backend.resolve_dense_backend`` — the reference's train → save →
``from_pretrained`` → predict loop, closed torch-free.

The loss is the reference's multilabel categorical crossentropy over
span logits (``modules.py`` sparse_multilabel_categorical_crossentropy
semantics, dense formulation), masked per channel.

Distributed shape (the ``ops.linear_train`` discipline, lifted to a
float model):

- ONE feature build (``train_prep.ner_convert_to_features`` /
  ``rel_convert_to_features``), then each epoch is one gradient pass:
  every block computes its summed gradient locally (vectorized einsum
  forward + backward over the padded block tensor) and emits one
  FIXED-POINT int64 partial — ``round(grad · 2^quant_bits)``.
- Integer partials make the cross-block reduce order-independent and
  EXACT, so training is bit-deterministic no matter how Ray SCHEDULES
  blocks — which is what makes checkpoint/resume reproduce the
  straight-through run bitwise (the float-sum alternative would drift
  by scheduling order). Precision of the guarantee (round-5 finding):
  order-independence is unconditional, but the per-block quantization
  point depends on the block PARTITION — re-executing a lazy feature
  pipeline can split blocks differently and move gradients by
  ~2^-quant_bits. Bitwise resume therefore holds when the feature
  dataset is materialized once and reused (what ``gp_train``'s
  BlockSet engine does within a run, and what callers comparing runs
  must do); across independent re-materializations the trajectories
  agree to quantization precision, not bitwise. Quantization noise
  (~2^-24 per block) is far below any meaningful gradient signal.
- The driver holds the Adam state (tiny: head params only), updates
  once per epoch (full-batch — the honest data-parallel formulation;
  sequential minibatch SGD is inherently serial), and re-broadcasts
  weights via ``ray.put`` once per epoch, not per block.
- FGM (trainer.py:50-88): each block locally perturbs its frozen
  embeddings by ``eps · dX/‖dX‖`` (the embedding-gradient attack) and
  adds the adversarial gradient to its partial — the reference's
  per-batch attack semantics, data-parallel.
- Eval (trainer.py:237-322): a streaming pass emitting integer
  (tp, pred, true) partials per block → micro P/R/F1
  (``ExtractionScore`` semantics). Per-epoch eval is channel-level
  span marking (exact, no pair enumeration); RE adds a final
  triple-level decode eval (``rel_triple_eval``) with the reference's
  head∩tail predicate intersection (``modeling_gplinker.py:164-213``).

Epoch engine: ``engine="blockset"`` (default) pins the feature blocks
in plasma once and runs each epoch as one raw-task wave per block (the
``state.exchange`` iterative-loop discipline — no per-epoch Dataset
executor bring-up, which otherwise dominates wall time at small
scale). ``engine="dataset"`` streams each epoch through
``map_batches`` — prefer it when the feature table exceeds comfortable
plasma residency (the 100-TB regime), where streaming + spill beats
pinning.

Scale: state that crosses the wire per epoch = one weight broadcast
(O(channels·d·h)) + one int64 partial per block. The corpus never
moves; epochs stream."""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:
    import ray.data


@dataclass(frozen=True)
class GPTrainConfig:
    d_model: int = 64
    head_size: int = 16
    emb_rows: int = 4096  # frozen-embedding hash-bucket rows
    lr: float = 0.05
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_eps: float = 1e-8
    fgm_eps: float | None = None  # None = FGM off; reference default 1.0
    seed: int = 7
    quant_bits: int = 24
    # frozen sinusoidal absolute positions added to the embeddings —
    # the context-free backbone's stand-in for what a real encoder's
    # position embeddings + attention provide (RoPE inside the GP head
    # is RELATIVE-only, so without this, roles that depend on absolute
    # position — e.g. GPLinker's subject-before-object — are
    # unlearnable)
    pos_scale: float = 0.5
    # context mixer (VERDICT r4 #2): one trainable single-head softmax
    # attention layer between the frozen embeddings and the GP head,
    # x' = x + softmax(xWq·(xWk)ᵀ/√m)·xWv·Wo with Wo initialized to
    # ZERO so training starts exactly at the context-free model.
    # Mixing lets the span scorer condition on middle context — the
    # piece NOTES fact 22 showed content-only link channels cannot
    # learn. 0 = off (default; fully backward compatible).
    mix_dim: int = 0
    # per-group learning-rate scale for the ma_* tensors: at Adam each
    # parameter moves ±lr per step, and a residual output projection
    # moving at the head's lr swings EVERY token representation —
    # measured loss explosions (1e3 per unit) at lr=0.2. 0.05 keeps
    # the mixer a slow-moving refinement of a stable head.
    mix_lr_scale: float = 0.05
    # attention locality: tokens attend only within ±mix_window
    # positions. GLOBAL attention (0 = unbounded) measured precision
    # 0.16-0.27 on trained_e2e — every representation drifts with the
    # WHOLE chunk, and serve-time chunks mix contents/lengths training
    # never saw. A local band keeps the learned context exactly the
    # neighborhood the span decision needs and is length-shift robust.
    mix_window: int = 8
    # loss tiling (VERDICT r4 #7): stream the multilabel-CE loss and
    # its dS over query-row tiles of this many rows instead of
    # materializing ~8 dense [B, C, L, L] temporaries at once — the
    # working set that hits this box's ~22 GB/s membw wall at 8→32
    # cpus. 0 = dense legacy path. Same math, tile-ordered float sums.
    loss_tile: int = 16


@dataclass(frozen=True)
class TaskSpec:
    """A trainable span-scoring task: how many GP channels, which get
    RoPE / the upper-triangle mask, how a feature row becomes dense
    channel labels, and how gold tuples are counted for eval."""

    n_channels: int
    tril: np.ndarray = field(repr=False)  # bool [C]
    rope: np.ndarray = field(repr=False)  # bool [C]
    build_labels: Callable = field(repr=False)  # rows -> [B, C, L, L]


def ner_task(num_labels: int) -> TaskSpec:
    """One RoPE + tril GP channel per entity label (A1 semantics)."""

    def build(df: pd.DataFrame, L: int) -> np.ndarray:
        y = np.zeros((len(df), num_labels, L, L), dtype=np.int64)
        for i, labs in enumerate(df["labels"]):
            for start, end, tag in labs:
                y[i, int(tag), int(start), int(end)] = 1
        return y

    ones = np.ones(num_labels, dtype=bool)
    return TaskSpec(num_labels, ones, ones.copy(), build)


def rel_task(num_predicates: int) -> TaskSpec:
    """GPLinker-RE channels (A7 semantics): ch0 = subject spans,
    ch1 = object spans (RoPE, tril); ch 2+p = per-predicate head pairs
    (sh, oh), ch 2+P+p = tail pairs (st, ot) — link channels carry no
    RoPE and no triangle mask, matching the reference's
    ``EfficientGlobalPointer(RoPE=False, tril_mask=False)`` heads."""
    P = num_predicates
    C = 2 + 2 * P

    def build(df: pd.DataFrame, L: int) -> np.ndarray:
        y = np.zeros((len(df), C, L, L), dtype=np.int64)
        for i, spo in enumerate(df["labels"]):
            for sh, st, p, oh, ot in spo:
                sh, st, p, oh, ot = int(sh), int(st), int(p), int(oh), int(ot)
                y[i, 0, sh, st] = 1
                y[i, 1, oh, ot] = 1
                y[i, 2 + p, sh, oh] = 1
                y[i, 2 + P + p, st, ot] = 1
        return y

    tril = np.array([True, True] + [False] * (2 * P))
    rope = tril.copy()
    return TaskSpec(C, tril, rope, build)


def ee_task(num_roles: int) -> TaskSpec:
    """GPLinker-EE channels (A13 semantics, ``event_extraction/
    gplinker/modeling_gplinker.py:60-156``): one argument channel per
    ``event_type@role`` label (RoPE, tril) + ONE head-link and ONE
    tail-link channel over (min, max)-normalized argument-pair
    positions (upper triangle by construction, no RoPE — the
    reference's single-channel link heads). Consumes
    ``train_prep.ee_convert_to_features`` rows (argu_labels flattened
    [tp, h1, t1, ...] per type; head/tail_labels (i, j) pairs; the
    reference's (0, 0…) sentinels are skipped — position 0 is CLS, so
    no real span can sit there)."""
    R = num_roles
    C = R + 2

    def build(df: pd.DataFrame, L: int) -> np.ndarray:
        y = np.zeros((len(df), C, L, L), dtype=np.int64)
        for i, (argu, heads, tails) in enumerate(zip(
            df["argu_labels"], df["head_labels"], df["tail_labels"]
        )):
            for lab in argu:
                lab = [int(v) for v in lab]
                tp = lab[0]
                for h, t in zip(lab[1::2], lab[2::2]):
                    if h == 0 and t == 0:
                        continue
                    y[i, tp, h, t] = 1
            for ch, pairs in ((R, heads), (R + 1, tails)):
                for pr in pairs:
                    a, b = int(pr[0]), int(pr[1])
                    if a == 0 and b == 0:
                        continue
                    y[i, ch, a, b] = 1
        return y

    tril = np.ones(C, dtype=bool)
    rope = np.array([True] * R + [False, False])
    return TaskSpec(C, tril, rope, build)


# ------------------------------------------------------------ frozen backbone

_EMB_CACHE: dict[tuple, np.ndarray] = {}


def frozen_embeddings(cfg: GPTrainConfig) -> np.ndarray:
    """Deterministic frozen token-embedding table, generated once per
    worker process (actor-``__init__`` discipline): hashed token ids
    index ``emb_rows`` buckets. A real checkpoint swaps this for the
    pretrained encoder's output; nothing downstream changes."""
    key = (cfg.seed, cfg.emb_rows, cfg.d_model)
    if key not in _EMB_CACHE:
        rng = np.random.default_rng(cfg.seed)
        _EMB_CACHE[key] = rng.standard_normal(
            (cfg.emb_rows, cfg.d_model)
        ) / np.sqrt(cfg.d_model)
    return _EMB_CACHE[key]


# ------------------------------------------------------------------- GP head


def init_gp_head(num_channels: int, cfg: GPTrainConfig) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(cfg.seed + 1)
    scale = 1.0 / np.sqrt(cfg.d_model)
    w = {
        "wq": rng.standard_normal(
            (num_channels, cfg.d_model, cfg.head_size)) * scale,
        "bq": np.zeros((num_channels, cfg.head_size)),
        "wk": rng.standard_normal(
            (num_channels, cfg.d_model, cfg.head_size)) * scale,
        "bk": np.zeros((num_channels, cfg.head_size)),
    }
    if cfg.mix_dim:
        # drawn AFTER the head tensors so mix_dim=0 runs reproduce the
        # exact historical init stream; ma_wo starts at zero → the
        # mixer is the identity at step 0
        m = cfg.mix_dim
        w["ma_wq"] = rng.standard_normal((cfg.d_model, m)) * scale
        w["ma_wk"] = rng.standard_normal((cfg.d_model, m)) * scale
        w["ma_wv"] = rng.standard_normal((cfg.d_model, m)) * scale
        w["ma_wo"] = np.zeros((m, cfg.d_model))
    return w


def _flatten(w: dict[str, np.ndarray]) -> np.ndarray:
    return np.concatenate([w[k].ravel() for k in sorted(w)])


def _unflatten(vec: np.ndarray, like: dict[str, np.ndarray]) -> dict:
    out, off = {}, 0
    for k in sorted(like):
        n = like[k].size
        out[k] = vec[off:off + n].reshape(like[k].shape)
        off += n
    return out


def _rope_tables(L: int, h: int) -> tuple[np.ndarray, np.ndarray]:
    half = h // 2
    theta = 10000.0 ** (-2.0 * np.arange(half) / h)
    ang = np.arange(L)[:, None] * theta[None, :]  # [L, h/2]
    return np.cos(ang), np.sin(ang)


def _rope(q: np.ndarray, cos: np.ndarray, sin: np.ndarray) -> np.ndarray:
    """Rotate last dim (pairs) by position: q is [..., L, h]."""
    qe, qo = q[..., 0::2], q[..., 1::2]
    out = np.empty_like(q)
    out[..., 0::2] = qe * cos - qo * sin
    out[..., 1::2] = qe * sin + qo * cos
    return out


def _unrope(g: np.ndarray, cos: np.ndarray, sin: np.ndarray) -> np.ndarray:
    """Transpose (inverse) rotation — backward of :func:`_rope`."""
    ge, go = g[..., 0::2], g[..., 1::2]
    out = np.empty_like(g)
    out[..., 0::2] = ge * cos + go * sin
    out[..., 1::2] = -ge * sin + go * cos
    return out


def _embed(
    input_ids: np.ndarray, emb: np.ndarray, pos_scale: float = 0.5
) -> np.ndarray:
    x = emb[input_ids % emb.shape[0]]
    if pos_scale:
        L, d = input_ids.shape[1], emb.shape[1]
        pos = np.arange(L)[:, None]
        div = 10000.0 ** (-np.arange(0, d, 2) / d)
        pe = np.zeros((L, d))
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div)
        x = x + pos_scale * pe[None, :, :]
    return x


def _sel_rope(a: np.ndarray, cos, sin, rope_ch: np.ndarray) -> np.ndarray:
    """Apply RoPE only on channels flagged in ``rope_ch`` ([..., C, L, h]
    with channels on axis 1)."""
    out = _rope(a, cos, sin)
    if not rope_ch.all():
        out[:, ~rope_ch] = a[:, ~rope_ch]
    return out


def _sel_unrope(g: np.ndarray, cos, sin, rope_ch: np.ndarray) -> np.ndarray:
    out = _unrope(g, cos, sin)
    if not rope_ch.all():
        out[:, ~rope_ch] = g[:, ~rope_ch]
    return out


def mix_forward(
    weights: dict[str, np.ndarray],
    x: np.ndarray,  # [B, L, d]
    seq_len: np.ndarray | None = None,
    window: int = 0,
) -> tuple[np.ndarray, dict]:
    """Context mixer forward (``GPTrainConfig.mix_dim``): one
    single-head softmax attention with residual,
    ``x' = x + softmax(q kᵀ/√m + masks) v Wo``. Returns (x', cache).
    ``seq_len=None`` means every position is valid (the serving path
    scores one unpadded sequence). ``window > 0`` restricts attention
    to the ±window band (``GPTrainConfig.mix_window``) — local context
    only, robust to serve-time length shift."""
    m = weights["ma_wq"].shape[1]
    q = x @ weights["ma_wq"]
    k = x @ weights["ma_wk"]
    v = x @ weights["ma_wv"]
    a = (q @ k.swapaxes(-1, -2)) / np.sqrt(m)  # [B, L, L]
    L = x.shape[1]
    if seq_len is not None:
        inside = np.arange(L)[None, :] < np.asarray(seq_len)[:, None]
        a = np.where(inside[:, None, :], a, -np.inf)
    if window > 0:
        pos = np.arange(L)
        band = np.abs(pos[:, None] - pos[None, :]) <= window
        a = np.where(band[None, :, :], a, -np.inf)
    # guarded softmax: a PAD query past seq_len + window has an ALL
    # -inf row (band ∩ valid-keys = ∅) — naive max-subtraction yields
    # NaN that poisons gradients through 0·NaN in the head backward
    # (measured: precision 1e-4). Fully-masked rows get att = 0 →
    # ctx = 0 → the residual passes x through untouched.
    m = a.max(axis=-1, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    e = np.exp(a - m)
    att = e / np.maximum(e.sum(axis=-1, keepdims=True), 1e-30)
    ctx = att @ v  # [B, L, m]
    x2 = x + ctx @ weights["ma_wo"]
    return x2, {"x": x, "q": q, "k": k, "v": v, "att": att, "ctx": ctx}


def mix_backward(
    dx2: np.ndarray,
    cache: dict,
    weights: dict[str, np.ndarray],
) -> tuple[dict, np.ndarray]:
    """Backward of :func:`mix_forward` → (mixer grads, d_x_input).
    Masked positions carry att == 0 so their gradient vanishes without
    re-masking."""
    m = weights["ma_wq"].shape[1]
    x, q, k, v = cache["x"], cache["q"], cache["k"], cache["v"]
    att, ctx = cache["att"], cache["ctx"]
    d_wo = np.tensordot(ctx, dx2, axes=([0, 1], [0, 1]))
    d_ctx = dx2 @ weights["ma_wo"].T  # [B, L, m]
    d_att = d_ctx @ v.swapaxes(-1, -2)  # [B, L, L]
    d_v = att.swapaxes(-1, -2) @ d_ctx
    d_a = att * (d_att - (d_att * att).sum(axis=-1, keepdims=True))
    d_a = d_a / np.sqrt(m)
    d_q = d_a @ k
    d_k = d_a.swapaxes(-1, -2) @ q
    grads = {
        "ma_wq": np.tensordot(x, d_q, axes=([0, 1], [0, 1])),
        "ma_wk": np.tensordot(x, d_k, axes=([0, 1], [0, 1])),
        "ma_wv": np.tensordot(x, d_v, axes=([0, 1], [0, 1])),
        "ma_wo": d_wo,
    }
    dx = (
        dx2
        + d_q @ weights["ma_wq"].T
        + d_k @ weights["ma_wk"].T
        + d_v @ weights["ma_wv"].T
    )
    return grads, dx


def gp_scores(
    weights: dict[str, np.ndarray],
    x: np.ndarray,  # [B, L, d] embeddings
    cfg: GPTrainConfig,
    rope_ch: np.ndarray | None = None,
) -> tuple[np.ndarray, dict]:
    """Forward: span logits [B, C, L, L] plus the cache for backward."""
    h = cfg.head_size
    L = x.shape[1]
    C = weights["wq"].shape[0]
    if rope_ch is None:
        rope_ch = np.ones(C, dtype=bool)
    cos, sin = _rope_tables(L, h)
    # BLAS-backed contractions (tensordot/matmul), NOT np.einsum: the
    # naive c_einsum loops were 80% of the epoch wall (profiled) —
    # GEMM is ~5× faster single-threaded at these shapes
    q = np.tensordot(x, weights["wq"], axes=([2], [1])).transpose(
        0, 2, 1, 3
    ) + weights["bq"][None, :, None, :]
    k = np.tensordot(x, weights["wk"], axes=([2], [1])).transpose(
        0, 2, 1, 3
    ) + weights["bk"][None, :, None, :]
    qr = _sel_rope(q, cos, sin, rope_ch)
    kr = _sel_rope(k, cos, sin, rope_ch)
    s = (qr @ kr.swapaxes(-1, -2)) / np.sqrt(h)
    return s, {"x": x, "qr": qr, "kr": kr, "cos": cos, "sin": sin,
               "rope_ch": rope_ch}


def _span_mask(seq_len: np.ndarray, L: int) -> np.ndarray:
    """[B, L, L] True where (i <= j) and both inside the sequence —
    the reference's add_mask_tril (pad + lower-triangle mask)."""
    B = len(seq_len)
    pos = np.arange(L)
    inside = pos[None, :] < seq_len[:, None]  # [B, L]
    valid = inside[:, :, None] & inside[:, None, :]
    return valid & (pos[:, None] <= pos[None, :])[None, :, :]


def _channel_valid(
    seq_len: np.ndarray, L: int, tril_ch: np.ndarray
) -> np.ndarray:
    """[B, C, L, L] per-channel validity: pad mask everywhere, the
    upper-triangle restriction only on channels flagged in tril_ch."""
    pos = np.arange(L)
    inside = pos[None, :] < seq_len[:, None]
    pad = inside[:, :, None] & inside[:, None, :]  # [B, L, L]
    tri = (pos[:, None] <= pos[None, :])  # [L, L]
    return pad[:, None, :, :] & (
        tri[None, None, :, :] | ~tril_ch[None, :, None, None]
    )


def _loss_and_dscore(
    s: np.ndarray,  # [B, C, L, L]
    y: np.ndarray,  # [B, C, L, L] 0/1
    valid: np.ndarray,  # [B, L, L] or [B, C, L, L]
) -> tuple[float, int, np.ndarray]:
    """Multilabel categorical CE (the reference GP loss) and its exact
    gradient wrt the logits. Returns (loss_sum, n_units, dS) where a
    unit is one (example, channel) — the reference averages over
    them; we sum and let the driver normalize."""
    v = valid if valid.ndim == 4 else valid[:, None, :, :]
    ninf = s.dtype.type(-np.inf)  # keep float32 compute float32
    neg = np.where(v & (y == 0), s, ninf)
    pos = np.where(v & (y == 1), -s, ninf)

    def lse0(a):  # logsumexp over flattened span axes, with appended 0
        m = np.maximum(a.max(axis=(2, 3), initial=0.0), 0.0)
        z = np.exp(a - m[:, :, None, None]).sum(axis=(2, 3)) + np.exp(-m)
        return m + np.log(z), m

    neg_l, _ = lse0(neg)
    pos_l, _ = lse0(pos)
    loss_sum = float((neg_l + pos_l).sum())
    n_units = int(neg_l.size)
    d_neg = np.exp(neg - neg_l[:, :, None, None])
    d_pos = np.exp(pos - pos_l[:, :, None, None])
    ds = np.where(v & (y == 0), d_neg, 0.0) - np.where(v & (y == 1), d_pos, 0.0)
    return loss_sum, n_units, ds


def _loss_and_dscore_tiled(
    s: np.ndarray,  # [B, C, L, L]
    y: np.ndarray,  # [B, C, L, L] 0/1
    valid: np.ndarray,  # [B, L, L] or [B, C, L, L]
    tile: int,
) -> tuple[float, int, np.ndarray]:
    """:func:`_loss_and_dscore` streamed over query-row tiles
    (``GPTrainConfig.loss_tile``): three passes over ``s`` — running
    max, exp-sum, dS write — with per-pass temporaries of
    ``[B, C, tile, L]`` instead of ~8 dense ``[B, C, L, L]`` arrays.
    Same arithmetic per element; float sums accumulate tile-by-tile
    (deterministic: tiles are fixed-order), so values agree with the
    dense path to float precision, not bitwise."""
    B, C, L, _ = s.shape
    v4 = valid.ndim == 4
    dt = s.dtype
    # pass 1: masked maxima (appended-0 convention of lse0)
    m_neg = np.zeros((B, C), dtype=dt)
    m_pos = np.zeros((B, C), dtype=dt)
    for lo in range(0, L, tile):
        sl = slice(lo, lo + tile)
        vv = (valid[:, :, sl] if v4 else valid[:, None, sl])
        st = s[:, :, sl]
        yt = y[:, :, sl]
        neg = np.where(vv & (yt == 0), st, -np.inf)
        pos = np.where(vv & (yt == 1), -st, -np.inf)
        np.maximum(m_neg, neg.max(axis=(2, 3)), out=m_neg)
        np.maximum(m_pos, pos.max(axis=(2, 3)), out=m_pos)
    # pass 2: exp sums under the global maxima
    z_neg = np.exp(-m_neg).astype(dt)
    z_pos = np.exp(-m_pos).astype(dt)
    for lo in range(0, L, tile):
        sl = slice(lo, lo + tile)
        vv = (valid[:, :, sl] if v4 else valid[:, None, sl])
        st = s[:, :, sl]
        yt = y[:, :, sl]
        neg = np.where(vv & (yt == 0), st, -np.inf)
        pos = np.where(vv & (yt == 1), -st, -np.inf)
        z_neg += np.exp(neg - m_neg[:, :, None, None]).sum(axis=(2, 3))
        z_pos += np.exp(pos - m_pos[:, :, None, None]).sum(axis=(2, 3))
    neg_l = m_neg + np.log(z_neg)
    pos_l = m_pos + np.log(z_pos)
    loss_sum = float((neg_l + pos_l).sum())
    n_units = int(neg_l.size)
    # pass 3: dS
    ds = np.empty_like(s)
    for lo in range(0, L, tile):
        sl = slice(lo, lo + tile)
        vv = (valid[:, :, sl] if v4 else valid[:, None, sl])
        st = s[:, :, sl]
        yt = y[:, :, sl]
        is_neg = vv & (yt == 0)
        is_pos = vv & (yt == 1)
        neg = np.where(is_neg, st, -np.inf)
        pos = np.where(is_pos, -st, -np.inf)
        d_neg = np.exp(neg - neg_l[:, :, None, None])
        d_pos = np.exp(pos - pos_l[:, :, None, None])
        ds[:, :, sl] = (
            np.where(is_neg, d_neg, 0.0) - np.where(is_pos, d_pos, 0.0)
        )
    return loss_sum, n_units, ds


def _backward(
    ds: np.ndarray,
    cache: dict,
    weights: dict[str, np.ndarray],
    cfg: GPTrainConfig,
    want_dx: bool = False,
) -> tuple[dict, np.ndarray | None]:
    h = cfg.head_size
    ds = ds / np.sqrt(h)
    # BLAS contractions (see gp_scores): batched matmul + tensordot
    dqr = ds @ cache["kr"]
    dkr = ds.swapaxes(-1, -2) @ cache["qr"]
    dq = _sel_unrope(dqr, cache["cos"], cache["sin"], cache["rope_ch"])
    dk = _sel_unrope(dkr, cache["cos"], cache["sin"], cache["rope_ch"])
    x = cache["x"]
    grads = {
        "wq": np.tensordot(x, dq, axes=([0, 1], [0, 2])).transpose(1, 0, 2),
        "bq": dq.sum(axis=(0, 2)),
        "wk": np.tensordot(x, dk, axes=([0, 1], [0, 2])).transpose(1, 0, 2),
        "bk": dk.sum(axis=(0, 2)),
    }
    dx = None
    if want_dx:
        dx = np.tensordot(dq, weights["wq"], axes=([1, 3], [0, 2])) + (
            np.tensordot(dk, weights["wk"], axes=([1, 3], [0, 2]))
        )
    return grads, dx


def _block_batch(df: pd.DataFrame, spec: TaskSpec):
    from fastie_ray.functions.padding import sequence_padding

    ids_list = [list(ids) for ids in df["input_ids"]]
    input_ids = sequence_padding(ids_list)
    seq_len = np.asarray([len(i) for i in ids_list], dtype=np.int64)
    y = spec.build_labels(df, input_ids.shape[1])
    return input_ids, y, seq_len


def _grad_partial(
    df: pd.DataFrame,
    weights: dict[str, np.ndarray],
    spec: TaskSpec,
    cfg: GPTrainConfig,
    batch_rows: int = 128,
) -> tuple[np.ndarray, int, int]:
    """One block's summed, fixed-point gradient partial:
    (int64 grad vector, n_units, loss_sum_e6). Internally sliced to
    ``batch_rows`` so the dense [B, C, L, L] working tensor stays
    bounded regardless of block size."""
    if len(df) > batch_rows:
        gvec = None
        n_units = loss_e6 = 0
        for lo in range(0, len(df), batch_rows):
            g, n, l = _grad_partial(
                df.iloc[lo:lo + batch_rows], weights, spec, cfg, batch_rows
            )
            gvec = g if gvec is None else gvec + g
            n_units += n
            loss_e6 += l
        return gvec, n_units, loss_e6
    input_ids, y, seq_len = _block_batch(df, spec)
    # float32 compute: the dense [B, C, L, L] temporaries make this
    # stage MEMORY-BANDWIDTH-bound, not FLOP-bound (measured: float64
    # capped multi-core scaling at ~0.46 efficiency on a ~23 GB/s
    # box; float32 halves the traffic). Determinism is unaffected —
    # same arithmetic every run, quantized per slice — and the
    # ~6e-8 relative float32 noise sits far below any gradient
    # signal.
    w32 = {k: v.astype(np.float32) for k, v in weights.items()}
    x = _embed(
        input_ids, frozen_embeddings(cfg), cfg.pos_scale
    ).astype(np.float32)
    valid = _channel_valid(seq_len, x.shape[1], spec.tril)

    use_mix = "ma_wq" in w32
    xh, mcache = (
        mix_forward(w32, x, seq_len, cfg.mix_window)
        if use_mix else (x, None)
    )
    def loss_fn(sc):
        if cfg.loss_tile and sc.shape[2] > cfg.loss_tile:
            return _loss_and_dscore_tiled(sc, y, valid, cfg.loss_tile)
        return _loss_and_dscore(sc, y, valid)

    s, cache = gp_scores(w32, xh, cfg, spec.rope)
    loss_sum, n_units, ds = loss_fn(s)
    grads, dxh = _backward(
        ds, cache, w32, cfg,
        want_dx=use_mix or cfg.fgm_eps is not None,
    )
    dx = dxh
    if use_mix:
        mgrads, dx = mix_backward(dxh, mcache, w32)
        grads.update(mgrads)

    if cfg.fgm_eps is not None:
        # reference FGM (trainer.py:50-88): attack the embeddings with
        # eps·g/‖g‖, accumulate BOTH gradients at full weight; units
        # stay the clean count (the adversarial pass is a second loss
        # on the same units, exactly as loss.backward() twice is).
        # With the mixer, the attack direction is the gradient at the
        # mixer INPUT (the frozen embeddings) and the adversarial pass
        # re-runs the mixer forward/backward.
        norm = np.sqrt((dx * dx).sum())
        if norm > 1e-12:
            x_adv = (x + cfg.fgm_eps * dx / norm).astype(np.float32)
            xh2, mcache2 = (
                mix_forward(w32, x_adv, seq_len, cfg.mix_window)
                if use_mix
                else (x_adv, None)
            )
            s2, cache2 = gp_scores(w32, xh2, cfg, spec.rope)
            loss2, _units2, ds2 = loss_fn(s2)
            g2, dxh2 = _backward(ds2, cache2, w32, cfg, want_dx=use_mix)
            if use_mix:
                mg2, _ = mix_backward(dxh2, mcache2, w32)
                g2.update(mg2)
            for k in grads:
                grads[k] = grads[k] + g2[k]
            loss_sum += loss2

    scale = float(1 << cfg.quant_bits)
    gvec = np.round(
        _flatten(grads).astype(np.float64) * scale
    ).astype(np.int64)
    return gvec, n_units, int(round(loss_sum * 1_000_000))


def _decode_valid(seq_len: np.ndarray, L: int, spec: TaskSpec) -> np.ndarray:
    """[B, C, L, L] eval-time validity: the reference decode exclusions
    (CLS/SEP/pad — ``modeling_gp.py:145-170``) on top of the per-channel
    triangle rule."""
    pos = np.arange(L)
    body = (pos[None, :] >= 1) & (pos[None, :] < (seq_len[:, None] - 1))
    pad = body[:, :, None] & body[:, None, :]
    tri = (pos[:, None] <= pos[None, :])
    return pad[:, None, :, :] & (
        tri[None, None, :, :] | ~spec.tril[None, :, None, None]
    )


def _eval_partial(
    df: pd.DataFrame,
    weights: dict[str, np.ndarray],
    spec: TaskSpec,
    cfg: GPTrainConfig,
    batch_rows: int = 128,
) -> tuple[int, int, int]:
    """(tp, n_pred, n_true) channel-level span-mark counts for one
    block — exact micro counts, no pair enumeration."""
    if len(df) > batch_rows:
        tp = np_ = nt = 0
        for lo in range(0, len(df), batch_rows):
            a, b, c = _eval_partial(
                df.iloc[lo:lo + batch_rows], weights, spec, cfg, batch_rows
            )
            tp += a
            np_ += b
            nt += c
        return tp, np_, nt
    input_ids, y, seq_len = _block_batch(df, spec)
    w32 = {k: v.astype(np.float32) for k, v in weights.items()}
    x = _embed(
        input_ids, frozen_embeddings(cfg), cfg.pos_scale
    ).astype(np.float32)
    if "ma_wq" in w32:
        x, _ = mix_forward(w32, x, seq_len, cfg.mix_window)
    s, _ = gp_scores(w32, x, cfg, spec.rope)
    dec = _decode_valid(seq_len, x.shape[1], spec)
    pred = (s > 0.0) & dec
    true = (y == 1) & dec
    return (
        int((pred & true).sum()), int(pred.sum()), int(true.sum())
    )


def _rel_triple_partial(
    df: pd.DataFrame,
    weights: dict[str, np.ndarray],
    num_predicates: int,
    cfg: GPTrainConfig,
    batch_rows: int = 64,
    pair_cap: int = 1 << 22,
) -> tuple[int, int, int]:
    """(tp, n_pred, n_true) TRIPLE-level counts — the reference
    GPLinker decode (``modeling_gplinker.py:164-213``): subjects /
    objects from the entity channels, predicates from the head∩tail
    intersection per (subject, object) pair. ``pair_cap`` guards the
    ns·no·P enumeration against an untrained head that marks half the
    matrix (counts above the cap report n_pred = cap as a floor)."""
    spec = rel_task(num_predicates)
    P = num_predicates
    tp = n_pred = n_true = 0
    for lo in range(0, len(df), batch_rows):
        part = df.iloc[lo:lo + batch_rows]
        input_ids, y, seq_len = _block_batch(part, spec)
        x = _embed(input_ids, frozen_embeddings(cfg), cfg.pos_scale)
        if "ma_wq" in weights:
            x, _ = mix_forward(weights, x, seq_len, cfg.mix_window)
        s, _ = gp_scores(weights, x, cfg, spec.rope)
        dec = _decode_valid(seq_len, x.shape[1], spec)
        pred = (s > 0.0) & dec
        for b, spo in enumerate(part["labels"]):
            gold = {tuple(int(v) for v in t) for t in spo}
            n_true += len(gold)
            subs = np.argwhere(pred[b, 0])
            objs = np.argwhere(pred[b, 1])
            for sh, st, p, oh, ot in gold:
                if (
                    pred[b, 0, sh, st] and pred[b, 1, oh, ot]
                    and pred[b, 2 + p, sh, oh] and pred[b, 2 + P + p, st, ot]
                ):
                    tp += 1
            if len(subs) * len(objs) * P > pair_cap:
                n_pred += pair_cap
                continue
            if len(subs) and len(objs):
                for p in range(P):
                    hm = pred[b, 2 + p][subs[:, 0][:, None], objs[:, 0][None, :]]
                    tm = pred[b, 2 + P + p][subs[:, 1][:, None], objs[:, 1][None, :]]
                    n_pred += int((hm & tm).sum())
    return tp, n_pred, n_true


# ------------------------------------------------------------- the trainer


def _ckpt_path(d: str, epoch: int) -> str:
    return os.path.join(d, f"gp_head_epoch{epoch:04d}.npz")


def _ckpt_sig(cfg: GPTrainConfig, task: TaskSpec) -> str:
    """Hyperparameter fingerprint persisted in every epoch checkpoint
    (ADVICE r4): resuming under different lr / fgm_eps / task / channel
    layout silently continued the old Adam state — voiding the bitwise-
    resume guarantee — so resume now raises on mismatch."""
    import dataclasses
    import hashlib

    chan = hashlib.md5(
        task.tril.tobytes() + b"|" + task.rope.tobytes()
    ).hexdigest()[:12]
    return (
        f"{dataclasses.astuple(cfg)!r}|C={task.n_channels}|{chan}"
    )


def _latest_ckpt(d: str, max_epoch: int) -> int:
    done = -1
    for e in range(max_epoch):
        if os.path.exists(_ckpt_path(d, e)):
            done = e
    return done


def gp_train(
    train_features: "ray.data.Dataset",
    num_labels: int | None = None,
    epochs: int = 12,
    cfg: GPTrainConfig = GPTrainConfig(),
    dev_features: "ray.data.Dataset | None" = None,
    checkpoint_dir: str | None = None,
    resume: bool = True,
    batch_rows: int = 128,
    engine: str = "blockset",
    n_blocks: int = 16,
    task: TaskSpec | None = None,
) -> tuple[dict[str, np.ndarray], pd.DataFrame]:
    """Train the span-scoring head full-batch for ``epochs`` passes;
    returns (weights, history) where history has one integer-exact row
    per epoch: (epoch, loss_e6, n_units, grad_l1_q, and — when
    ``dev_features`` is given — tp, n_pred, n_true, f1_e6).

    ``task`` defaults to :func:`ner_task`(num_labels); pass
    :func:`rel_task`(P) for GPLinker relation training.

    ``checkpoint_dir`` + ``resume=True`` gives bitwise resume: epoch
    checkpoints carry weights, Adam state and history; a resumed run
    replays the remaining epochs to the identical final weights
    (guaranteed by the integer gradient reduce — see module
    docstring)."""
    import ray

    if task is None:
        if num_labels is None:
            raise ValueError("need num_labels or task")
        task = ner_task(num_labels)

    feats = train_features.materialize()
    bs = dev_bs = None
    if engine == "blockset":
        from fastie_ray.state.exchange import BlockSet

        def to_blocks(ds):
            # exactly n_blocks tasks per epoch wave: repartition UP
            # when the source has fewer blocks (compact only merges —
            # a 16-block feature set would cap a 32-core epoch at 16
            # tasks, measured 0.44 scaling efficiency), compact DOWN
            # when it has more
            if ds.num_blocks() < n_blocks:
                ds = ds.repartition(n_blocks).materialize()
            return BlockSet.from_dataset(ds).compact(n_blocks)

        bs = to_blocks(feats)
        if dev_features is not None:
            dev_bs = to_blocks(dev_features.materialize())

    weights = init_gp_head(task.n_channels, cfg)
    like = {k: v.copy() for k, v in weights.items()}
    m = np.zeros(_flatten(weights).size)
    v = np.zeros_like(m)
    # per-parameter lr vector: ma_* tensors move at mix_lr_scale×lr
    # (see GPTrainConfig.mix_lr_scale); _flatten orders by sorted key
    lr_vec = np.concatenate([
        np.full(like[k].size,
                cfg.lr * (cfg.mix_lr_scale if k.startswith("ma_")
                          else 1.0))
        for k in sorted(like)
    ])
    t0 = 0
    history: list[dict] = []

    sig = _ckpt_sig(cfg, task)
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        if resume:
            last = _latest_ckpt(checkpoint_dir, epochs)
            if last >= 0:
                z = np.load(_ckpt_path(checkpoint_dir, last), allow_pickle=True)
                if "cfg_sig" in z.files and str(z["cfg_sig"]) != sig:
                    raise ValueError(
                        "gp_train resume: checkpoint was written under "
                        f"different hyperparameters/task.\n  checkpoint: "
                        f"{z['cfg_sig']}\n  current:    {sig}\nContinuing "
                        "the saved Adam state under new settings would "
                        "void the bitwise-resume guarantee — delete the "
                        "checkpoint dir or pass resume=False to restart."
                    )
                weights = _unflatten(z["w"], like)
                m, v, t0 = z["m"], z["v"], int(z["t"])
                history = list(pd.DataFrame(
                    z["hist"], columns=list(z["hist_cols"])
                ).astype("int64").to_dict("records"))

    scale = float(1 << cfg.quant_bits)
    b1, b2 = cfg.adam_beta1, cfg.adam_beta2

    for epoch in range(t0, epochs):
        wref = ray.put({k: w.copy() for k, w in weights.items()})

        gsum = np.zeros(m.size, dtype=np.int64)
        n_units = loss_e6 = 0
        if bs is not None:
            parts = bs.scalar(
                lambda df, _w=wref: _grad_partial(
                    df, ray.get(_w), task, cfg, batch_rows
                ) if len(df) else None
            )
            for part in parts:
                if part is None:
                    continue
                g, n, l = part
                gsum += np.asarray(g, dtype=np.int64)
                n_units += n
                loss_e6 += l
        else:
            def gpart(df: pd.DataFrame, _wref=wref) -> pd.DataFrame:
                w = ray.get(_wref)
                gvec, n_u, l_e6 = _grad_partial(
                    df, w, task, cfg, batch_rows
                )
                return pd.DataFrame(
                    {"g": [gvec], "n_units": np.int64(n_u),
                     "loss_e6": np.int64(l_e6)}
                )

            # batch_rows bounds the dense [B, C, L, L] working tensor
            # per task (B·C·L²·8 bytes × a few temporaries)
            parts = feats.map_batches(
                gpart, batch_format="pandas", batch_size=batch_rows
            ).to_pandas()
            for garr in parts["g"]:
                gsum += np.asarray(garr, dtype=np.int64)
            n_units = int(parts["n_units"].sum())
            loss_e6 = int(parts["loss_e6"].sum())

        g = gsum.astype(np.float64) / scale / max(n_units, 1)
        t = epoch + 1
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mhat = m / (1 - b1 ** t)
        vhat = v / (1 - b2 ** t)
        step = lr_vec * mhat / (np.sqrt(vhat) + cfg.adam_eps)
        weights = _unflatten(_flatten(weights) - step, like)

        row = {
            "epoch": epoch,
            "loss_e6": loss_e6 // max(n_units, 1),
            "n_units": n_units,
            "grad_l1_q": int(np.abs(gsum).sum()),
        }
        if dev_bs is not None:
            row.update(_eval_blockset(
                dev_bs, weights, task, cfg, batch_rows
            ))
        elif dev_features is not None:
            row.update(evaluate_gp_head(
                dev_features, weights, task, cfg, batch_rows
            ))
        history.append(row)

        if checkpoint_dir:
            hist_df = pd.DataFrame(history)
            np.savez(
                _ckpt_path(checkpoint_dir, epoch),
                w=_flatten(weights), m=m, v=v, t=np.int64(epoch + 1),
                hist=hist_df.to_numpy(dtype=np.int64),
                hist_cols=np.array(list(hist_df.columns)),
                cfg_sig=np.array(sig),
            )

    return weights, pd.DataFrame(history)


def _f1_row(tp: int, n_pred: int, n_true: int) -> dict[str, int]:
    p = tp / n_pred if n_pred else 0.0
    r = tp / n_true if n_true else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return {
        "tp": tp, "n_pred": n_pred, "n_true": n_true,
        "f1_e6": int(f1 * 1_000_000),
    }


def _eval_blockset(
    dev_bs, weights, task: TaskSpec, cfg: GPTrainConfig, batch_rows: int
) -> dict[str, int]:
    import ray

    wref = ray.put(weights)
    parts = dev_bs.scalar(
        lambda df, _w=wref: _eval_partial(
            df, ray.get(_w), task, cfg, batch_rows
        ) if len(df) else (0, 0, 0)
    )
    tp = sum(p[0] for p in parts)
    n_pred = sum(p[1] for p in parts)
    n_true = sum(p[2] for p in parts)
    return _f1_row(tp, n_pred, n_true)


def evaluate_gp_head(
    dev_features: "ray.data.Dataset",
    weights: dict[str, np.ndarray],
    task: TaskSpec | int,
    cfg: GPTrainConfig = GPTrainConfig(),
    batch_rows: int = 128,
) -> dict[str, int]:
    """Streaming span-level micro P/R/F1 (ExtractionScore semantics,
    ``fastie/metrics/extraction/score.py:9-31``): integer (tp, pred,
    true) partials per block, summed exactly."""
    import ray

    spec = ner_task(task) if isinstance(task, int) else task
    wref = ray.put(weights)

    def epart(df: pd.DataFrame, _wref=wref) -> pd.DataFrame:
        tp, np_, nt = _eval_partial(
            df, ray.get(_wref), spec, cfg, batch_rows
        )
        return pd.DataFrame(
            {"tp": [np.int64(tp)], "n_pred": [np.int64(np_)],
             "n_true": [np.int64(nt)]}
        )

    tot = dev_features.map_batches(
        epart, batch_format="pandas", batch_size=batch_rows
    ).to_pandas().sum()
    return _f1_row(int(tot["tp"]), int(tot["n_pred"]), int(tot["n_true"]))


def rel_triple_eval(
    dev_features: "ray.data.Dataset",
    weights: dict[str, np.ndarray],
    num_predicates: int,
    cfg: GPTrainConfig = GPTrainConfig(),
    batch_rows: int = 64,
) -> dict[str, int]:
    """Triple-level micro P/R/F1 of a trained GPLinker head — the
    reference's evaluate.py metric ((predicate, subject, object) sets,
    ``examples/relation_extraction/evaluate.py:8-37``) at token-span
    granularity, distributed as integer partials."""
    import ray

    wref = ray.put(weights)

    def epart(df: pd.DataFrame, _wref=wref) -> pd.DataFrame:
        tp, np_, nt = _rel_triple_partial(
            df, ray.get(_wref), num_predicates, cfg, batch_rows
        )
        return pd.DataFrame(
            {"tp": [np.int64(tp)], "n_pred": [np.int64(np_)],
             "n_true": [np.int64(nt)]}
        )

    tot = dev_features.map_batches(
        epart, batch_format="pandas", batch_size=256
    ).to_pandas().sum()
    return _f1_row(int(tot["tp"]), int(tot["n_pred"]), int(tot["n_true"]))


def save_trained_head(
    path: str,
    weights: dict[str, np.ndarray],
    task_name: str,
    labels: list[str],
    cfg: GPTrainConfig,
    max_length: int = 64,
) -> None:
    """Persist a trained head as a self-describing ``.npz`` checkpoint
    (weights + the backbone hyperparameters that reproduce the frozen
    embeddings + the label vocabulary). ``hf_backend.
    resolve_dense_backend`` dispatches on these keys, so a trained
    checkpoint drives the production scorer path
    (``NerScorer(ner_backend="hf", hf_model=path)``) — the reference's
    train → save → ``from_pretrained`` → predict loop, closed."""
    np.savez(
        path,
        **{k: np.asarray(v) for k, v in weights.items()},
        head_task=np.array(task_name),
        head_labels=np.array(list(labels)),
        head_cfg=np.array([
            cfg.d_model, cfg.head_size, cfg.emb_rows, cfg.seed,
            cfg.mix_dim, cfg.mix_window,
        ], dtype=np.int64),
        head_pos_scale=np.float64(cfg.pos_scale),
        # the TRAINED context window: inference must not score beyond
        # it — absolute positions the head never saw produce arbitrary
        # bilinear scores (measured: an unclamped 512-token pass over a
        # 64-token-trained head emitted 28M false spans)
        head_max_length=np.int64(max_length),
    )


def load_trained_head(path: str):
    """→ (weights, task_name, labels, cfg, max_length) from
    :func:`save_trained_head` output."""
    z = np.load(path, allow_pickle=False)
    weights = {
        k: z[k] for k in z.files
        if k in ("wq", "bq", "wk", "bk") or k.startswith("ma_")
    }
    hc = [int(v) for v in z["head_cfg"]]
    d, h, rows, seed = hc[:4]
    mix_dim = hc[4] if len(hc) > 4 else 0  # pre-mixer checkpoints
    mix_window = hc[5] if len(hc) > 5 else 0
    cfg = GPTrainConfig(
        d_model=d, head_size=h, emb_rows=rows, seed=seed,
        pos_scale=float(z["head_pos_scale"]), mix_dim=mix_dim,
        mix_window=mix_window,
    )
    ml = int(z["head_max_length"]) if "head_max_length" in z.files else 64
    return (
        weights, str(z["head_task"]), [str(x) for x in z["head_labels"]],
        cfg, ml,
    )
