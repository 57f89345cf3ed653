"""Distributed GP-head trainer (``pipelines.trainer`` — the
ExtractionTrainer analogue): exact gradients, convergence on the
synthetic gazetteer task, FGM adversarial hook, bitwise
checkpoint/resume (guaranteed by the integer gradient reduce)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray
import ray.data

from fastie_ray.pipelines.trainer import (
    GPTrainConfig,
    _backward,
    _embed,
    _flatten,
    _loss_and_dscore,
    _span_mask,
    _unflatten,
    frozen_embeddings,
    gp_scores,
    gp_train,
)


def _gaz_rows(n: int, seed: int) -> list[dict]:
    from fastie_ray.synth import build_world

    gaz = sorted(build_world().gazetteer.items())
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        s1, l1 = gaz[rng.integers(len(gaz))]
        s2, l2 = gaz[rng.integers(len(gaz))]
        text = f"{s1} met {s2} today ."
        rows.append(
            {"text": text, "entities": [
                {"start_offset": 0, "end_offset": len(s1), "label": l1},
                {"start_offset": len(s1) + 5,
                 "end_offset": len(s1) + 5 + len(s2), "label": l2},
            ]}
        )
    return rows


def _features(rows, labels):
    from fastie_ray.pipelines.train_prep import ner_convert_to_features

    l2i = {lb: i for i, lb in enumerate(labels)}
    return ner_convert_to_features(
        ray.data.from_items(rows), l2i, max_length=64
    )


LABELS5 = ["EVT", "LOC", "ORG", "PER", "PROD"]


def test_gp_gradients_match_finite_differences():
    cfg = GPTrainConfig(d_model=8, head_size=4, emb_rows=64, seed=3)
    nl = 2
    from fastie_ray.pipelines.trainer import init_gp_head

    w = init_gp_head(nl, cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, (3, 7))
    seq_len = np.array([7, 5, 6])
    y = np.zeros((3, nl, 7, 7), dtype=np.int64)
    y[0, 0, 1, 2] = 1
    y[1, 1, 2, 2] = 1
    y[2, 0, 1, 4] = 1
    x = _embed(ids, frozen_embeddings(cfg))
    valid = _span_mask(seq_len, 7)

    def loss_of(wd):
        s, _ = gp_scores(wd, x, cfg)
        return _loss_and_dscore(s, y, valid)[0]

    s, cache = gp_scores(w, x, cfg)
    _, _, ds = _loss_and_dscore(s, y, valid)
    grads, dx = _backward(ds, cache, w, cfg, want_dx=True)
    gv, flat = _flatten(grads), _flatten(w)
    eps = 1e-6
    for i in np.random.default_rng(1).choice(flat.size, 10, replace=False):
        fp, fm = flat.copy(), flat.copy()
        fp[i] += eps
        fm[i] -= eps
        num = (loss_of(_unflatten(fp, w)) - loss_of(_unflatten(fm, w))) / (
            2 * eps
        )
        assert abs(num - gv[i]) <= 1e-5 * (abs(num) + abs(gv[i]) + 1e-3)
    # embedding gradient (the FGM attack direction)
    xx = x.copy()
    xx[1, 2, 3] += eps
    s2, _ = gp_scores(w, xx, cfg)
    lp = _loss_and_dscore(s2, y, valid)[0]
    xx[1, 2, 3] -= 2 * eps
    s3, _ = gp_scores(w, xx, cfg)
    lm = _loss_and_dscore(s3, y, valid)[0]
    num = (lp - lm) / (2 * eps)
    assert abs(num - dx[1, 2, 3]) <= 1e-5 * (abs(num) + 1e-3)


def test_gp_train_converges_to_high_f1(ray_session):
    train = _features(_gaz_rows(300, 5), LABELS5)
    dev = _features(_gaz_rows(80, 9), LABELS5)
    _, hist = gp_train(
        train, len(LABELS5), epochs=40,
        cfg=GPTrainConfig(lr=0.2), dev_features=dev,
    )
    assert hist["loss_e6"].iloc[-1] < hist["loss_e6"].iloc[0] / 10
    assert hist["f1_e6"].iloc[-1] >= 900_000
    # streaming eval is integer-exact: tp <= n_true always
    assert (hist["tp"] <= hist["n_true"]).all()


def test_gp_train_fgm_converges(ray_session):
    train = _features(_gaz_rows(200, 6), LABELS5)
    dev = _features(_gaz_rows(60, 10), LABELS5)
    w_clean, _ = gp_train(
        train, len(LABELS5), epochs=12, cfg=GPTrainConfig(lr=0.2)
    )
    w_fgm, hist = gp_train(
        train, len(LABELS5), epochs=12,
        cfg=GPTrainConfig(lr=0.2, fgm_eps=1.0), dev_features=dev,
    )
    # adversarial training changes the trajectory but still learns
    assert not np.array_equal(_flatten(w_clean), _flatten(w_fgm))
    assert hist["loss_e6"].iloc[-1] < hist["loss_e6"].max()


def test_gp_train_resume_bitwise(ray_session, tmp_path):
    train = _features(_gaz_rows(150, 7), LABELS5).materialize()
    cfg = GPTrainConfig(lr=0.2)
    w_straight, h_straight = gp_train(
        train, len(LABELS5), epochs=6, cfg=cfg,
        checkpoint_dir=str(tmp_path / "a"),
    )
    # interrupted run: 3 epochs, then resume to 6
    gp_train(
        train, len(LABELS5), epochs=3, cfg=cfg,
        checkpoint_dir=str(tmp_path / "b"),
    )
    w_resumed, h_resumed = gp_train(
        train, len(LABELS5), epochs=6, cfg=cfg,
        checkpoint_dir=str(tmp_path / "b"), resume=True,
    )
    assert np.array_equal(_flatten(w_straight), _flatten(w_resumed))
    pd.testing.assert_frame_equal(
        h_straight.astype("int64"), h_resumed.astype("int64")
    )


def _rel_rows(n: int, seed: int) -> list[dict]:
    """Subject-label-determined predicates: learnable by the
    content+position bilinear link channels (a PREDICATE RANDOM per
    row would demand context mixing the frozen backbone doesn't
    have — the head can only see the endpoint tokens)."""
    from fastie_ray.synth import PREDICATES, build_world

    w = build_world()
    gaz = sorted(w.gazetteer.items())
    preds = sorted(PREDICATES)
    labels = sorted({lb for _, lb in gaz})
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        s, l1 = gaz[rng.integers(len(gaz))]
        o, _l2 = gaz[rng.integers(len(gaz))]
        pid = labels.index(l1) % len(preds)
        joiner = f" {preds[pid].replace('_', ' ')} "
        text = f"{s}{joiner}{o} ."
        oh = len(s) + len(joiner)
        rows.append({"text": text, "spo_list": [[
            0, len(s) - 1, pid, oh, oh + len(o) - 1  # tails INCLUSIVE
        ]]})
    return rows


def test_rel_gradients_mixed_rope_tril():
    """Finite-difference check through the per-channel RoPE/tril
    selection (the GPLinker head shape)."""
    from fastie_ray.pipelines.trainer import (
        _channel_valid, init_gp_head, rel_task,
    )

    cfg = GPTrainConfig(d_model=8, head_size=4, emb_rows=64, seed=3)
    spec = rel_task(2)  # 6 channels, mixed flags
    w = init_gp_head(spec.n_channels, cfg)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 1000, (2, 6))
    seq_len = np.array([6, 5])
    y = np.zeros((2, spec.n_channels, 6, 6), dtype=np.int64)
    y[0, 0, 1, 2] = 1
    y[0, 2, 1, 3] = 1  # head-pair channel, no tril
    y[1, 5, 4, 1] = 1  # tail-pair channel, BELOW the diagonal
    x = _embed(ids, frozen_embeddings(cfg))
    valid = _channel_valid(seq_len, 6, spec.tril)

    def loss_of(wd):
        s, _ = gp_scores(wd, x, cfg, spec.rope)
        return _loss_and_dscore(s, y, valid)[0]

    s, cache = gp_scores(w, x, cfg, spec.rope)
    _, _, ds = _loss_and_dscore(s, y, valid)
    grads, _ = _backward(ds, cache, w, cfg)
    gv, flat = _flatten(grads), _flatten(w)
    eps = 1e-6
    for i in np.random.default_rng(4).choice(flat.size, 10, replace=False):
        fp, fm = flat.copy(), flat.copy()
        fp[i] += eps
        fm[i] -= eps
        num = (loss_of(_unflatten(fp, w)) - loss_of(_unflatten(fm, w))) / (
            2 * eps
        )
        assert abs(num - gv[i]) <= 1e-5 * (abs(num) + abs(gv[i]) + 1e-3)
    # a sub-diagonal positive on a no-tril channel is actually valid
    assert valid[1, 5, 4, 1]


def test_rel_train_converges_triple_level(ray_session):
    from fastie_ray.pipelines.train_prep import rel_convert_to_features
    from fastie_ray.pipelines.trainer import rel_task, rel_triple_eval
    from fastie_ray.synth import PREDICATES

    preds = sorted(PREDICATES)
    p2i = {p: i for i, p in enumerate(preds)}
    train = rel_convert_to_features(
        ray.data.from_items(_rel_rows(300, 5)), p2i, max_length=64
    )
    dev = rel_convert_to_features(
        ray.data.from_items(_rel_rows(80, 9)), p2i, max_length=64
    )
    w, hist = gp_train(
        train, epochs=100, cfg=GPTrainConfig(lr=0.3),
        dev_features=dev, task=rel_task(len(preds)),
    )
    # channel-level span marking converges...
    assert hist["f1_e6"].iloc[-1] >= 750_000
    # ...and the reference triple-level decode (head∩tail predicate
    # intersection) recovers triples with high precision
    m = rel_triple_eval(dev, w, len(preds))
    assert m["n_true"] == 80
    assert m["f1_e6"] >= 500_000
    assert m["tp"] >= int(0.8 * m["n_pred"])


def _ee_rows(n: int, seed: int) -> list[dict]:
    """One 'hire' event per row: trigger + employer + employee
    arguments — argument channels learn gazetteer spans, link channels
    learn the (min, max) pair structure."""
    from fastie_ray.synth import build_world

    gaz = sorted(build_world().gazetteer.items())
    orgs = [s for s, lb in gaz if lb == "ORG"]
    pers = [s for s, lb in gaz if lb == "PER"]
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n):
        org = orgs[rng.integers(len(orgs))]
        per = pers[rng.integers(len(pers))]
        text = f"{org} hired {per} ."
        tr = len(org) + 1
        ph = tr + 6
        rows.append({"text": text, "events": [[
            ("hire", "trigger", "hired", tr, tr + 5),
            ("hire", "employer", org, 0, len(org)),
            ("hire", "employee", per, ph, ph + len(per)),
        ]]})
    return rows


def test_ee_train_converges(ray_session):
    from fastie_ray.pipelines.train_prep import ee_convert_to_features
    from fastie_ray.pipelines.trainer import ee_task

    labels = ["hire@employee", "hire@employer", "hire@trigger"]
    l2i = {lb: i for i, lb in enumerate(labels)}

    def ds_of(rows):  # nested event tuples need a pandas object column
        return ray.data.from_pandas(pd.DataFrame({
            "text": [r["text"] for r in rows],
            "events": [r["events"] for r in rows],
        }))

    train = ee_convert_to_features(
        ds_of(_ee_rows(300, 5)), l2i, max_length=64, label_col="events",
    )
    dev = ee_convert_to_features(
        ds_of(_ee_rows(80, 9)), l2i, max_length=64, label_col="events",
    )
    _, hist = gp_train(
        train, epochs=60, cfg=GPTrainConfig(lr=0.2),
        dev_features=dev, task=ee_task(len(labels)),
    )
    assert hist["f1_e6"].iloc[-1] >= 750_000
    assert (hist["tp"] <= hist["n_true"]).all()


def test_gp_train_all_negative_rows(ray_session):
    """Docs with zero entities must train (suppression-only loss) and
    evaluate without dividing by zero."""
    rows = [{"text": f"nothing here {i} .", "entities": []} for i in range(40)]
    feats = _features(rows, LABELS5)
    w, hist = gp_train(
        feats, len(LABELS5), epochs=3, cfg=GPTrainConfig(lr=0.1),
        dev_features=feats,
    )
    assert (hist["n_true"] == 0).all()
    assert (hist["f1_e6"] == 0).all()
    # suppression learning: predicted positives shrink
    assert hist["n_pred"].iloc[-1] <= hist["n_pred"].iloc[0]


def test_gp_train_dataset_engine_matches_blockset(ray_session):
    """engine="dataset" (the beyond-plasma streaming path) follows the
    same trajectory as the pinned-BlockSet path. Bitwise parity holds
    only WITHIN an engine (fixed block boundaries — resume test);
    across engines the per-block fixed-point rounding differs, so
    agreement is at quantization precision, not bitwise."""
    train = _features(_gaz_rows(60, 3), LABELS5)
    _, h_bs = gp_train(
        train, len(LABELS5), epochs=3, cfg=GPTrainConfig(lr=0.1),
        engine="blockset",
    )
    _, h_ds = gp_train(
        train, len(LABELS5), epochs=3, cfg=GPTrainConfig(lr=0.1),
        engine="dataset",
    )
    assert (h_bs["epoch"] == h_ds["epoch"]).all()
    assert (h_bs["n_units"] == h_ds["n_units"]).all()
    # per-unit loss agrees to the e6 quantum (+/- block-count rounding)
    assert (h_bs["loss_e6"] - h_ds["loss_e6"]).abs().max() <= 2
    # summed |grad| agrees to ~1e-9 relative (per-block rounding)
    rel = (
        (h_bs["grad_l1_q"] - h_ds["grad_l1_q"]).abs()
        / h_bs["grad_l1_q"].clip(lower=1)
    )
    assert rel.max() < 1e-6


def test_gp_train_resume_hyperparameter_mismatch_raises(
    ray_session, tmp_path
):
    """ADVICE r4: resuming with different --lr/--fgm-eps/task silently
    continued the old Adam state; checkpoints now carry the cfg/task
    fingerprint and resume raises on mismatch."""
    import pytest

    train = _features(_gaz_rows(80, 7), LABELS5)
    gp_train(
        train, len(LABELS5), epochs=2, cfg=GPTrainConfig(lr=0.2),
        checkpoint_dir=str(tmp_path / "c"),
    )
    with pytest.raises(ValueError, match="different hyperparameters"):
        gp_train(
            train, len(LABELS5), epochs=4, cfg=GPTrainConfig(lr=0.05),
            checkpoint_dir=str(tmp_path / "c"), resume=True,
        )
    # different task (channel count) also raises
    with pytest.raises(ValueError, match="different hyperparameters"):
        gp_train(
            train, len(LABELS5) + 1, epochs=4, cfg=GPTrainConfig(lr=0.2),
            checkpoint_dir=str(tmp_path / "c"), resume=True,
        )
    # identical settings still resume fine
    w2, _ = gp_train(
        train, len(LABELS5), epochs=4, cfg=GPTrainConfig(lr=0.2),
        checkpoint_dir=str(tmp_path / "c"), resume=True,
    )
    assert _flatten(w2).size > 0


def test_mixer_gradients_match_finite_differences():
    """Context-mixer (mix_dim > 0): analytic gradients for ALL weight
    tensors (head + ma_*) and the mixer-input embedding gradient (the
    FGM attack direction) match central finite differences."""
    from fastie_ray.pipelines.trainer import (
        init_gp_head, mix_backward, mix_forward,
    )

    cfg = GPTrainConfig(d_model=8, head_size=4, emb_rows=64, seed=3,
                        mix_dim=5)
    nl = 2
    w = init_gp_head(nl, cfg)
    # ma_wo starts at zero (identity mixer) — perturb it so the
    # attention path actually carries gradient in this check
    rng = np.random.default_rng(4)
    w["ma_wo"] = rng.standard_normal(w["ma_wo"].shape) * 0.3
    ids = rng.integers(0, 1000, (3, 7))
    seq_len = np.array([7, 5, 6])
    y = np.zeros((3, nl, 7, 7), dtype=np.int64)
    y[0, 0, 1, 2] = 1
    y[1, 1, 2, 2] = 1
    y[2, 0, 1, 4] = 1
    x = _embed(ids, frozen_embeddings(cfg))
    valid = _span_mask(seq_len, 7)

    def loss_of(wd, xx=x):
        xh, _ = mix_forward(wd, xx, seq_len)
        s, _ = gp_scores(wd, xh, cfg)
        return _loss_and_dscore(s, y, valid)[0]

    xh, mcache = mix_forward(w, x, seq_len)
    s, cache = gp_scores(w, xh, cfg)
    _, _, ds = _loss_and_dscore(s, y, valid)
    grads, dxh = _backward(ds, cache, w, cfg, want_dx=True)
    mg, dx = mix_backward(dxh, mcache, w)
    grads.update(mg)
    gv, flat = _flatten(grads), _flatten(w)
    eps = 1e-6
    for i in np.random.default_rng(1).choice(flat.size, 16, replace=False):
        fp, fm = flat.copy(), flat.copy()
        fp[i] += eps
        fm[i] -= eps
        num = (loss_of(_unflatten(fp, w)) - loss_of(_unflatten(fm, w))) / (
            2 * eps
        )
        assert abs(num - gv[i]) <= 1e-4 * (abs(num) + abs(gv[i]) + 1e-3), i
    # embedding gradient through mixer + residual
    for (b, l, d) in [(1, 2, 3), (0, 0, 1), (2, 4, 7)]:
        xx = x.copy()
        xx[b, l, d] += eps
        lp = loss_of(w, xx)
        xx[b, l, d] -= 2 * eps
        lm = loss_of(w, xx)
        num = (lp - lm) / (2 * eps)
        assert abs(num - dx[b, l, d]) <= 1e-4 * (abs(num) + 1e-3)


def test_mixer_off_is_bit_identical_to_historical(ray_session):
    """mix_dim=0 (default) leaves the init stream, gradient vector
    layout and training trajectory EXACTLY as before the mixer landed.
    The init stream is pinned to its RECORDED pre-mixer md5 (not mere
    self-equality — a reordered draw would self-agree and still break
    every historical checkpoint)."""
    import hashlib

    from fastie_ray.pipelines.trainer import init_gp_head

    cfg = GPTrainConfig()
    w = init_gp_head(5, cfg)
    assert sorted(w) == ["bk", "bq", "wk", "wq"]
    # md5 of the flattened default-config 5-channel init, recorded
    # before the mixer landed (round 5) — the byte stream historical
    # checkpoints were trained from
    assert (
        hashlib.md5(_flatten(w).tobytes()).hexdigest()
        == "9ad73ad4ab3d05139c55187f81d1ff4b"
    )
    train = _features(_gaz_rows(60, 7), LABELS5).materialize()
    w1, h1 = gp_train(train, len(LABELS5), epochs=3, cfg=cfg)
    w2, h2 = gp_train(train, len(LABELS5), epochs=3, cfg=cfg)
    assert np.array_equal(_flatten(w1), _flatten(w2))


def test_mixer_train_and_checkpoint_roundtrip(ray_session, tmp_path):
    """mix_dim > 0 trains, converges, and round-trips through
    save_trained_head → TrainedHeadBackend (serving applies the mixer)."""
    from fastie_ray.hf_backend import resolve_dense_backend
    from fastie_ray.pipelines.trainer import save_trained_head

    train = _features(_gaz_rows(200, 6), LABELS5)
    dev = _features(_gaz_rows(60, 10), LABELS5)
    cfg = GPTrainConfig(lr=0.2, mix_dim=8)
    w, hist = gp_train(
        train, len(LABELS5), epochs=40, cfg=cfg, dev_features=dev,
    )
    assert "ma_wq" in w
    assert hist["f1_e6"].iloc[-1] >= 900_000
    path = str(tmp_path / "mix_head.npz")
    save_trained_head(path, w, "ner", LABELS5, cfg)
    be = resolve_dense_backend(None, model_name_or_path=path)
    assert "ma_wq" in be.w and be.cfg.mix_dim == 8
    enc, s = be.ner_forward("Alice met Bob .")
    assert s.shape[0] == len(LABELS5)


def test_mixer_resume_bitwise(ray_session, tmp_path):
    """bitwise checkpoint/resume holds WITH the mixer enabled."""
    train = _features(_gaz_rows(100, 7), LABELS5).materialize()
    cfg = GPTrainConfig(lr=0.2, mix_dim=8)
    w_straight, h_s = gp_train(
        train, len(LABELS5), epochs=6, cfg=cfg,
        checkpoint_dir=str(tmp_path / "a"),
    )
    gp_train(
        train, len(LABELS5), epochs=3, cfg=cfg,
        checkpoint_dir=str(tmp_path / "b"),
    )
    w_resumed, h_r = gp_train(
        train, len(LABELS5), epochs=6, cfg=cfg,
        checkpoint_dir=str(tmp_path / "b"), resume=True,
    )
    assert np.array_equal(_flatten(w_straight), _flatten(w_resumed))
    pd.testing.assert_frame_equal(
        h_s.astype("int64"), h_r.astype("int64")
    )


def test_tiled_loss_matches_dense():
    """loss_tile path (VERDICT r4 #7): tiled three-pass loss/dS equals
    the dense formulation to float tolerance on random masked inputs,
    and its gradients pass the same finite-difference check."""
    from fastie_ray.pipelines.trainer import _loss_and_dscore_tiled

    rng = np.random.default_rng(0)
    B, C, L = 3, 4, 23
    s = rng.standard_normal((B, C, L, L)).astype(np.float32) * 3
    y = (rng.random((B, C, L, L)) < 0.02).astype(np.int64)
    seq_len = np.array([23, 11, 17])
    valid = _span_mask(seq_len, L)
    y = y & valid[:, None, :, :]
    l_d, n_d, ds_d = _loss_and_dscore(s, y, valid)
    for tile in (1, 5, 16, 23, 64):
        l_t, n_t, ds_t = _loss_and_dscore_tiled(s, y, valid, tile)
        assert n_t == n_d
        assert abs(l_t - l_d) <= 1e-3 * (abs(l_d) + 1)
        np.testing.assert_allclose(ds_t, ds_d, rtol=2e-4, atol=2e-6)


def test_tiled_gradients_match_finite_differences():
    cfg = GPTrainConfig(d_model=8, head_size=4, emb_rows=64, seed=3,
                        loss_tile=3)
    nl = 2
    from fastie_ray.pipelines.trainer import (
        _loss_and_dscore_tiled, init_gp_head,
    )

    w = init_gp_head(nl, cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, (3, 7))
    seq_len = np.array([7, 5, 6])
    y = np.zeros((3, nl, 7, 7), dtype=np.int64)
    y[0, 0, 1, 2] = 1
    y[1, 1, 2, 2] = 1
    y[2, 0, 1, 4] = 1
    x = _embed(ids, frozen_embeddings(cfg))
    valid = _span_mask(seq_len, 7)

    def loss_of(wd):
        s, _ = gp_scores(wd, x, cfg)
        return _loss_and_dscore_tiled(s, y, valid, cfg.loss_tile)[0]

    s, cache = gp_scores(w, x, cfg)
    _, _, ds = _loss_and_dscore_tiled(s, y, valid, cfg.loss_tile)
    grads, _ = _backward(ds, cache, w, cfg)
    gv, flat = _flatten(grads), _flatten(w)
    eps = 1e-6
    for i in np.random.default_rng(1).choice(flat.size, 10, replace=False):
        fp, fm = flat.copy(), flat.copy()
        fp[i] += eps
        fm[i] -= eps
        num = (loss_of(_unflatten(fp, w)) - loss_of(_unflatten(fm, w))) / (
            2 * eps
        )
        assert abs(num - gv[i]) <= 1e-5 * (abs(num) + abs(gv[i]) + 1e-3)
