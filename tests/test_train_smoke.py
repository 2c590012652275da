"""End-to-end smoke tests: overfit trend, semi-supervised step, checkpoint
surgery, scaler, schedules, synthetic data round trip."""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_transformer_tpu.config import SEDTConfig
from sound_event_detection_transformer_tpu.data.encoder import BoxEncoder
from sound_event_detection_transformer_tpu.data.dataset import collate
from sound_event_detection_transformer_tpu.data.synthetic import SyntheticDataset
from sound_event_detection_transformer_tpu.engine import (
    Batch,
    TrainState,
    make_semi_train_step,
    make_train_step,
)
from sound_event_detection_transformer_tpu.models import build_model, empty_targets
from sound_event_detection_transformer_tpu.parallel.optim import make_optimizer

CLASSES = ["a", "b", "c", "d"]


def _setup(cfg):
    model, wd = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    B, T, F = 4, cfg.model.max_frames, cfg.model.n_mels
    feats = jnp.zeros((B, T, F, 1))
    pad = jnp.zeros((B, T), bool)
    variables = model.init({"params": rng, "dropout": rng}, feats, pad, True)
    tx = make_optimizer(variables["params"], cfg.train, steps_per_epoch=10)
    state = TrainState(variables["params"], variables.get("frozen", {}),
                       tx.init(variables["params"]), jnp.asarray(0))
    return model, wd, tx, state


def _synthetic_batch(cfg, seed=0):
    enc = BoxEncoder(CLASSES, seconds=10.0)
    ds = SyntheticDataset(4, CLASSES, cfg.model.max_frames, cfg.model.n_mels,
                          enc.encode_strong_df, max_events=2, seed=seed)
    return collate([ds[i] for i in range(4)], cfg.model.max_events, 10.0), ds


def test_overfit_single_batch():
    cfg = SEDTConfig.tiny_test()
    model, wd, tx, state = _setup(cfg)
    batch, _ = _synthetic_batch(cfg)
    step = make_train_step(model, wd, cfg, tx)
    losses = []
    for i in range(40):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.85 * np.mean(losses[:5])


def test_frozen_backbone_params_never_move():
    """Freeze policy (reference backbone.py:61): stem+layer1 leaves get exact
    zero grads (XLA skips their weight-grad convs) and never change; trainable
    conv0/layer2+ leaves do move."""
    from sound_event_detection_transformer_tpu.engine import (
        _frozen_param_mask,
    )

    cfg = SEDTConfig.tiny_test()
    model, wd, tx, state = _setup(cfg)
    batch, _ = _synthetic_batch(cfg)
    step = make_train_step(model, wd, cfg, tx)
    before = jax.tree.map(lambda x: np.asarray(x), state.params)
    state2, _ = step(state, batch, jax.random.PRNGKey(0))
    mask = _frozen_param_mask(before)
    moved_frozen, moved_trainable = [], []
    for (path, b), a, f in zip(
        jax.tree_util.tree_flatten_with_path(before)[0],
        jax.tree.leaves(state2.params),
        jax.tree.leaves(mask),
    ):
        changed = bool(np.any(np.asarray(a) != b))
        (moved_frozen if f else moved_trainable).append(changed)
    assert not any(moved_frozen)
    assert any(moved_trainable)


def test_train_step_with_all_augmentations():
    cfg = SEDTConfig.tiny_test()
    cfg = cfg.replace(
        augment=dataclasses.replace(
            cfg.augment, mix_up_ratio=0.5, time_mask=True, freq_mask=True,
            freq_shift=True,
        )
    )
    model, wd, tx, state = _setup(cfg)
    batch, _ = _synthetic_batch(cfg)
    step = make_train_step(model, wd, cfg, tx)
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))


def test_semi_train_step():
    cfg = SEDTConfig.tiny_test()
    model, wd, tx, state = _setup(cfg)
    batch, _ = _synthetic_batch(cfg)
    B = batch.feats.shape[0]
    strong = jnp.asarray([True, True, False, False])
    weak = jnp.zeros((B,), bool)
    unlabel = jnp.asarray([False, False, True, True])
    thr = jnp.full((cfg.model.num_classes,), 0.5)
    # n_labeled=2: sup forward on [:2], teacher/student on [2:] (the static
    # layout the semi CLI uses; halves the step's model FLOPs)
    step = make_semi_train_step(model, wd, cfg, tx, n_labeled=2)
    ema = jax.tree.map(jnp.copy, state.params)
    for i in range(2):
        state, ema, m, counts = step(
            state, ema, jnp.asarray(batch.feats), jnp.asarray(batch.feats),
            jnp.asarray(batch.pad_mask), jax.tree.map(jnp.asarray, batch.targets),
            strong, weak, unlabel, thr, jax.random.PRNGKey(i), jnp.asarray(True),
        )
        assert np.isfinite(float(m["loss"]))
    assert counts.shape == (cfg.model.num_classes,)
    # full-batch fallback path (n_labeled=None) still works
    step_full = make_semi_train_step(model, wd, cfg, tx)
    state, ema, m, _ = step_full(
        state, ema, jnp.asarray(batch.feats), jnp.asarray(batch.feats),
        jnp.asarray(batch.pad_mask), jax.tree.map(jnp.asarray, batch.targets),
        strong, weak, unlabel, thr, jax.random.PRNGKey(9), jnp.asarray(True),
    )
    assert np.isfinite(float(m["loss"]))
    # EMA drifted toward params
    d0 = jax.tree.leaves(state.params)[0]
    e0 = jax.tree.leaves(ema)[0]
    assert np.abs(np.asarray(d0) - np.asarray(e0)).max() < 1.0


def test_semi_merged_forward_parity():
    """The semi step's single concatenated forward (labeled view + student
    view in one model call) must produce the same loss as the reference
    formulation of two separate half-batch forwards (ref engine.py:127-160).
    Dropout 0 so the forward is deterministic."""
    from sound_event_detection_transformer_tpu.engine import get_pseudo_labels
    from sound_event_detection_transformer_tpu.models.criterion import (
        set_criterion, total_loss,
    )

    cfg = SEDTConfig.tiny_test()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dropout=0.0)
    )
    model, wd, tx, state = _setup(cfg)
    batch, _ = _synthetic_batch(cfg)
    B, n_l = batch.feats.shape[0], 2
    strong = jnp.asarray([True, True, False, False])
    weak = jnp.zeros((B,), bool)
    unlabel = jnp.asarray([False, False, True, True])
    thr = jnp.full((cfg.model.num_classes,), 0.5)
    ema = jax.tree.map(jnp.copy, state.params)
    tfeats = jnp.asarray(batch.feats)
    sfeats = tfeats + 0.01
    pad = jnp.asarray(batch.pad_mask)
    targets = jax.tree.map(jnp.asarray, batch.targets)

    step = make_semi_train_step(model, wd, cfg, tx, n_labeled=n_l)
    _, _, m, _ = step(
        state, ema, tfeats, sfeats, pad, targets, strong, weak, unlabel,
        thr, jax.random.PRNGKey(0), jnp.asarray(True),
    )

    # reference formulation: two separate half-batch forwards
    variables = {"params": state.params, "frozen": state.frozen}
    rng = jax.random.PRNGKey(0)
    sup_out = model.apply(variables, tfeats[:n_l], pad[:n_l], False,
                          rngs={"dropout": rng})
    tea_out = model.apply({"params": ema, "frozen": state.frozen},
                          tfeats[n_l:], pad[n_l:], True)
    pseudo, _ = get_pseudo_labels(
        tea_out, thr, targets.orig_size[n_l:], cfg.model.max_events
    )
    st_out = model.apply(variables, sfeats[n_l:], pad[n_l:], False,
                         rngs={"dropout": rng})
    r = jax.random.split(jax.random.PRNGKey(0), 6)
    sup_losses, _ = set_criterion(
        sup_out, jax.tree.map(lambda x: x[:n_l], targets), strong[:n_l],
        weak[:n_l], cfg.model, cfg.loss, rng=r[3],
    )
    un_losses, _ = set_criterion(
        st_out, pseudo, unlabel[n_l:], None, cfg.model, cfg.loss, rng=r[4],
    )
    expected = total_loss(sup_losses, wd) + total_loss(un_losses, wd)
    np.testing.assert_allclose(float(m["loss"]), float(expected), rtol=1e-4)


def test_adjust_threshold():
    from sound_event_detection_transformer_tpu.engine import adjust_threshold

    counts = np.array([50.0, 5.0, 100.0])
    prior = np.array([0.2, 0.3, 0.5])
    out = adjust_threshold(counts, np.full(3, 0.5), prior)
    assert (out >= 0.45).all() and (out <= 0.7).all()
    # overrepresented class gets a HIGHER threshold than underrepresented
    assert out[0] > out[1]
    # zero counts: unchanged
    np.testing.assert_array_equal(
        adjust_threshold(np.zeros(3), np.full(3, 0.5), prior), np.full(3, 0.5)
    )


def test_checkpoint_roundtrip_and_surgery(tmp_path):
    from sound_event_detection_transformer_tpu.utils.checkpoint import (
        load_audio_tag_backbone, load_checkpoint, load_pretrain_into,
        save_checkpoint,
    )

    cfg = SEDTConfig.tiny_test()
    model, wd, tx, state = _setup(cfg)
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, {"params": state.params, "frozen": state.frozen, "epoch": 3})
    ck = load_checkpoint(p)
    assert int(ck["epoch"]) == 3
    x0 = jax.tree.leaves(state.params)[0]
    y0 = jax.tree.leaves(ck["params"])[0]
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(y0))

    # pretrain surgery: self-sup model (no dec_at) -> dec_at model
    cfg_ss = cfg.replace(model=dataclasses.replace(
        cfg.model, self_sup=True, dec_at=False, num_queries=cfg.model.num_queries,
        num_patches=2, feature_recon=False))
    ss_model, _ = build_model(cfg_ss)
    rng = jax.random.PRNGKey(1)
    feats = jnp.zeros((1, cfg.model.max_frames, cfg.model.n_mels, 1))
    pad = jnp.zeros((1, cfg.model.max_frames), bool)
    patches = jnp.zeros((1, 2, 32, 32, 1))
    ss_vars = ss_model.init({"params": rng, "dropout": rng, "patch_mask": rng},
                            feats, pad, patches, True)
    merged = load_pretrain_into(state.params, ss_vars["params"])
    # query rows 1: come from the pretrained table
    np.testing.assert_array_equal(
        np.asarray(merged["query_embed"]["embedding"][1:]),
        np.asarray(ss_vars["params"]["query_embed"]["embedding"]),
    )
    # class_embed untouched
    np.testing.assert_array_equal(
        np.asarray(merged["class_embed"]["kernel"]),
        np.asarray(state.params["class_embed"]["kernel"]),
    )
    # backbone import from an audio-tag checkpoint
    merged2 = load_audio_tag_backbone(state.params, {"backbone": ss_vars["params"]["backbone"]})
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(merged2["backbone"])[0]),
        np.asarray(jax.tree.leaves(ss_vars["params"]["backbone"])[0]),
    )


def test_scaler_roundtrip(tmp_path):
    from sound_event_detection_transformer_tpu.data.scaler import Scaler

    rng = np.random.RandomState(0)
    data = [rng.randn(50, 8) * 3 + 1 for _ in range(10)]
    sc = Scaler()
    mean, std = sc.calculate_scaler(data)
    assert mean.shape == (8,)
    np.testing.assert_allclose(mean, 1.0, atol=0.4)  # 500 samples/bin
    np.testing.assert_allclose(std, 3.0, atol=0.4)
    p = str(tmp_path / "scaler.json")
    sc.save(p)
    sc2 = Scaler()
    sc2.load(p)
    np.testing.assert_allclose(sc2.mean_, sc.mean_)
    norm = sc2.normalize(data[0])
    assert abs(np.mean(norm)) < 1.0


def test_schedules():
    from sound_event_detection_transformer_tpu.parallel.optim import (
        cosine_lr, step_lr,
    )

    s = step_lr(1e-4, lr_drop=10, steps_per_epoch=5)
    assert s(0) == 1e-4
    assert s(5 * 10) == pytest.approx(1e-5)
    c = cosine_lr(1e-3, total_epochs=100, steps_per_epoch=1)
    assert c(0) == pytest.approx(1e-3)
    assert float(c(50)) == pytest.approx(5e-4, rel=1e-3)
    assert float(c(100)) < 1e-9


def test_synthetic_roundtrip_decoding():
    """Planted events survive encode -> dense -> decode with perfect boxes."""
    enc = BoxEncoder(CLASSES, seconds=10.0)
    ds = SyntheticDataset(4, CLASSES, 128, 32, enc.encode_strong_df,
                          max_events=2, seed=3)
    batch = collate([ds[i] for i in range(4)], 8, 10.0)
    ref = ds.ref_df()
    t = batch.targets
    for b in range(4):
        fname = ds.filenames.iloc[b]
        rows = ref[ref.filename == fname]
        assert int(t.box_valid[b].sum()) == len(rows)


def test_gradient_accumulation():
    """With accumulation k, params update only every k-th step."""
    from sound_event_detection_transformer_tpu.config import TrainConfig
    import optax

    cfg = SEDTConfig.tiny_test()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                accumulating_gradient_steps=2))
    model, wd, tx, state = _setup(cfg)
    batch, _ = _synthetic_batch(cfg)
    step = make_train_step(model, wd, cfg, tx)
    p0 = np.asarray(jax.tree.leaves(state.params)[0]).copy()
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    np.testing.assert_array_equal(p0, p1)  # step 1 of 2: accumulate only
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    p2 = np.asarray(jax.tree.leaves(state.params)[0])
    assert np.abs(p2 - p0).max() > 0  # step 2 of 2: applied
