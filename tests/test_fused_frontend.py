"""Fused waveform->logmel train path: equivalence with the precomputed path."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sound_event_detection_transformer_tpu.config import FeatureConfig, SEDTConfig
from sound_event_detection_transformer_tpu.data.features import logmel_numpy
from sound_event_detection_transformer_tpu.engine import (
    Batch,
    make_train_step,
)
from sound_event_detection_transformer_tpu.models import build_model, empty_targets
from sound_event_detection_transformer_tpu.ops.frontend import make_frontend_fn
from sound_event_detection_transformer_tpu.parallel.optim import make_optimizer
from sound_event_detection_transformer_tpu.engine import init_train_state


def test_fused_frontend_matches_offline(rng):
    fc = FeatureConfig(sample_rate=8000, n_window=256, n_fft=256, hop_size=128,
                       n_mels=32, max_len_seconds=2.0)
    B, n_samples = 2, 16000
    waves = rng.randn(B, n_samples).astype(np.float32) * 0.1
    mean = rng.randn(32).astype(np.float32)
    std = rng.rand(32).astype(np.float32) + 0.5

    fe = make_frontend_fn(
        sr=fc.sample_rate, n_fft=fc.n_fft, n_window=fc.n_window,
        hop=fc.hop_size, n_mels=fc.n_mels, max_frames=128,
        scaler_mean=mean, scaler_std=std,
    )
    fused = np.asarray(jax.jit(fe)(jnp.asarray(waves)))
    assert fused.shape == (B, 128, 32, 1)

    from sound_event_detection_transformer_tpu.data.transforms import pad_trunc_seq

    for b in range(B):
        offline = logmel_numpy(waves[b], fc)
        offline = pad_trunc_seq(offline, 128)
        offline = (offline - mean) / std
        # rFFT (host) vs matmul-DFT (device), dB scale -> loose tolerance
        assert np.abs(fused[b, :, :, 0] - offline).max() < 0.2


def test_train_step_from_waveforms(rng):
    cfg = SEDTConfig.tiny_test()
    fc = cfg.features
    model, wd = build_model(cfg)
    key = jax.random.PRNGKey(0)
    tx = make_optimizer(
        model.init({"params": key, "dropout": key},
                   jnp.zeros((1, cfg.model.max_frames, cfg.model.n_mels, 1)),
                   jnp.zeros((1, cfg.model.max_frames), bool), True)["params"],
        cfg.train, 10,
    )
    state = init_train_state(model, cfg, tx, key,
                             (2, cfg.model.max_frames, cfg.model.n_mels))
    fe = make_frontend_fn(
        sr=fc.sample_rate, n_fft=fc.n_fft, n_window=fc.n_window,
        hop=fc.hop_size, n_mels=fc.n_mels, max_frames=cfg.model.max_frames,
    )
    step = make_train_step(model, wd, cfg, tx, frontend_fn=fe)
    n_samples = int(fc.max_len_seconds * fc.sample_rate)
    tg = empty_targets(2, cfg.model.max_events, fc.max_len_seconds)
    tg = tg._replace(
        labels=tg.labels.at[:, 0].set(1),
        boxes=tg.boxes.at[:, 0].set(jnp.array([0.5, 0.3])),
        box_valid=tg.box_valid.at[:, 0].set(True),
        label_valid=tg.label_valid.at[:, 0].set(True),
    )
    batch = Batch(
        feats=jnp.asarray(rng.randn(2, n_samples).astype(np.float32) * 0.1),
        pad_mask=jnp.zeros((2, cfg.model.max_frames), bool),
        targets=tg,
        strong=jnp.ones((2,), bool),
        weak=jnp.zeros((2,), bool),
    )
    state, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
