#!/usr/bin/env python
"""Honest timing of the SP-SEDT self-supervised pretraining step.

Reference recipe (README.md:50-64): batch 200, 10 patches/clip, 20 queries,
E=6, feature reconstruction.  The step runs the backbone twice (clips +
B*P patch crops).  Usage: python tools/profile_spsedt.py [--batch 200]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", default=200, type=int)
    ap.add_argument("--iters", default=5, type=int)
    ap.add_argument("--num_patches", default=10, type=int)
    ap.add_argument("--compute_dtype", default="bfloat16")
    args = ap.parse_args()

    from sound_event_detection_transformer_tpu.utils.compilation_cache import (
        enable as enable_compilation_cache,
    )
    enable_compilation_cache()
    from sound_event_detection_transformer_tpu import config as C
    from sound_event_detection_transformer_tpu.engine import (
        Batch, init_train_state, make_train_step,
    )
    from sound_event_detection_transformer_tpu.models import build_model, empty_targets
    from sound_event_detection_transformer_tpu.parallel.optim import make_optimizer

    B, P = args.batch, args.num_patches
    feats_cfg = C.FeatureConfig.dcase()
    model_cfg = C.ModelConfig(
        backbone="resnet50", enc_layers=6, dec_layers=6, num_queries=20,
        num_classes=1, dec_at=False, self_sup=True, feature_recon=True,
        num_patches=P, max_frames=feats_cfg.max_frames,
        n_mels=feats_cfg.n_mels, compute_dtype=args.compute_dtype,
    )
    cfg = C.SEDTConfig(
        features=feats_cfg, model=model_cfg,
        data=C.DataConfig(classes=["event"], batch_size=B),
    )
    model, wd = build_model(cfg)
    T, F = cfg.model.max_frames, cfg.model.n_mels
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(
        jax.eval_shape(
            lambda r: model.init(
                {"params": r, "dropout": r, "patch_mask": r},
                jnp.zeros((2, T, F, 1)), jnp.zeros((2, T), bool),
                jnp.zeros((2, P, 128, 64, 1)), True,
            )["params"],
            rng,
        ),
        cfg.train, steps_per_epoch=100,
    )
    state = init_train_state(
        model, cfg, tx, rng, (B, T, F), patches_shape=(B, P, 128, 64, 1)
    )

    rs = np.random.RandomState(0)
    tgts = empty_targets(B, cfg.model.max_events, cfg.features.max_len_seconds)
    centers = rs.uniform(0.1, 0.9, (B, P))
    lengths = rs.uniform(0.05, 0.3, (B, P))
    M = cfg.model.max_events
    lab = np.zeros((B, M), np.int32)
    box = np.zeros((B, M, 2), np.float32)
    box[:, :P, 0] = centers
    box[:, :P, 1] = lengths
    val = np.zeros((B, M), bool)
    val[:, :P] = True
    tgts = tgts._replace(
        labels=jnp.asarray(lab), boxes=jnp.asarray(box),
        box_valid=jnp.asarray(val), label_valid=jnp.asarray(val),
    )
    batch = Batch(
        feats=jnp.asarray(rs.randn(B, T, F, 1), jnp.float32),
        pad_mask=jnp.zeros((B, T), bool),
        targets=tgts,
        strong=jnp.ones((B,), bool),
        weak=jnp.zeros((B,), bool),
        patches=jnp.asarray(rs.randn(B, P, 128, 64, 1), jnp.float32),
    )
    step = make_train_step(model, wd, cfg, tx, augment_on=False)
    key = jax.random.PRNGKey(1)
    for i in range(2):
        state, m = step(state, batch, jax.random.fold_in(key, i))
    _ = float(m["loss"])

    ts = []
    for t in range(3):
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, m = step(state, batch, jax.random.fold_in(key, 100 + i))
        _ = float(m["loss"])
        ts.append((time.perf_counter() - t0) / args.iters)
    dt = float(np.median(ts))
    print(f"spsedt pretrain step batch={B} patches={P} E=6 "
          f"dtype={args.compute_dtype}: {dt * 1e3:.2f} ms ({B / dt:.0f} clips/s)")


if __name__ == "__main__":
    main()
