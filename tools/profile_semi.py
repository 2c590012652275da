#!/usr/bin/env python
"""Honest timing of the semi-supervised mean-teacher step (DCASE recipe).

The mean-teacher step is 3 model forwards (supervised on the labeled half,
teacher + student on the unlabeled half) + backward + EMA.  Reference:
engine.py:97-196.  Usage: python tools/profile_semi.py [--batch 64]
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
    ap.add_argument("--batch", default=64, type=int)
    ap.add_argument("--iters", default=10, type=int)
    ap.add_argument("--enc_layers", default=6, type=int)
    ap.add_argument("--dec_layers", default=6, type=int)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--components", action="store_true",
                    help="also time teacher-fwd / pseudo-NMS / grad-step "
                         "separately (where do the 60 ms go?)")
    args = ap.parse_args()

    from sound_event_detection_transformer_tpu.utils.compilation_cache import (
        enable as enable_compilation_cache,
    )
    enable_compilation_cache()
    from sound_event_detection_transformer_tpu import config as C
    from sound_event_detection_transformer_tpu.engine import (
        TrainState, init_train_state, make_semi_train_step,
    )
    from sound_event_detection_transformer_tpu.models import build_model, empty_targets
    from sound_event_detection_transformer_tpu.parallel.optim import make_optimizer

    B = args.batch
    feats_cfg = C.FeatureConfig.dcase()
    model_cfg = C.ModelConfig(
        backbone="resnet50", enc_layers=args.enc_layers,
        dec_layers=args.dec_layers, num_queries=20, num_classes=10,
        dec_at=True, max_frames=feats_cfg.max_frames, n_mels=feats_cfg.n_mels,
        compute_dtype=args.compute_dtype,
    )
    cfg = C.SEDTConfig(
        features=feats_cfg, model=model_cfg,
        data=C.DataConfig(classes=C.DCASE_CLASSES, batch_size=B),
    )
    model, wd = build_model(cfg)
    T, F = cfg.model.max_frames, cfg.model.n_mels
    rng = jax.random.PRNGKey(0)
    tx = make_optimizer(
        jax.eval_shape(
            lambda r: model.init({"params": r, "dropout": r},
                                 jnp.zeros((B, T, F, 1)), jnp.zeros((B, T), bool),
                                 True)["params"],
            rng,
        ),
        cfg.train, steps_per_epoch=100, schedule="cosine",
    )
    state = init_train_state(model, cfg, tx, rng, (B, T, F))
    ema_params = state.params

    n_labeled = B // 2  # 1/4 strong + 1/4 weak labeled, 1/2 unlabeled
    rs = np.random.RandomState(0)
    tgts = empty_targets(B, cfg.model.max_events, cfg.features.max_len_seconds)
    valid = rs.rand(B, cfg.model.max_events) < 0.3
    valid[:, 0] = True
    valid[n_labeled:] = False
    tgts = tgts._replace(
        labels=jnp.asarray(rs.randint(0, 10, (B, cfg.model.max_events)), jnp.int32),
        boxes=jnp.stack([
            jnp.asarray(rs.uniform(0.2, 0.8, (B, cfg.model.max_events))),
            jnp.asarray(rs.uniform(0.05, 0.3, (B, cfg.model.max_events))),
        ], -1).astype(jnp.float32),
        box_valid=jnp.asarray(valid), label_valid=jnp.asarray(valid),
    )
    pos = np.arange(B)
    strong = jnp.asarray(pos < B // 4)
    weak = jnp.asarray((pos >= B // 4) & (pos < n_labeled))
    unlabel = jnp.asarray(pos >= n_labeled)
    tfeats = jnp.asarray(rs.randn(B, T, F, 1), jnp.float32)
    sfeats = tfeats + 0.01
    pad = jnp.zeros((B, T), bool)
    thr = jnp.full((10,), 0.5, jnp.float32)

    step = make_semi_train_step(model, wd, cfg, tx, n_labeled=n_labeled)
    key = jax.random.PRNGKey(1)
    for i in range(3):
        state, ema_params, m, counts = step(
            state, ema_params, tfeats, sfeats, pad, tgts, strong, weak,
            unlabel, thr, jax.random.fold_in(key, i), jnp.asarray(True),
        )
    _ = float(m["loss"])

    ts = []
    for t in range(3):
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, ema_params, m, counts = step(
                state, ema_params, tfeats, sfeats, pad, tgts, strong, weak,
                unlabel, thr, jax.random.fold_in(key, 100 + i), jnp.asarray(True),
            )
        _ = float(m["loss"])
        ts.append((time.perf_counter() - t0) / args.iters)
    dt = float(np.median(ts))
    print(f"semi step batch={B} enc/dec={args.enc_layers}/{args.dec_layers} "
          f"dtype={args.compute_dtype}: {dt * 1e3:.2f} ms "
          f"({B / dt:.0f} clips/s)")

    if not args.components:
        return

    # --- component split: teacher fwd | pseudo-label NMS | nothing else ---
    from sound_event_detection_transformer_tpu.engine import get_pseudo_labels

    unl = slice(n_labeled, None)

    @jax.jit
    def teacher_fwd(params, frozen, feats, pad):
        return model.apply({"params": params, "frozen": frozen},
                           feats[unl], pad[unl], True)

    @jax.jit
    def pseudo_only(tea_out, thr, orig):
        t, counts = get_pseudo_labels(tea_out, thr, orig[unl],
                                      cfg.model.max_events)
        return counts

    def timed(fn, *a, iters=args.iters):
        out = fn(*a)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*a)
            _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
            ts.append((time.perf_counter() - t0) / iters)
        return float(np.median(ts))

    t_tea = timed(teacher_fwd, state.params, state.frozen, tfeats, pad)
    tea_out = teacher_fwd(state.params, state.frozen, tfeats, pad)
    t_nms = timed(pseudo_only, tea_out, thr, tgts.orig_size)
    print(f"  teacher fwd (unlabeled half, deterministic): {t_tea*1e3:.2f} ms")
    print(f"  pseudo-labels (postprocess + same-class NMS): {t_nms*1e3:.2f} ms")
    print(f"  remainder (sup fwd + student fwd + bwd + opt + EMA): "
          f"{(dt - t_tea - t_nms)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
