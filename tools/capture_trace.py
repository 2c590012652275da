#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship train step.

Usage: python tools/capture_trace.py [--out /tmp/sedt_trace] [--iters 5]
       python tools/xplane_report.py /tmp/sedt_trace        # then analyze
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sedt_trace")
    ap.add_argument("--iters", default=5, type=int)
    ap.add_argument("--batch", default=None, type=int,
                    help="batch size (default: 64 flagship/semi, 200 spsedt)")
    ap.add_argument("--compute_dtype", default=None,
                    help="override model compute dtype")
    mode = ap.add_mutually_exclusive_group()
    mode.add_argument("--semi", action="store_true",
                      help="trace the mean-teacher semi step instead")
    mode.add_argument("--spsedt", action="store_true",
                      help="trace the SP-SEDT pretrain step instead "
                           "(batch 200 + 10 patches recipe geometry)")
    ap.add_argument("--host_patches", action="store_true",
                    help="with --spsedt: feed host-cropped patches instead of "
                         "the production in-graph extract_patches_device path")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from sound_event_detection_transformer_tpu.engine import (
        Batch, TrainState, make_semi_train_step, make_train_step,
    )
    from sound_event_detection_transformer_tpu.models import build_model, empty_targets
    from sound_event_detection_transformer_tpu.parallel.optim import make_optimizer
    from sound_event_detection_transformer_tpu.utils.compilation_cache import (
        enable as enable_compilation_cache,
    )

    enable_compilation_cache()
    B = args.batch if args.batch is not None else (200 if args.spsedt else 64)
    if args.spsedt:
        # match tools/profile_spsedt.py's recipe geometry (reference
        # README.md:50-64: batch 200, 10 patches, E=6, feature recon)
        from sound_event_detection_transformer_tpu import config as C
        P = 10
        feats_cfg = C.FeatureConfig.dcase()
        cfg = C.SEDTConfig(
            features=feats_cfg,
            model=C.ModelConfig(
                backbone="resnet50", enc_layers=6, dec_layers=6,
                num_queries=20, num_classes=1, dec_at=False, self_sup=True,
                feature_recon=True, num_patches=P,
                max_frames=feats_cfg.max_frames, n_mels=feats_cfg.n_mels,
            ),
            data=C.DataConfig(classes=["event"], batch_size=B),
        )
    elif args.semi:
        # match tools/profile_semi.py's geometry (DCASE recipe, E=6/D=6)
        from sound_event_detection_transformer_tpu import config as C
        feats_cfg = C.FeatureConfig.dcase()
        cfg = C.SEDTConfig(
            features=feats_cfg,
            model=C.ModelConfig(
                backbone="resnet50", enc_layers=6, dec_layers=6,
                num_queries=20, num_classes=10, dec_at=True,
                max_frames=feats_cfg.max_frames, n_mels=feats_cfg.n_mels,
            ),
            data=C.DataConfig(classes=C.DCASE_CLASSES, batch_size=B),
        )
    else:
        cfg = _flagship_cfg(tiny=False)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=B))
    if args.compute_dtype:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, compute_dtype=args.compute_dtype)
        )
    model, wd = build_model(cfg)
    T, F = cfg.model.max_frames, cfg.model.n_mels
    rng = jax.random.PRNGKey(0)
    pad = jnp.zeros((B, T), bool)
    if args.spsedt:
        from sound_event_detection_transformer_tpu.engine import init_train_state
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
    else:
        feats0 = jnp.zeros((B, T, F, 1), jnp.float32)
        variables = jax.jit(
            lambda r, f, p: model.init({"params": r, "dropout": r}, f, p, True)
        )(rng, feats0, pad)
        tx = make_optimizer(variables["params"], cfg.train, steps_per_epoch=100)
        state = TrainState(
            variables["params"], variables.get("frozen", {}),
            tx.init(variables["params"]), jnp.asarray(0),
        )
    rs = np.random.RandomState(0)
    tgts = empty_targets(B, cfg.model.max_events, cfg.features.max_len_seconds)
    if args.spsedt:
        M = cfg.model.max_events
        lab = np.zeros((B, M), np.int32)
        box = np.zeros((B, M, 2), np.float32)
        box[:, :P, 0] = rs.uniform(0.1, 0.9, (B, P))
        box[:, :P, 1] = rs.uniform(0.05, 0.3, (B, P))
        val = np.zeros((B, M), bool)
        val[:, :P] = True
        tgts = tgts._replace(
            labels=jnp.asarray(lab), boxes=jnp.asarray(box),
            box_valid=jnp.asarray(val), label_valid=jnp.asarray(val),
        )
        # Default: patches=None -> the step runs the production in-graph
        # extract_patches_device gather (engine.py:145-154), so the trace
        # reflects the real pretrain step.  --host_patches restores the
        # host-supplied-crop variant for comparison.
        batch = Batch(
            feats=jnp.asarray(rs.randn(B, T, F, 1), jnp.float32),
            pad_mask=pad, targets=tgts,
            strong=jnp.ones((B,), bool), weak=jnp.zeros((B,), bool),
            patches=(jnp.asarray(rs.randn(B, P, 128, 64, 1), jnp.float32)
                     if args.host_patches else None),
        )
        step = make_train_step(model, wd, cfg, tx, augment_on=False)
        key = jax.random.PRNGKey(1)
        for i in range(3):
            state, m = step(state, batch, jax.random.fold_in(key, i))
        _ = float(m["loss"])
        with jax.profiler.trace(args.out):
            for i in range(args.iters):
                state, m = step(state, batch, jax.random.fold_in(key, 100 + i))
            _ = float(m["loss"])
        print(f"trace written to {args.out} (dtype={cfg.model.compute_dtype}, "
              f"{args.iters} steps, spsedt batch={B} patches={P} "
              f"{'host' if args.host_patches else 'in-graph'} crops)")
        return
    valid = rs.rand(B, cfg.model.max_events) < 0.3
    valid[:, 0] = True
    tgts = tgts._replace(
        labels=jnp.asarray(
            rs.randint(0, cfg.model.num_classes, (B, cfg.model.max_events)),
            jnp.int32),
        boxes=jnp.stack([
            jnp.asarray(rs.uniform(0.2, 0.8, (B, cfg.model.max_events))),
            jnp.asarray(rs.uniform(0.05, 0.3, (B, cfg.model.max_events))),
        ], -1).astype(jnp.float32),
        box_valid=jnp.asarray(valid), label_valid=jnp.asarray(valid),
    )
    batch = Batch(
        feats=jnp.asarray(rs.randn(B, T, F, 1), jnp.float32),
        pad_mask=pad, targets=tgts,
        strong=jnp.ones((B,), bool), weak=jnp.zeros((B,), bool),
    )
    key = jax.random.PRNGKey(1)
    if args.semi:
        # mirror tools/profile_semi.py: DCASE layout, labeled first half
        n_labeled = B // 2
        pos = np.arange(B)
        strong = jnp.asarray(pos < B // 4)
        weakm = jnp.asarray((pos >= B // 4) & (pos < n_labeled))
        unlabel = jnp.asarray(pos >= n_labeled)
        v = np.array(tgts.box_valid)  # np.asarray of a jax array is read-only
        v[n_labeled:] = False
        tgts = tgts._replace(box_valid=jnp.asarray(v), label_valid=jnp.asarray(v))
        thr = jnp.full((cfg.model.num_classes,), 0.5, jnp.float32)
        sfeats = batch.feats + 0.01
        ema = jax.tree.map(jnp.copy, state.params)
        sstep = make_semi_train_step(model, wd, cfg, tx, n_labeled=n_labeled)

        def step_fn(state, ema, i):
            return sstep(state, ema, batch.feats, sfeats, pad, tgts, strong,
                         weakm, unlabel, thr, jax.random.fold_in(key, i),
                         jnp.asarray(True))

        for i in range(3):
            state, ema, m, _ = step_fn(state, ema, i)
        _ = float(m["loss"])
        with jax.profiler.trace(args.out):
            for i in range(args.iters):
                state, ema, m, _ = step_fn(state, ema, 100 + i)
            _ = float(m["loss"])
    else:
        step = make_train_step(model, wd, cfg, tx)
        for i in range(3):  # compile + warm outside the trace
            state, m = step(state, batch, jax.random.fold_in(key, i))
        _ = float(m["loss"])

        with jax.profiler.trace(args.out):
            for i in range(args.iters):
                state, m = step(state, batch, jax.random.fold_in(key, 100 + i))
            _ = float(m["loss"])
    print(f"trace written to {args.out} (dtype={cfg.model.compute_dtype}, "
          f"{args.iters} steps, semi={args.semi})")


if __name__ == "__main__":
    main()
