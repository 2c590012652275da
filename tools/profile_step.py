#!/usr/bin/env python
"""Component-level honest timing of the flagship train step on this device.

Methodology (CLAUDE.md): `jax.block_until_ready` lies on the axon backend, and
each dispatch+fetch pays ~40 ms tunnel latency, so every component is timed by
chaining ITERS data-dependent iterations inside ONE jitted `lax.scan` and
fetching a scalar once.  Numbers are amortized ms per iteration.

Usage: python tools/profile_step.py [--compute_dtype bfloat16] [--batch 64]
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


def timed(fn, *args, iters_outer=3):
    """Median wall time of fn(*args) with a data-dependent scalar fetch."""
    out = fn(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # warm + barrier
    ts = []
    for _ in range(iters_outer):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compute_dtype", default="float32",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--batch", default=64, type=int)
    ap.add_argument("--iters", default=20, type=int)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny geometry (CPU sanity check of the harness)")
    ap.add_argument("--dropout", default=None, type=float,
                    help="override model dropout (e.g. 0 to cost the RNG)")
    ap.add_argument("--step_only", action="store_true",
                    help="only time the full train step")
    args = ap.parse_args()

    from sound_event_detection_transformer_tpu.utils.compilation_cache import (
        enable as enable_compilation_cache,
    )
    enable_compilation_cache()
    from __graft_entry__ import _flagship_cfg
    from sound_event_detection_transformer_tpu.engine import (
        Batch, TrainState, make_train_step,
    )
    from sound_event_detection_transformer_tpu.models import (
        build_model, empty_targets, set_criterion, total_loss,
    )
    from sound_event_detection_transformer_tpu.parallel.optim import make_optimizer

    B, ITERS = args.batch, args.iters
    cfg = _flagship_cfg(tiny=args.tiny)
    mkw = dict(compute_dtype=args.compute_dtype)
    if args.dropout is not None:
        mkw["dropout"] = args.dropout
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=B),
        model=dataclasses.replace(cfg.model, **mkw),
    )
    model, wd = build_model(cfg)
    T, F = cfg.model.max_frames, cfg.model.n_mels

    rng = jax.random.PRNGKey(0)
    feats0 = jnp.zeros((B, T, F, 1), jnp.float32)
    pad = jnp.zeros((B, T), bool)
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
    feats = jnp.asarray(rs.randn(B, T, F, 1), jnp.float32)
    batch = Batch(feats=feats, pad_mask=pad, targets=tgts,
                  strong=jnp.ones((B,), bool), weak=jnp.zeros((B,), bool))

    results = {}

    # --- full train step: ITERS chained steps in one jit ---
    step = make_train_step(model, wd, cfg, tx)

    # chain ITERS steps via python loop over the jitted step (async dispatch
    # amortizes the tunnel latency; final scalar fetch is the barrier).
    # NB the step donates its state arg, so state must thread through calls.
    st = {"state": state}

    def full():
        key = jax.random.PRNGKey(1)
        s = st["state"]
        for i in range(ITERS):
            s, m = step(s, batch, jax.random.fold_in(key, i))
        st["state"] = s
        return m["loss"]

    t = timed(full)
    results["train_step"] = t / ITERS
    if args.step_only:
        print(f"batch={B} dtype={args.compute_dtype} dropout={args.dropout}")
        v = results["train_step"]
        print(f"  train_step {v * 1e3:8.2f} ms  ({B / v:8.0f} clips/s)")
        return
    # the step donated the original state buffers; use the live ones for the
    # component timings below
    params, frozen = st["state"].params, st["state"].frozen

    # --- forward only (train mode, no dropout rng needed in eval) ---
    @jax.jit
    def fwd_scan(params, feats):
        def body(f, _):
            out = model.apply({"params": params, "frozen": frozen}, f, pad, True)
            f = f + 1e-6 * out["pred_boxes"].sum()  # data dependence
            return f, out["pred_logits"].sum()
        f, s = jax.lax.scan(body, feats, None, length=ITERS)
        return s.sum()

    results["forward_eval"] = timed(fwd_scan, params, feats) / ITERS

    # --- forward + criterion (no grad) ---
    @jax.jit
    def fwd_loss_scan(params, feats):
        def body(f, _):
            out = model.apply({"params": params, "frozen": frozen}, f, pad, True)
            losses, _ = set_criterion(
                out, tgts, batch.strong, batch.weak, cfg.model, cfg.loss,
                rng=jax.random.PRNGKey(0))
            l = total_loss(losses, wd)
            return f + 1e-6 * l, l
        f, s = jax.lax.scan(body, feats, None, length=ITERS)
        return s.sum()

    results["forward_plus_criterion"] = timed(fwd_loss_scan, params, feats) / ITERS

    # --- matcher alone at the step's (1+A)*B problem batch shape ---
    from sound_event_detection_transformer_tpu.ops.matcher import assign
    A = cfg.model.dec_layers  # final + aux layers solved jointly
    NP = A * B
    Q, M = cfg.model.num_queries, cfg.model.max_events
    cost = jnp.asarray(rs.rand(NP, Q, M), jnp.float32)
    cvalid = jnp.asarray(rs.rand(NP, M) < 0.3)

    @jax.jit
    def match_scan(cost):
        def body(c, _):
            tq, qm, qt, tm = assign(c, cvalid)
            return c + 1e-6 * tq.sum(), tq.sum()
        c, s = jax.lax.scan(body, cost, None, length=ITERS)
        return s.sum()

    results["matcher_batch"] = timed(match_scan, cost) / ITERS

    # --- grad only (fwd+bwd, no optimizer) and update only ---
    from sound_event_detection_transformer_tpu.models import (
        set_criterion as _set_criterion,
    )

    def _loss(params, feats):
        out = model.apply(
            {"params": params, "frozen": frozen}, feats, pad, True)
        losses, _ = _set_criterion(
            out, tgts, batch.strong, batch.weak, cfg.model, cfg.loss,
            rng=jax.random.PRNGKey(0))
        return total_loss(losses, wd)

    @jax.jit
    def grad_scan(params, feats):
        def body(f, _):
            l, g = jax.value_and_grad(_loss)(params, f)
            # fold EVERY grad leaf into the output: an unused grad tree is
            # dead-code-eliminated and the "backward" silently vanishes
            gsum = sum(x.sum().astype(jnp.float32) for x in jax.tree.leaves(g))
            return f + 1e-6 * l, l + 1e-30 * gsum
        f, s = jax.lax.scan(body, feats, None, length=ITERS)
        return s.sum()

    results["forward_backward"] = timed(grad_scan, params, feats) / ITERS

    grads = jax.jit(jax.grad(_loss))(params, feats)
    opt_state = tx.init(params)

    @jax.jit
    def update_scan(params, opt_state, grads):
        def body(carry, _):
            p, o = carry
            updates, o = tx.update(grads, o, p)
            import optax as _optax
            p = _optax.apply_updates(p, updates)
            return (p, o), jax.tree.leaves(updates)[0].sum()
        (p, o), s = jax.lax.scan(body, (params, opt_state), None, length=ITERS)
        return s.sum()

    try:
        results["optimizer_update"] = timed(update_scan, params, opt_state, grads) / ITERS
    except Exception as e:
        print("optimizer-only timing skipped:", e)

    # --- backbone alone (flax method= dispatch into the submodule) ---
    cdt = jnp.dtype(cfg.model.compute_dtype)

    @jax.jit
    def bb_scan(params, feats):
        def body(f, _):
            y = model.apply(
                {"params": params, "frozen": frozen}, f.astype(cdt),
                method=lambda m, x: m.backbone(x),
            )
            return f + 1e-6 * y.mean().astype(f.dtype), y.mean()
        f, s = jax.lax.scan(body, feats, None, length=ITERS)
        return s.sum()

    try:
        results["backbone"] = timed(bb_scan, params, feats) / ITERS
    except Exception as e:  # submodule dispatch is best-effort
        print("backbone-only timing skipped:", e)

    results["criterion_only"] = (
        results["forward_plus_criterion"] - results["forward_eval"])
    results["backward_plus_update"] = (
        results["train_step"] - results["forward_plus_criterion"])
    print(f"batch={B} dtype={args.compute_dtype} iters={ITERS}")
    for k, v in results.items():
        print(f"  {k:26s} {v * 1e3:8.2f} ms  ({B / v:8.0f} clips/s)")


if __name__ == "__main__":
    main()
