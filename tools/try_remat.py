#!/usr/bin/env python
"""A/B rematerialization policies on the flagship train step.

The round-2 profile put the backward at ~65 % of the step (fwd 7.0 +
criterion 1.1 + bwd ~18 + opt 1.6 ms at batch 64) with ~5.8 ms/step
attributable to dropout-mask save/apply traffic (CLAUDE.md).  This tool
times the full train step with jax.checkpoint policies wrapped around the
model forward, which trade HBM activation traffic (the usual TPU
bottleneck) for recompute FLOPs:

  * baseline  — no remat (XLA's own fusion/DCE only);
  * dots      — checkpoint_dots_with_no_batch_dims: save matmul outputs,
                recompute elementwise chains (dropout masks regenerate from
                the PRNG in bwd instead of being stored);
  * nothing   — nothing_saveable: full recompute of the forward in bwd.

A fourth variant, ``dropmask``, saves everything EXCEPT checkpoint-named
dropout keep masks (see ops/dropout.py) — the surgical version of the
"regenerate dropout in bwd" idea.

MEASURED (TPU v5e, batch 64, bf16, 2026-08-17):
  baseline   28.69 ms/step  (2231 clips/s)
  dropmask   29.13 ms/step  (2197 clips/s)   <- neutral: XLA ALREADY
             rematerializes dropout masks (baseline bwd fusions take the
             threefry keys as inputs in the xplane trace)
  dots       36.39 ms/step  (1759 clips/s)   <- recompute > saved traffic
  nothing    37.56 ms/step  (1704 clips/s)
Conclusion: the step is compute-bound and remat in any form does not pay;
see the roofline analysis in README.md.

Methodology per CLAUDE.md: chain ITERS data-dependent steps, fetch one
scalar (block_until_ready lies on this backend).
Usage: python tools/try_remat.py [--batch 64] [--iters 20]
"""
from __future__ import annotations

import argparse
import dataclasses
import functools
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
    ap.add_argument("--iters", default=20, type=int)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from sound_event_detection_transformer_tpu.utils.compilation_cache import (
        enable as enable_compilation_cache,
    )
    enable_compilation_cache()
    from __graft_entry__ import _flagship_cfg
    from sound_event_detection_transformer_tpu.engine import Batch, TrainState
    from sound_event_detection_transformer_tpu.models import (
        build_model, empty_targets, set_criterion, total_loss,
    )
    from sound_event_detection_transformer_tpu.parallel.optim import make_optimizer

    import optax

    B, ITERS = args.batch, args.iters
    cfg = _flagship_cfg(tiny=args.tiny)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, batch_size=B),
        model=dataclasses.replace(cfg.model, compute_dtype=args.compute_dtype),
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
    state0 = TrainState(
        variables["params"], variables.get("frozen", {}),
        tx.init(variables["params"]), jnp.asarray(0),
    )

    rs = np.random.RandomState(0)
    M = cfg.model.max_events
    valid = rs.rand(B, M) < 0.3
    valid[:, 0] = True
    tgts = empty_targets(B, M, cfg.features.max_len_seconds)._replace(
        labels=jnp.asarray(rs.randint(0, cfg.model.num_classes, (B, M)), jnp.int32),
        boxes=jnp.stack(
            [jnp.asarray(rs.uniform(0.2, 0.8, (B, M))),
             jnp.asarray(rs.uniform(0.05, 0.3, (B, M)))], -1
        ).astype(jnp.float32),
        box_valid=jnp.asarray(valid), label_valid=jnp.asarray(valid),
    )
    feats = jnp.asarray(rs.randn(B, T, F, 1), jnp.float32)
    batch = Batch(feats=feats, pad_mask=pad, targets=tgts,
                  strong=jnp.ones((B,), bool), weak=jnp.zeros((B,), bool))

    from sound_event_detection_transformer_tpu.ops.dropout import (
        remat_dropout_policy,
    )

    pols = {
        "baseline": None,
        "dropmask": remat_dropout_policy(),
        "dots": jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
        "nothing": jax.checkpoint_policies.nothing_saveable,
    }

    def make_step(policy, with_remat):
        def fwd(params, frozen, feats, pad, r_drop):
            return model.apply({"params": params, "frozen": frozen},
                               feats, pad, False, rngs={"dropout": r_drop})

        fwd_maybe = (
            jax.checkpoint(fwd, policy=policy) if with_remat else fwd
        )

        @jax.jit
        def step(state, batch, rng):
            r_drop, r_match = jax.random.split(rng)

            def loss_fn(params):
                out = fwd_maybe(params, state.frozen, batch.feats,
                                batch.pad_mask, r_drop)
                losses, _ = set_criterion(
                    out, batch.targets, batch.strong, batch.weak,
                    cfg.model, cfg.loss, rng=r_match,
                )
                return total_loss(losses, wd)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, state.frozen, opt_state,
                              state.step + 1), loss

        return step

    for name, pol in pols.items():
        step = make_step(pol, with_remat=pol is not None)

        def run():
            s = state0
            key = jax.random.PRNGKey(1)
            loss = None
            for i in range(ITERS):
                key, k = jax.random.split(key)
                s, loss = step(s, batch, k)
            return float(loss)  # honest barrier

        run()  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ms = np.median(ts) / ITERS * 1000
        print(f"{name:10s}: {ms:7.2f} ms/step  "
              f"({B / (np.median(ts) / ITERS):7.0f} clips/s)")


if __name__ == "__main__":
    main()
