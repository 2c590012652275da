"""Optimizer assembly: AdamW param groups, freeze policy, LR schedules, EMA.

Reference behavior being re-expressed:
  * AdamW with two param groups — backbone at ``lr_backbone``, the rest at
    ``lr`` (/root/reference/train_sedt.py:234-240,269-270);
  * freeze policy — backbone stem+layer1 never train; only conv0/layer2/3/4
    do (backbone.py:61).  FrozenBN stats live in the ``frozen`` collection and
    never reach the optimizer at all;
  * StepLR decay at ``lr_drop`` with gamma 0.1 (train_sedt.py:271, torch
    default), or cosine for the semi-supervised system (utils.py:19-43);
  * global-norm gradient clipping at 0.1 (engine.py:78);
  * EMA mean teacher — in JAX the teacher is simply a second param tree
    updated as ``ema = d * ema + (1 - d) * params`` (replaces the in-place
    shadow/backup swap dance, utils.py:46-81).
"""
from __future__ import annotations

import math
import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig

_TRAINABLE_BACKBONE = re.compile(r"^backbone/(conv0|layer[234]_)")


def param_label(path_str: str) -> str:
    """'frozen' | 'backbone' | 'main' for a flattened param path."""
    if path_str.startswith("backbone/"):
        return "backbone" if _TRAINABLE_BACKBONE.match(path_str) else "frozen"
    return "main"


def _path_str(path) -> str:
    return "/".join(p.key if hasattr(p, "key") else str(p) for p in path)


def label_tree(params: Any) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: param_label(_path_str(path)), params
    )


def step_lr(base_lr: float, lr_drop: int, steps_per_epoch: int, gamma: float = 0.1):
    """torch StepLR semantics in steps: lr * gamma^(epoch // lr_drop)."""

    def sched(step):
        epoch = step // max(1, steps_per_epoch)
        return base_lr * gamma ** (epoch // lr_drop)

    return sched


def cosine_lr(base_lr: float, total_epochs: int, steps_per_epoch: int,
              min_ratio: float = 0.0, warmup_epochs: float = 0.0):
    """Cosine decay over epochs with optional linear warmup
    (reference get_cosine_schedule_with_warmup, utils.py:19-43; the semi
    trainer uses zero warmup, train_ss_sedt.py:160)."""

    def sched(step):
        epoch = step / max(1, steps_per_epoch)
        if warmup_epochs > 0:
            warm = jnp.clip(epoch / warmup_epochs, 0.0, 1.0)
        else:
            warm = 1.0
        t = jnp.clip(
            (epoch - warmup_epochs) / max(1, total_epochs - warmup_epochs), 0.0, 1.0
        )
        cos = min_ratio + (1 - min_ratio) * 0.5 * (1 + jnp.cos(math.pi * t))
        return base_lr * warm * cos

    return sched


def make_optimizer(
    params: Any,
    tcfg: TrainConfig,
    steps_per_epoch: int,
    schedule: str = "step",
    fixed_lr: Optional[float] = None,
) -> optax.GradientTransformation:
    """Masked multi-group AdamW with clip-by-global-norm.

    ``fixed_lr`` implements the fine-tune stage's frozen LR 1e-5
    (train_sedt.py:307-308).
    """

    def make_sched(base):
        if fixed_lr is not None:
            return lambda _: fixed_lr
        if not tcfg.adjust_lr:
            # --adjust_lr=False: the reference never steps the scheduler
            # (train_sedt.py:315, train_ss_sedt.py:206) — constant base LR
            return lambda _: base
        if schedule == "cosine":
            return cosine_lr(base, tcfg.epochs, steps_per_epoch)
        return step_lr(base, tcfg.lr_drop, steps_per_epoch, tcfg.lr_drop_gamma)

    def adamw(base_lr):
        return optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(tcfg.weight_decay),
            optax.scale_by_learning_rate(make_sched(base_lr)),
        )

    labels = label_tree(params)
    tx = optax.multi_transform(
        {
            "main": adamw(tcfg.lr),
            "backbone": adamw(tcfg.lr_backbone),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    tx = optax.chain(optax.clip_by_global_norm(tcfg.clip_max_norm), tx)
    if tcfg.accumulating_gradient_steps > 1:
        # gradient accumulation (reference engine.py:76-80); optax MultiSteps
        # averages the accumulated grads rather than summing - equivalent up
        # to an lr rescale
        tx = optax.MultiSteps(tx, tcfg.accumulating_gradient_steps)
    return tx


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """Mean-teacher EMA step (reference utils.py:58-62)."""
    return jax.tree.map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
