"""Optimizer/schedule tests (reference train_sedt.py:269-315 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np

from sound_event_detection_transformer_tpu.config import TrainConfig
from sound_event_detection_transformer_tpu.parallel.optim import (
    cosine_lr,
    make_optimizer,
    step_lr,
)


def _lr_of_update(tx, params, opt_state, step_grads):
    """Apply a unit gradient and read back the effective LR magnitude."""
    updates, opt_state = tx.update(step_grads, opt_state, params)
    return float(jnp.abs(updates["w"])), opt_state


def test_step_lr_drops_at_epoch_boundary():
    sched = step_lr(1e-4, lr_drop=2, steps_per_epoch=10)
    assert float(sched(0)) == 1e-4
    assert float(sched(19)) == 1e-4  # still epoch 1
    assert np.isclose(float(sched(20)), 1e-5)  # epoch 2 = lr_drop


def test_adjust_lr_false_keeps_lr_constant():
    """--adjust_lr (store_false) disables the scheduler step in the
    reference (train_sedt.py:315); here the schedule itself goes constant."""
    params = {"w": jnp.zeros(())}
    grads = {"w": jnp.ones(())}
    tcfg_on = TrainConfig(lr=1e-4, lr_drop=1, adjust_lr=True)
    tcfg_off = TrainConfig(lr=1e-4, lr_drop=1, adjust_lr=False)

    for tcfg, expect_drop in ((tcfg_on, True), (tcfg_off, False)):
        tx = make_optimizer(params, tcfg, steps_per_epoch=1)
        opt_state = tx.init(params)
        lrs = []
        for _ in range(3):  # 3 steps = 3 epochs at steps_per_epoch=1
            lr, opt_state = _lr_of_update(tx, params, opt_state, grads)
            lrs.append(lr)
        if expect_drop:
            assert lrs[1] < lrs[0] * 0.5, lrs
        else:
            assert np.allclose(lrs, lrs[0], rtol=1e-5), lrs


def test_cosine_warmup_and_decay():
    sched = cosine_lr(1e-3, total_epochs=10, steps_per_epoch=1,
                      warmup_epochs=2.0)
    assert float(sched(0)) == 0.0
    assert float(sched(1)) < 1e-3
    mid, end = float(sched(6)), float(sched(10))
    assert end < mid < 1e-3
