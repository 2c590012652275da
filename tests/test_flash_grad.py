"""Gradient equivalence of the Pallas flash-attention path vs the XLA path.

``scaled_dot_attention`` auto-dispatches to the flash kernel for long
sequences on TPU — including *training* runs with ``--dropout 0`` — so the
kernel must be differentiable and its gradients must match the XLA
formulation.  The custom VJP recomputes attention in the backward
(flash_attention.py:_flash_bwd); pinned here at S >= FLASH_MIN_SEQ with
unaligned shapes (exercises the padding) and a key-padding bias.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_transformer_tpu.ops.attention import (
    FLASH_MIN_SEQ,
    make_key_padding_bias,
    scaled_dot_attention,
)
from sound_event_detection_transformer_tpu.ops.pallas.flash_attention import (
    flash_attention,
)


def _inputs(with_bias: bool, seed=0, b=1, h=2, s=None, d=40):
    s = s or FLASH_MIN_SEQ + 8  # unaligned: exercises block padding
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(rs.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(rs.randn(b, h, s, d), jnp.float32)
    bias = None
    if with_bias:
        pad = jnp.asarray(rs.rand(b, s) < 0.2)
        bias = make_key_padding_bias(pad)
    return q, k, v, bias


@pytest.mark.parametrize("with_bias", [False, True])
def test_flash_grads_match_xla(with_bias):
    q, k, v, bias = _inputs(with_bias)
    w = jnp.asarray(np.random.RandomState(1).randn(*q.shape), jnp.float32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, bias, interpret=True) * w).sum()

    def loss_xla(q, k, v):
        return (
            scaled_dot_attention(q, k, v, bias, use_flash=False) * w
        ).sum()

    out_f = flash_attention(q, k, v, bias, interpret=True)
    out_x = scaled_dot_attention(q, k, v, bias, use_flash=False)
    np.testing.assert_allclose(out_f, out_x, rtol=2e-5, atol=2e-5)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=2e-4)


def test_flash_grad_under_jit():
    q, k, v, bias = _inputs(True, seed=3)

    @jax.jit
    def g(q, k, v):
        return jax.grad(
            lambda q: flash_attention(q, k, v, bias, interpret=True).sum()
        )(q)

    assert np.isfinite(np.asarray(g(q, k, v))).all()
