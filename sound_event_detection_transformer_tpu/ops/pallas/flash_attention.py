"""Blockwise (flash-style) attention kernel in Pallas for TPU.

SEDT's encoder attention is tiny after the ResNet's ~16x time downsampling, but
the framework is designed so longer audio only changes a config value
(SURVEY.md §5 "long-context").  This kernel implements the online-softmax
streaming formulation: the [Sq, Sk] score matrix is never materialized in HBM;
K/V are consumed block-by-block with running (max, sum, accumulator) state in
VMEM, so memory is O(Sq * D) and the matmuls tile onto the MXU.

Layout: q/k/v are [BH, S, D] (batch*heads flattened).  D is padded to the
128-lane tile outside the kernel (zero-padding is exact: padded query/key dims
contribute 0 to scores, padded value dims produce sliced-off zeros).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - TPU-only import
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
NEG_INF = -1.0e30


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int, sk: int, scale: float):
    """One (bh, q_block) program: stream K/V blocks with online softmax."""
    q = q_ref[0].astype(jnp.float32) * scale  # [block_q, D]
    block_q = q.shape[0]
    d = q.shape[1]
    num_k_blocks = pl.cdiv(sk, block_k)

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk]
        b = bias_ref[0, :, pl.ds(kb * block_k, block_k)].astype(jnp.float32)
        s = s + b
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # [bq, bk]
        alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
        l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((block_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((block_q, d), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int, value: float = 0.0) -> jnp.ndarray:
    size = x.shape[axis]
    target = -(-size // mult) * mult
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=value)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret"))
def flash_attention_bh(
    q: jnp.ndarray,  # [BH, Sq, D]
    k: jnp.ndarray,  # [BH, Sk, D]
    v: jnp.ndarray,  # [BH, Sk, D]
    bias: Optional[jnp.ndarray] = None,  # [BH, Sq, Sk] additive
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over flattened batch*heads.  Returns [BH, Sq, D]."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    scale = 1.0 / float(d) ** 0.5
    if bias is None:
        bias = jnp.zeros((bh, sq, sk), dtype=jnp.float32)
    else:
        bias = jnp.broadcast_to(bias, (bh, sq, sk)).astype(jnp.float32)

    # pad: D to 128 lanes, Sq to block_q, Sk to block_k.  Padded K positions are
    # masked with NEG_INF bias so they contribute exp(-inf) = 0.
    qp = _pad_to(_pad_to(q, 2, 128), 1, block_q)
    kp = _pad_to(_pad_to(k, 2, 128), 1, block_k)
    vp = _pad_to(_pad_to(v, 2, 128), 1, block_k)
    bp = _pad_to(_pad_to(bias, 2, block_k, value=NEG_INF), 1, block_q)

    sq_p, d_p = qp.shape[1], qp.shape[2]
    sk_p = kp.shape[1]
    grid = (bh, sq_p // block_q)

    kernel = functools.partial(_flash_kernel, block_k=block_k, sk=sk_p, scale=scale)
    mem = pltpu.VMEM if _HAS_PLTPU else None
    spec_kwargs = {"memory_space": mem} if mem is not None else {}
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d_p), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_p), lambda b, i: (b, i, 0), **spec_kwargs),
            pl.BlockSpec((1, sk_p, d_p), lambda b, i: (b, 0, 0), **spec_kwargs),
            pl.BlockSpec((1, sk_p, d_p), lambda b, i: (b, 0, 0), **spec_kwargs),
            pl.BlockSpec((1, block_q, sk_p), lambda b, i: (b, i, 0), **spec_kwargs),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_p), lambda b, i: (b, i, 0), **spec_kwargs),
        interpret=interpret,
    )(qp, kp, vp, bp)
    return out[:, :sq, :d]


def _reference_attention(q, k, v, bias):
    """The plain-XLA attention math (f32 softmax), used by the custom VJP to
    recompute activations in the backward.  Must mirror
    ``ops.attention.scaled_dot_attention``'s non-flash branch exactly so
    training through the flash kernel gets the XLA path's gradients."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_attention_vjp(q, k, v, bias, interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    qf = q.reshape(b * h, sq, d)
    kf = k.reshape(b * h, sk, d)
    vf = v.reshape(b * h, sk, d)
    bf = jnp.broadcast_to(bias, (b, h, sq, sk)).reshape(b * h, sq, sk)
    out = flash_attention_bh(qf, kf, vf, bf, interpret=interpret)
    return out.reshape(b, h, sq, d)


def _flash_fwd(q, k, v, bias, interpret):
    # Recompute-style: save only the inputs (O(S*D) like the forward), not
    # the [Sq, Sk] probabilities.
    return _flash_attention_vjp(q, k, v, bias, interpret), (q, k, v, bias)


def _flash_bwd(interpret, res, g):
    # Backward recomputes attention through the XLA formulation and
    # differentiates it — gradients are exactly the non-flash path's
    # (pinned by tests/test_flash_grad.py).  This materializes the score
    # matrix for the backward only, i.e. the same peak memory as training
    # through the XLA path; a blockwise Pallas backward is a further
    # optimization, not a correctness requirement.
    q, k, v, bias = res
    _, pullback = jax.vjp(_reference_attention, q, k, v, bias)
    return pullback(g)


_flash_attention_vjp.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, H, Sq, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Sq, Sk]
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, H, S, D] wrapper matching ``scaled_dot_attention``'s signature.

    Differentiable: a ``custom_vjp`` recomputes the attention in the backward
    pass (XLA formulation) so flash dispatch is safe inside training steps."""
    if bias is None:
        bias = jnp.zeros((1, 1, 1, 1), jnp.float32)
    return _flash_attention_vjp(q, k, v, bias, interpret)
