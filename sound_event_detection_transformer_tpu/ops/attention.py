"""Fused scaled-dot-product attention: XLA path + Pallas flash kernel.

The reference relies on ``torch.nn.MultiheadAttention``
(/root/reference/sedt/transformer.py:160,220-221).  On TPU, attention over
SEDT's short post-backbone sequences (~31-62 tokens) fuses completely inside
XLA, so the default path is plain ``jnp`` einsums.  For long-audio scaling the
blockwise (flash-style) Pallas kernel in ``pallas/flash_attention.py`` is used
automatically once the KV sequence length crosses ``FLASH_MIN_SEQ`` on TPU —
longer clips are a config change, not a redesign (SURVEY.md §2.2).

Masks are additive f32 biases (0 = keep, -1e9 = drop), the XLA-friendly
formulation of torch's ``key_padding_mask``/``attn_mask`` booleans.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

NEG_INF_BIAS = -1.0e9
FLASH_MIN_SEQ = 512


def make_key_padding_bias(key_padding_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, Sk] bool (True = padded) -> additive bias [B, 1, 1, Sk]."""
    return jnp.where(key_padding_mask, NEG_INF_BIAS, 0.0)[:, None, None, :].astype(
        jnp.float32
    )


def scaled_dot_attention(
    q: jnp.ndarray,  # [B, H, Sq, D]
    k: jnp.ndarray,  # [B, H, Sk, D]
    v: jnp.ndarray,  # [B, H, Sk, D]
    bias: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Sq, Sk]
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention core.  Returns [B, H, Sq, D].

    Softmax runs in float32 regardless of input dtype (bfloat16-safe).
    """
    if use_flash is None:
        use_flash = (
            k.shape[-2] >= FLASH_MIN_SEQ
            and dropout_rate == 0.0
            and jax.default_backend() == "tpu"
        )
    if use_flash:
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, bias)

    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        from .dropout import DROPOUT_MASK

        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        keep = checkpoint_name(keep, DROPOUT_MASK)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=jnp.float32).astype(
        v.dtype
    )
