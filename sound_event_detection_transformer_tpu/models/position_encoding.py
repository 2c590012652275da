"""Time-axis positional encodings.

The reference uses a sine embedding over the *time axis only* — the frequency
terms are commented out (/root/reference/sedt/position_encoding.py:33,37,42-46)
— with the position given by the normalized cumulative count of unmasked
frames, and ``num_pos_feats = hidden_dim`` (position_encoding.py:80).
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


def sine_position_encoding(
    pad_mask: jnp.ndarray,  # [B, T', F'] bool, True = padded
    num_pos_feats: int,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
) -> jnp.ndarray:
    """Returns [B, T', F', num_pos_feats] (reference position_encoding.py:27-47)."""
    not_mask = (~pad_mask).astype(jnp.float32)
    y = jnp.cumsum(not_mask, axis=1)  # over time
    if normalize:
        y = y / (y[:, -1:, :] + 1e-6) * scale
    i = jnp.arange(num_pos_feats)
    dim_t = temperature ** (2.0 * (i // 2).astype(jnp.float32) / num_pos_feats)
    pos = y[..., None] / dim_t  # [B, T', F', D]
    # even channels -> sin, odd -> cos (paired channels share dim_t)
    return jnp.where(i % 2 == 0, jnp.sin(pos), jnp.cos(pos))


class PositionEmbeddingLearned(nn.Module):
    """Learned absolute time embedding (sane 1-D re-design of the reference's
    2-D learned variant, position_encoding.py:50-75, which is a dead path)."""

    num_pos_feats: int = 256
    max_positions: int = 50

    @nn.compact
    def __call__(self, pad_mask: jnp.ndarray) -> jnp.ndarray:
        b, t, f = pad_mask.shape
        emb = nn.Embed(
            self.max_positions,
            self.num_pos_feats,
            embedding_init=nn.initializers.uniform(1.0),
            name="row_embed",
        )
        idx = jnp.clip(jnp.arange(t), 0, self.max_positions - 1)
        pos = emb(idx)  # [T', D]
        return jnp.broadcast_to(pos[None, :, None, :], (b, t, f, self.num_pos_feats))
