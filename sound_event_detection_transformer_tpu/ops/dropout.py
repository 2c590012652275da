"""Dropout with a remat-nameable keep mask.

Replaces ``flax.linen.Dropout`` (reference: torch's inline
``nn.Dropout`` uses, sedt/transformer.py:165-175,255-270).  Functionally
identical — same bernoulli keep mask, inverted scaling — but the mask is
tagged with :func:`jax.ad_checkpoint.checkpoint_name` so a surrounding
``jax.checkpoint(..., policy=save_anything_except_these_names(DROPOUT_MASK))``
regenerates masks from the PRNG during the backward pass instead of
saving them to HBM.

Round-2/3 profiling (CLAUDE.md): dropout costs ~5.8 ms of the 28.7 ms
train step, and the cost is mask materialization/apply/save traffic — the
threefry generation itself is 0.3-0.5 ms.  Blanket rematerialization
(``checkpoint_dots*`` / ``nothing_saveable``) is a measured LOSS on this
compute-bound step (tools/try_remat.py: 28.7 -> 35.8 / 36.6 ms); the
name-based policy keeps every other residual saved and recomputes only
the masks.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

DROPOUT_MASK = "dropout_mask"


def remat_dropout_policy():
    """Checkpoint policy: save every residual except dropout keep masks."""
    return jax.checkpoint_policies.save_anything_except_these_names(DROPOUT_MASK)


def dropout(
    x: jnp.ndarray,
    rate: float,
    rng: Optional[jax.Array],
    deterministic: bool,
) -> jnp.ndarray:
    """Inverted dropout with a checkpoint-named keep mask."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    keep = checkpoint_name(keep, DROPOUT_MASK)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


class Dropout(nn.Module):
    """Drop-in for ``nn.Dropout`` drawing from the ``"dropout"`` RNG stream."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        return dropout(x, self.rate, self.make_rng("dropout"), False)
