"""On-device SP-SEDT patch extraction: crop + bilinear resize in-graph.

TPU-native replacement for the host path (``data.transforms.extract_patches``
/ ``resize_patch``, mirroring reference BoxTransforms.py:315-360): instead of
cropping/resizing 10 patches per clip on the host and shipping a second
[B, P, 128, 64] tensor over the interconnect every step (~65 MB at the
reference pretrain recipe batch 200 — measured to dominate the step), the
patch boxes ride along as the (already-transferred) dense targets and the
crops are gathered from ``feats`` inside the jitted train step.

Numerics: the host version min/max-normalizes each patch before the bilinear
resample and denormalizes after (PIL-parity bookkeeping); bilinear
interpolation is affine-equivariant, so that round-trip cancels exactly and
is omitted here.  Gather indices derive from traced box values — keeping
them traced (not constant-folded) is required for sane XLA-TPU compile times
(see CLAUDE.md).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_patches_device(
    feats: jnp.ndarray,  # [B, T, F, 1] (post-transform, padded)
    boxes: jnp.ndarray,  # [B, P, 2] (center, length) normalized to T
    out_t: int = 128,
    out_f: int = 64,
) -> jnp.ndarray:
    """[B, P, out_t, out_f, 1] patches, bit-matching the host pipeline.

    Host semantics reproduced (transforms.py extract_patches):
      * ``s = int((c - l/2) * T)``, ``e = int((c + l/2) * T)`` (truncation ==
        floor for the non-negative boxes the samplers produce);
      * empty-patch guard ``s >= e -> (max(0, s-1), min(T, e+1))``;
      * align_corners=False bilinear along T; F handled the same way (a
        no-op when ``F == out_f``, the URBAN-SED/DCASE geometry).
    """
    B, T, F, _ = feats.shape
    x = feats[..., 0]  # [B, T, F]
    c, l = boxes[..., 0], boxes[..., 1]
    s = jnp.floor((c - l / 2.0) * T).astype(jnp.int32)  # [B, P]
    e = jnp.floor((c + l / 2.0) * T).astype(jnp.int32)
    empty = s >= e
    s = jnp.where(empty, jnp.maximum(0, s - 1), s)
    e = jnp.where(empty, jnp.minimum(T, e + 1), e)
    tp = (e - s).astype(feats.dtype)  # [B, P] patch lengths

    j = jnp.arange(out_t, dtype=feats.dtype)
    yi = (j[None, None, :] + 0.5) * tp[..., None] / out_t - 0.5  # [B, P, out_t]
    tmax = tp[..., None] - 1.0
    y0 = jnp.clip(jnp.floor(yi), 0.0, tmax)
    wy = jnp.clip(yi - y0, 0.0, 1.0)[..., None]  # [B, P, out_t, 1]
    y0i = y0.astype(jnp.int32)
    y1i = jnp.clip(y0i + 1, 0, tmax.astype(jnp.int32))
    y0i = y0i + s[..., None]
    y1i = y1i + s[..., None]

    def gather_rows(xb, idx):  # [T, F], [P, out_t] -> [P, out_t, F]
        return xb[idx]

    r0 = jax.vmap(gather_rows)(x, y0i)
    r1 = jax.vmap(gather_rows)(x, y1i)
    out = r0 * (1.0 - wy) + r1 * wy  # [B, P, out_t, F]

    if F != out_f:  # generic geometry fallback (static 64-entry index maps)
        xi = (jnp.arange(out_f, dtype=feats.dtype) + 0.5) * F / out_f - 0.5
        x0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, F - 1)
        x1 = jnp.clip(x0 + 1, 0, F - 1)
        wx = jnp.clip(xi - x0.astype(feats.dtype), 0.0, 1.0)
        out = out[..., x0] * (1.0 - wx) + out[..., x1] * wx
    return out[..., None]
