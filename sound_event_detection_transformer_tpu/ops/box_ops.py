"""1-D time-box operations (center, length) on [0, 1] normalized time.

The reference lifts 1-D boxes to 2-D with a dummy y in [0,1] so it can reuse
torchvision IoU (/root/reference/utilities/box_ops.py:9-57).  On TPU we keep
everything natively 1-D: for boxes spanning the full dummy axis, 2-D IoU/GIoU
degenerate exactly to their 1-D counterparts, so the numerics match.

All functions are pure jnp, batched over arbitrary leading dims, and safe under
jit/vmap/grad.
"""
from __future__ import annotations

import jax.numpy as jnp


def box_cl_to_se(x: jnp.ndarray) -> jnp.ndarray:
    """(center, length) -> (start, end).  Reference box_cxcywh_to_se (box_ops.py:16-19)."""
    c, l = x[..., 0], x[..., 1]
    return jnp.stack([c - l / 2, c + l / 2], axis=-1)


def box_se_to_cl(x: jnp.ndarray) -> jnp.ndarray:
    """(start, end) -> (center, length).  Reference box_xyxy_to_cxcywh (box_ops.py:22-25)."""
    s, e = x[..., 0], x[..., 1]
    return jnp.stack([(s + e) / 2, e - s], axis=-1)


def box_length(se: jnp.ndarray) -> jnp.ndarray:
    return se[..., 1] - se[..., 0]


def box_iou(se1: jnp.ndarray, se2: jnp.ndarray):
    """Pairwise IoU between two sets of (start, end) boxes.

    Args:
      se1: [..., N, 2], se2: [..., M, 2]
    Returns:
      (iou, union): each [..., N, M]

    Matches the reference's 2-D lift (box_ops.py:29-42) where the y-extent is
    the constant interval [0, 1]: areas equal lengths and the y-intersection is
    always 1.
    """
    len1 = box_length(se1)  # [..., N]
    len2 = box_length(se2)  # [..., M]
    lt = jnp.maximum(se1[..., :, None, 0], se2[..., None, :, 0])
    rb = jnp.minimum(se1[..., :, None, 1], se2[..., None, :, 1])
    inter = jnp.clip(rb - lt, 0.0)
    union = len1[..., :, None] + len2[..., None, :] - inter
    return inter / union, union


def generalized_box_iou(se1: jnp.ndarray, se2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 1-D GIoU (reference box_ops.py:45-56 with the [0,1] y-lift).

    GIoU = IoU - (hull - union) / hull, hull = smallest interval covering both.
    """
    iou, union = box_iou(se1, se2)
    lt = jnp.minimum(se1[..., :, None, 0], se2[..., None, :, 0])
    rb = jnp.maximum(se1[..., :, None, 1], se2[..., None, :, 1])
    hull = jnp.clip(rb - lt, 0.0)
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def elementwise_l1_se(se1: jnp.ndarray, se2: jnp.ndarray) -> jnp.ndarray:
    """Per-pair L1 distance in (start, end) space *including the constant y
    terms of the reference's 2-D lift*, which contribute 0 (|0-0| + |1-1|).

    se1, se2: [..., 2] aligned boxes -> [...] sums over the 2 coords.
    """
    return jnp.abs(se1 - se2).sum(-1)


def pairwise_l1_se(se1: jnp.ndarray, se2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise L1 cost matrix in (start, end) space.

    se1: [..., N, 2], se2: [..., M, 2] -> [..., N, M].
    Equivalent to the reference's torch.cdist over the xyxy lift
    (matcher.py:85) since the y coords are identical constants.
    """
    return jnp.abs(se1[..., :, None, :] - se2[..., None, :, :]).sum(-1)


def elementwise_giou_se(se1: jnp.ndarray, se2: jnp.ndarray) -> jnp.ndarray:
    """Aligned (non-pairwise) 1-D GIoU for matched pairs; se*: [..., 2]."""
    len1 = box_length(se1)
    len2 = box_length(se2)
    lt = jnp.maximum(se1[..., 0], se2[..., 0])
    rb = jnp.minimum(se1[..., 1], se2[..., 1])
    inter = jnp.clip(rb - lt, 0.0)
    union = len1 + len2 - inter
    iou = inter / jnp.maximum(union, 1e-9)
    hull_lt = jnp.minimum(se1[..., 0], se2[..., 0])
    hull_rb = jnp.maximum(se1[..., 1], se2[..., 1])
    hull = jnp.clip(hull_rb - hull_lt, 0.0)
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)
