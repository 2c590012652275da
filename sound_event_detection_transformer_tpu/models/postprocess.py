"""Device-side post-processing: audio-tag fusion + box scaling.

Vectorized re-design of ``PostProcess`` (/root/reference/sedt/sedt.py:355-396).
The reference's per-sample python loops over best-query indices (at_m 2/3,
sedt.py:377-385) become masked tensor ops; everything runs under jit.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import box_ops


class PostProcessResult(NamedTuple):
    scores: jnp.ndarray  # [B, Q]
    labels: jnp.ndarray  # [B, Q] int32
    boxes: jnp.ndarray  # [B, Q, 2] (start, end) seconds, or (c,l) if is_semi


def postprocess(
    outputs: Dict[str, jnp.ndarray],
    target_sizes: jnp.ndarray,  # [B] seconds
    audio_tags: Optional[jnp.ndarray] = None,  # [B, C] 0/1
    at_m: int = 2,
    is_semi: bool = False,
    threshold: Optional[float] = 0.5,
) -> PostProcessResult:
    logits, out_bbox = outputs["pred_logits"], outputs["pred_boxes"]
    B, Q, _ = logits.shape
    prob = jax.nn.softmax(logits, axis=-1)  # [B, Q, C+1]
    cls_prob = prob[..., :-1]  # [B, C+1-1]

    if audio_tags is not None:
        tags = audio_tags.astype(cls_prob.dtype)
        # best query per class (sedt.py:371)
        best_q = cls_prob.argmax(axis=1)  # [B, C]
        is_best = jax.nn.one_hot(best_q, Q, axis=1, dtype=bool)  # [B, Q, C]
        if at_m == 1:
            cls_prob = cls_prob * tags[:, None, :]
        elif at_m == 2:
            # clamp each class's best-query prob up to threshold, then gate
            # by the clip tag (sedt.py:376-380)
            thr = 0.5 if threshold is None else threshold
            clamp = is_best & (cls_prob < thr)
            cls_prob = jnp.where(clamp, thr, cls_prob)
            cls_prob = cls_prob * tags[:, None, :]
        elif at_m == 3:
            # clamp only where the tag is active; no multiply (sedt.py:381-385)
            thr = 0.5 if threshold is None else threshold
            clamp = is_best & (cls_prob < thr) & (tags[:, None, :] > 0.5)
            cls_prob = jnp.where(clamp, thr, cls_prob)

    scores = cls_prob.max(-1)
    labels = cls_prob.argmax(-1).astype(jnp.int32)

    if not is_semi:
        boxes = box_ops.box_cl_to_se(out_bbox) * target_sizes[:, None, None]
    else:
        boxes = out_bbox  # keep normalized (c, l) for pseudo-labels
    return PostProcessResult(scores=scores, labels=labels, boxes=boxes)
