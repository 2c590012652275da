"""Device-side data augmentation: mixup, time/freq masks, freq shift, noise.

Re-expresses the reference's host-side numpy transforms
(/root/reference/utilities/BoxTransforms.py:121-180,363-451 and
/root/reference/utilities/mixup.py) as vmapped tensor ops under explicit PRNG
keys, so augmentation fuses into the jitted train step instead of running in
DataLoader workers.

Control-flow-heavy accept/reject rules (mixup) become masked selects
(SURVEY.md §7 "hard parts" #4).  Known deliberate deviations:
  * batch re-ordering: the reference physically regroups mixed samples into
    strong/weak blocks and returns new slice masks (mixup.py:96-127); dense
    per-sample flags make that unnecessary — each sample keeps its slot and
    its flag may flip (e.g. two weak samples mixing stay weak).
  * FreqShift resamples a normal until |shift| <= max_band
    (BoxTransforms.py:436-439); here the draw is clipped instead of rejected.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.criterion import DenseTargets
from . import box_ops


def gaussian_noise_pair(
    feats: jnp.ndarray,  # [B, T, F] or [B, T, F, 1]
    rng: jax.Array,
    snr: float = 30.0,
    p: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(clean, noisy) teacher/student pair (BoxTransforms.py:121-180).

    Noise std per frequency bin: sqrt(mean_t(x^2) * 10^(-snr/10)).
    """
    b = feats.shape[0]
    r_apply, r_noise = jax.random.split(rng)
    std = jnp.sqrt(jnp.mean(feats**2, axis=1, keepdims=True) * 10.0 ** (-snr / 10.0))
    noise = jax.random.normal(r_noise, feats.shape) * std
    apply = jax.random.uniform(r_apply, (b,) + (1,) * (feats.ndim - 1)) < p
    return feats, jnp.where(apply, feats + noise, feats)


def time_mask(
    feats: jnp.ndarray,  # [B, T, F, ...]
    rng: jax.Array,
    p: float = 0.2,
    min_band_part: float = 0.0,
    max_band_part: float = 0.1,
) -> jnp.ndarray:
    """Random contiguous time span zeroed (BoxTransforms.py:363-396)."""
    b, t = feats.shape[0], feats.shape[1]
    r_apply, r_len, r_start = jax.random.split(rng, 3)
    apply = jax.random.uniform(r_apply, (b,)) < p
    frac = jax.random.uniform(r_len, (b,), minval=min_band_part, maxval=max_band_part)
    t0f = jax.random.uniform(r_start, (b,)) * (1.0 - frac)
    tlen = (frac * t).astype(jnp.int32)
    t0 = (t0f * t).astype(jnp.int32)
    idx = jnp.arange(t)[None, :]
    in_band = (idx >= t0[:, None]) & (idx < (t0 + tlen)[:, None])
    kill = in_band & apply[:, None]
    shape = (b, t) + (1,) * (feats.ndim - 2)
    return jnp.where(kill.reshape(shape), 0.0, feats)


def freq_mask(
    feats: jnp.ndarray,  # [B, T, F, ...]
    rng: jax.Array,
    p: float = 0.5,
    min_mask_fraction: float = 0.03,
    max_mask_fraction: float = 0.4,
    fill_constant: float = 0.0,
) -> jnp.ndarray:
    """Random contiguous mel band filled (BoxTransforms.py:399-425)."""
    b, f = feats.shape[0], feats.shape[2]
    r_apply, r_len, r_start = jax.random.split(rng, 3)
    apply = jax.random.uniform(r_apply, (b,)) < p
    frac = jax.random.uniform(
        r_len, (b,), minval=min_mask_fraction, maxval=max_mask_fraction
    )
    f0f = jax.random.uniform(r_start, (b,)) * (1.0 - frac)
    flen = (frac * f).astype(jnp.int32)
    f0 = (f0f * f).astype(jnp.int32)
    idx = jnp.arange(f)[None, :]
    in_band = (idx >= f0[:, None]) & (idx < (f0 + flen)[:, None])
    kill = in_band & apply[:, None]
    shape = (b, 1, f) + (1,) * (feats.ndim - 3)
    return jnp.where(kill.reshape(shape), fill_constant, feats)


def freq_shift(
    feats: jnp.ndarray,  # [B, T, F, ...]
    rng: jax.Array,
    p: float = 0.5,
    max_band: int = 4,
    std: float = 2.0,
) -> jnp.ndarray:
    """Roll along the mel axis with zero fill (BoxTransforms.py:428-451)."""
    b, f = feats.shape[0], feats.shape[2]
    r_apply, r_shift = jax.random.split(rng)
    apply = jax.random.uniform(r_apply, (b,)) < p
    shift = jnp.clip(
        jnp.round(jax.random.normal(r_shift, (b,)) * std), -max_band, max_band
    ).astype(jnp.int32)
    shift = jnp.where(apply, shift, 0)
    idx = jnp.arange(f)[None, :]
    src = idx - shift[:, None]
    valid = (src >= 0) & (src < f)
    src = jnp.clip(src, 0, f - 1)
    shape = (b, 1, f) + (1,) * (feats.ndim - 3)
    gathered = jnp.take_along_axis(feats, src.reshape(shape), axis=2)
    return jnp.where(valid.reshape(shape), gathered, 0.0)


def _has_same_class_overlap(
    labels: jnp.ndarray, boxes: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """True iff two valid same-class events overlap or touch.

    Mirrors the reference's sorted-adjacent test ``not (ends < next_starts)``
    (mixup.py:86-95): exists i != j, same class, s_i <= s_j and e_i >= s_j.
    """
    se = box_ops.box_cl_to_se(boxes)
    s, e = se[..., 0], se[..., 1]
    same = (labels[:, None] == labels[None, :]) & valid[:, None] & valid[None, :]
    not_self = ~jnp.eye(labels.shape[0], dtype=bool)
    pair = (s[:, None] <= s[None, :]) & (e[:, None] >= s[None, :])
    return (same & not_self & pair).any()


def _compact(t: DenseTargets) -> DenseTargets:
    """Stable-sort each sample's rows so label-valid entries come first."""

    def one(labels, boxes, bv, lv, ratio):
        order = jnp.argsort(~lv, stable=True)
        return labels[order], boxes[order], bv[order], lv[order], ratio[order]

    labels, boxes, bv, lv, ratio = jax.vmap(one)(
        t.labels, t.boxes, t.box_valid, t.label_valid, t.ratio
    )
    return DenseTargets(labels, boxes, bv, lv, ratio, t.orig_size)


def concat_targets(
    t1: DenseTargets, t2: DenseTargets, lam: jnp.ndarray
) -> DenseTargets:
    """Dense label-set union: t1 rows first (ratio *= lam), then t2 rows
    (ratio *= 1-lam), truncated at capacity M (mixup.py:74-79).
    """
    t1c, t2c = _compact(t1), _compact(t2)
    M = t1.labels.shape[1]
    n1 = t1c.label_valid.sum(-1)  # [B]
    d = jnp.arange(M)[None, :]  # destination slot
    from_t1 = d < n1[:, None]
    j2 = jnp.clip(d - n1[:, None], 0, M - 1)  # index into t2c

    def take2(arr):
        return jnp.take_along_axis(
            arr, j2.reshape(j2.shape + (1,) * (arr.ndim - 2)), axis=1
        )

    pick = lambda a1, a2: jnp.where(
        from_t1.reshape(from_t1.shape + (1,) * (a1.ndim - 2)), a1, a2
    )
    labels = pick(t1c.labels, take2(t2c.labels))
    boxes = pick(t1c.boxes, take2(t2c.boxes))
    box_valid = pick(t1c.box_valid, take2(t2c.box_valid) & (d >= n1[:, None]))
    label_valid = pick(t1c.label_valid, take2(t2c.label_valid) & (d >= n1[:, None]))
    ratio = pick(lam * t1c.ratio, (1 - lam) * take2(t2c.ratio))
    ratio = jnp.where(label_valid, ratio, 1.0)
    labels = jnp.where(label_valid, labels, 0)
    boxes = jnp.where(label_valid[..., None], boxes, 0.0)
    box_valid = box_valid & label_valid
    return DenseTargets(labels, boxes, box_valid, label_valid, ratio, t1.orig_size)


def _select_targets(mask: jnp.ndarray, a: DenseTargets, b: DenseTargets) -> DenseTargets:
    """Per-sample select: a where mask else b (orig_size kept from b)."""

    def pick(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return DenseTargets(
        labels=pick(a.labels, b.labels),
        boxes=pick(a.boxes, b.boxes),
        box_valid=pick(a.box_valid, b.box_valid),
        label_valid=pick(a.label_valid, b.label_valid),
        ratio=pick(a.ratio, b.ratio),
        orig_size=b.orig_size,
    )


def mixup(
    feats: jnp.ndarray,  # [B, T, F, 1] (or [B, T, F])
    targets: DenseTargets,
    strong_flag: jnp.ndarray,  # [B] bool
    weak_flag: jnp.ndarray,  # [B] bool
    rng: jax.Array,
    mix_up_ratio: float = 0.5,
    alpha: float = 1.0,
    max_events: int = 20,
):
    """Pairwise spectrogram mixup with label-set union (mixup.py:13-127).

    The first ``int(B * mix_up_ratio)`` samples mix with a random partner; a
    candidate is rejected back to the un-mixed donor when the union exceeds
    ``max_events`` or creates same-class overlap.  Returns
    (feats, targets, strong_flag, weak_flag).
    """
    B = feats.shape[0]
    mix_num = int(B * mix_up_ratio)
    if mix_num == 0:
        return feats, targets, strong_flag, weak_flag

    r_lam, r_perm = jax.random.split(rng)
    lam = jax.random.beta(r_lam, alpha, alpha) if alpha > 0 else jnp.asarray(1.0)
    perm = jax.random.permutation(r_perm, B)
    f2 = feats[perm]
    t2 = jax.tree.map(lambda x: x[perm], targets)

    n1 = targets.box_valid.sum(-1)
    n2 = t2.box_valid.sum(-1)
    mixed_feats = lam * feats + (1 - lam) * f2
    union = concat_targets(targets, t2, lam)
    overlap = jax.vmap(_has_same_class_overlap)(
        union.labels, union.boxes, union.box_valid
    )
    too_many = (n1 + n2) > max_events
    one_empty = (n1 == 0) | (n2 == 0)
    both_empty = (n1 == 0) & (n2 == 0)
    in_mix = jnp.arange(B) < mix_num

    # per-sample outcome (mixup.py:41-95):
    #   both_empty          -> weak union, mixed data
    #   one empty, n2 > 0   -> keep t2 / f2 unmixed (strong)
    #   one empty, n1 > 0   -> keep t1 / feats unmixed (strong)
    #   too_many | overlap  -> keep t1 (both non-empty here)
    #   else                -> strong union, mixed data
    keep_t2 = one_empty & (n1 == 0) & (n2 > 0)
    reject = (~one_empty) & (too_many | overlap)
    accept_mix = in_mix & (~reject) & (both_empty | ~one_empty)
    use_t2 = in_mix & keep_t2 & (~accept_mix)

    shape = (B,) + (1,) * (feats.ndim - 1)
    out_feats = jnp.where(accept_mix.reshape(shape), mixed_feats, feats)
    out_feats = jnp.where(use_t2.reshape(shape), f2, out_feats)
    out_targets = _select_targets(
        accept_mix, union, _select_targets(use_t2, t2, targets)
    )
    has_boxes = out_targets.box_valid.sum(-1) > 0
    has_labels = out_targets.label_valid.sum(-1) > 0
    new_strong = jnp.where(in_mix, has_boxes, strong_flag)
    new_weak = jnp.where(in_mix, (~has_boxes) & has_labels, weak_flag)
    return out_feats, out_targets, new_strong, new_weak


def mixup_label_unlabel(
    feats_labeled: jnp.ndarray,
    feats_unlabeled: jnp.ndarray,
    targets_labeled: DenseTargets,
    targets_pseudo: DenseTargets,
    rng: jax.Array,
    mix_up_ratio: float = 0.5,
    alpha: float = 1.0,
    max_events: int = 20,
):
    """Mix labeled clips into the unlabeled/pseudo stream (mixup.py:129-196).

    Rejects fall back to the *labeled* donor on overlap (mixup.py:186-189),
    and to the pseudo target on count overflow when it has boxes
    (mixup.py:158-164).  Returns (student feats, pseudo targets).
    """
    B = feats_unlabeled.shape[0]
    nb = min(B, feats_labeled.shape[0])
    nmix = int(nb * mix_up_ratio)
    if nmix == 0:
        return feats_unlabeled, targets_pseudo

    lam = (
        jax.random.beta(rng, alpha, alpha) if alpha > 0 else jnp.asarray(1.0)
    )
    f1 = feats_labeled[:nb]
    t1 = jax.tree.map(lambda x: x[:nb], targets_labeled)
    f2 = feats_unlabeled[:nb]
    t2 = jax.tree.map(lambda x: x[:nb], targets_pseudo)

    mixed = lam * f1 + (1 - lam) * f2
    union = concat_targets(t1, t2, lam)
    overlap = jax.vmap(_has_same_class_overlap)(
        union.labels, union.boxes, union.box_valid
    )
    n1b, n2b = t1.box_valid.sum(-1), t2.box_valid.sum(-1)
    too_many = (n1b + n2b) > max_events
    in_mix = jnp.arange(nb) < nmix
    keep_t2 = too_many & (n2b > 0)
    accept = in_mix & (~too_many) & (~overlap)
    use_t1 = in_mix & (~accept) & (~keep_t2)

    shape = (nb,) + (1,) * (f1.ndim - 1)
    head_feats = jnp.where(accept.reshape(shape), mixed, f2)
    head_feats = jnp.where(use_t1.reshape(shape), f1, head_feats)
    head_t = _select_targets(accept, union, _select_targets(use_t1, t1, t2))

    out_feats = jnp.concatenate([head_feats, feats_unlabeled[nb:]], axis=0)
    out_t = jax.tree.map(
        lambda h, rest: jnp.concatenate([h, rest[nb:]], axis=0),
        head_t,
        targets_pseudo,
    )
    return out_feats, out_t
