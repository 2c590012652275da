"""Training / evaluation engine: jitted SPMD steps + host loops.

Re-designs /root/reference/engine.py for TPU execution:
  * ``train`` (engine.py:19-95) becomes one jitted step — forward, on-device
    matching, loss, backward, clip, AdamW — compiled once; augmentation
    (mixup/masks) runs device-side inside the same program;
  * ``semi_train`` (engine.py:97-196) becomes a jitted mean-teacher step: the
    EMA teacher is a second param tree, pseudo-labels (class-wise thresholds,
    duration filter, same-class NMS, engine.py:300-348) are computed on
    device, and the EMA update is a tree-map — no shadow/restore swapping;
  * ``evaluate``/``get_sedt_predictions`` (engine.py:199-297) keeps the jitted
    forward + fusion postprocessing on device and only moves final
    (scores, labels, boxes) to the host for the tiny irregular decoding step.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .config import SEDTConfig
from .models import set_criterion, total_loss
from .models.criterion import DenseTargets, joint_match
from .models.postprocess import postprocess
from .ops import augment


def _frozen_param_mask(params: Any) -> Any:
    """Bool pytree: True for backbone stem/layer1 leaves under the freeze
    policy (reference backbone.py:61, ``requires_grad=False``)."""
    from .parallel.optim import label_tree

    return jax.tree.map(lambda l: l == "frozen", label_tree(params))


def _swap_in_frozen(params_in: Any, params_state: Any, frozen_mask: Any) -> Any:
    """Rebuild the full param tree, sourcing frozen leaves from the state as
    constants.

    The differentiated tree then never *uses* its frozen leaves, so
    ``value_and_grad`` returns exact zeros for them and XLA dead-code
    eliminates their weight-gradient convolutions — the analogue of torch
    skipping grads for ``requires_grad=False`` params.  This also matches the
    reference's clipping semantics: ``clip_grad_norm_`` only sees params with
    grads (engine.py:78), so frozen leaves must contribute nothing to the
    global norm.
    """
    return jax.tree.map(
        lambda p_in, p_st, f: jax.lax.stop_gradient(p_st) if f else p_in,
        params_in, params_state, frozen_mask,
    )


class TrainState(NamedTuple):
    params: Any
    frozen: Any  # FrozenBN constants (never optimized)
    opt_state: Any
    step: jnp.ndarray


class Batch(NamedTuple):
    feats: jnp.ndarray  # [B, T, F, 1]
    pad_mask: jnp.ndarray  # [B, T] bool, True = padded
    targets: DenseTargets
    strong: jnp.ndarray  # [B] bool
    weak: jnp.ndarray  # [B] bool
    patches: Optional[jnp.ndarray] = None  # [B, P, ph, pw, 1] (SP-SEDT)
    indexes: Optional[jnp.ndarray] = None  # [B] dataset row ids (eval)


def init_train_state(
    model, cfg: SEDTConfig, tx: optax.GradientTransformation, rng: jax.Array,
    batch_shape: Tuple[int, int, int], patches_shape=None,
) -> TrainState:
    B, T, F = batch_shape
    feats = jnp.zeros((B, T, F, 1), jnp.float32)
    pad = jnp.zeros((B, T), bool)
    # jit the init: eager flax init dispatches hundreds of tiny ops, which is
    # minutes of latency through a remote-device tunnel
    if patches_shape is not None:
        variables = jax.jit(
            lambda r, f, p, pt: model.init(
                {"params": r, "dropout": r, "patch_mask": r}, f, p, pt, True
            )
        )(rng, feats, pad, jnp.zeros(patches_shape, jnp.float32))
    else:
        variables = jax.jit(
            lambda r, f, p: model.init({"params": r, "dropout": r}, f, p, True)
        )(rng, feats, pad)
    params = variables["params"]
    frozen = variables.get("frozen", {})
    return TrainState(params, frozen, tx.init(params), jnp.asarray(0))


def _apply_augment(cfg: SEDTConfig, batch: Batch, rng: jax.Array) -> Batch:
    a = cfg.augment
    feats, targets = batch.feats, batch.targets
    strong, weak = batch.strong, batch.weak
    r_mix, r_tm, r_fm, r_fs = jax.random.split(rng, 4)
    if a.mix_up_ratio > 0:
        feats, targets, strong, weak = augment.mixup(
            feats, targets, strong, weak, r_mix,
            mix_up_ratio=a.mix_up_ratio, alpha=1.0,
            max_events=cfg.model.max_events,
        )
    if a.time_mask:
        feats = augment.time_mask(feats, r_tm)
    if a.freq_mask:
        feats = augment.freq_mask(feats, r_fm)
    if a.freq_shift:
        feats = augment.freq_shift(feats, r_fs)
    return batch._replace(feats=feats, targets=targets, strong=strong, weak=weak)


def make_train_step(
    model,
    weight_dict: Dict[str, float],
    cfg: SEDTConfig,
    tx: optax.GradientTransformation,
    fine_tune: bool = False,
    normalize: bool = False,
    fl: bool = False,
    augment_on: bool = True,
    frontend_fn: Optional[Callable] = None,
) -> Callable:
    """Jitted supervised step (reference engine.py:44-85, one iteration).

    With ``frontend_fn`` (see ``ops.frontend.make_frontend_fn``),
    ``batch.feats`` carries raw waveforms [B, num_samples] and featurization
    fuses into the same XLA program as the model (the north-star path).
    """

    def step(state: TrainState, batch: Batch, rng: jax.Array):
        r_aug, r_drop, r_patch, r_match = jax.random.split(rng, 4)
        if frontend_fn is not None:
            feats = frontend_fn(batch.feats)
            batch = batch._replace(
                feats=feats,
                pad_mask=jnp.zeros(feats.shape[:2], bool),
            )
        if augment_on:
            batch = _apply_augment(cfg, batch, r_aug)
        if cfg.model.self_sup and batch.patches is None:
            # on-device patch crops from the (already-transferred) target
            # boxes — replaces shipping a second [B, P, 128, 64] host tensor
            # every step (ops/patches.py)
            from .ops.patches import extract_patches_device

            batch = batch._replace(patches=extract_patches_device(
                batch.feats, batch.targets.boxes[:, : cfg.model.num_patches]
            ))

        frozen_mask = _frozen_param_mask(state.params)

        def loss_fn(params_in):
            params = _swap_in_frozen(params_in, state.params, frozen_mask)
            variables = {"params": params, "frozen": state.frozen}
            rngs = {"dropout": r_drop, "patch_mask": r_patch}
            if batch.patches is not None:
                out = model.apply(
                    variables, batch.feats, batch.pad_mask, batch.patches,
                    False, rngs=rngs,
                )
            else:
                out = model.apply(
                    variables, batch.feats, batch.pad_mask, False, rngs=rngs
                )
            losses, _ = set_criterion(
                out, batch.targets, batch.strong, batch.weak, cfg.model,
                cfg.loss, fine_tune=fine_tune, normalize=normalize, fl=fl,
                rng=r_match,
            )
            return total_loss(losses, weight_dict), losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **losses}
        return TrainState(params, state.frozen, opt_state, state.step + 1), metrics

    return jax.jit(step, donate_argnums=(0,))


# ---------------------------------------------------------------------------
# Semi-supervised mean teacher
# ---------------------------------------------------------------------------


def same_class_nms(
    scores: jnp.ndarray,  # [Q]
    labels: jnp.ndarray,  # [Q]
    boxes_cl: jnp.ndarray,  # [Q, 2] (center, length) normalized
    valid: jnp.ndarray,  # [Q]
) -> jnp.ndarray:
    """Greedy same-class overlap suppression by score (engine.py:321-346).

    Returns keep mask.  A candidate is dropped if any higher-scored kept event
    of the same class overlaps it (overlap > 0).
    """
    q = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    s = boxes_cl[:, 0] - boxes_cl[:, 1] / 2
    e = boxes_cl[:, 0] + boxes_cl[:, 1] / 2

    def body(i, keep):
        cand = order[i]

        def overlap_with(j_keep):
            j = order[j_keep]
            ov = jnp.minimum(e[cand], e[j]) - jnp.maximum(s[cand], s[j])
            return (
                keep[j]
                & (labels[j] == labels[cand])
                & (ov > 0)
                & (j_keep < i)
            )

        blocked = jax.vmap(overlap_with)(jnp.arange(q)).any()
        return keep.at[cand].set(valid[cand] & ~blocked)

    keep0 = jnp.zeros((q,), bool)
    return jax.lax.fori_loop(0, q, body, keep0)


def get_pseudo_labels(
    tea_outputs: Dict[str, jnp.ndarray],
    classwise_threshold: jnp.ndarray,  # [C]
    orig_sizes: jnp.ndarray,  # [B]
    max_events: int,
) -> Tuple[DenseTargets, jnp.ndarray]:
    """Teacher predictions -> dense pseudo targets (engine.py:300-348).

    Filters: score >= classwise threshold, normalized length > 0.2/seconds,
    greedy same-class NMS.  Returns (targets, per-class kept counts [C]).
    """
    at = tea_outputs.get("at")
    audio_tags = (
        (at >= classwise_threshold[None, :]).astype(jnp.float32)
        if at is not None
        else None
    )
    pp = postprocess(
        tea_outputs, orig_sizes, audio_tags=audio_tags, at_m=1, is_semi=True,
        threshold=None,
    )
    B, Q = pp.scores.shape
    thr = classwise_threshold[pp.labels]  # [B, Q]
    keep = (pp.scores >= thr) & (pp.boxes[..., 1] > 0.2 / orig_sizes[:, None])
    keep = keep & jax.vmap(same_class_nms)(pp.scores, pp.labels, pp.boxes, keep)

    # compact into fixed capacity M = max_events, highest scores first
    M = max_events
    k = min(Q, M)
    rank = jnp.argsort(-jnp.where(keep, pp.scores, -jnp.inf), axis=-1)[:, :k]
    take = lambda x: jnp.take_along_axis(
        x, rank.reshape(rank.shape + (1,) * (x.ndim - 2)), axis=1
    )

    def pad_to_m(x, fill=0):
        if x.shape[1] == M:
            return x
        pads = [(0, 0), (0, M - x.shape[1])] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, pads, constant_values=fill)

    labels = pad_to_m(take(pp.labels).astype(jnp.int32))
    boxes = pad_to_m(take(pp.boxes))
    valid = pad_to_m(take(keep), fill=False)
    C = classwise_threshold.shape[0]
    counts = (jax.nn.one_hot(labels, C) * valid[..., None]).sum(axis=(0, 1))
    targets = DenseTargets(
        labels=jnp.where(valid, labels, 0),
        boxes=jnp.where(valid[..., None], boxes, 0.0),
        box_valid=valid,
        label_valid=valid,
        ratio=jnp.ones_like(boxes[..., 0]),
        orig_size=orig_sizes,
    )
    return targets, counts


def make_semi_train_step(
    model,
    weight_dict: Dict[str, float],
    cfg: SEDTConfig,
    tx: optax.GradientTransformation,
    fine_tune: bool = False,
    normalize: bool = False,
    fl: bool = False,
    n_labeled: Optional[int] = None,
) -> Callable:
    """Jitted mean-teacher step (reference engine.py:97-196).

    The batch carries teacher (clean) and student (noisy) views plus
    label/unlabel flags; returns (state, ema_params, metrics, pseudo counts).

    ``n_labeled``: the batch layout is static (labeled samples first,
    unlabeled after — train_ss_sedt.py:100-113's fixed 1/4+1/4+1/2 split), so
    when given, the supervised forward runs only on ``[:n_labeled]`` and the
    teacher/student forwards only on ``[n_labeled:]`` — the reference does
    exactly this via masks (engine.py:127-160); running all three on the full
    batch (the ``None`` fallback) wastes ~half the model FLOPs.
    """
    a = cfg.augment

    def step(
        state: TrainState,
        ema_params: Any,
        teacher_feats: jnp.ndarray,
        student_feats: jnp.ndarray,
        pad_mask: jnp.ndarray,
        targets: DenseTargets,
        strong: jnp.ndarray,  # [B] bool: labeled-strong samples
        weak: jnp.ndarray,  # [B] bool: labeled-weak samples
        unlabel: jnp.ndarray,  # [B] bool
        classwise_threshold: jnp.ndarray,  # [C]
        rng: jax.Array,
        do_ema: jnp.ndarray,  # bool scalar: apply EMA this step
    ):
        r_mix, r_d1, r_d2, r_m1, r_m2, r_mixlu = jax.random.split(rng, 6)
        # static sub-batch slices (full batch when n_labeled is None)
        lab = slice(0, n_labeled) if n_labeled else slice(None)
        unl = slice(n_labeled, None) if n_labeled else slice(None)
        labeled_l = (strong | weak)[lab]
        pad_lab, pad_unl = pad_mask[lab], pad_mask[unl]

        # --- supervised branch on the labeled part (engine.py:127-139) ---
        feats_l = teacher_feats[lab]
        targets_l = jax.tree.map(lambda x: x[lab], targets)
        strong_l, weak_l = strong[lab], weak[lab]
        if a.mix_up_ratio > 0:
            feats_l, targets_l, strong_l, weak_l = augment.mixup(
                feats_l, targets_l, strong_l, weak_l, r_mix,
                mix_up_ratio=a.mix_up_ratio, alpha=1.0,
                max_events=cfg.model.max_events,
            )
            # never let mixup promote unlabeled samples into the loss
            strong_l = strong_l & labeled_l
            weak_l = weak_l & labeled_l

        # --- teacher pseudo-labels on clean unlabeled (engine.py:144-153) ---
        tea_out = model.apply(
            {"params": ema_params, "frozen": state.frozen},
            teacher_feats[unl], pad_unl, True,
        )
        pseudo, counts = get_pseudo_labels(
            tea_out, classwise_threshold, targets.orig_size[unl],
            cfg.model.max_events,
        )
        unlabel_u = unlabel[unl]
        counts = jnp.where(unlabel_u.any(), counts, jnp.zeros_like(counts))
        student_in = student_feats[unl]
        if a.mix_up_ratio > 0:
            student_in, pseudo = augment.mixup_label_unlabel(
                feats_l, student_in, targets_l, pseudo, r_mixlu,
                mix_up_ratio=a.mix_up_ratio, alpha=1.0,
                max_events=cfg.model.max_events,
            )

        frozen_mask = _frozen_param_mask(state.params)

        def loss_fn(params_in):
            params = _swap_in_frozen(params_in, state.params, frozen_mask)
            variables = {"params": params, "frozen": state.frozen}
            # One full-batch forward instead of two half-batch passes: the
            # supervised (labeled view) and student (noisy unlabeled view)
            # branches share params, so concatenating them fills the MXU at
            # the step's full batch size (the reference runs them as two
            # separate model calls, engine.py:127-160).  The two criterion
            # calls stay separate — sup and unsup normalize by their OWN
            # num_boxes, which a merged criterion would conflate.
            n_l = feats_l.shape[0]
            both_out = model.apply(
                variables,
                jnp.concatenate([feats_l, student_in], 0),
                jnp.concatenate([pad_lab, pad_unl], 0),
                False, rngs={"dropout": r_d1},
            )
            # aux_* outputs stack decoder layers in front: batch is axis 1
            sup_out = {k: (v[:, :n_l] if k.startswith("aux_") else v[:n_l])
                       for k, v in both_out.items()}
            st_out = {k: (v[:, n_l:] if k.startswith("aux_") else v[n_l:])
                      for k, v in both_out.items()}

            # The Hungarian kernel's cost scales with the number of CALLS,
            # not problems (sequential-control-flow bound): solve the labeled
            # AND pseudo-labeled assignment problems in ONE batched call over
            # the full-batch outputs + concatenated targets, then split.  The
            # per-problem results are bit-identical to two separate solves
            # (vmap semantics); only valid for plain matching.
            pre_sup = pre_un = None
            if not fine_tune and not normalize:
                targets_cat = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], 0), targets_l, pseudo
                )
                m_all, aux_all = joint_match(both_out, targets_cat, cfg.loss, fl)
                cut = lambda t, sl: jax.tree.map(lambda x: x[sl], t)
                cut_aux = lambda t, sl: (
                    None if t is None else jax.tree.map(lambda x: x[:, sl], t)
                )
                pre_sup = (cut(m_all, slice(0, n_l)),
                           cut_aux(aux_all, slice(0, n_l)))
                pre_un = (cut(m_all, slice(n_l, None)),
                          cut_aux(aux_all, slice(n_l, None)))

            sup_losses, _ = set_criterion(
                sup_out, targets_l, strong_l, weak_l, cfg.model, cfg.loss,
                fine_tune=fine_tune, normalize=normalize, fl=fl, rng=r_m1,
                precomputed=pre_sup,
            )
            sup = total_loss(sup_losses, weight_dict)

            # unsup: every unlabeled sample is "strong" vs its pseudo boxes
            # (engine.py:159-160 passes slice(all))
            un_losses, _ = set_criterion(
                st_out, pseudo, unlabel_u, None, cfg.model, cfg.loss,
                fine_tune=fine_tune, normalize=normalize, fl=fl, rng=r_m2,
                precomputed=pre_un,
            )
            unsup = total_loss(un_losses, weight_dict)
            aux = {f"sup_{k}": v for k, v in sup_losses.items()}
            aux.update({f"unsup_{k}": v for k, v in un_losses.items()})
            return sup + unsup, aux

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree.map(
            lambda e, p: jnp.where(do_ema, cfg.train.ema_decay * e
                                   + (1 - cfg.train.ema_decay) * p, e),
            ema_params, params,
        )
        metrics = {"loss": loss, **losses}
        new_state = TrainState(params, state.frozen, opt_state, state.step + 1)
        return new_state, new_ema, metrics, counts

    # NOTE: no donate_argnums here — donating (state, ema) into this graph
    # sends XLA buffer assignment on this backend into a >10-minute compile
    # (60 s without).  The extra copies are ~2x param size and irrelevant
    # next to the activations.
    return jax.jit(step)


def adjust_threshold(
    pseudo_counts: np.ndarray,  # [C] accumulated over the epoch
    origin_threshold: np.ndarray,  # [C]
    true_distribution: np.ndarray,
) -> np.ndarray:
    """Class-wise threshold adaptation toward the dataset prior
    (reference engine.py:350-360)."""
    total = pseudo_counts.sum()
    if total <= 0:
        return origin_threshold
    ratio = pseudo_counts / total
    adjust = (ratio / true_distribution) ** 0.7
    return np.clip(adjust * origin_threshold, 0.45, 0.7)


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def make_eval_step(model, weight_dict, cfg: SEDTConfig, fusion_strategy):
    """Jitted eval forward: losses + per-fusion-strategy device postprocess.

    Returns a dict with host-decodable arrays (reference engine.py:218-297's
    device portion).  ``valid`` ([B] bool) marks real rows; padded tail rows
    (index -1 repeats of the last real sample) are excluded from the loss
    masks so the logged eval means are exact."""
    fusion_strategy = tuple(fusion_strategy)

    def step(params, frozen, batch: Batch, valid):
        variables = {"params": params, "frozen": frozen}
        out = model.apply(variables, batch.feats, batch.pad_mask, True)
        losses, _ = set_criterion(
            out, batch.targets, batch.strong & valid, None, cfg.model, cfg.loss
        )
        res = {"losses": losses}
        audio_tags = None
        if "at" in out:
            audio_tags = (out["at"] > 0.5).astype(jnp.float32)
            res["at"] = out["at"]
        for at_m in fusion_strategy:
            pp = postprocess(
                out, batch.targets.orig_size, audio_tags=audio_tags, at_m=at_m
            )
            res[f"pp_{at_m}"] = pp
        return res

    return jax.jit(step)
