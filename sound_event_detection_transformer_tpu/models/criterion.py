"""Set-prediction criterion over dense targets (pure functions).

Re-expresses ``SetCriterion`` (/root/reference/sedt/sedt.py:134-352) for jit:
ragged per-sample target dicts become fixed-capacity dense tensors, the slice
masks become per-sample boolean flags, and the per-decoder-layer auxiliary
matching (sedt.py:335-351) becomes a vmap over the stacked layer axis — all of
it, matcher included, stays on device inside the train step.

Divergence from the reference (deliberate): ``num_boxes`` is clamped to >= 1.
The reference divides by the raw coefficient sum, so an all-empty batch yields
inf loss and the trainer aborts (engine.py:70-73); the clamp (upstream DETR's
behavior) makes empty batches a no-op instead.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import LossConfig, ModelConfig
from ..ops import box_ops
from ..ops.matcher import MatchResult, match


class DenseTargets(NamedTuple):
    """Fixed-capacity padded targets (SURVEY.md §7 step 3).

    ``label_valid`` can exceed ``box_valid``: weak samples carry class labels
    without boxes (reference BoxEncoder.encode_weak); the matcher only sees
    ``box_valid`` (the reference truncates labels to the box count,
    matcher.py:69).
    """

    labels: jnp.ndarray  # [B, M] int32
    boxes: jnp.ndarray  # [B, M, 2] f32 (center, length) normalized
    box_valid: jnp.ndarray  # [B, M] bool
    label_valid: jnp.ndarray  # [B, M] bool
    ratio: jnp.ndarray  # [B, M] f32 per-event mixup weight (1 when unmixed)
    orig_size: jnp.ndarray  # [B] f32 clip length in seconds


def empty_targets(batch: int, max_events: int, seconds: float = 10.0) -> DenseTargets:
    return DenseTargets(
        labels=jnp.zeros((batch, max_events), jnp.int32),
        boxes=jnp.zeros((batch, max_events, 2), jnp.float32),
        box_valid=jnp.zeros((batch, max_events), bool),
        label_valid=jnp.zeros((batch, max_events), bool),
        ratio=jnp.ones((batch, max_events), jnp.float32),
        orig_size=jnp.full((batch,), seconds, jnp.float32),
    )


def _gather_tgt(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """arr [B, M, ...], idx [B, Q] (clipped) -> [B, Q, ...]."""
    return jax.vmap(lambda a, i: a[i])(arr, jnp.clip(idx, 0, arr.shape[1] - 1))


def loss_labels(
    logits: jnp.ndarray,  # [B, Q, C+1]
    targets: DenseTargets,
    mres: MatchResult,
    strong: jnp.ndarray,  # [B] f32 0/1
    num_boxes: jnp.ndarray,
    num_classes: int,
    eos_coef: float,
    fl: bool,
    alpha_fl: float,
    gamma_fl: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CE (or sigmoid focal) classification loss (reference sedt.py:188-221).

    Returns (loss_ce, class_error).
    """
    B, Q, _ = logits.shape
    tgt_cls = jnp.where(
        mres.query_matched,
        _gather_tgt(targets.labels, mres.tgt_for_query),
        num_classes,
    )  # [B, Q]
    coef_b = jnp.where(mres.query_matched, mres.coef, 1.0)
    empty_weight = jnp.ones((num_classes + 1,)).at[num_classes].set(eos_coef)

    if fl:
        # sigmoid focal with pos_weight=empty_weight (reference sedt.py:412-421)
        onehot = jax.nn.one_hot(tgt_cls, num_classes + 1)
        p = jax.nn.sigmoid(logits)
        logsig = jax.nn.log_sigmoid(logits)
        log1msig = jax.nn.log_sigmoid(-logits)
        bce = -(empty_weight * onehot * logsig + (1.0 - onehot) * log1msig)
        p_t = p * onehot + (1 - p) * (1 - onehot)
        loss = bce * (1 - p_t) ** gamma_fl
        if alpha_fl >= 0:
            alpha_t = alpha_fl * onehot + (1 - alpha_fl) * (1 - onehot)
            loss = alpha_t * loss
        ce = loss.sum(-1)  # [B, Q]
    else:
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_cls[..., None], axis=-1)[..., 0]
        ce = nll * empty_weight[tgt_cls]

    loss_ce = (ce * coef_b * strong[:, None]).sum() / num_boxes

    pred_cls = logits.argmax(-1)
    matched = mres.query_matched & (strong[:, None] > 0)
    correct = (pred_cls == tgt_cls) & matched
    denom = jnp.maximum(matched.sum(), 1)
    class_error = 100.0 * (1.0 - correct.sum() / denom)
    return loss_ce, jax.lax.stop_gradient(class_error)


def loss_boxes(
    pred_boxes: jnp.ndarray,  # [B, Q, 2]
    targets: DenseTargets,
    mres: MatchResult,
    strong: jnp.ndarray,
    num_boxes: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """L1 + GIoU box regression over matched pairs (reference sedt.py:238-261)."""
    tgt_box = _gather_tgt(targets.boxes, mres.tgt_for_query)  # [B, Q, 2]
    pred_se = box_ops.box_cl_to_se(pred_boxes)
    tgt_se = box_ops.box_cl_to_se(tgt_box)
    l1 = box_ops.elementwise_l1_se(pred_se, tgt_se)  # [B, Q]
    giou = 1.0 - box_ops.elementwise_giou_se(pred_se, tgt_se)
    w = mres.coef * mres.query_matched * strong[:, None]
    return (l1 * w).sum() / num_boxes, (giou * w).sum() / num_boxes


def loss_cardinality(
    logits: jnp.ndarray, targets: DenseTargets
) -> jnp.ndarray:
    """Logging-only |#non-empty-preds - #targets| (reference sedt.py:223-236)."""
    n_pred = (logits.argmax(-1) != logits.shape[-1] - 1).sum(-1)
    n_tgt = targets.label_valid.sum(-1)
    return jax.lax.stop_gradient(
        jnp.abs(n_pred.astype(jnp.float32) - n_tgt.astype(jnp.float32)).mean()
    )


def weak_ground_truth(targets: DenseTargets, num_classes: int) -> jnp.ndarray:
    """Clip-level multi-hot gt with mixup-ratio accumulation, clamped to [0,1]
    (reference sedt.py:168-175)."""
    onehot = jax.nn.one_hot(targets.labels, num_classes)  # [B, M, C]
    w = (targets.ratio * targets.label_valid)[..., None]
    return jnp.clip((onehot * w).sum(axis=1), 0.0, 1.0)


def loss_weak(
    at: jnp.ndarray,  # [B, C] sigmoid probabilities
    targets: DenseTargets,
    labeled: jnp.ndarray,  # [B] f32 0/1 (strong | weak samples)
    fl: bool,
    alpha_fl: float,
    gamma_fl: float,
) -> jnp.ndarray:
    """Clip-tag BCE over the labeled sub-batch (reference sedt.py:161-181)."""
    C = at.shape[-1]
    gt = weak_ground_truth(targets, C)
    eps = 1e-7
    p = jnp.clip(at, eps, 1.0 - eps)
    bce = -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p))
    if fl:
        # weak focal (reference sedt.py:424-433): per-sample sum over classes,
        # then mean over (labeled) samples
        p_t = p * gt + (1 - p) * (1 - gt)
        loss = bce * (1 - p_t) ** gamma_fl
        if alpha_fl >= 0:
            loss = (alpha_fl * gt + (1 - alpha_fl) * (1 - gt)) * loss
        per_sample = loss.sum(-1)
        denom = jnp.maximum(labeled.sum(), 1.0)
        return (per_sample * labeled).sum() / denom
    # nn.BCELoss: mean over every element of the labeled slice
    denom = jnp.maximum(labeled.sum() * C, 1.0)
    return (bce * labeled[:, None]).sum() / denom


def loss_weak_p(
    at_p: jnp.ndarray, targets: DenseTargets, weak: jnp.ndarray
) -> jnp.ndarray:
    """Pooling-branch BCE over the weak sub-batch only (reference sedt.py:182-185)."""
    C = at_p.shape[-1]
    gt = weak_ground_truth(targets, C)
    eps = 1e-7
    p = jnp.clip(at_p, eps, 1.0 - eps)
    bce = -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p))
    denom = jnp.maximum(weak.sum() * C, 1.0)
    return (bce * weak[:, None]).sum() / denom


def loss_feature(
    pred_feature: jnp.ndarray,  # [B, Q, Cb]
    gt_feature: jnp.ndarray,  # [B, P, Cb]
    mres: MatchResult,
    strong: jnp.ndarray,
    num_boxes: jnp.ndarray,
) -> jnp.ndarray:
    """Normalized-MSE patch-feature reconstruction (reference sedt.py:263-282)."""
    tgt = _gather_tgt(gt_feature, mres.tgt_for_query)  # [B, Q, Cb]
    norm = lambda v: v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    mse = ((norm(pred_feature) - norm(tgt)) ** 2).sum(-1)  # [B, Q]
    w = mres.query_matched * strong[:, None]
    return (mse * w).sum() / num_boxes


def build_weight_dict(mcfg: ModelConfig, lcfg: LossConfig) -> Dict[str, float]:
    """Loss-name -> weight map (reference sedt/__init__.py:38-56)."""
    wd = {
        "loss_ce": lcfg.ce_loss_coef,
        "loss_bbox": lcfg.bbox_loss_coef,
        "loss_giou": lcfg.giou_loss_coef,
    }
    if not mcfg.self_sup:
        if mcfg.dec_at:
            wd["loss_weak"] = lcfg.weak_loss_coef
        if mcfg.pooling:
            wd["loss_weak_p"] = lcfg.weak_loss_p_coef
    elif mcfg.feature_recon:
        wd["loss_feature"] = lcfg.feature_loss_coef
    if mcfg.aux_loss:
        for i in range(mcfg.dec_layers - 1):
            wd.update({f"{k}_{i}": v for k, v in list(wd.items()) if not k[-1].isdigit()})
    return wd


def _match_kw(lcfg: LossConfig, fl: bool) -> Dict:
    return dict(
        cost_class=lcfg.set_cost_class,
        cost_bbox=lcfg.set_cost_bbox,
        cost_giou=lcfg.set_cost_giou,
        focal=fl,
        alpha_fl=lcfg.alpha_fl,
        gamma_fl=lcfg.gamma_fl,
    )


def joint_match(
    outputs: Dict[str, jnp.ndarray],
    targets: DenseTargets,
    lcfg: LossConfig,
    fl: bool = False,
) -> Tuple[MatchResult, Optional[MatchResult]]:
    """Plain matching for the final + all aux decoder layers in ONE batched
    LSAP solve (the Hungarian kernel's device cost scales with the number of
    *calls*, not problems — ops/matcher.py).  Returns (mres, aux_mres); pass
    the pair to :func:`set_criterion` via ``precomputed`` to share one solve
    across several criterion calls (the semi step batches its labeled and
    pseudo-labeled assignment problems this way)."""
    kw = _match_kw(lcfg, fl)
    if "aux_logits" in outputs:
        all_logits = jnp.concatenate(
            [outputs["pred_logits"][None], outputs["aux_logits"]], axis=0
        )
        all_boxes = jnp.concatenate(
            [outputs["pred_boxes"][None], outputs["aux_boxes"]], axis=0
        )
        all_m = jax.vmap(
            lambda lg, bx: match(
                lg, bx, targets.labels, targets.boxes, targets.box_valid,
                targets.ratio, **kw,
            )
        )(all_logits, all_boxes)
        all_m = jax.tree.map(jax.lax.stop_gradient, all_m)
        return (
            jax.tree.map(lambda x: x[0], all_m),
            jax.tree.map(lambda x: x[1:], all_m),
        )
    m = match(
        outputs["pred_logits"], outputs["pred_boxes"], targets.labels,
        targets.boxes, targets.box_valid, targets.ratio, **kw,
    )
    return jax.tree.map(jax.lax.stop_gradient, m), None


def set_criterion(
    outputs: Dict[str, jnp.ndarray],
    targets: DenseTargets,
    strong_mask: Optional[jnp.ndarray],  # [B] bool; None = no strong samples
    weak_mask: Optional[jnp.ndarray],  # [B] bool or None
    mcfg: ModelConfig,
    lcfg: LossConfig,
    fine_tune: bool = False,
    normalize: bool = False,
    fl: bool = False,
    rng: Optional[jax.Array] = None,
    precomputed: Optional[Tuple[MatchResult, Optional[MatchResult]]] = None,
) -> Tuple[Dict[str, jnp.ndarray], Optional[MatchResult]]:
    """Full criterion (reference SetCriterion.forward, sedt.py:309-352).

    Returns (losses, final-layer match result).  Use
    :func:`build_weight_dict` + :func:`total_loss` to reduce to a scalar.
    ``precomputed``: externally solved ``(mres, aux_mres)`` (see
    :func:`joint_match`) — only valid for plain matching
    (no fine_tune/normalize).
    """
    B = outputs["pred_boxes"].shape[0]
    strong = (
        strong_mask.astype(jnp.float32)
        if strong_mask is not None
        else jnp.zeros((B,), jnp.float32)
    )
    weak = weak_mask.astype(jnp.float32) if weak_mask is not None else jnp.zeros((B,))
    labeled = jnp.clip(strong + weak, 0.0, 1.0)
    num_classes = mcfg.num_classes if not mcfg.self_sup else 1

    match_kw = _match_kw(lcfg, fl)
    losses: Dict[str, jnp.ndarray] = {}
    mres = None
    aux_mres = None
    num_boxes = jnp.asarray(1.0)
    has_aux = "aux_logits" in outputs
    if strong_mask is not None:
        # Perf: the Hungarian solve is sequential-control-flow bound, so its
        # device cost scales with the number of *calls*, not problems.  When
        # the final layer uses plain matching (no fine-tune/normalize, the
        # common case) we stack it with the aux layers and pay for ONE
        # batched solve over (1 + A) x B problems instead of two calls.
        joint = has_aux and not fine_tune and not normalize
        if precomputed is not None:
            assert not fine_tune and not normalize
            mres, aux_mres = precomputed
        elif joint:
            mres, aux_mres = joint_match(outputs, targets, lcfg, fl)
        else:
            mres = match(
                outputs["pred_logits"],
                outputs["pred_boxes"],
                targets.labels,
                targets.boxes,
                targets.box_valid,
                targets.ratio,
                fine_tune=fine_tune,
                normalize=normalize,
                epsilon=lcfg.epsilon,
                alpha=lcfg.alpha,
                rng=rng,
                **match_kw,
            )
            mres = jax.tree.map(jax.lax.stop_gradient, mres)
        num_boxes = jnp.maximum((mres.num_boxes * strong).sum(), 1.0)

        lc, cerr = loss_labels(
            outputs["pred_logits"], targets, mres, strong, num_boxes,
            num_classes, lcfg.eos_coef, fl, lcfg.alpha_fl, lcfg.gamma_fl,
        )
        lb, lg = loss_boxes(outputs["pred_boxes"], targets, mres, strong, num_boxes)
        losses.update(loss_ce=lc, class_error=cerr, loss_bbox=lb, loss_giou=lg)
        losses["cardinality_error"] = loss_cardinality(outputs["pred_logits"], targets)
        if "pred_feature" in outputs:
            losses["loss_feature"] = loss_feature(
                outputs["pred_feature"], outputs["gt_feature"], mres, strong, num_boxes
            )

    if "at" in outputs:
        losses["loss_weak"] = loss_weak(
            outputs["at"], targets, labeled, fl, lcfg.alpha_fl, lcfg.gamma_fl
        )
    if "at_p" in outputs and weak_mask is not None:
        losses["loss_weak_p"] = loss_weak_p(outputs["at_p"], targets, weak)

    # auxiliary decoder layers: fresh plain matching per layer
    # (reference sedt.py:335-351; matcher called without fine_tune/normalize).
    # NOTE: the final layer's num_boxes deliberately normalizes the aux
    # layers too — including under fine_tune, where it counts relax-added
    # queries.  This matches the reference exactly: sedt.py:322-324 computes
    # num_boxes once from the final-layer coef and sedt.py:348 passes that
    # same value to every aux get_loss (pinned by
    # tests/test_criterion.py::test_aux_num_boxes_shared_under_fine_tune).
    if has_aux and strong_mask is not None:
        def aux_one(logits_a, boxes_a, feat_a, m):
            if m is None:
                m = match(
                    logits_a, boxes_a, targets.labels, targets.boxes,
                    targets.box_valid, targets.ratio, **match_kw,
                )
                m = jax.tree.map(jax.lax.stop_gradient, m)
            lc, _ = loss_labels(
                logits_a, targets, m, strong, num_boxes,
                num_classes, lcfg.eos_coef, fl, lcfg.alpha_fl, lcfg.gamma_fl,
            )
            lb, lg = loss_boxes(boxes_a, targets, m, strong, num_boxes)
            out = {"loss_ce": lc, "loss_bbox": lb, "loss_giou": lg}
            out["cardinality_error"] = loss_cardinality(logits_a, targets)
            if feat_a is not None:
                out["loss_feature"] = loss_feature(
                    feat_a, outputs["gt_feature"], m, strong, num_boxes
                )
            return out

        aux_feat = outputs.get("aux_feature")
        if aux_mres is not None:
            if aux_feat is not None:
                aux_losses = jax.vmap(
                    lambda l, b, f, m: aux_one(l, b, f, m)
                )(outputs["aux_logits"], outputs["aux_boxes"], aux_feat, aux_mres)
            else:
                aux_losses = jax.vmap(
                    lambda l, b, m: aux_one(l, b, None, m)
                )(outputs["aux_logits"], outputs["aux_boxes"], aux_mres)
        elif aux_feat is not None:
            aux_losses = jax.vmap(
                lambda l, b, f: aux_one(l, b, f, None)
            )(outputs["aux_logits"], outputs["aux_boxes"], aux_feat)
        else:
            aux_losses = jax.vmap(
                lambda l, b: aux_one(l, b, None, None)
            )(outputs["aux_logits"], outputs["aux_boxes"])
        A = outputs["aux_logits"].shape[0]
        for i in range(A):
            for k, v in aux_losses.items():
                losses[f"{k}_{i}"] = v[i]
    return losses, mres


def total_loss(
    losses: Dict[str, jnp.ndarray], weight_dict: Dict[str, float]
) -> jnp.ndarray:
    """Weighted sum over the losses present in the weight dict (engine.py:65)."""
    return sum(losses[k] * w for k, w in weight_dict.items() if k in losses)
