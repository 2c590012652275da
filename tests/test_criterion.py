"""Criterion tests: dense losses vs hand-computed values
(/root/reference/sedt/sedt.py:134-352 semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_transformer_tpu.config import LossConfig, ModelConfig
from sound_event_detection_transformer_tpu.models.criterion import (
    DenseTargets,
    build_weight_dict,
    empty_targets,
    loss_weak,
    set_criterion,
    total_loss,
    weak_ground_truth,
)


def _mcfg(**kw):
    base = dict(num_classes=3, num_queries=4, dec_at=True, aux_loss=False,
                max_events=4)
    base.update(kw)
    return ModelConfig(**base)


def _targets(B=2, M=4):
    t = empty_targets(B, M, 10.0)
    return t._replace(
        labels=t.labels.at[0, 0].set(1).at[0, 1].set(2),
        boxes=t.boxes.at[0, 0].set(jnp.array([0.3, 0.2]))
        .at[0, 1].set(jnp.array([0.7, 0.1])),
        box_valid=t.box_valid.at[0, :2].set(True),
        label_valid=t.label_valid.at[0, :2].set(True),
    )


def _outputs(rng, B=2, Q=4, C=3):
    return {
        "pred_logits": jnp.asarray(rng.randn(B, Q, C + 1), jnp.float32),
        "pred_boxes": jax.nn.sigmoid(jnp.asarray(rng.randn(B, Q, 2), jnp.float32)),
        "at": jax.nn.sigmoid(jnp.asarray(rng.randn(B, C), jnp.float32)),
    }


def test_perfect_prediction_near_zero_box_loss(rng):
    """If predictions exactly equal targets, box losses vanish and CE is
    minimal when logits strongly favor the right classes."""
    mcfg, lcfg = _mcfg(), LossConfig()
    t = _targets()
    B, Q, C = 2, 4, 3
    logits = np.full((B, Q, C + 1), -10.0, np.float32)
    boxes = np.zeros((B, Q, 2), np.float32)
    # queries 0,1 of sample 0 predict the two targets; everything else no-object
    logits[:, :, C] = 10.0
    logits[0, 0, :] = [-10, 10, -10, -10]
    logits[0, 1, :] = [-10, -10, 10, -10]
    boxes[0, 0] = [0.3, 0.2]
    boxes[0, 1] = [0.7, 0.1]
    out = {
        "pred_logits": jnp.asarray(logits),
        "pred_boxes": jnp.asarray(boxes),
        "at": jnp.asarray([[0.001, 0.999, 0.999], [0.001, 0.001, 0.001]]),
    }
    losses, res = set_criterion(out, t, jnp.array([True, True]), None, mcfg, lcfg)
    assert float(losses["loss_bbox"]) < 1e-4
    assert float(losses["loss_giou"]) < 1e-4
    assert float(losses["loss_ce"]) < 1e-3
    assert float(losses["loss_weak"]) < 1e-2
    assert float(losses["class_error"]) == 0.0
    # matched: exactly targets 0,1 to queries 0,1
    assert bool(res.query_matched[0, 0]) and bool(res.query_matched[0, 1])
    assert not np.asarray(res.query_matched[1]).any()


def test_weak_ground_truth_ratio_accumulation():
    t = empty_targets(1, 4, 10.0)
    t = t._replace(
        labels=jnp.asarray([[1, 1, 2, 0]]),
        label_valid=jnp.asarray([[True, True, True, False]]),
        ratio=jnp.asarray([[0.4, 0.9, 0.3, 1.0]]),
    )
    gt = np.asarray(weak_ground_truth(t, 3))
    np.testing.assert_allclose(gt[0], [0.0, 1.0, 0.3], atol=1e-6)  # 0.4+0.9 clamped


def test_loss_weak_bce_hand_value():
    t = empty_targets(2, 2, 10.0)
    t = t._replace(
        labels=jnp.asarray([[0, 0], [0, 0]]),
        label_valid=jnp.asarray([[True, False], [False, False]]),
    )
    at = jnp.asarray([[0.8, 0.2], [0.5, 0.5]])
    labeled = jnp.asarray([1.0, 0.0])
    val = float(loss_weak(at, t, labeled, False, 0.5, 1.0))
    expected = -(np.log(0.8) + np.log(1 - 0.2)) / 2  # mean over labeled x C
    np.testing.assert_allclose(val, expected, rtol=1e-3)


def test_eos_weight_scales_noobject_ce(rng):
    mcfg = _mcfg()
    t = empty_targets(1, 4, 10.0)  # no targets: every query is no-object
    out = {
        "pred_logits": jnp.zeros((1, 4, 4)),
        "pred_boxes": jnp.full((1, 4, 2), 0.5),
    }
    l1, _ = set_criterion(out, t, jnp.array([True]), None, mcfg,
                          LossConfig(eos_coef=0.1))
    l2, _ = set_criterion(out, t, jnp.array([True]), None, mcfg,
                          LossConfig(eos_coef=1.0))
    np.testing.assert_allclose(
        float(l1["loss_ce"]) * 10.0, float(l2["loss_ce"]), rtol=1e-5
    )


def test_aux_losses_present_and_weighted(rng):
    mcfg = _mcfg(aux_loss=True, dec_layers=3)
    lcfg = LossConfig()
    out = _outputs(rng)
    out["aux_logits"] = jnp.asarray(rng.randn(2, 2, 4, 4), jnp.float32)
    out["aux_boxes"] = jax.nn.sigmoid(jnp.asarray(rng.randn(2, 2, 4, 2), jnp.float32))
    losses, _ = set_criterion(out, _targets(), jnp.array([True, True]), None,
                              mcfg, lcfg)
    for i in range(2):
        for k in ("loss_ce", "loss_bbox", "loss_giou"):
            assert f"{k}_{i}" in losses
    wd = build_weight_dict(mcfg, lcfg)
    assert "loss_ce_0" in wd and "loss_ce_1" in wd and "loss_ce_2" not in wd
    tot = float(total_loss(losses, wd))
    assert np.isfinite(tot) and tot > 0


def test_focal_loss_path_finite(rng):
    mcfg, lcfg = _mcfg(), LossConfig()
    losses, _ = set_criterion(
        _outputs(rng), _targets(), jnp.array([True, True]), None, mcfg, lcfg,
        fl=True,
    )
    assert np.isfinite(float(losses["loss_ce"]))
    assert np.isfinite(float(losses["loss_weak"]))


def test_empty_batch_no_nan(rng):
    """All-empty batch: clamped num_boxes keeps losses finite (deliberate
    divergence from the reference's inf-and-abort)."""
    mcfg, lcfg = _mcfg(), LossConfig()
    t = empty_targets(2, 4, 10.0)
    losses, _ = set_criterion(_outputs(rng), t, jnp.array([True, True]), None,
                              mcfg, lcfg)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_gradients_flow(rng):
    mcfg, lcfg = _mcfg(), LossConfig()
    wd = build_weight_dict(mcfg, lcfg)
    t = _targets()

    def f(logits):
        out = {
            "pred_logits": logits,
            "pred_boxes": jnp.full((2, 4, 2), 0.4),
            "at": jnp.full((2, 3), 0.5),
        }
        losses, _ = set_criterion(out, t, jnp.array([True, True]), None, mcfg, lcfg)
        return total_loss(losses, wd)

    g = jax.grad(f)(jnp.asarray(rng.randn(2, 4, 4), jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_aux_num_boxes_shared_under_fine_tune(rng):
    """Aux layers normalize by the FINAL layer's num_boxes — including under
    fine_tune where relax matching inflates it (reference sedt.py:322-324
    computes num_boxes once from the final-layer coef; sedt.py:348 passes
    that same value to every aux get_loss)."""
    mcfg = _mcfg(aux_loss=True)
    # large epsilon + alpha: every query within epsilon of a target is kept
    lcfg = LossConfig(epsilon=2.0, alpha=100.0)
    t = _targets()
    B, Q, C = 2, 4, 3
    logits = jnp.asarray(rng.randn(B, Q, C + 1), jnp.float32)
    # all queries sit exactly on target 0 of sample 0 -> zero location cost,
    # so fine_tune relax matches all of them while plain matching keeps 2
    boxes = jnp.tile(jnp.array([0.3, 0.2], jnp.float32), (B, Q, 1))
    out = {
        "pred_logits": logits,
        "pred_boxes": boxes,
        "at": jnp.full((B, C), 0.5),
        # aux layer identical to the final layer: same plain-match raw sums
        "aux_logits": logits[None],
        "aux_boxes": boxes[None],
    }
    strong = jnp.array([True, True])

    losses_ft, mres_ft = set_criterion(
        out, t, strong, None, mcfg, lcfg, fine_tune=True,
        rng=jax.random.PRNGKey(0),
    )
    out_plain = {k: v for k, v in out.items() if not k.startswith("aux_")}
    losses_plain, mres_plain = set_criterion(
        out_plain, t, strong, None, mcfg, lcfg, fine_tune=False
    )

    nb_ft = max(float((mres_ft.num_boxes * strong).sum()), 1.0)
    nb_plain = max(float((mres_plain.num_boxes * strong).sum()), 1.0)
    assert nb_ft > nb_plain  # relax actually added queries
    # identical predictions -> identical raw box-loss sums; only the shared
    # normalizer differs
    np.testing.assert_allclose(
        float(losses_ft["loss_bbox_0"]) * nb_ft,
        float(losses_plain["loss_bbox"]) * nb_plain,
        rtol=1e-5,
    )
