"""Unit tests: 1-D box ops vs hand-computed values and the reference's
2-D-lift semantics (/root/reference/utilities/box_ops.py)."""
import jax.numpy as jnp
import numpy as np

from sound_event_detection_transformer_tpu.ops import box_ops


def test_cl_se_roundtrip():
    cl = jnp.array([[0.5, 0.2], [0.1, 0.1], [0.9, 0.05]])
    se = box_ops.box_cl_to_se(cl)
    np.testing.assert_allclose(np.asarray(box_ops.box_se_to_cl(se)), np.asarray(cl), atol=1e-7)
    np.testing.assert_allclose(np.asarray(se[0]), [0.4, 0.6], atol=1e-7)


def test_iou_hand_computed():
    a = jnp.array([[0.0, 1.0]])  # full interval
    b = jnp.array([[0.5, 1.5], [2.0, 3.0], [0.0, 1.0]])
    iou, union = box_ops.box_iou(a, b)
    np.testing.assert_allclose(
        np.asarray(iou)[0], [0.5 / 1.5, 0.0, 1.0], atol=1e-6
    )


def test_giou_hand_computed():
    a = jnp.array([[0.0, 1.0]])
    b = jnp.array([[2.0, 3.0]])  # disjoint, hull 3, union 2
    giou = box_ops.generalized_box_iou(a, b)
    np.testing.assert_allclose(np.asarray(giou)[0, 0], 0.0 - (3 - 2) / 3, atol=1e-6)
    # identical boxes: giou = 1
    giou2 = box_ops.generalized_box_iou(a, a)
    np.testing.assert_allclose(np.asarray(giou2)[0, 0], 1.0, atol=1e-6)


def test_pairwise_l1_matches_2d_lift():
    # the reference computes cdist over (x0, 0, x1, 1): y terms contribute 0
    rng = np.random.RandomState(0)
    a = rng.rand(4, 2).astype(np.float32)
    b = rng.rand(5, 2).astype(np.float32)
    se_a = np.stack([a[:, 0] - a[:, 1] / 2, a[:, 0] + a[:, 1] / 2], -1)
    se_b = np.stack([b[:, 0] - b[:, 1] / 2, b[:, 0] + b[:, 1] / 2], -1)
    expected = np.abs(se_a[:, None, :] - se_b[None, :, :]).sum(-1)
    got = box_ops.pairwise_l1_se(jnp.asarray(se_a), jnp.asarray(se_b))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def test_elementwise_giou_matches_pairwise_diag():
    rng = np.random.RandomState(1)
    cl = rng.rand(6, 2).astype(np.float32) * 0.5 + 0.1
    se = box_ops.box_cl_to_se(jnp.asarray(cl))
    pair = box_ops.generalized_box_iou(se, se)
    diag = box_ops.elementwise_giou_se(se, se)
    np.testing.assert_allclose(np.asarray(pair).diagonal(), np.asarray(diag), atol=1e-5)
