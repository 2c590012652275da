"""On-device patch extraction == the host crop/resize pipeline
(ops/patches.py vs data/transforms.py, reference BoxTransforms.py:315-360)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_transformer_tpu.data.transforms import (
    extract_patches,
    get_random_patch_boxes,
)
from sound_event_detection_transformer_tpu.ops.patches import (
    extract_patches_device,
)


@pytest.mark.parametrize("T,F", [(128, 64), (496, 64), (100, 48)])
def test_device_matches_host(T, F, rng):
    B, P = 3, 5
    feats = rng.randn(B, T, F).astype(np.float32)
    boxes = np.stack(
        [get_random_patch_boxes(T, P, rng=np.random.RandomState(i))
         for i in range(B)]
    )
    host = np.stack(
        [extract_patches(feats[b], boxes[b], out_t=128, out_f=64)
         for b in range(B)]
    )  # [B, P, 128, 64]
    dev = extract_patches_device(
        jnp.asarray(feats[..., None]), jnp.asarray(boxes)
    )
    np.testing.assert_allclose(np.asarray(dev[..., 0]), host, atol=2e-5)


def test_empty_box_guard(rng):
    """Degenerate (zero-length) boxes take the host's widen-by-one path."""
    T, F = 64, 64
    feats = rng.randn(1, T, F).astype(np.float32)
    boxes = np.array([[[0.5, 0.0], [0.0, 0.0], [1.0, 0.0]]], np.float32)
    host = extract_patches(feats[0], boxes[0], out_t=128, out_f=64)
    dev = extract_patches_device(
        jnp.asarray(feats[..., None]), jnp.asarray(boxes)
    )
    np.testing.assert_allclose(np.asarray(dev[0, ..., 0]), host, atol=2e-5)
