"""Device-side augmentation tests (ops/augment.py vs the reference's rules,
/root/reference/utilities/mixup.py and BoxTransforms.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_transformer_tpu.models.criterion import empty_targets
from sound_event_detection_transformer_tpu.ops import augment


def test_gaussian_noise_pair_snr():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((4, 100, 16)) * 2.0
    clean, noisy = augment.gaussian_noise_pair(x, rng, snr=30.0, p=1.0)
    np.testing.assert_array_equal(np.asarray(clean), np.asarray(x))
    noise = np.asarray(noisy - clean)
    # expected std: sqrt(mean(x^2) * 10^-3) = 2 * ~0.0316
    assert 0.02 < noise.std() < 0.1
    # p=0: untouched
    _, same = augment.gaussian_noise_pair(x, rng, snr=30.0, p=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))


def test_time_and_freq_mask_zero_bands():
    rng = jax.random.PRNGKey(1)
    x = jnp.ones((8, 100, 32))
    tm = np.asarray(augment.time_mask(x, rng, p=1.0, min_band_part=0.1,
                                      max_band_part=0.1))
    # each sample has ~10 fully-zeroed frames
    zeros_per_sample = (tm == 0).all(axis=2).sum(axis=1)
    assert ((zeros_per_sample >= 9) & (zeros_per_sample <= 11)).all()
    fm = np.asarray(augment.freq_mask(x, rng, p=1.0, min_mask_fraction=0.25,
                                      max_mask_fraction=0.25))
    zero_bands = (fm == 0).all(axis=1).sum(axis=1)
    assert ((zero_bands >= 7) & (zero_bands <= 9)).all()


def test_freq_shift_rolls_with_zero_fill():
    rng = jax.random.PRNGKey(2)
    x = jnp.arange(16, dtype=jnp.float32)[None, None, :].repeat(4, 0).repeat(3, 1)
    out = np.asarray(augment.freq_shift(x, rng, p=1.0, max_band=4, std=10.0))
    for b in range(4):
        row = out[b, 0]
        orig = np.arange(16, dtype=np.float32)
        nz = row != 0
        # the shifted content preserves consecutive ordering
        if nz.any():
            vals = row[nz]
            assert (np.diff(vals) == 1).all()


def _mk_targets(events):
    """events: list per sample of (label, center, length)"""
    B, M = len(events), 6
    t = empty_targets(B, M, 10.0)
    labels = np.zeros((B, M), np.int32)
    boxes = np.zeros((B, M, 2), np.float32)
    valid = np.zeros((B, M), bool)
    for b, evs in enumerate(events):
        for j, (l, c, w) in enumerate(evs):
            labels[b, j] = l
            boxes[b, j] = [c, w]
            valid[b, j] = True
    return t._replace(
        labels=jnp.asarray(labels), boxes=jnp.asarray(boxes),
        box_valid=jnp.asarray(valid), label_valid=jnp.asarray(valid),
    )


def test_concat_targets_union():
    t1 = _mk_targets([[(1, 0.2, 0.1)]])
    t2 = _mk_targets([[(2, 0.6, 0.1), (0, 0.8, 0.05)]])
    u = augment.concat_targets(t1, t2, jnp.asarray(0.7))
    assert int(u.label_valid.sum()) == 3
    labels = np.asarray(u.labels)[0][np.asarray(u.label_valid)[0]]
    np.testing.assert_array_equal(labels, [1, 2, 0])
    ratios = np.asarray(u.ratio)[0][np.asarray(u.label_valid)[0]]
    np.testing.assert_allclose(ratios, [0.7, 0.3, 0.3], atol=1e-6)


def test_overlap_detector():
    # same class, overlapping
    t = _mk_targets([[(1, 0.3, 0.2), (1, 0.35, 0.2)]])
    assert bool(augment._has_same_class_overlap(
        t.labels[0], t.boxes[0], t.box_valid[0]))
    # same class, disjoint
    t2 = _mk_targets([[(1, 0.2, 0.1), (1, 0.6, 0.1)]])
    assert not bool(augment._has_same_class_overlap(
        t2.labels[0], t2.boxes[0], t2.box_valid[0]))
    # different classes overlapping: fine
    t3 = _mk_targets([[(1, 0.3, 0.2), (2, 0.35, 0.2)]])
    assert not bool(augment._has_same_class_overlap(
        t3.labels[0], t3.boxes[0], t3.box_valid[0]))


def test_mixup_accepts_disjoint_and_rejects_overlap():
    B = 2
    feats = jnp.stack([jnp.zeros((32, 8, 1)), jnp.ones((32, 8, 1))])
    # sample 0: class1 @ [0.1,0.3]; sample 1: class1 @ [0.6,0.8] -> union ok
    t = _mk_targets([[(1, 0.2, 0.2)], [(1, 0.7, 0.2)]])
    strong = jnp.ones((B,), bool)
    weak = jnp.zeros((B,), bool)
    out_f, out_t, s2, w2 = augment.mixup(
        feats, t, strong, weak, jax.random.PRNGKey(0), mix_up_ratio=1.0,
        alpha=1.0, max_events=6,
    )
    counts = np.asarray(out_t.box_valid.sum(-1))
    # accepted mixes have 2 events; rejected keep 1
    assert set(counts.tolist()) <= {1, 2}
    assert np.asarray(s2).all()

    # force same-class overlap -> rejection keeps original single event
    t_ov = _mk_targets([[(1, 0.5, 0.4)], [(1, 0.5, 0.4)]])
    _, out_t2, _, _ = augment.mixup(
        feats, t_ov, strong, weak, jax.random.PRNGKey(0), mix_up_ratio=1.0,
        alpha=1.0, max_events=6,
    )
    assert (np.asarray(out_t2.box_valid.sum(-1)) == 1).all()


def test_mixup_label_unlabel_shapes():
    fl = jnp.zeros((4, 32, 8, 1))
    fu = jnp.ones((4, 32, 8, 1))
    tl = _mk_targets([[(1, 0.2, 0.1)]] * 4)
    tu = _mk_targets([[(2, 0.7, 0.1)]] * 4)
    out_f, out_t = augment.mixup_label_unlabel(
        fl, fu, tl, tu, jax.random.PRNGKey(3), mix_up_ratio=0.5, alpha=1.0,
    )
    assert out_f.shape == fu.shape
    # first 2 mixed (accepted: disjoint classes) -> 2 events; rest 1
    counts = np.asarray(out_t.box_valid.sum(-1))
    assert counts[2:].tolist() == [1, 1]
