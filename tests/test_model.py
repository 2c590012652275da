"""Model-level tests: shapes, masks, pooling variants, SP-SEDT, attention
kernel equivalence, EMA/pseudo-labels, postprocess fusion strategies."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_transformer_tpu.config import SEDTConfig
from sound_event_detection_transformer_tpu.models import (
    build_model,
    empty_targets,
    postprocess,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = SEDTConfig.tiny_test()
    model, wd = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    B, T, F = 2, cfg.model.max_frames, cfg.model.n_mels
    feats = jax.random.normal(rng, (B, T, F, 1))
    pad = jnp.zeros((B, T), bool)
    variables = model.init({"params": rng, "dropout": rng}, feats, pad, True)
    return cfg, model, variables, feats, pad


def test_output_shapes(tiny):
    cfg, model, variables, feats, pad = tiny
    out = model.apply(variables, feats, pad, True)
    Q, C = cfg.model.num_queries, cfg.model.num_classes
    assert out["pred_logits"].shape == (2, Q, C + 1)
    assert out["pred_boxes"].shape == (2, Q, 2)
    assert out["at"].shape == (2, C)
    assert out["aux_logits"].shape == (cfg.model.dec_layers - 1, 2, Q, C + 1)
    assert ((np.asarray(out["pred_boxes"]) >= 0) & (np.asarray(out["pred_boxes"]) <= 1)).all()
    assert ((np.asarray(out["at"]) >= 0) & (np.asarray(out["at"]) <= 1)).all()


def test_dropout_changes_train_outputs(tiny):
    cfg, model, variables, feats, pad = tiny
    o1 = model.apply(variables, feats, pad, False,
                     rngs={"dropout": jax.random.PRNGKey(1)})
    o2 = model.apply(variables, feats, pad, False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.abs(np.asarray(o1["pred_logits"] - o2["pred_logits"])).max() > 1e-6
    # deterministic eval: identical
    e1 = model.apply(variables, feats, pad, True)
    e2 = model.apply(variables, feats, pad, True)
    np.testing.assert_array_equal(np.asarray(e1["pred_logits"]),
                                  np.asarray(e2["pred_logits"]))


@pytest.mark.parametrize("pooling", ["max", "avg", "attn", "weighted_sum"])
def test_pooling_variants(pooling):
    cfg = SEDTConfig.tiny_test()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, pooling=pooling))
    model, wd = build_model(cfg)
    assert "loss_weak_p" in wd
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (2, cfg.model.max_frames, cfg.model.n_mels, 1))
    pad = jnp.zeros((2, cfg.model.max_frames), bool)
    variables = model.init({"params": rng, "dropout": rng}, feats, pad, True)
    out = model.apply(variables, feats, pad, True)
    assert out["at_p"].shape == (2, cfg.model.num_classes)
    assert np.isfinite(np.asarray(out["at_p"])).all()


def test_spsedt_forward_and_feature_recon():
    cfg = SEDTConfig.tiny_test()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, self_sup=True, feature_recon=True, dec_at=False,
            num_queries=6, num_patches=3,
        )
    )
    model, wd = build_model(cfg)
    assert "loss_feature" in wd
    rng = jax.random.PRNGKey(0)
    B, T, F = 2, cfg.model.max_frames, cfg.model.n_mels
    feats = jax.random.normal(rng, (B, T, F, 1))
    pad = jnp.zeros((B, T), bool)
    patches = jax.random.normal(rng, (B, 3, 64, 32, 1))
    variables = model.init(
        {"params": rng, "dropout": rng, "patch_mask": rng}, feats, pad, patches, True
    )
    out = model.apply(variables, feats, pad, patches, True)
    # num_classes forced to 1 in self-sup (reference sedt/__init__.py:9-11)
    assert out["pred_logits"].shape[-1] == 2
    assert out["pred_feature"].shape == (B, 6, 512)  # resnet18 channels
    assert out["gt_feature"].shape == (B, 3, 512)
    # train path applies query masking via the patch_mask rng
    out_tr = model.apply(
        variables, feats, pad, patches, False,
        rngs={"dropout": jax.random.PRNGKey(1), "patch_mask": jax.random.PRNGKey(2)},
    )
    assert out_tr["pred_logits"].shape == out["pred_logits"].shape


def test_postprocess_fusion_strategies(rng):
    B, Q, C = 2, 5, 3
    logits = jnp.asarray(rng.randn(B, Q, C + 1), jnp.float32)
    boxes = jax.nn.sigmoid(jnp.asarray(rng.randn(B, Q, 2), jnp.float32))
    out = {"pred_logits": logits, "pred_boxes": boxes}
    sizes = jnp.full((B,), 10.0)
    tags = jnp.asarray([[1, 0, 1], [0, 0, 0]], jnp.float32)

    p0 = postprocess(out, sizes, None)
    assert p0.boxes.shape == (B, Q, 2)
    # boxes scale to seconds; (c + l/2) can exceed 1 so ends may exceed the
    # clip length — the decoder clips later (reference engine.py:287)
    assert float(np.asarray(p0.boxes).max()) <= 15.0

    p1 = postprocess(out, sizes, tags, at_m=1)
    # tag-gated: sample 1 has all-zero tags -> all scores 0
    assert float(np.asarray(p1.scores[1]).max()) == 0.0

    p2 = postprocess(out, sizes, tags, at_m=2)
    # active classes' best query >= 0.5 before gating -> max score >= 0.5
    assert float(np.asarray(p2.scores[0]).max()) >= 0.5

    p3 = postprocess(out, sizes, tags, at_m=3)
    assert np.isfinite(np.asarray(p3.scores)).all()

    psemi = postprocess(out, sizes, None, is_semi=True)
    np.testing.assert_allclose(np.asarray(psemi.boxes), np.asarray(boxes))


def test_flash_attention_matches_reference(rng):
    from sound_event_detection_transformer_tpu.ops.attention import (
        make_key_padding_bias, scaled_dot_attention,
    )
    from sound_event_detection_transformer_tpu.ops.pallas.flash_attention import (
        flash_attention,
    )

    q = jnp.asarray(rng.randn(2, 2, 40, 32), jnp.float32)
    k = jnp.asarray(rng.randn(2, 2, 150, 32), jnp.float32)
    v = jnp.asarray(rng.randn(2, 2, 150, 32), jnp.float32)
    pad = jnp.zeros((2, 150), bool).at[:, 120:].set(True)
    bias = make_key_padding_bias(pad)
    ref = scaled_dot_attention(q, k, v, bias, use_flash=False)
    fl = flash_attention(q, k, v, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(fl), np.asarray(ref), atol=2e-2)


def test_same_class_nms():
    from sound_event_detection_transformer_tpu.engine import same_class_nms

    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    labels = jnp.asarray([0, 0, 1, 0])
    boxes = jnp.asarray([
        [0.3, 0.2],   # kept (highest)
        [0.35, 0.2],  # same class, overlaps 0 -> dropped
        [0.35, 0.2],  # class 1 -> kept
        [0.8, 0.1],   # class 0, disjoint -> kept
    ])
    keep = np.asarray(same_class_nms(scores, labels, boxes, jnp.ones(4, bool)))
    np.testing.assert_array_equal(keep, [True, False, True, True])


def test_get_pseudo_labels_filters():
    from sound_event_detection_transformer_tpu.engine import get_pseudo_labels

    B, Q, C = 1, 4, 3
    logits = np.full((B, Q, C + 1), -8.0, np.float32)
    logits[0, 0, 0] = 8.0   # confident class 0, long enough -> kept
    logits[0, 1, 1] = 8.0   # confident class 1 but too short -> dropped
    logits[0, 2, 2] = 8.0   # confident class 2, 1 s long -> kept
    # query 3: uniform logits -> score 0.25 < threshold -> dropped
    boxes = np.array([[[0.3, 0.2], [0.6, 0.001], [0.8, 0.1], [0.5, 0.5]]],
                     np.float32)
    out = {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)}
    thr = jnp.full((C,), 0.5)
    targets, counts = get_pseudo_labels(out, thr, jnp.full((B,), 10.0), 4)
    assert int(targets.box_valid.sum()) == 2
    kept_labels = sorted(
        np.asarray(targets.labels)[np.asarray(targets.box_valid)].tolist()
    )
    assert kept_labels == [0, 2]
    assert counts.tolist() == [1.0, 0.0, 1.0]


def test_ema_update():
    from sound_event_detection_transformer_tpu.parallel.optim import ema_update

    ema = {"w": jnp.ones((3,))}
    new = {"w": jnp.zeros((3,))}
    out = ema_update(ema, new, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_bfloat16_compute_path(rng):
    """bf16 activations: finite f32 outputs, params stay f32."""
    cfg = SEDTConfig.tiny_test()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, compute_dtype="bfloat16"))
    model, _ = build_model(cfg)
    key = jax.random.PRNGKey(0)
    feats = jax.random.normal(key, (2, cfg.model.max_frames, cfg.model.n_mels, 1))
    pad = jnp.zeros((2, cfg.model.max_frames), bool)
    variables = model.init({"params": key, "dropout": key}, feats, pad, True)
    assert all(
        v.dtype == jnp.float32 for v in jax.tree.leaves(variables["params"])
    )
    out = model.apply(variables, feats, pad, True)
    assert out["pred_logits"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
    assert np.isfinite(np.asarray(out["at"])).all()


def test_spsedt_query_shuffle():
    """query_shuffle permutes the event queries during training
    (reference spsedt.py:60; was a silent no-op in round 1)."""
    import dataclasses

    cfg = SEDTConfig.tiny_test()
    mk = lambda qs: dataclasses.replace(
        cfg.model, self_sup=True, dec_at=False, num_queries=6, num_patches=3,
        query_shuffle=qs, mask_ratio=0.0,
    )
    cfg_on = cfg.replace(model=mk(True))
    cfg_off = cfg.replace(model=mk(False))
    model_on, _ = build_model(cfg_on)
    model_off, _ = build_model(cfg_off)

    rng = jax.random.PRNGKey(0)
    B, T, F = 1, cfg.model.max_frames, cfg.model.n_mels
    feats = jax.random.normal(rng, (B, T, F, 1))
    pad = jnp.zeros((B, T), bool)
    patches = jax.random.normal(rng, (B, 3, 64, 32, 1))
    variables = model_off.init(
        {"params": rng, "dropout": rng, "patch_mask": rng}, feats, pad,
        patches, True,
    )

    def run(model, key):
        return np.asarray(model.apply(
            variables, feats, pad, patches, False,
            rngs={"dropout": jax.random.PRNGKey(0),
                  "patch_mask": jax.random.PRNGKey(key)},
        )["pred_boxes"])

    # without shuffle: deterministic given fixed rngs (mask_ratio 0)
    np.testing.assert_array_equal(run(model_off, 1), run(model_off, 2))
    # with shuffle: different patch_mask keys give different permutations
    outs = [run(model_on, k) for k in range(6)]
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])
