"""Multi-device tests on the 8-device virtual CPU mesh: DP equivalence,
TP param shardings, dryrun entry points (SURVEY.md §4's answer to testing
distribution without a cluster)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_transformer_tpu.config import MeshConfig, SEDTConfig
from sound_event_detection_transformer_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch_pytree,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig())
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh2 = make_mesh(MeshConfig(n_model=2))
    assert dict(mesh2.shape) == {"data": 4, "model": 2}


def test_param_sharding_rules():
    mesh = make_mesh(MeshConfig(n_model=2))
    params = {
        "transformer": {
            "encoder_layer_0": {
                "ffn": {"linear1": {"kernel": jnp.zeros((64, 128)),
                                     "bias": jnp.zeros((128,))},
                        "linear2": {"kernel": jnp.zeros((128, 64)),
                                     "bias": jnp.zeros((64,))}},
                "self_attn": {"q_proj": {"kernel": jnp.zeros((64, 64)),
                                          "bias": jnp.zeros((64,))}},
            }
        },
        "class_embed": {"kernel": jnp.zeros((64, 5))},
    }
    sh = param_sharding(params, mesh)
    enc = sh["transformer"]["encoder_layer_0"]
    assert enc["ffn"]["linear1"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert enc["ffn"]["linear2"]["kernel"].spec == jax.sharding.PartitionSpec("model", None)
    assert enc["self_attn"]["q_proj"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert sh["class_embed"]["kernel"].spec == jax.sharding.PartitionSpec()


def test_data_parallel_matches_single_device():
    """pjit-sharded loss == single-device loss on the same batch."""
    mesh = make_mesh(MeshConfig())

    def loss_fn(w, x, y):
        pred = jnp.tanh(x @ w)
        return ((pred - y) ** 2).mean()

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(16, 4), jnp.float32)
    x = jnp.asarray(rng.randn(32, 16), jnp.float32)
    y = jnp.asarray(rng.randn(32, 4), jnp.float32)

    single = jax.jit(jax.value_and_grad(loss_fn))(w, x, y)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    with mesh:
        sharded = jax.jit(jax.value_and_grad(loss_fn))(w, xs, ys)
    np.testing.assert_allclose(float(single[0]), float(sharded[0]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(single[1]), np.asarray(sharded[1]), rtol=1e-4, atol=1e-6
    )


@pytest.mark.slow  # ~250 s: full train step on a (data x model) mesh; the
# driver's dryrun_multichip exercises this same path every round
def test_sharded_train_step_runs_dp_tp():
    """Tiny SEDT train step over a (4, 2) mesh: compiles + finite loss."""
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles_small():
    """entry()'s fn jits (use tiny shapes to keep CPU compile fast)."""
    from sound_event_detection_transformer_tpu.models import build_model
    import __graft_entry__ as g

    cfg = g._flagship_cfg(tiny=True)
    model, _ = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    B, T, F = 1, cfg.model.max_frames, cfg.model.n_mels
    feats = jnp.zeros((B, T, F, 1))
    pad = jnp.zeros((B, T), bool)
    variables = model.init({"params": rng, "dropout": rng}, feats, pad, True)

    @jax.jit
    def fn(params, frozen, feats, pad):
        out = model.apply({"params": params, "frozen": frozen}, feats, pad, True)
        return out["pred_logits"]

    res = fn(variables["params"], variables.get("frozen", {}), feats, pad)
    assert np.isfinite(np.asarray(res)).all()


def test_semi_step_dp_matches_single_device():
    """Mean-teacher semi step over the 8-device data mesh == single device.

    The fixed 1/4+1/4+1/2 stream layout shards over ``data``; pjit's global
    array semantics make per-device stream composition irrelevant
    (train_lib.run_semi's mesh path)."""
    import __graft_entry__ as g
    from sound_event_detection_transformer_tpu.engine import (
        TrainState, make_semi_train_step,
    )
    from sound_event_detection_transformer_tpu.models import (
        build_model, empty_targets,
    )
    from sound_event_detection_transformer_tpu.parallel.mesh import (
        replicated,
    )
    from sound_event_detection_transformer_tpu.parallel.optim import (
        make_optimizer,
    )

    cfg = g._flagship_cfg(tiny=True)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, batch_size=8))
    model, wd = build_model(cfg)
    B, T, F = 8, cfg.model.max_frames, cfg.model.n_mels
    rng = jax.random.PRNGKey(0)
    feats0 = jnp.zeros((B, T, F, 1), jnp.float32)
    pad = np.zeros((B, T), bool)
    variables = model.init({"params": rng, "dropout": rng}, feats0, pad, True)
    params = variables["params"]
    tx = make_optimizer(params, cfg.train, steps_per_epoch=10)
    state = TrainState(params, variables.get("frozen", {}), tx.init(params),
                       jnp.asarray(0))
    ema = jax.tree.map(jnp.copy, params)

    step = make_semi_train_step(model, wd, cfg, tx, n_labeled=4)

    npr = np.random.RandomState(0)
    tfeat = npr.randn(B, T, F, 1).astype(np.float32)
    sfeat = tfeat + npr.randn(B, T, F, 1).astype(np.float32) * 0.01
    tgts = empty_targets(B, cfg.model.max_events, 10.0)
    tgts = tgts._replace(
        labels=tgts.labels.at[:, 0].set(1),
        boxes=tgts.boxes.at[:, 0].set(jnp.array([0.5, 0.2])),
        box_valid=tgts.box_valid.at[:4, 0].set(True),
        label_valid=tgts.label_valid.at[:4, 0].set(True),
    )
    pos = np.arange(B)
    strong = pos < 2
    weak = (pos >= 2) & (pos < 4)
    unlab = pos >= 4
    thr = np.full((cfg.model.num_classes,), 0.5, np.float32)
    k = jax.random.PRNGKey(7)
    do_ema = jnp.asarray(True)

    # single device: uncommitted host inputs
    _, ema1, m1, c1 = step(state, ema, tfeat, sfeat, pad, tgts,
                           strong, weak, unlab, thr, k, do_ema)

    mesh = make_mesh(MeshConfig())
    put_rep = lambda tree: jax.device_put(
        tree, jax.tree.map(lambda _: replicated(mesh), tree)
    )
    state_r = TrainState(put_rep(state.params), put_rep(state.frozen),
                         put_rep(state.opt_state), state.step)
    fsh = batch_sharding(mesh)
    tfeat_s, sfeat_s, pad_s, tgts_s = shard_batch_pytree(
        (tfeat, sfeat, pad, tgts), mesh
    )
    strong_s = jax.device_put(strong, fsh)
    weak_s = jax.device_put(weak, fsh)
    unlab_s = jax.device_put(unlab, fsh)
    _, ema2, m2, c2 = step(state_r, put_rep(ema), tfeat_s, sfeat_s, pad_s,
                           tgts_s, strong_s, weak_s, unlab_s, thr, k, do_ema)

    # bf16 compute: cross-device psum reduction order shifts the loss at
    # the ~2e-4 relative level
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2))
