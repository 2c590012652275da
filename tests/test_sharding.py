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
