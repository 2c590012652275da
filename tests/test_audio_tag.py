"""Audio-tag trainer learns from a COLD backbone (no ImageNet init).

Regression for the dead-training bug: probability-space BCE on clipped
sigmoid outputs has zero gradient once saturated, and a from-scratch model
saturates at init — the loss froze at its initial value forever.  The
logit-space BCE (models/resnet.py AudioTagBackbone.logits_out) must descend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from sound_event_detection_transformer_tpu.models.resnet import AudioTagBackbone


def test_at_logit_bce_descends_from_cold_start(rng):
    B, T, F, C = 8, 64, 64, 3
    model = AudioTagBackbone(arch="resnet18", pooling="avg", num_classes=C,
                             logits_out=True)
    x = jnp.asarray(rng.randn(B, T, F, 1) * 3.0, jnp.float32)  # hot input
    y = jnp.asarray(rng.rand(B, C) < 0.3, jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    params, frozen = variables["params"], variables.get("frozen", {})
    tx = optax.chain(optax.clip_by_global_norm(0.1), optax.adam(1e-3))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            z = model.apply({"params": p, "frozen": frozen}, x)
            return optax.sigmoid_binary_cross_entropy(z, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # must actually move and descend (the dead version stays bit-identical)
    assert losses[-1] < losses[0] * 0.9, losses
    assert len({round(l, 6) for l in losses}) > 1
