"""Worker for the true multi-process SPMD test (NOT a pytest module).

Launched by tests/test_multihost.py as N cooperating processes, each with 2
virtual CPU devices: initializes ``jax.distributed`` (Gloo over localhost),
builds the repo's mesh, and runs ONE supervised train step where every
process contributes only its contiguous per-host slice of the global batch
through ``shard_batch_pytree`` — the reference's DistributedSampler + DDP
flow done the SPMD way (SURVEY.md §2.2).  Prints ``LOSS=<v>`` on success;
the parent asserts both processes print the identical finite value.
"""
import os
import sys

port, pid, nprocs = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.distributed.initialize(
    f"localhost:{port}", num_processes=nprocs, process_id=pid
)
assert jax.process_count() == nprocs, jax.process_count()

import numpy as np
import jax.numpy as jnp

from sound_event_detection_transformer_tpu import config as C
from sound_event_detection_transformer_tpu.engine import (
    Batch, TrainState, make_train_step,
)
from sound_event_detection_transformer_tpu.models import build_model, empty_targets
from sound_event_detection_transformer_tpu.parallel.mesh import (
    make_mesh, replicated, shard_batch_pytree,
)
from sound_event_detection_transformer_tpu.parallel.optim import make_optimizer

feats = C.FeatureConfig.urbansed()
cfg = C.SEDTConfig(
    features=feats,
    model=C.ModelConfig(
        backbone="resnet18", enc_layers=1, dec_layers=1, num_queries=5,
        num_classes=10, dec_at=True, max_frames=64, n_mels=feats.n_mels,
    ),
    data=C.DataConfig(dataset_name="urbansed", classes=C.URBAN_CLASSES,
                      batch_size=4),
)
model, wd = build_model(cfg)
mesh = make_mesh(C.MeshConfig(n_model=1))
assert mesh.shape["data"] == 2 * nprocs, dict(mesh.shape)

B, T, F = cfg.data.batch_size, cfg.model.max_frames, cfg.model.n_mels
rng = jax.random.PRNGKey(0)  # same seed everywhere -> identical init
variables = model.init(
    {"params": rng, "dropout": rng},
    jnp.zeros((1, T, F, 1)), jnp.zeros((1, T), bool), True,
)
put_rep = lambda tree: jax.device_put(
    tree, jax.tree.map(lambda _: replicated(mesh), tree)
)
params = put_rep(variables["params"])
frozen = put_rep(variables.get("frozen", {}))
tx = make_optimizer(params, cfg.train, steps_per_epoch=10)
opt_state = put_rep(tx.init(params))
state = TrainState(params, frozen, opt_state, jnp.asarray(0))

# deterministic GLOBAL batch; each process keeps only its contiguous slice
tgts = empty_targets(B, cfg.model.max_events, cfg.features.max_len_seconds)
tgts = tgts._replace(
    labels=tgts.labels.at[:, 0].set(1),
    boxes=tgts.boxes.at[:, 0].set(jnp.array([0.5, 0.2])),
    box_valid=tgts.box_valid.at[:, 0].set(True),
    label_valid=tgts.label_valid.at[:, 0].set(True),
)
feats_global = np.random.RandomState(0).randn(B, T, F, 1).astype(np.float32)
lo, hi = pid * B // nprocs, (pid + 1) * B // nprocs
local = Batch(
    feats=feats_global[lo:hi],
    pad_mask=np.zeros((hi - lo, T), bool),
    targets=jax.tree.map(lambda x: np.asarray(x)[lo:hi], tgts),
    strong=np.ones((hi - lo,), bool),
    weak=np.zeros((hi - lo,), bool),
)
batch = shard_batch_pytree(local, mesh)  # make_array_from_process_local_data

step = make_train_step(model, wd, cfg, tx)
with mesh:
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
assert np.isfinite(loss), loss

# Sharded FeatureBank across processes: each host loads only its shard's
# clips; the gather's psum_scatter assembles a batch every process can
# verify through its addressable output shards.
from sound_event_detection_transformer_tpu.data.encoder import BoxEncoder
from sound_event_detection_transformer_tpu.data.feature_bank import FeatureBank
from sound_event_detection_transformer_tpu.data.synthetic import SyntheticDataset

enc = BoxEncoder(len(cfg.data.classes), seconds=cfg.features.max_len_seconds)
ds = SyntheticDataset(
    9, list(cfg.data.classes), T, F, enc.encode_strong_df, max_events=2, seed=0
)
bank = FeatureBank(ds, mesh=mesh, shard=True)
# raw frame counts allgathered: complete on every host (features stay 1/d)
assert len(bank.raw_frames) == len(ds), sorted(bank.raw_frames)
assert all(v > 0 for v in bank.raw_frames.values())
idx = np.array([8, 3, 0, 5], np.int32)  # same global batch on every host
got = bank.gather(idx)
want = {
    j: np.asarray(ds.features_only(int(i))[0], np.float32)[..., None]
    for j, i in enumerate(idx)
}
for s in got.addressable_shards:
    rows = range(s.index[0].start or 0, s.index[0].stop or len(idx))
    for off, j in enumerate(rows):
        np.testing.assert_array_equal(np.asarray(s.data)[off], want[j])

# Full multi-host bank training path: batch_iterator emits GLOBAL index
# batches + per-host target slices; allgathered raw_frames let any host
# build targets for any clip; two real train steps must agree everywhere.
from sound_event_detection_transformer_tpu.data.dataset import batch_iterator

ds2 = SyntheticDataset(
    8, list(cfg.data.classes), T, F, enc.encode_strong_df, max_events=2, seed=1
)
bank2 = FeatureBank(ds2, mesh=mesh, shard=True)
assert len(bank2.raw_frames) == len(ds2), sorted(bank2.raw_frames)
loop_losses = []
for b in batch_iterator(ds2, B, cfg.model.max_events,
                        cfg.features.max_len_seconds,
                        prefetch=False, to_device=False, bank=bank2):
    assert len(b.indexes) == B and len(b.strong) == B // nprocs
    idx = b.indexes
    b = shard_batch_pytree(b._replace(indexes=None), mesh)
    b = b._replace(feats=bank2.gather(np.maximum(idx, 0)))
    with mesh:
        state, metrics = step(state, b, jax.random.PRNGKey(4))
        loop_losses.append(float(metrics["loss"]))
assert all(np.isfinite(l) for l in loop_losses), loop_losses
print(f"BANKLOSS={loop_losses[-1]:.6f}", flush=True)
print(f"LOSS={loss:.6f}", flush=True)
