"""Device-resident feature bank: the dataset lives in HBM, batches are
gathered in-graph.

The reference streams every batch host -> device each step (pinned-memory
DataLoader + side-CUDA-stream ``data_prefetcher``, reference
DataLoad.py:304-336).  Through this backend's remote-device tunnel that
transfer is the dominant cost of the heaviest recipe (SP-SEDT pretrain,
batch 200: ~25 MB of spectrograms per step; the measured loop ran at ~1/3 of
the pure-step rate).  The TPU-native answer is to stop shipping features at
all: the post-transform features of the WHOLE dataset are stacked once and
device_put into HBM (a 39k-clip DCASE unlabeled set is ~5 GB float32 —
comfortable on a 16 GB chip), and each step gathers its batch on device from
a traced index array.  The host then ships only O(B) int32 indices and the
O(B*M) dense target scalars per step.

Valid because the host transform chain (log -> pad -> normalize,
data/transforms.py:121-143) is deterministic and never reads the labels;
all stochastic augmentation already runs on device (ops/augment.py,
ops/patches.py).

Two device layouts: replicated (default — local gather, capacity = one
chip's HBM) and sharded over the mesh's data axis (``shard=True`` — each
chip holds 1/d of the clips and one ``psum_scatter`` per step assembles the
batch already batch-sharded; capacity scales with the mesh).  ``maybe_bank``
picks automatically: replicated if it fits, else sharded, else host stream.

Multi-host: the sharded layout constructs via ``make_array_from_callback``,
so each process loads and holds ONLY its addressable shards' clips (host RAM
and HBM both scale 1/d); raw frame counts allgather once so any host can
build targets for any clip.  ``batch_iterator(bank=...)`` then emits GLOBAL
index batches (identical on every host — the samplers are seed-synchronized)
next to per-host target slices, and ``maybe_bank`` selects the sharded
layout whenever processes > 1 and a mesh exists.  Proven end to end by the
2-process SPMD test (tests/test_multihost.py).  The replicated layout stays
single-host.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _take0(bank, idx):
    return bank[idx]


def _make_sharded_gather(mesh, shard_size: int, axis: str):
    """Shard-local gather + reduce-scatter over the ``data`` axis.

    The bank lives SPLIT over the mesh's data axis (each device holds a
    contiguous ``shard_size``-clip slice), so dataset capacity scales with
    the number of chips instead of being capped at one chip's HBM.  Each
    device gathers the batch rows it owns (others contribute zeros) and a
    single ``psum_scatter`` assembles the batch already sharded over
    ``data`` — exactly one [B/d, T, F, 1] tile of collective traffic per
    device per step, and the indices stay fully arbitrary (no sampler
    constraints).  This is the scaling-book recipe: pick shardings, let the
    collective do the assembly.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def _take(bank, idx):
        k = jax.lax.axis_index(axis)
        local = idx.astype(jnp.int32) - k * shard_size
        inshard = (local >= 0) & (local < shard_size)
        rows = bank[jnp.clip(local, 0, shard_size - 1)]
        mask = inshard.reshape((-1,) + (1,) * (rows.ndim - 1))
        rows = jnp.where(mask, rows, 0)
        return jax.lax.psum_scatter(rows, axis, scatter_dimension=0, tiled=True)

    return jax.jit(
        shard_map(
            _take, mesh=mesh, in_specs=(P(axis), P()), out_specs=P(axis)
        )
    )


class FeatureBank:
    """Stack ``dataset.features_only(i)`` for all clips and hold it in HBM.

    ``gather(idx)`` returns the ``[B, T, F, 1]`` float32 feature batch as a
    device array (batch-sharded over the mesh's data axis when a mesh is
    given).  The gather is a separate tiny jit — one HBM copy of the batch
    (~30 us) instead of a host transfer.  CLAUDE.md gotcha honored: the
    index array is a traced argument, never a closure constant, so XLA
    cannot constant-fold the gather.

    Two device layouts:

    * ``shard=False`` (default): the bank replicates on every device and the
      gather is purely local — fastest, capacity = one chip's HBM.
    * ``shard=True`` (needs a mesh): the bank splits over the ``data`` axis
      (rows padded to a multiple of the axis size; the padded tail is never
      indexed) and batches assemble via one reduce-scatter — capacity
      scales with the mesh's data-axis size.  ``gather`` then requires
      ``len(idx)`` divisible by that axis size (already true for any
      batch that shards over ``data``).
    """

    def __init__(self, dataset, mesh=None, log=None, shard: bool = False):
        import jax

        assert shard or jax.process_count() == 1, (
            "the replicated bank is single-host; multi-process needs shard=True"
        )
        assert not shard or mesh is not None, "sharded bank needs a mesh"
        self.sharded = bool(shard)
        self.raw_frames: dict = {}
        n_real = len(dataset)
        if shard:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            d = mesh.shape[axis]
            n_pad = -(-n_real // d) * d
            sample0 = np.asarray(dataset.features_only(0)[0], np.float32)
            self.shape = (n_real, *sample0.shape, 1)
            self.nbytes = n_real * sample0.nbytes * 1  # trailing channel dim
            self.shard_size = n_pad // d
            cache: dict = {}

            def load(i: int) -> np.ndarray:
                i = i % n_real  # padded tail wraps to the head; never indexed
                if i not in cache:
                    feat, t_raw = dataset.features_only(i)
                    cache[i] = np.asarray(feat, np.float32)[..., None]
                    self.raw_frames[i] = int(t_raw)
                return cache[i]

            def shard_rows(index):
                sl = index[0]
                return np.stack([load(i) for i in range(sl.start, sl.stop)])

            # each process materializes ONLY its addressable shards' rows —
            # this is what makes the bank multi-host capable (and keeps host
            # RAM at 1/d of the dataset)
            self._bank = jax.make_array_from_callback(
                (n_pad, *self.shape[1:]), NamedSharding(mesh, P(axis)),
                shard_rows,
            )
            cache.clear()
            self._gather = _make_sharded_gather(mesh, self.shard_size, axis)
            if jax.process_count() > 1:
                # targets are built host-side for arbitrary batch slices, so
                # every host needs every clip's pre-pad frame count — merge
                # the per-shard raw_frames across processes (max: data-shard
                # replicas along the model axis hold identical values)
                from jax.experimental import multihost_utils

                local = np.zeros(n_real, np.int32)
                for i, t in self.raw_frames.items():
                    local[i] = t
                merged = np.maximum.reduce(
                    np.asarray(multihost_utils.process_allgather(local))
                )
                self.raw_frames = {i: int(v) for i, v in enumerate(merged)}
        else:
            feats = []
            for i in range(n_real):
                feat, t_raw = dataset.features_only(i)
                feats.append(np.asarray(feat, np.float32))
                self.raw_frames[i] = int(t_raw)
            arr = np.stack(feats)[..., None]
            self.shape = arr.shape
            self.nbytes = arr.nbytes
            if mesh is not None:
                from ..parallel.mesh import batch_sharding, replicated

                self._bank = jax.device_put(arr, replicated(mesh))
                self._gather = jax.jit(
                    _take0, out_shardings=batch_sharding(mesh)
                )
            else:
                self._bank = jax.device_put(arr)
                self._gather = jax.jit(_take0)
            del arr
        if log is not None:
            layout = "sharded over data axis" if shard else "in HBM"
            log.info(
                f"device-resident feature bank: {self.shape} "
                f"({self.nbytes / 1e9:.2f} GB) {layout}"
            )

    def __len__(self) -> int:
        return self.shape[0]

    def gather(self, idx: Sequence[int]):
        """[B] indices -> [B, T, F, 1] device feature batch (async)."""
        return self._gather(self._bank, np.asarray(idx, np.int32))


def maybe_bank(args, dataset, cfg, mesh=None, log=None,
               budget_bytes: float = 8e9) -> Optional[FeatureBank]:
    """Build a FeatureBank when enabled, single-host, and it fits in HBM.

    Preference order: replicated (local gather, fastest) when one chip can
    hold the whole dataset; sharded over the mesh's data axis (capacity x
    the axis size, one reduce-scatter per gather) when only a shard fits;
    otherwise fall back to the host batch stream.
    """
    import jax

    multi = jax.process_count() > 1
    if not getattr(args, "device_data", True) or (multi and mesh is None):
        return None
    est = len(dataset) * cfg.model.max_frames * cfg.model.n_mels * 4
    force_shard = (getattr(args, "shard_bank", False) and mesh is not None)
    if est <= budget_bytes and not force_shard and not multi:
        return FeatureBank(dataset, mesh=mesh, log=log)
    n_data = mesh.shape[mesh.axis_names[0]] if mesh is not None else 1
    if mesh is not None and est / n_data <= budget_bytes:
        return FeatureBank(dataset, mesh=mesh, log=log, shard=True)
    if log is not None:
        log.info(
            f"feature bank would need {est / 1e9:.1f} GB"
            + (f" ({est / n_data / 1e9:.1f} GB/shard)" if mesh is not None else "")
            + "; keeping the host batch stream"
        )
    return None
