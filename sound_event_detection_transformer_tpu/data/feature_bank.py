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

Single-host only: with multiple processes each host would need the full
bank; the multi-host path keeps the ``batch_iterator(host_slice=...)``
stream instead.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _take0(bank, idx):
    return bank[idx]


class FeatureBank:
    """Stack ``dataset.features_only(i)`` for all clips and hold it in HBM.

    ``gather(idx)`` returns the ``[B, T, F, 1]`` float32 feature batch as a
    device array (batch-sharded over the mesh's data axis when a mesh is
    given; the bank itself is replicated).  The gather is a separate tiny
    jit — one HBM copy of the batch (~30 us) instead of a host transfer.
    CLAUDE.md gotcha honored: the index array is a traced argument, never a
    closure constant, so XLA cannot constant-fold the gather.
    """

    def __init__(self, dataset, mesh=None, log=None):
        import jax

        assert jax.process_count() == 1, "FeatureBank is single-host only"
        feats = []
        self.raw_frames: list = []
        for i in range(len(dataset)):
            d, t_raw = dataset.features_only(i)
            feats.append(np.asarray(d, np.float32))
            self.raw_frames.append(int(t_raw))
        arr = np.stack(feats)[..., None]
        self.shape = arr.shape
        self.nbytes = arr.nbytes
        out_shardings = None
        if mesh is not None:
            from ..parallel.mesh import batch_sharding, replicated

            self._bank = jax.device_put(arr, replicated(mesh))
            out_shardings = batch_sharding(mesh)
        else:
            self._bank = jax.device_put(arr)
        del arr
        self._gather = jax.jit(_take0, out_shardings=out_shardings)
        if log is not None:
            log.info(
                f"device-resident feature bank: {self.shape} "
                f"({self.nbytes / 1e9:.2f} GB) in HBM"
            )

    def __len__(self) -> int:
        return self.shape[0]

    def gather(self, idx: Sequence[int]):
        """[B] indices -> [B, T, F, 1] device feature batch (async)."""
        return self._gather(self._bank, np.asarray(idx, np.int32))


def maybe_bank(args, dataset, cfg, mesh=None, log=None,
               budget_bytes: float = 8e9) -> Optional[FeatureBank]:
    """Build a FeatureBank when enabled, single-host, and it fits in HBM."""
    import jax

    if not getattr(args, "device_data", True) or jax.process_count() > 1:
        return None
    est = len(dataset) * cfg.model.max_frames * cfg.model.n_mels * 4
    if est > budget_bytes:
        if log is not None:
            log.info(
                f"feature bank would need {est / 1e9:.1f} GB; "
                "keeping the host batch stream"
            )
        return None
    return FeatureBank(dataset, mesh=mesh, log=log)
