"""Device mesh + sharding layout (SPMD replacement for the reference's NCCL
DDP, /root/reference/utilities/distribute.py:43-65, train_spsedt.py:157-158).

Design (SURVEY.md §2.2): a 2-D ``(data, model)`` mesh.  Batches shard over
``data`` (the DistributedSampler + DDP gradient all-reduce become XLA psums
over ICI inserted by pjit); the transformer's FFN/attention projections can
shard over ``model`` for scale-up.  Multi-host init goes through
``jax.distributed.initialize`` (replacing the env:// / SLURM rendezvous).
"""
from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    n_model = max(1, cfg.n_model)
    n_data = cfg.n_data if cfg.n_data > 0 else n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array with its leading dim over ``data``.

    Multi-host: each process holds only its contiguous 1/process_count chunk
    of the global batch (see ``batch_iterator(host_slice=...)``); the chunks
    are assembled into one global jax.Array via
    ``make_array_from_process_local_data`` — the SPMD replacement for
    DistributedSampler + DDP input scattering (train_spsedt.py:110-115).
    """
    multi_host = jax.process_count() > 1

    def put(x):
        x = np.asarray(x)
        spec = P(mesh.axis_names[0], *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if multi_host:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


# Tensor-parallel layout for the transformer: FFN hidden dim and attention
# head projections shard over ``model``; everything else replicates.  Path
# regexes over flattened param names.
_TP_RULES = (
    (re.compile(r"ffn/linear1/kernel$"), lambda ax: P(None, ax)),
    (re.compile(r"ffn/linear1/bias$"), lambda ax: P(ax)),
    (re.compile(r"ffn/linear2/kernel$"), lambda ax: P(ax, None)),
    (re.compile(r"(q_proj|k_proj|v_proj)/kernel$"), lambda ax: P(None, ax)),
    (re.compile(r"(q_proj|k_proj|v_proj)/bias$"), lambda ax: P(ax)),
    (re.compile(r"out_proj/kernel$"), lambda ax: P(ax, None)),
)


def param_sharding(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree: TP rules over ``model`` axis, replicate the rest."""
    model_axis = mesh.axis_names[1]
    tp_on = mesh.shape[model_axis] > 1

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    shardings = []
    for path, leaf in flat:
        name = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        spec = P()
        if tp_on:
            for rule, make in _TP_RULES:
                if rule.search(name):
                    cand = make(model_axis)
                    # only shard if the dim divides evenly
                    dims = [d for d in cand if d is not None]
                    ok = True
                    for i, ax in enumerate(cand):
                        if ax is not None and leaf.shape[i] % mesh.shape[ax] != 0:
                            ok = False
                    if ok:
                        spec = cand
                    break
        shardings.append(NamedSharding(mesh, spec))
    return jax.tree.unflatten(treedef, shardings)


def process_is_main() -> bool:
    """rank-0 gating (reference distribute.py:6-26)."""
    return jax.process_index() == 0


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (replaces init_process_group, distribute.py:43-65).

    No-op for single-process; with args (or TPU pod env) delegates to
    ``jax.distributed.initialize``.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
