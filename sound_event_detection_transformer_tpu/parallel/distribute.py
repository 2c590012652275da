"""Rank helpers and cross-process reductions.

SPMD/JAX counterpart of /root/reference/utilities/distribute.py: rank gating
becomes ``jax.process_index``; the explicit loss all_reduce for logging
(distribute.py:88, utils.py:300-302) becomes a host allgather-sum (metrics
computed inside the jitted step are already globally consistent under pjit —
XLA's psums make every host see the same scalars, so most callers need no
explicit reduction at all).
"""
from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_dist_avail_and_initialized() -> bool:
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def reduce_dict(input_dict: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Average (or sum) python-scalar metrics across hosts
    (reference distribute.py:67-91)."""
    world = jax.process_count()
    if world < 2:
        return dict(input_dict)
    from jax.experimental import multihost_utils

    names = sorted(input_dict.keys())
    values = np.asarray([float(input_dict[k]) for k in names], np.float64)
    total = multihost_utils.process_allgather(values).sum(axis=0)
    if average:
        total = total / world
    return dict(zip(names, total.tolist()))


def get_reduced_loss(loss_dict, weight_dict, metric_logger, prefix: str = "") -> float:
    """Log scaled + unscaled losses, return the weighted total
    (reference distribute.py:94-106)."""
    reduced = reduce_dict({k: float(v) for k, v in loss_dict.items()})
    unscaled = {f"{prefix}{k}_unscaled": v for k, v in reduced.items()}
    scaled = {
        f"{prefix}{k}": v * weight_dict[k]
        for k, v in reduced.items()
        if k in weight_dict
    }
    if metric_logger is not None:
        metric_logger.update(**unscaled)
        metric_logger.update(**scaled)
    return float(sum(scaled.values()))
