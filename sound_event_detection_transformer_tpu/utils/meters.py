"""Training meters (port of /root/reference/utilities/utils.py:215-436).

``SmoothedValue`` keeps a window of recent values (median/avg) plus global
totals; cross-process sync uses a jax pmean/psum-style all-reduce via
``jax.experimental.multihost_utils`` when running multi-process (replacing the
torch.distributed all_reduce at utils.py:293-304).  ``MetricLogger`` groups
meters and prints ETA progress lines (utils.py:384-436).
"""
from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Iterable, Optional

import numpy as np


class AverageMeter:
    """(reference utils.py:253-272)"""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


class AverageMeterSet:
    """(reference utils.py:215-250)"""

    def __init__(self):
        self.meters: Dict[str, AverageMeter] = {}

    def __getitem__(self, key):
        if key not in self.meters:
            self.meters[key] = AverageMeter()
        return self.meters[key]

    def update(self, name, value, n=1):
        self[name].update(value, n)

    def reset(self):
        for m in self.meters.values():
            m.reset()

    def values(self, postfix=""):
        return {name + postfix: m.val for name, m in self.meters.items()}

    def averages(self, postfix="/avg"):
        return {name + postfix: m.avg for name, m in self.meters.items()}


class SmoothedValue:
    """Windowed median/avg + global totals (reference utils.py:275-335)."""

    def __init__(self, window_size: int = 20, fmt: Optional[str] = None):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt or "{median:.4f} ({global_avg:.4f})"

    def update(self, value, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    def synchronize_between_processes(self):
        """All-reduce (count, total) across hosts (utils.py:293-304)."""
        try:
            import jax

            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                arr = np.array([self.count, self.total], dtype=np.float64)
                arr = multihost_utils.process_allgather(arr).sum(axis=0)
                self.count = int(arr[0])
                self.total = float(arr[1])
        except Exception:  # pragma: no cover - single host
            pass

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class Heartbeat:
    """Time-based intra-epoch progress line (the role of the reference's
    ``MetricLogger.log_every`` ETA, utils.py:384-436) with ZERO device
    fetches: rate and ETA come from host wall-clock + dispatched-step count
    only, so it never breaks the one-fetch-per-epoch discipline.  With async
    dispatch the rate is the *dispatch* rate; on a saturated pipeline that
    converges to true step rate within a queue depth.
    """

    def __init__(self, log_fn, total_steps: int, interval_s: float = 60.0):
        self.log_fn = log_fn
        self.total = total_steps
        self.interval_s = interval_s
        self._t0 = time.time()
        self._last = self._t0

    def tick(self, i: int) -> None:
        """Call once per step with the 0-based step index."""
        now = time.time()
        if now - self._last < self.interval_s:
            return
        self._last = now
        done = i + 1
        rate = done / max(now - self._t0, 1e-9)
        eta = (self.total - done) / max(rate, 1e-9)
        self.log_fn(
            f"  [{done}/{self.total}] {rate:.2f} steps/s dispatched, "
            f"eta {datetime.timedelta(seconds=int(eta))}"
        )


class DeviceMetricAccumulator:
    """Sums per-step metric pytrees ON DEVICE; one host fetch per epoch.

    Fetching metrics every step (``jax.device_get`` / ``float(loss)``) is a
    host-device barrier; through this backend's remote-device tunnel each one
    costs ~40 ms — comparable to the train step itself, so per-step fetches
    can halve effective throughput (CLAUDE.md).  The reference's per-step
    meter updates (engine.py:66-69) are free on a local CUDA stream; the
    TPU-native equivalent is to accumulate sums on device (a tiny jitted
    tree-add, fully async) and transfer a single packed array at epoch end.

    Consequence (documented divergence): per-step windowed medians collapse
    to epoch means, and the NaN-loss abort (engine.py:70-73) fires at epoch
    end instead of mid-epoch — NaN propagates through the sum, so it is
    still detected.
    """

    def __init__(self):
        self._sum = None
        self._n = 0
        self._w = 0.0

    def update(self, metrics: Dict, weight: float = 1.0) -> None:
        """Add one step's metric dict (device scalars/arrays). Async.

        ``weight`` scales this step's contribution; ``means()`` divides by
        the total weight.  The eval loop weights each batch by its number of
        REAL (non-padded) rows so a padded ragged-tail batch contributes
        exactly its real samples to the epoch means.
        """
        self._n += 1
        self._w += weight
        if self._sum is None:
            self._sum = (
                dict(metrics) if weight == 1.0 else _tree_scale(dict(metrics), weight)
            )
        elif weight == 1.0:
            self._sum = _tree_add(self._sum, dict(metrics))
        else:
            self._sum = _tree_add_scaled(self._sum, dict(metrics), weight)

    @property
    def steps(self) -> int:
        return self._n

    def totals(self) -> Dict[str, np.ndarray]:
        """Epoch sums as numpy, via ONE packed device->host transfer."""
        if not self._n:
            return {}
        import jax

        keys = sorted(self._sum)
        scalars = [k for k in keys if np.ndim(self._sum[k]) == 0]
        out: Dict[str, np.ndarray] = {}
        if scalars:
            packed = _pack_scalars([self._sum[k] for k in scalars])
            vals = np.asarray(jax.device_get(packed), np.float64)
            out.update(dict(zip(scalars, vals)))
        for k in keys:  # non-scalar leaves (e.g. per-class counts)
            if k not in out:
                out[k] = np.asarray(jax.device_get(self._sum[k]), np.float64)
        return out

    def means(self):
        """(dict of weight-normalized epoch means, step count); one fetch."""
        t = self.totals()
        denom = self._w if self._w > 0 else max(self._n, 1)
        return {k: v / denom for k, v in t.items()}, self._n


def _tree_add(a, b):
    global _TREE_ADD_JIT
    if _TREE_ADD_JIT is None:
        import jax

        _TREE_ADD_JIT = jax.jit(
            lambda x, y: jax.tree.map(lambda p, q: p + q, x, y)
        )
    return _TREE_ADD_JIT(a, b)


def _tree_add_scaled(a, b, w):
    global _TREE_ADD_SCALED_JIT
    if _TREE_ADD_SCALED_JIT is None:
        import jax

        _TREE_ADD_SCALED_JIT = jax.jit(
            lambda x, y, s: jax.tree.map(lambda p, q: p + s * q, x, y)
        )
    return _TREE_ADD_SCALED_JIT(a, b, w)


def _tree_scale(a, w):
    global _TREE_SCALE_JIT
    if _TREE_SCALE_JIT is None:
        import jax

        _TREE_SCALE_JIT = jax.jit(
            lambda x, s: jax.tree.map(lambda p: s * p, x)
        )
    return _TREE_SCALE_JIT(a, w)


def _pack_scalars(xs):
    global _PACK_JIT
    if _PACK_JIT is None:
        import jax
        import jax.numpy as jnp

        _PACK_JIT = jax.jit(
            lambda ys: jnp.stack([jnp.asarray(y, jnp.float32) for y in ys])
        )
    return _PACK_JIT(xs)


_TREE_ADD_JIT = None
_TREE_ADD_SCALED_JIT = None
_TREE_SCALE_JIT = None
_PACK_JIT = None


class MetricLogger:
    """(reference utils.py:338-436)"""

    def __init__(self, delimiter: str = "\t"):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def add_meter(self, name, meter: SmoothedValue):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def log_every(self, iterable: Iterable, print_freq: int, header: str = ""):
        i = 0
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        try:
            total = len(iterable)  # type: ignore[arg-type]
        except TypeError:
            total = None
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 and total:
                eta = iter_time.global_avg * (total - i)
                print(
                    f"{header} [{i}/{total}] "
                    f"eta: {datetime.timedelta(seconds=int(eta))} "
                    f"{self} time: {iter_time} data: {data_time}"
                )
            i += 1
            end = time.time()
        elapsed = time.time() - start
        print(f"{header} Total time: {datetime.timedelta(seconds=int(elapsed))}")
