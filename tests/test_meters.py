"""DeviceMetricAccumulator: device-side sums, single-fetch semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from sound_event_detection_transformer_tpu.utils.meters import (
    DeviceMetricAccumulator,
    MetricLogger,
)


def test_accumulator_means_and_totals():
    acc = DeviceMetricAccumulator()
    for i in range(4):
        acc.update({
            "loss": jnp.asarray(float(i)),
            "loss_ce": jnp.asarray(2.0 * i),
            "counts": jnp.full((3,), float(i)),
        })
    totals = acc.totals()
    assert acc.steps == 4
    assert totals["loss"] == pytest.approx(0 + 1 + 2 + 3)
    assert totals["loss_ce"] == pytest.approx(12.0)
    np.testing.assert_allclose(totals["counts"], np.full(3, 6.0))
    means, n = acc.means()
    assert n == 4
    assert means["loss"] == pytest.approx(1.5)
    np.testing.assert_allclose(means["counts"], np.full(3, 1.5))


def test_accumulator_empty():
    acc = DeviceMetricAccumulator()
    means, n = acc.means()
    assert n == 0 and means == {}


def test_accumulator_nan_propagates():
    acc = DeviceMetricAccumulator()
    acc.update({"loss": jnp.asarray(1.0)})
    acc.update({"loss": jnp.asarray(float("nan"))})
    means, _ = acc.means()
    assert not np.isfinite(means["loss"])


def test_metric_logger_str():
    mlog = MetricLogger(delimiter="  ")
    mlog.update(loss=1.0, lr=0.1)
    s = str(mlog)
    assert "loss" in s and "lr" in s


def test_heartbeat_time_gated(monkeypatch):
    """Heartbeat logs on wall-clock intervals, not step counts, and its
    rate/ETA come from host time only (no device fetches to patch out)."""
    from sound_event_detection_transformer_tpu.utils import meters

    now = [1000.0]
    monkeypatch.setattr(meters.time, "time", lambda: now[0])
    lines = []
    hb = meters.Heartbeat(lines.append, total_steps=100, interval_s=60.0)

    now[0] += 10.0
    hb.tick(0)          # 10 s in: below the interval, silent
    assert lines == []

    now[0] += 55.0
    hb.tick(4)          # 65 s in: one line, 5 steps done
    assert len(lines) == 1 and "[5/100]" in lines[0]
    assert "steps/s dispatched" in lines[0]  # honest: dispatch rate, not device rate

    now[0] += 1.0
    hb.tick(5)          # 1 s later: gated again
    assert len(lines) == 1
