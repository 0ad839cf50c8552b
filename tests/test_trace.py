"""Observability: tracer spans, power monitor plumbing."""

import math
import time

from hispmv_tpu.utils.trace import PowerMonitor, Tracer


def test_tracer_spans():
    tr = Tracer()
    with tr.span("a"):
        time.sleep(0.01)
    with tr.span("a"):
        pass
    with tr.span("b"):
        pass
    assert tr.counts["a"] == 2 and tr.counts["b"] == 1
    assert tr.segments["a"] >= 0.01
    assert "a" in tr.report()


def test_power_monitor_plumbing():
    pm = PowerMonitor(interval_s=0.05)
    pm.start()
    time.sleep(0.2)
    pm.stop()
    assert len(pm.samples) >= 2
    # no power telemetry on cloud TPU hosts: watts are NaN by contract
    assert math.isnan(pm.avg_watts) and math.isnan(pm.max_watts)
