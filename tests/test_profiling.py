"""utils/profiling.py: phase timers, trace context, memory stats."""

import os

import jax
import jax.numpy as jnp

from acas2d_tpu.utils import profiling


def test_phase_timers_accumulate():
    t = profiling.PhaseTimers()
    with t("a"):
        pass
    with t("a"):
        pass
    with t("b"):
        pass
    rep = t.report()
    assert rep["a_calls"] == 2
    assert rep["b_calls"] == 1
    assert rep["a_s"] >= 0.0


def test_phase_timers_record_on_exception():
    t = profiling.PhaseTimers()
    try:
        with t("x"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert t.report()["x_calls"] == 1


def test_trace_noop_without_dir():
    with profiling.trace(None):
        jnp.ones(8).sum().block_until_ready()


def test_trace_writes_xplane(tmp_path):
    out = str(tmp_path / "trace")
    with profiling.trace(out):
        jnp.ones((64, 64)).sum().block_until_ready()
    found = [f for root, _, files in os.walk(out)
             for f in files if f.endswith(".xplane.pb")]
    assert found, f"no xplane trace written under {out}"


def test_device_memory_stats_shape():
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)
    for v in stats.values():
        assert isinstance(v, int)
