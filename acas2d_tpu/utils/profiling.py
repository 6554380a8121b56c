"""Tracing / profiling (SURVEY.md §5: the reference's only tracing is
wall-clock `time.time()` around training, training_main.py:25,54, plus SB3's
`time/fps` console scalars).

TPU-native equivalents:
  * `trace(out_dir)` — context manager around `jax.profiler.trace`, writing
    a TensorBoard-loadable XPlane trace of device + host activity;
  * `PhaseTimers` — named wall-clock accumulators for coarse host-side
    phases (rollout / update / eval / checkpoint), reported like the
    reference's `time/*` block;
  * `device_memory_stats()` — live HBM usage, if the backend exposes it.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(out_dir: Optional[str]):
    """Profile the enclosed block to `out_dir` (no-op when out_dir is None).

    View with TensorBoard's profile plugin or xprof (`tensorboard
    --logdir <out_dir>`).
    """
    if not out_dir:
        yield
        return
    with jax.profiler.trace(out_dir):
        yield


class PhaseTimers:
    """Accumulating named wall-clock timers.

    >>> t = PhaseTimers()
    >>> with t("rollout"): ...
    >>> t.report()  # {'rollout_s': ..., 'rollout_calls': ...}

    NOTE: on an asynchronous-dispatch backend a phase only bounds host time
    unless the caller blocks on the phase's outputs; the train driver's
    metrics transfer provides that barrier once per iteration.
    """

    def __init__(self):
        self.total: Dict[str, float] = {}
        self.calls: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] = self.total.get(name, 0.0) + dt
            self.calls[name] = self.calls.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for k, v in self.total.items():
            out[f"{k}_s"] = round(v, 3)
            out[f"{k}_calls"] = self.calls[k]
        return out


def device_memory_stats(device: Optional[jax.Device] = None
                        ) -> Dict[str, int]:
    """Best-effort live device memory stats ({} if unsupported)."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        return {}
    if not stats:
        return {}
    keep = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: int(stats[k]) for k in keep if k in stats}
