"""Test configuration: force a virtual 8-device CPU backend with x64.

Must run before jax is imported anywhere: parity tests need float64 (the
reference is pure-Python float64), and sharding tests need multiple devices
without a TPU pod (SURVEY.md §4 test strategy).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
