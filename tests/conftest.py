"""Test configuration: force a virtual 8-device CPU backend with x64.

Parity tests need float64 (the reference is pure-Python float64) and the
sharding tests need multiple devices without a TPU pod (SURVEY.md §4), so we
run the suite on a virtual 8-device CPU backend.

NOTE: this machine's sitecustomize registers an 'axon' TPU platform and
forcibly sets jax_platforms='axon,cpu', overriding the JAX_PLATFORMS env var
— so we must override via jax.config *after* import, before first backend
use.  The XLA_FLAGS env var must still be set before import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
