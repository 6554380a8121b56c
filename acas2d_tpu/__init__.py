"""acas2d_tpu — a TPU-native vectorized ACAS-2D engine and PPO training stack.

A from-scratch JAX/XLA re-design of the capabilities of the reference
`Christos-14/gym-ACAS2D` repository: the single-aircraft collision-avoidance
environment becomes a pure, jit-compiled, vmappable step function with
in-graph auto-reset, sharded over TPU device meshes, feeding an on-device PPO
learner.  See SURVEY.md at the repo root for the full blueprint.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA/Mosaic compilation cache (opt-out: ACAS2D_NO_CC=1).

    The fused Pallas rollout kernel takes minutes to Mosaic-compile on the
    tunneled TPU backend; without a disk cache every driver/test process
    pays that again.  JAX only consults the cache for compilations slower
    than the threshold, so small programs are unaffected.
    """
    if _os.environ.get("ACAS2D_NO_CC", "0") == "1":
        return
    import jax

    # Respect a cache the application (or another library) configured first
    # — this is a default, not an override.
    if jax.config.jax_compilation_cache_dir is not None:
        return
    jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        _os.path.expanduser("~/.cache/acas2d_jax")))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


_enable_compilation_cache()

from acas2d_tpu.config import EnvParams, DEFAULT_PARAMS, OUTCOME_NAMES  # noqa: E402
