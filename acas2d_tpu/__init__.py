"""acas2d_tpu — a TPU-native vectorized ACAS-2D engine and PPO training stack.

A from-scratch JAX/XLA re-design of the capabilities of the reference
`Christos-14/gym-ACAS2D` repository: the single-aircraft collision-avoidance
environment becomes a pure, jit-compiled, vmappable step function with
in-graph auto-reset, sharded over TPU device meshes, feeding an on-device PPO
learner.  See SURVEY.md at the repo root for the full blueprint.
"""

__version__ = "0.1.0"

from acas2d_tpu.config import EnvParams, DEFAULT_PARAMS, OUTCOME_NAMES
