"""Pytree state containers for the TPU-native ACAS-2D engine.

The reference keeps episode state as mutable attributes of a game object
(`gym_ACAS2D/envs/game.py:9-160`); here it is an immutable struct-of-arrays
pytree.  A single `EnvState` holds scalars / (max_traffic,) arrays; under
`jax.vmap` every leaf gains a leading env axis, giving an SoA layout that
maps each field to one contiguous (B,)-vector in HBM — the layout the VPU
wants.  Per-episode observation normalizers are NOT stored here: they are
provably episode-invariant (see config.py) and constant-fold into the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class EnvState:
    """Complete per-env simulation state (one episode instance).

    Mirrors the live attributes of ACAS2DGame (game.py:29-160) minus pygame
    and telemetry lists (telemetry is recovered as stacked scan outputs, see
    envs/vector.py).
    """

    # Player aircraft (game.py:84-92). Airspeed is constant (= params.airspeed,
    # game.py:86) and therefore not stored.
    px: jax.Array          # x position [px]
    py: jax.Array          # y position [px]
    ppsi: jax.Array        # heading [deg, 0..360), clockwise from +x, y down
    pa_lat: jax.Array      # last commanded lateral acceleration

    # Traffic aircraft, shape (max_traffic,) each (game.py:95-115).
    tx: jax.Array
    ty: jax.Array
    tv: jax.Array          # airspeed (drawn from uniform(f_min,f_max)*airspeed)
    tpsi: jax.Array

    num_traffic: jax.Array   # int32; slots >= num_traffic are inert

    # Episode bookkeeping (game.py:29-41).
    steps: jax.Array         # int32; incremented by observe (game.py:197)
    total_reward: jax.Array
    outcome: jax.Array       # int32; 0 running / 1 goal / 2 collision / 3 timeout

    # PRNG stream for in-graph auto-reset spawning (no reference counterpart;
    # the reference consumes a host-global Mersenne stream, game.py:41-114).
    key: jax.Array

    @property
    def done(self) -> jax.Array:
        return self.outcome != 0


@struct.dataclass
class StepOutput:
    """One transition's outputs: (obs, reward, done, info-fields)."""
    obs: jax.Array
    reward: jax.Array
    done: jax.Array
    outcome: jax.Array        # outcome code of the *terminated* episode (0 if not done)
    episode_steps: jax.Array  # step counter at termination (0 if not done)
    episode_return: jax.Array # total reward at termination (0 if not done)


def tree_select(pred, on_true, on_false):
    """Scalar-predicate pytree select (used per-env; vmap adds the batch axis).

    Uses raw uint32 PRNG keys (jax.random.PRNGKey) so `where` applies
    uniformly to every leaf.
    """
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false)
