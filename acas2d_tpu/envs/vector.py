"""Vectorized (vmap) and device-sharded batched environment API.

The reference has exactly one env instance stepped sequentially in-process
(SB3 DummyVecEnv, SURVEY.md §2.3).  Here the env axis is the framework's
data-parallel axis: `jax.vmap` turns the scalar functional core into a
lockstep batch of B envs (struct-of-arrays), `lax.scan` runs T steps without
leaving the device, and `jax.sharding.NamedSharding` over an ('env',) mesh
splits the batch across chips/hosts — XLA keeps the whole rollout
collective-free because every env is independent.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from acas2d_tpu.config import EnvParams, DEFAULT_PARAMS
from acas2d_tpu.envs import core
from acas2d_tpu.types import EnvState, StepOutput


# --------------------------------------------------------------- batched API

def reset_batch(key: jax.Array, n_envs: int,
                params: EnvParams = DEFAULT_PARAMS,
                dtype=jnp.float32) -> Tuple[EnvState, jax.Array]:
    """Spawn B independent envs: (states with leading (B,) axis, obs (B,O))."""
    keys = jax.random.split(key, n_envs)
    return jax.vmap(lambda k: core.reset(k, params, dtype))(keys)


def step_batch(states: EnvState, actions: jax.Array,
               params: EnvParams = DEFAULT_PARAMS
               ) -> Tuple[EnvState, StepOutput]:
    """vmapped `core.step`: actions (B,) -> batched StepOutput."""
    return jax.vmap(lambda s, a: core.step(s, a, params))(states, actions)


def step_autoreset_batch(states: EnvState, actions: jax.Array,
                         params: EnvParams = DEFAULT_PARAMS
                         ) -> Tuple[EnvState, StepOutput]:
    """vmapped `core.step_autoreset` (in-graph masked respawn)."""
    return jax.vmap(lambda s, a: core.step_autoreset(s, a, params))(states, actions)


# ------------------------------------------------------------------ rollouts

class Trajectory(NamedTuple):
    """Stacked scan outputs, time-major: leaves have shape (T, B, ...).

    This is the TPU-native replacement for the reference's ~20 per-step
    telemetry lists (game.py:43-75): everything a driver wants to log or
    train on comes back as dense arrays from one device program.
    """
    obs: jax.Array        # (T, B, O) observation that *preceded* the action
    action: jax.Array     # (T, B)
    reward: jax.Array     # (T, B)
    done: jax.Array       # (T, B)
    next_obs: jax.Array   # (T, B, O) obs returned by the step (reset obs at dones)
    outcome: jax.Array    # (T, B) int32, nonzero at episode ends
    episode_steps: jax.Array   # (T, B) episode length at ends, else 0
    episode_return: jax.Array  # (T, B) episode return at ends, else 0


def rollout_actions(states: EnvState, actions: jax.Array,
                    params: EnvParams = DEFAULT_PARAMS,
                    autoreset: bool = False) -> Tuple[EnvState, StepOutput]:
    """Replay a fixed (T, B) action sequence through the batch via lax.scan.

    Used by parity tests (golden action replays, SURVEY.md §7 stage 2) and
    by the scripted-policy drivers (baseline_main/gym_main equivalents).
    Returns final states and time-stacked StepOutput (leaves (T, B, ...)).
    """
    step_fn = step_autoreset_batch if autoreset else step_batch

    def body(s, a):
        s, out = step_fn(s, a, params)
        return s, out

    return jax.lax.scan(body, states, actions)


def rollout_policy(states: EnvState, obs: jax.Array, key: jax.Array,
                   policy_fn: Callable, n_steps: int,
                   params: EnvParams = DEFAULT_PARAMS,
                   ) -> Tuple[Tuple[EnvState, jax.Array], Trajectory]:
    """Roll the batch forward n_steps under a policy, with auto-reset.

    `policy_fn(obs, key) -> actions (B,)` — any callable (e.g. an
    actor-critic apply with sampling closed over its params).  The PPO stack
    uses its own richer rollout (ppo/learner.py:collect_rollout) that also records log-probs
    and values; this one is for eval and scripted policies.
    """

    def body(carry, _):
        s, o, k = carry
        k, k_act = jax.random.split(k)
        a = policy_fn(o, k_act)
        s, out = step_autoreset_batch(s, a, params)
        traj = Trajectory(obs=o, action=a, reward=out.reward, done=out.done,
                          next_obs=out.obs, outcome=out.outcome,
                          episode_steps=out.episode_steps,
                          episode_return=out.episode_return)
        return (s, out.obs, k), traj

    (states, obs, _), traj = jax.lax.scan(
        body, (states, obs, key), None, length=n_steps)
    return (states, obs), traj
