"""Environment contract checker — the SB3 `check_env` stand-in.

Every reference driver validates its env before use
(`check_env(environment, warn=True, skip_render_check=True)`,
training_main.py:23 etc.).  This util applies the same contract checks to
both the functional core and the gym adapters: observation bounds/dtype/
shape, action handling, reset/step signatures, determinism of reset under a
fixed spawn, and reward finiteness.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from acas2d_tpu.config import EnvParams, DEFAULT_PARAMS
from acas2d_tpu.envs import core


class EnvCheckError(AssertionError):
    pass


def _check(cond, msg):
    if not cond:
        raise EnvCheckError(msg)


def check_functional_env(params: EnvParams = DEFAULT_PARAMS,
                         n_random_steps: int = 200,
                         seed: int = 0) -> None:
    """Validate the functional core's contract."""
    key = jax.random.PRNGKey(seed)
    state, obs = jax.jit(lambda k: core.reset(k, params, jnp.float32))(key)
    _check(obs.shape == (params.obs_dim,),
           f"obs shape {obs.shape} != ({params.obs_dim},)")
    _check(int(state.steps) == 1, "reset must leave steps == 1 "
           "(observe-increments semantics, game.py:197)")
    # Determinism: same key -> same state.
    state2, obs2 = jax.jit(lambda k: core.reset(k, params, jnp.float32))(key)
    np.testing.assert_array_equal(np.asarray(obs), np.asarray(obs2))

    lo = np.array([0, 0, -1, 0, 0] + [0, -1, -1] * params.max_traffic)
    hi = np.ones(params.obs_dim)
    step = jax.jit(lambda s, a: core.step_autoreset(s, a, params))
    k = key
    for i in range(n_random_steps):
        k, ka = jax.random.split(k)
        a = jax.random.uniform(ka, (), jnp.float32, -1, 1)
        state, out = step(state, a)
        o = np.asarray(out.obs)
        _check(np.all(np.isfinite(o)), f"non-finite obs at step {i}")
        _check(np.all(o >= lo - 1e-6) and np.all(o <= hi + 1e-6),
               f"obs outside declared Box at step {i}: {o}")
        _check(np.isfinite(float(out.reward)), f"non-finite reward at {i}")
        _check(int(out.outcome) in (0, 1, 2, 3), "bad outcome code")


def check_gym_env(env, n_random_steps: int = 100,
                  seed: Optional[int] = 0) -> None:
    """Validate a gym/gymnasium-style adapter (5-tuple or legacy 4-tuple)."""
    rng = np.random.default_rng(seed)
    out = env.reset(seed=seed) if _is_gymnasium(env) else env.reset()
    obs = out[0] if isinstance(out, tuple) else out
    _check(isinstance(obs, np.ndarray), "reset must return ndarray obs")
    if hasattr(env, "observation_space"):
        _check(env.observation_space.contains(obs),
               f"reset obs outside observation_space: {obs}")
    for i in range(n_random_steps):
        a = rng.uniform(-1, 1, size=(1,))
        res = env.step(a)
        _check(len(res) in (4, 5), "step must return a 4- or 5-tuple")
        obs, reward = res[0], res[1]
        _check(isinstance(obs, np.ndarray) and np.all(np.isfinite(obs)),
               f"bad obs at step {i}")
        _check(np.isfinite(reward), f"non-finite reward at step {i}")
        done = res[2] if len(res) == 4 else (res[2] or res[3])
        if done:
            out = env.reset(seed=None) if _is_gymnasium(env) else env.reset()
            obs = out[0] if isinstance(out, tuple) else out


def _is_gymnasium(env) -> bool:
    try:
        import gymnasium
        return isinstance(env, gymnasium.Env) or isinstance(
            getattr(env, "unwrapped", None), gymnasium.Env)
    except ImportError:
        return False
