"""Single-env Gym(nasium) adapters over the functional core.

Capability parity with the reference's L3 layer (environment.py:10-54 and
the 'ACAS2D-v0' registration, gym_ACAS2D/__init__.py:3-6): a drop-in
Python-stateful env for users of the gym API, backed by the jitted JAX step.

Two flavors:
  * ACAS2DEnv — gymnasium.Env (5-tuple step).  Timeout maps to `truncated`,
    collision/goal to `terminated`; `info['outcome']` carries the reference
    outcome code.  Registered as 'ACAS2D-v0' on import when gymnasium is
    available.
  * LegacyACAS2DEnv — the reference's old-gym 4-tuple surface
    (obs, reward, done, info with info == {}; environment.py:29-42), for
    byte-compatible driver ports and parity testing.

Spawning uses the host Mersenne stream by default (`exact_spawn=True`) so a
process that seeds once and resets repeatedly sees the reference's episode
sequence (SURVEY.md §2.2 draw order).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from acas2d_tpu.config import DEFAULT_PARAMS, EnvParams
from acas2d_tpu.envs import core
from acas2d_tpu.oracle import MersenneSpawner

try:
    import gymnasium
    from gymnasium import spaces
    _HAS_GYMNASIUM = True
except ImportError:                                    # pragma: no cover
    gymnasium = None
    _HAS_GYMNASIUM = False


class _EnvBackend:
    """Shared jitted-core backend for both API flavors."""

    def __init__(self, params: EnvParams, exact_spawn: bool = True,
                 seed: Optional[int] = None, dtype=None):
        self.p = params
        self.dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64
                               else jnp.float32)
        self.exact_spawn = exact_spawn
        self._spawner = MersenneSpawner(params, seed=seed)
        self._key = jax.random.PRNGKey(
            params.seed if seed is None else seed)
        self._step = jax.jit(lambda s, a: core.step(s, a, params))
        self._reset_from = jax.jit(
            lambda psi, tx, ty, tv, tpsi, nt: core.reset_from(
                psi, tx, ty, tv, tpsi, nt, params, self.dtype))
        self._reset_rand = jax.jit(
            lambda k: core.reset(k, params, self.dtype))
        self.state = None

    def seed(self, seed: int):
        self._spawner = MersenneSpawner(self.p, seed=seed)
        self._key = jax.random.PRNGKey(seed)

    def reset(self) -> np.ndarray:
        if self.exact_spawn:
            i = self._spawner.spawn()
            self.state, obs = self._reset_from(
                i.player_psi, i.traffic_x, i.traffic_y, i.traffic_v,
                i.traffic_psi, i.num_traffic)
        else:
            self._key, k = jax.random.split(self._key)
            self.state, obs = self._reset_rand(k)
        return np.asarray(obs, dtype=np.float64)

    def step(self, action):
        a = float(np.asarray(action).reshape(-1)[0])
        self.state, out = self._step(self.state, a)
        return (np.asarray(out.obs, np.float64), float(out.reward),
                bool(out.done), int(out.outcome))

    # -- introspection used by renderers / drivers
    @property
    def game_state(self):
        return jax.device_get(self.state)


class _PlainBox:
    """Minimal Box stand-in when gymnasium is absent: exposes the same
    low/high/shape/dtype surface plus contains(), so the reference's
    check_env contract (utils/env_check.py) stays verifiable."""

    def __init__(self, low, high, shape=None, dtype=np.float64):
        low = np.broadcast_to(np.asarray(low, dtype), shape) if shape else \
            np.asarray(low, dtype)
        high = np.broadcast_to(np.asarray(high, dtype), shape) if shape else \
            np.asarray(high, dtype)
        self.low, self.high = low, high
        self.shape = low.shape
        self.dtype = np.dtype(dtype)

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return (x.shape == self.shape and np.all(x >= self.low)
                and np.all(x <= self.high))

    def __repr__(self):
        return f"Box({self.low.min()}, {self.high.max()}, {self.shape}, {self.dtype})"


def _box_spaces(params: EnvParams):
    """Observation/action boxes exactly as environment.py:15-27.

    Uses gymnasium.spaces.Box when available, else the plain stand-in — the
    LegacyACAS2DEnv contract surface must not silently shrink without
    gymnasium installed."""
    box = spaces.Box if _HAS_GYMNASIUM else _PlainBox
    lo = np.array([0, 0, -1, 0, 0] + [0, -1, -1] * params.max_traffic,
                  dtype=np.float64)
    hi = np.ones(params.obs_dim, dtype=np.float64)
    obs_space = box(low=lo, high=hi, dtype=np.float64)
    act_space = box(low=-1.0, high=1.0, shape=(1,), dtype=np.float64)
    return obs_space, act_space


if _HAS_GYMNASIUM:

    class ACAS2DEnv(gymnasium.Env):
        metadata = {"render_modes": ["rgb_array"], "render_fps": 100}

        def __init__(self, params: EnvParams = DEFAULT_PARAMS,
                     exact_spawn: bool = True, render_mode: Optional[str] = None):
            self.p = params
            self._backend = _EnvBackend(params, exact_spawn)
            self.observation_space, self.action_space = _box_spaces(params)
            self.render_mode = render_mode
            self._trail = []

        def reset(self, *, seed: Optional[int] = None, options=None):
            super().reset(seed=seed)
            if seed is not None:
                self._backend.seed(seed)
            obs = self._backend.reset()
            self._trail = []
            return obs, {}

        def step(self, action):
            obs, reward, done, outcome = self._backend.step(action)
            terminated = done and outcome in (1, 2)
            truncated = done and outcome == 3
            if self.render_mode is not None:
                s = self._backend.game_state
                self._trail.append((float(s.px), float(s.py)))
            return obs, reward, terminated, truncated, {"outcome": outcome}

        def render(self):
            if self.render_mode != "rgb_array":
                return None
            from acas2d_tpu.render import render_frame
            s = self._backend.game_state
            return render_frame(
                float(s.px), float(s.py), float(s.ppsi),
                np.asarray(s.tx), np.asarray(s.ty),
                int(s.num_traffic), self.p, trail=self._trail)

    try:
        gymnasium.register(id="ACAS2D-v0",
                           entry_point="acas2d_tpu.envs.gym_compat:ACAS2DEnv")
    except Exception:                                    # already registered
        pass


class LegacyACAS2DEnv:
    """The reference's exact old-gym surface (environment.py:29-54):
    step -> (obs, reward, done, {}), reset -> obs, no-op close."""

    def __init__(self, params: EnvParams = DEFAULT_PARAMS,
                 exact_spawn: bool = True):
        self.p = params
        self._backend = _EnvBackend(params, exact_spawn)
        self.observation_space, self.action_space = _box_spaces(params)
        self.outcome = None

    def reset(self):
        self.outcome = None
        return self._backend.reset()

    def step(self, action):
        obs, reward, done, outcome = self._backend.step(action)
        if done:
            self.outcome = outcome
        return obs, reward, done, {}

    def seed(self, seed: int):
        """Old-gym seeding surface; the reference seeds the global
        `random` module once per process instead (training_main.py:14)."""
        self._backend.seed(seed)
        return [seed]

    def render(self, mode="human"):
        pass

    def close(self):
        pass


# Best-effort legacy-gym registration (the reference registers 'ACAS2D-v0'
# under old `gym`, gym_ACAS2D/__init__.py:3-6).  Old gym is not a
# dependency of this package; when a user's environment has a 4-tuple-era
# release (< 0.26, the API the reference targets) installed,
# `gym.make("ACAS2D-v0")` resolves to the 4-tuple legacy env below.
# gym >= 0.26 switched to the gymnasium-style 5-tuple API (and wraps
# every made env in checkers that enforce it), so there the registration
# is skipped — those users get the gymnasium 'ACAS2D-v0' above.
def _old_gym_api(mod) -> bool:                           # pragma: no cover
    try:
        major, minor = str(getattr(mod, "__version__", "999")).split(".")[:2]
        return (int(major), int(minor)) < (0, 26)
    except (ValueError, TypeError):
        return False


try:                                                     # pragma: no cover
    import gym as _legacy_gym
    _HAS_LEGACY_GYM = _old_gym_api(_legacy_gym)
except ImportError:
    _legacy_gym = None
    _HAS_LEGACY_GYM = False

if _HAS_LEGACY_GYM:                                      # pragma: no cover

    class LegacyGymACAS2DEnv(LegacyACAS2DEnv, _legacy_gym.Env):
        """LegacyACAS2DEnv as a registered old-gym (< 0.26) Env."""
        metadata = {"render.modes": []}

        def reset(self, seed=None, options=None, **kwargs):
            if seed is not None:
                self.seed(seed)
            return super().reset()

    # old-gym registries keep specs in `env_specs`; only a re-register is
    # expected and tolerable here, so check membership explicitly and let
    # real failures (entry-point typos, gym internals drift) surface at
    # import time instead of being swallowed.
    _specs = getattr(_legacy_gym.envs.registry, "env_specs", {})
    if "ACAS2D-v0" not in _specs:
        _legacy_gym.register(
            id="ACAS2D-v0",
            entry_point="acas2d_tpu.envs.gym_compat:LegacyGymACAS2DEnv")
