"""Functional core of the TPU-native ACAS-2D environment.

The reference's stateful object graph (ACAS2DGame + ACAS2DEnv,
`gym_ACAS2D/envs/game.py`, `envs/environment.py`) is re-designed as four pure
functions over an `EnvState` pytree:

    reset(key, params)              -> (state, obs)
    step(state, action, params)     -> (state, StepOutput)
    step_autoreset(...)             -> same, but terminated episodes respawn
                                       in-graph (the engine never leaves the
                                       device; SB3-DummyVecEnv semantics:
                                       the returned obs is the *reset* obs)
    reset_from(init, key, params)   -> (state, obs) from host-provided spawn
                                       values (Mersenne-exact parity mode)

Everything is jit-able, vmap-able and shard-able; there is no Python control
flow on traced values.  Reference semantics reproduced exactly (SURVEY.md
§2.2 parity contract):

  * step order: action -> integrate player, then traffic -> observe
    (steps += 1) -> evaluate -> termination check (environment.py:29-42);
    the real-time clock.tick throttle (environment.py:31) is dropped.
  * observation layout and normalizers (game.py:194-218, 118-128);
  * shaped reward with time-discount + terminal bonuses (game.py:249-292);
  * termination precedence timeout > collision > goal (game.py:294-314),
    with collision tested at 2*COLLISION_RADIUS (game.py:187).

Deviation (documented): when num_traffic < max_traffic the reference builds a
*shorter* observation (it pads 2 zeros per absent aircraft instead of 3,
game.py:213 — a latent bug that is unreachable with the default
MIN_TRAFFIC == MAX_TRAFFIC and would crash SB3 if hit).  We keep the obs
statically shaped at 5 + 3*max_traffic and zero the 3 slots of absent
aircraft.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from acas2d_tpu.config import EnvParams, DEFAULT_PARAMS
from acas2d_tpu.ops import kinematics as kin
from acas2d_tpu.ops import rewards as rw
from acas2d_tpu.types import EnvState, StepOutput, tree_select


# ------------------------------------------------------------------ helpers

def _traffic_mask(params: EnvParams, num_traffic) -> jax.Array:
    """(max_traffic,) bool — True for active traffic slots."""
    return jnp.arange(params.max_traffic) < num_traffic


def _d_goal(state: EnvState, params: EnvParams):
    return kin.distance(state.px, state.py, params.goal_x, params.goal_y)


def _h_goal(state: EnvState, params: EnvParams):
    return kin.relative_angle(state.px, state.py, params.goal_x, params.goal_y)


def _plan_deviation(state: EnvState, params: EnvParams):
    """game.py:175-180: d_goal * sin(h_goal) — signed vertical offset from
    the straight plan (equals goal_y - player_y algebraically)."""
    d_goal = _d_goal(state, params)
    h_goal_rad = kin.deg_to_rad(_h_goal(state, params))
    return d_goal * jnp.sin(h_goal_rad)


def _separations(state: EnvState, params: EnvParams):
    """(max_traffic,) distances to all traffic; +inf for inert slots."""
    d = kin.distance(state.px, state.py, state.tx, state.ty)
    return jnp.where(_traffic_mask(params, state.num_traffic), d, jnp.inf)


def _collision(state: EnvState, params: EnvParams):
    """game.py:185-189 — any active traffic within 2*COLLISION_RADIUS."""
    return jnp.any(_separations(state, params) < 2 * params.collision_radius)


def _goal_reached(state: EnvState, params: EnvParams):
    return _d_goal(state, params) < params.goal_radius        # game.py:191


def _pair_metrics(state: EnvState, params: EnvParams):
    """(v_closing, d_cpa) of player vs every traffic slot, shape (T,)."""
    v_c = kin.closing_speed(
        state.px, state.py, params.airspeed, state.ppsi, state.pa_lat,
        state.tx, state.ty, state.tv, state.tpsi, 0.0,
        params.dt, params.bug_compat)
    d_cpa = kin.distance_closest_approach(
        state.px, state.py, params.airspeed, state.ppsi,
        state.tx, state.ty, state.tv, state.tpsi, params.bug_compat)
    return v_c, d_cpa


# ------------------------------------------------------------------ observe

def observe(state: EnvState, params: EnvParams) -> Tuple[EnvState, jax.Array]:
    """Build the normalized observation; increments the step counter first
    (game.py:194-218 — 'all steps start with an observation')."""
    state = state.replace(steps=state.steps + 1)
    dtype = state.px.dtype
    t_frac = state.steps.astype(dtype) / params.max_steps
    d_sep = _separations(state, params)
    v_c, d_cpa = _pair_metrics(state, params)
    mask = _traffic_mask(params, state.num_traffic)
    per_traffic = jnp.stack([
        jnp.where(mask, d_sep / params.d_separation_max, 0.0),
        jnp.where(mask, d_cpa / params.d_cpa_max, 0.0),
        jnp.where(mask, v_c / params.v_closing_max, 0.0),
    ], axis=-1)                                    # (T, 3)
    head = jnp.stack([
        t_frac,
        state.ppsi / 360,
        _plan_deviation(state, params) / params.d_dev_max,
        _d_goal(state, params) / params.d_goal_max,
        _h_goal(state, params) / 360,
    ])
    obs = jnp.concatenate([head, per_traffic.reshape(-1)]).astype(dtype)
    return state, obs


# -------------------------------------------------------------------- spawn

def spawn(key: jax.Array, params: EnvParams = DEFAULT_PARAMS,
          dtype=jnp.float32) -> EnvState:
    """In-graph episode spawn using jax.random (counter-based threefry).

    Reproduces the reference spawn *distributions* (game.py:41,88-114) — the
    same geometry and jitters — but not the Mersenne bit-stream (host-side
    Mersenne parity spawning is `oracle.MersenneSpawner` + `reset_from`).
    """
    p = params
    k_nt, k_psi, k_sd, k_v0, k_h0, k_rest, k_carry = jax.random.split(key, 7)

    num_traffic = jax.random.randint(k_nt, (), p.min_traffic, p.max_traffic + 1)

    # Player (game.py:84-92): fixed position, bearing-to-goal + jitter heading.
    bearing = kin.relative_angle(
        jnp.asarray(p.player_x0, dtype), jnp.asarray(p.player_y0, dtype),
        jnp.asarray(p.goal_x, dtype), jnp.asarray(p.goal_y, dtype))
    jit_lim = p.player_initial_heading_lim
    ppsi = (bearing + jax.random.uniform(
        k_psi, (), dtype, -jit_lim, jit_lim)) % 360

    # Traffic slot 0 (game.py:98-106): spawns on the right edge, top or
    # bottom corner, heading back across the player's plan.
    starts_down = jax.random.randint(k_sd, (), 0, 2).astype(dtype)
    t0x = jnp.asarray(p.width - p.collision_radius, dtype)
    t0y = p.collision_radius + starts_down * (p.height - 2 * p.collision_radius)
    t0v = jax.random.uniform(
        k_v0, (), dtype, p.airspeed_factor_min, p.airspeed_factor_max) * p.airspeed
    t0psi = (145 + starts_down * 70 + jax.random.uniform(
        k_h0, (), dtype, -p.traffic_initial_heading_lim,
        p.traffic_initial_heading_lim)) % 360

    T = p.max_traffic
    if T > 1:
        # Slots >= 1 (game.py:107-114): uniform over the upper airspace.
        ku = jax.random.split(k_rest, 4)
        ux = jax.random.uniform(ku[0], (T,), dtype, 0.0, p.width - p.aircraft_size)
        uy = jax.random.uniform(ku[1], (T,), dtype, 0.0, 3 * p.height / 5)
        uv = jax.random.uniform(ku[2], (T,), dtype, p.airspeed_factor_min,
                                p.airspeed_factor_max) * p.airspeed
        upsi = jax.random.uniform(ku[3], (T,), dtype, 0.0, 360.0)
        slot0 = jnp.arange(T) == 0
        tx = jnp.where(slot0, t0x, ux)
        ty = jnp.where(slot0, t0y, uy)
        tv = jnp.where(slot0, t0v, uv)
        tpsi = jnp.where(slot0, t0psi, upsi)
    else:
        tx = t0x[None]
        ty = t0y[None]
        tv = t0v[None]
        tpsi = t0psi[None]

    return EnvState(
        px=jnp.asarray(p.player_x0, dtype), py=jnp.asarray(p.player_y0, dtype),
        ppsi=ppsi.astype(dtype), pa_lat=jnp.asarray(0.0, dtype),
        tx=tx.astype(dtype), ty=ty.astype(dtype),
        tv=tv.astype(dtype), tpsi=tpsi.astype(dtype),
        num_traffic=num_traffic.astype(jnp.int32),
        steps=jnp.asarray(0, jnp.int32),
        total_reward=jnp.asarray(0.0, dtype),
        outcome=jnp.asarray(0, jnp.int32),
        key=k_carry)


def reset(key: jax.Array, params: EnvParams = DEFAULT_PARAMS,
          dtype=jnp.float32) -> Tuple[EnvState, jax.Array]:
    """Fresh episode + initial observation (environment.py:44-48: the
    reference rebuilds the whole game then observes once, steps becomes 1)."""
    return observe(spawn(key, params, dtype), params)


def reset_from(player_psi, traffic_x, traffic_y, traffic_v, traffic_psi,
               num_traffic, params: EnvParams = DEFAULT_PARAMS,
               dtype=jnp.float64,
               key: Optional[jax.Array] = None) -> Tuple[EnvState, jax.Array]:
    """Reset from externally drawn spawn values (host Mersenne parity path;
    see oracle.MersenneSpawner for the draw-order contract)."""
    p = params
    state = EnvState(
        px=jnp.asarray(p.player_x0, dtype), py=jnp.asarray(p.player_y0, dtype),
        ppsi=jnp.asarray(player_psi, dtype), pa_lat=jnp.asarray(0.0, dtype),
        tx=jnp.asarray(traffic_x, dtype), ty=jnp.asarray(traffic_y, dtype),
        tv=jnp.asarray(traffic_v, dtype), tpsi=jnp.asarray(traffic_psi, dtype),
        num_traffic=jnp.asarray(num_traffic, jnp.int32),
        steps=jnp.asarray(0, jnp.int32),
        total_reward=jnp.asarray(0.0, dtype),
        outcome=jnp.asarray(0, jnp.int32),
        key=key if key is not None else jax.random.PRNGKey(0))
    return observe(state, params)


# --------------------------------------------------------------------- step

def step(state: EnvState, action, params: EnvParams = DEFAULT_PARAMS
         ) -> Tuple[EnvState, StepOutput]:
    """One environment transition (environment.py:29-42 without the clock).

    `action` is a scalar in [-1, 1]; it is rescaled to a lateral acceleration
    in [-ACC_LAT_LIMIT, +ACC_LAT_LIMIT] (game.py:222-225).
    """
    p = params
    dtype = state.px.dtype
    a_lat = jnp.asarray(action, dtype) * p.acc_lat_limit

    # --- action phase (game.py:222-247): player integrates first, traffic
    # (always straight: a_lat = 0) after.
    px, py, ppsi = kin.integrate(state.px, state.py, p.airspeed, state.ppsi,
                                 a_lat, p.dt)
    ntx, nty, ntpsi = kin.integrate(state.tx, state.ty, state.tv, state.tpsi,
                                    jnp.asarray(0.0, dtype), p.dt)
    mask = _traffic_mask(p, state.num_traffic)
    state = state.replace(
        px=px, py=py, ppsi=ppsi, pa_lat=a_lat,
        tx=jnp.where(mask, ntx, state.tx),
        ty=jnp.where(mask, nty, state.ty),
        tpsi=jnp.where(mask, ntpsi, state.tpsi))

    # --- observe phase (environment.py:35): increments the step counter.
    state, obs = observe(state, p)

    # --- evaluate phase (game.py:249-292): shaped reward, time discount,
    # terminal bonuses (which can co-occur).
    phi = _h_goal(state, p)
    v_c_all, d_cpa_all = _pair_metrics(state, p)
    v_c, d_cpa = v_c_all[0], d_cpa_all[0]   # slot 0 only, game.py:254-255
    d_goal = _d_goal(state, p)
    d_dev = _plan_deviation(state, p)
    r_step = rw.step_reward(v_c, state.ppsi, phi, d_cpa, d_goal, d_dev,
                            p.safe_distance, p.d_dev_max_reward,
                            p.d_goal_max_reward)
    tdf = 1 - (state.steps.astype(dtype) / p.max_steps)
    collided = _collision(state, p)
    at_goal = _goal_reached(state, p)
    reward = (r_step * tdf
              + jnp.where(collided, p.reward_collision, 0.0)
              + jnp.where(at_goal, p.reward_goal, 0.0))
    total_reward = state.total_reward + reward

    # --- termination (game.py:294-314): timeout > collision > goal.
    outcome = jnp.where(
        state.steps > p.max_steps, 3,
        jnp.where(collided, 2, jnp.where(at_goal, 1, 0))).astype(jnp.int32)
    done = outcome != 0

    state = state.replace(total_reward=total_reward, outcome=outcome)
    out = StepOutput(
        obs=obs, reward=reward, done=done, outcome=outcome,
        episode_steps=jnp.where(done, state.steps, 0),
        episode_return=jnp.where(done, total_reward, jnp.asarray(0.0, dtype)))
    return state, out


def step_autoreset(state: EnvState, action, params: EnvParams = DEFAULT_PARAMS
                   ) -> Tuple[EnvState, StepOutput]:
    """step() with in-graph masked auto-reset (BASELINE.json config 3).

    Matches SB3's DummyVecEnv episode boundary (the reference training loop's
    behavior): when an episode terminates, the env respawns immediately and
    the returned obs is the *reset* observation; reward/done/outcome describe
    the terminated episode.  The fresh spawn draws from this env's private
    threefry stream (state.key), so results are independent of batch size and
    sharding layout.
    """
    stepped, out = step(state, action, params)
    _, k_spawn = jax.random.split(state.key)
    fresh, fresh_obs = reset(k_spawn, params, dtype=state.px.dtype)
    next_state = tree_select(out.done, fresh, stepped)
    # The env's key advances only at reset boundaries (the respawned state
    # carries spawn()'s leftover key); between resets it is untouched, so the
    # stream is independent of episode timing elsewhere in the batch.
    next_state = next_state.replace(
        key=jnp.where(out.done, fresh.key, state.key))
    out = out.replace(obs=jnp.where(out.done, fresh_obs, out.obs))
    return next_state, out
