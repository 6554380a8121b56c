"""Trajectory telemetry: the reference's per-step record lists as scan stacks.

The reference game object appends ~20 telemetry lists while stepping
(game.py:43-75, 130-160, 227-243, 263-276) which the eval drivers harvest
into CSVs (testing_main.py:113-138).  Here a dedicated instrumented step
returns the same quantities as dense arrays from a `lax.scan`, with the
reference's exact (and quirky) recording phases:

  * player path: position AFTER the player's integration (game.py:228);
  * traffic paths: positions BEFORE the traffic integration (game.py:230-231
    run before the update loop at 244-245) — so the spawn position appears
    twice at the head of the reference list;
  * d_sep record: player post-update vs traffic PRE-update (game.py:235);
  * reward-parameter and reward-component records: post-both-updates, with
    `step_reward_record` storing the time-discounted reward WITHOUT terminal
    bonuses (game.py:261,276 — append happens before the bonus branches);
  * t=0 seed entries (game.py:130-160) where `step_reward_record[0]` is the
    RAW step reward (no tdf) — reproduced by `initial_telemetry`.

This is the analysis path (eval/baseline drivers, rendering) — the training
hot loop never computes it.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from acas2d_tpu.config import EnvParams, DEFAULT_PARAMS
from acas2d_tpu.envs import core
from acas2d_tpu.ops import kinematics as kin
from acas2d_tpu.ops import rewards as rw
from acas2d_tpu.types import EnvState


@struct.dataclass
class Telemetry:
    """One step's records (scan: leaves gain a leading (T_steps,) axis)."""
    px: jax.Array          # player position after integration (path)
    py: jax.Array
    tx: jax.Array          # (T,) traffic positions BEFORE their integration
    ty: jax.Array
    psi: jax.Array         # heading_record
    d_sep: jax.Array       # min separation, player-post vs traffic-pre
    a_lat: jax.Array       # a_lat_record
    d_path_inc: jax.Array  # per-step path-length increment (d_path cumsum)
    # evaluate-phase records (post both integrations):
    d_goal: jax.Array
    delta_h_goal: jax.Array
    v_closing: jax.Array
    d_cpa: jax.Array
    d_dev: jax.Array
    r_d_goal: jax.Array
    r_h_goal: jax.Array
    r_d_cpa: jax.Array
    r_d_dev: jax.Array
    r_step: jax.Array      # tdf-discounted reward, NO terminal bonuses
    reward: jax.Array      # full reward (with bonuses) — env return value
    done: jax.Array
    outcome: jax.Array
    obs: jax.Array


def _eval_records(state: EnvState, params: EnvParams, tdf_steps=None):
    """The quantities evaluate() records (game.py:249-276)."""
    p = params
    phi = core._h_goal(state, p)
    v_c_all, d_cpa_all = core._pair_metrics(state, p)
    v_c, d_cpa = v_c_all[0], d_cpa_all[0]
    d_goal = core._d_goal(state, p)
    d_dev = core._plan_deviation(state, p)
    r_step_raw = rw.step_reward(v_c, state.ppsi, phi, d_cpa, d_goal, d_dev,
                                p.safe_distance, p.d_dev_max_reward,
                                p.d_goal_max_reward)
    recs = dict(
        d_goal=d_goal,
        delta_h_goal=kin.delta_heading(state.ppsi, phi),
        v_closing=v_c, d_cpa=d_cpa, d_dev=d_dev,
        r_d_goal=rw.goal_distance_reward(d_goal, p.d_goal_max_reward),
        r_h_goal=rw.heading_reward(state.ppsi, phi),
        r_d_cpa=rw.closest_approach_reward(v_c, d_cpa, p.safe_distance),
        r_d_dev=rw.plan_deviation_reward(d_dev, p.d_dev_max_reward),
    )
    return recs, r_step_raw


def initial_telemetry(state: EnvState, params: EnvParams):
    """t=0 seed records (game.py:130-160).  Note `r_step` here is the RAW
    step reward — the reference applies no tdf to the seed entry."""
    recs, r_step_raw = _eval_records(state, params)
    return dict(
        px=state.px, py=state.py, tx=state.tx, ty=state.ty,
        psi=state.ppsi,
        d_sep=jnp.min(core._separations(state, params)),
        a_lat=state.pa_lat,
        r_step=r_step_raw, **recs)


def step_with_telemetry(state: EnvState, action,
                        params: EnvParams = DEFAULT_PARAMS
                        ) -> Tuple[EnvState, Telemetry]:
    """core.step with the reference's record points interleaved."""
    p = params
    dtype = state.px.dtype
    a_lat = jnp.asarray(action, dtype) * p.acc_lat_limit

    x_old, y_old = state.px, state.py
    px, py, ppsi = kin.integrate(state.px, state.py, p.airspeed, state.ppsi,
                                 a_lat, p.dt)
    # --- records taken between player and traffic integration
    tx_pre, ty_pre = state.tx, state.ty                      # game.py:230-231
    mid = state.replace(px=px, py=py, ppsi=ppsi, pa_lat=a_lat)
    d_sep_mid = jnp.min(core._separations(mid, p))           # game.py:235
    d_path_inc = kin.distance(x_old, y_old, px, py)          # game.py:239

    # --- traffic integration (game.py:244-245)
    ntx, nty, ntpsi = kin.integrate(state.tx, state.ty, state.tv, state.tpsi,
                                    jnp.asarray(0.0, dtype), p.dt)
    mask = core._traffic_mask(p, state.num_traffic)
    state = mid.replace(tx=jnp.where(mask, ntx, state.tx),
                        ty=jnp.where(mask, nty, state.ty),
                        tpsi=jnp.where(mask, ntpsi, state.tpsi))

    # --- observe (steps += 1) and evaluate
    state, obs = core.observe(state, p)
    recs, r_step_raw = _eval_records(state, p)
    tdf = 1 - (state.steps.astype(dtype) / p.max_steps)
    r_disc = r_step_raw * tdf                                # game.py:259-261
    collided = core._collision(state, p)
    at_goal = core._goal_reached(state, p)
    reward = (r_disc + jnp.where(collided, p.reward_collision, 0.0)
              + jnp.where(at_goal, p.reward_goal, 0.0))
    outcome = jnp.where(
        state.steps > p.max_steps, 3,
        jnp.where(collided, 2, jnp.where(at_goal, 1, 0))).astype(jnp.int32)
    state = state.replace(total_reward=state.total_reward + reward,
                          outcome=outcome)
    tel = Telemetry(px=px, py=py, tx=tx_pre, ty=ty_pre, psi=ppsi,
                    d_sep=d_sep_mid, a_lat=a_lat, d_path_inc=d_path_inc,
                    r_step=r_disc, reward=reward, done=outcome != 0,
                    outcome=outcome, obs=obs, **recs)
    return state, tel


def rollout_telemetry(state: EnvState, actions: jax.Array,
                      params: EnvParams = DEFAULT_PARAMS):
    """Replay (T_steps,) actions on a single env, stacking full telemetry.
    No auto-reset: the caller slices at the first done (as the reference
    drivers break their step loop, testing_main.py:82-108)."""

    def body(s, a):
        s, tel = step_with_telemetry(s, a, params)
        return s, tel

    return jax.lax.scan(body, state, actions)


def rollout_telemetry_policy(state: EnvState, obs: jax.Array, n_steps: int,
                             policy_fn, params: EnvParams = DEFAULT_PARAMS):
    """Greedy-policy telemetry rollout: policy_fn(obs) -> scalar action."""

    def body(carry, _):
        s, o = carry
        a = policy_fn(o)
        s, tel = step_with_telemetry(s, a, params)
        return (s, tel.obs), tel

    (state, _), tel = jax.lax.scan(body, (state, obs), None, length=n_steps)
    return state, tel
