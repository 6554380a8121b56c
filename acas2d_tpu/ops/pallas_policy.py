"""Fused policy-in-kernel PPO rollout: MLP forward + env step in one kernel.

The XLA training rollout (ppo/learner.py:collect_rollout) scans T steps,
each a handful of small device kernels (policy matmuls + env VPU math) with
the (B,)-state round-tripping through HBM between them; at the tpu preset
that costs ~6.5 ms of the 17.7 ms iteration (docs/PERFORMANCE.md).  This
kernel runs K steps per launch with EVERYTHING resident in VMEM:

  * the SB3-architecture actor-critic (models/actor_critic.py) computed
    in-kernel, feature-major on the MXU: h1 = tanh(W1' @ obs(8,E)),
    h2 = tanh(W2' @ h1), mean/value heads — E = 1024 envs per program, so
    every matmul has full 1024-lane utilization;
  * gaussian sampling via Box-Muller over the counter-based hash RNG
    (ops/pallas_step.py:_triple32), log-probs of the raw sample
    (SB3 semantics: env gets the clipped action, log-prob keeps the raw);
  * the complete autoreset env step (integration, geometry with bug_compat
    quirks, shaped reward, termination order, masked respawn) — the same
    semantics as ops/pallas_step.py, plus the observation build
    (envs/core.py:observe: steps incremented first, 8 features);
  * per-step rollout buffers (obs, action, logp, value, reward, done) and
    episode-end records written as (K, ...) VMEM outputs.

The learner scans T/K of these launches (ppo/learner.py:
collect_rollout_fused) and trains on the returned buffers unchanged — GAE,
minibatching, and the update are identical.  RNG streams differ from the
XLA path (hash vs threefry), so fused and unfused runs are statistically
— not bit — identical; tests/test_pallas_policy.py pins internal
consistency (stored log-probs/values recomputed with flax on the stored
obs; stored actions replayed through the XLA engine reproduce the stored
rewards until each env's first respawn).

Env layout: each grid program owns LANES = 1024 envs as (8, 128) tiles
(sublane s, lane l; env id = s*128 + l).  The MLP I/O crosses layouts via
(8,128) <-> (1,1024) reshapes — Mosaic supports these tile collapses — so
env math stays fully tiled and matrices stay fully laned.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acas2d_tpu.config import EnvParams, DEFAULT_PARAMS
from acas2d_tpu.ops.pallas_step import (LANES, DEG2RAD, TWO_PI, _u01_hash,
                                        _mod360, env_geometry, goal_bearing,
                                        respawn, shaped_step_reward)

E = LANES                      # envs per grid program (8 x 128 tile)


def _flatten_tile(t):
    """(8, 128) env tile -> (1, 1024) matrix row (env id = s*128 + l)."""
    return t.reshape(1, E)


def _unflatten_row(r):
    """(1, 1024) matrix row -> (8, 128) env tile."""
    return r.reshape(8, 128)


def fused_policy_rollout_kernel(
        # scalar prefetch/SMEM operands
        seed_ref, log_std_ref,
        # policy weights, packed two-towers-in-one host-side (VMEM,
        # replicated): [w1;v1] (128,8), block-diag [[w2,0],[0,v2]]
        # (128,128), heads in rows 0/1 of (8,128) — every matmul a full
        # 128-wide MXU tile instead of two half-utilized 64-wide ones
        w1c_ref, b1c_ref, w2c_ref, b2c_ref, w3c_ref, b3c_ref,
        # carried state blocks (1, 8, 128)
        px0, py0, psi0, tx0, ty0, tv0, tpsi0, steps0, tot0,
        # carried obs matrix block (1, 8, E)
        obs0,
        # step-offset for the RNG counter (SMEM) so chunked launches don't
        # reuse (base, step) pairs
        # -- outputs --
        pxo, pyo, psio, txo, tyo, tvo, tpsio, stepso, toto, obso,
        obs_buf, act_buf, logp_buf, val_buf, rew_buf, done_buf,
        ep_ret_buf, ep_len_buf, outcome_buf, alato,
        *, K: int, p: EnvParams):
    # grid is (members, env_blocks); the flattened program id keeps every
    # (member, block) pair's RNG stream distinct and reduces to the old
    # env-block id when members == 1 (the solo path's streams unchanged)
    pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    member = pl.program_id(0)
    lane = (jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 1))
    rng_base = (seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                + jnp.uint32(pid) * jnp.uint32(0xC2B2AE35)
                + lane * jnp.uint32(0x27D4EB2F))
    step_off = seed_ref[0, 1]

    dt = jnp.float32(p.dt)
    v = jnp.float32(p.airspeed)
    acc = jnp.float32(p.acc_lat_limit)
    gx = jnp.float32(p.goal_x)
    gy = jnp.float32(p.goal_y)
    inv_max_steps = jnp.float32(1.0 / p.max_steps)
    # log_std is SMEM (members, 1), dynamically indexed by the member id
    log_std = jnp.minimum(jnp.maximum(log_std_ref[member, 0], -4.0), 2.0)
    sigma = jnp.exp(log_std)
    # log N(x; m, s) = -0.5*((x-m)/s)^2 - log_std - 0.5*log(2pi)
    logp_const = -log_std - jnp.float32(0.5 * math.log(2.0 * math.pi))

    bearing = goal_bearing(p)

    # weight blocks carry a leading member-block dim of 1 (the index map
    # selects this program's member row from the (members, ...) stack)
    w1c = w1c_ref[0]     # (128, 8)
    b1c = b1c_ref[0]     # (128, 1)
    w2c = w2c_ref[0]     # (128, 128) block-diagonal
    b2c = b2c_ref[0]     # (128, 1)
    w3c = w3c_ref[0]     # (8, 128); row 0 = action head, row 1 = value
    b3c = b3c_ref[0]     # (8, 1)

    def policy(M):
        """Feature-major MLP: M (8, E) -> (mean (1,E), value (1,E)).
        Rows 0-63 of H carry the pi tower, 64-127 the vf tower; the
        block-diagonal layer 2 keeps them independent."""
        H = jnp.tanh(jnp.dot(w1c, M, preferred_element_type=jnp.float32)
                     + b1c)
        H = jnp.tanh(jnp.dot(w2c, H, preferred_element_type=jnp.float32)
                     + b2c)
        O = jnp.dot(w3c, H, preferred_element_type=jnp.float32) + b3c
        return O[0:1, :], O[1:2, :]

    def build_obs(steps, psi, d_goal, h_goal_rad, d_dev, d_sep, d_cpa,
                  v_closing):
        """envs/core.py:observe feature order, feature-major (8, E)."""
        rows = [
            steps.astype(jnp.float32) * inv_max_steps,
            psi * jnp.float32(1.0 / 360.0),
            d_dev * jnp.float32(1.0 / p.d_dev_max),
            d_goal * jnp.float32(1.0 / p.d_goal_max),
            (h_goal_rad * jnp.float32(1.0 / DEG2RAD)) * jnp.float32(1.0 / 360.0),
            d_sep * jnp.float32(1.0 / p.d_separation_max),
            d_cpa * jnp.float32(1.0 / p.d_cpa_max),
            v_closing * jnp.float32(1.0 / p.v_closing_max),
        ]
        return jnp.concatenate([_flatten_tile(r) for r in rows], axis=0)

    def body(i, carry):
        (px, py, psi, tx, ty, tv, tpsi, tcos, tsin, steps, tot, M,
         _alat_prev) = carry
        step_id = step_off + i

        # ---- policy forward + gaussian sample (SB3 collect_rollouts)
        mean_row, value_row = policy(M)
        mean = _unflatten_row(mean_row)
        value = _unflatten_row(value_row)
        u1 = _u01_hash(rng_base, step_id, 4)
        u2 = _u01_hash(rng_base, step_id, 5)
        z = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u1,
                                                jnp.float32(1e-12)))) \
            * jnp.cos(jnp.float32(TWO_PI) * u2)
        action = mean + sigma * z                      # raw sample
        dz = (action - mean) / sigma
        logp = logp_const - 0.5 * dz * dz
        a_clip = jnp.minimum(jnp.maximum(action, -1.0), 1.0)
        a_lat = a_clip * acc

        # ---- record pre-step buffers
        obs_buf[0, i] = M
        act_buf[0, i] = action
        logp_buf[0, i] = logp
        val_buf[0, i] = value

        # ---- integrate player + traffic (aircraft.py:16-26)
        psi = _mod360(psi + a_lat / v)
        pr = psi * DEG2RAD
        cp = jnp.cos(pr)
        sp = jnp.sin(pr)
        px = px + v * cp * dt
        py = py + v * sp * dt
        tx = tx + tv * tcos * dt
        ty = ty + tv * tsin * dt
        steps = steps + 1

        d_goal, h_goal_rad, d_dev, d_sep, d_cpa, v_closing = env_geometry(
            px, py, cp, sp, psi, tx, ty, tv, tcos, tsin, a_lat,
            v=v, dt=dt, gx=gx, gy=gy)

        # ---- shaped reward (rewards.py:5-60) + terminal bonuses
        h_goal_deg = h_goal_rad * jnp.float32(1.0 / DEG2RAD)
        r_step = shaped_step_reward(psi, h_goal_deg, d_goal, d_dev, d_cpa,
                                    v_closing, p=p)

        collided = d_sep < jnp.float32(2 * p.collision_radius)
        at_goal = d_goal < jnp.float32(p.goal_radius)
        timeout = steps > p.max_steps
        tdf = 1.0 - steps.astype(jnp.float32) * inv_max_steps
        reward = (r_step * tdf
                  + jnp.where(collided, jnp.float32(p.reward_collision), 0.0)
                  + jnp.where(at_goal, jnp.float32(p.reward_goal), 0.0))
        tot = tot + reward

        # ---- termination precedence timeout > collision > goal
        done = timeout | collided | at_goal
        outcome = jnp.where(
            timeout, 3, jnp.where(collided, 2, jnp.where(at_goal, 1, 0))
        ).astype(jnp.int32)

        rew_buf[0, i] = reward
        done_buf[0, i] = done.astype(jnp.float32)
        ep_ret_buf[0, i] = jnp.where(done, tot, 0.0)
        ep_len_buf[0, i] = jnp.where(done, steps, 0).astype(jnp.int32)
        outcome_buf[0, i] = outcome

        # ---- masked respawn (reset_from semantics)
        (fpx, fpy, fpsi, ftx, fty, ftv, ftpsi) = respawn(
            _u01_hash(rng_base, step_id, 1), _u01_hash(rng_base, step_id, 2),
            _u01_hash(rng_base, step_id, 3), p=p, bearing=bearing)
        ftr = ftpsi * DEG2RAD
        px = jnp.where(done, fpx, px)
        py = jnp.where(done, fpy, py)
        psi = jnp.where(done, fpsi, psi)
        tx = jnp.where(done, ftx, tx)
        ty = jnp.where(done, fty, ty)
        tv = jnp.where(done, ftv, tv)
        tpsi = jnp.where(done, ftpsi, tpsi)
        tcos = jnp.where(done, jnp.cos(ftr), tcos)
        tsin = jnp.where(done, jnp.sin(ftr), tsin)
        steps = jnp.where(done, 1, steps)       # observe() leaves steps == 1
        tot = jnp.where(done, 0.0, tot)

        # ---- next observation from the (possibly respawned) state.
        # observe()'s closing-speed lookahead uses state.pa_lat — the
        # lateral acceleration just applied this step (envs/core.py), which
        # is 0 only for freshly respawned envs.  `a_live` is also carried
        # out of the kernel so the reconstructed env_state's pa_lat lets
        # host-side consumers (core.observe, telemetry) recompute this same
        # observation from the state.
        a_live = jnp.where(done, jnp.float32(0.0), a_lat)
        pr = psi * DEG2RAD
        cp = jnp.cos(pr)
        sp = jnp.sin(pr)
        d_goal, h_goal_rad, d_dev, d_sep, d_cpa, v_closing = env_geometry(
            px, py, cp, sp, psi, tx, ty, tv, tcos, tsin, a_live,
            v=v, dt=dt, gx=gx, gy=gy)
        M = build_obs(steps, psi, d_goal, h_goal_rad, d_dev, d_sep, d_cpa,
                      v_closing)
        return (px, py, psi, tx, ty, tv, tpsi, tcos, tsin, steps, tot, M,
                a_live)

    tr = tpsi0[0] * DEG2RAD
    init = (px0[0], py0[0], psi0[0], tx0[0], ty0[0], tv0[0], tpsi0[0],
            jnp.cos(tr), jnp.sin(tr), steps0[0], tot0[0], obs0[0],
            jnp.zeros_like(px0[0]))
    (px, py, psi, tx, ty, tv, tpsi, _, _, steps, tot, M,
     alat) = jax.lax.fori_loop(0, K, body, init)
    pxo[0] = px
    pyo[0] = py
    psio[0] = psi
    txo[0] = tx
    tyo[0] = ty
    tvo[0] = tv
    tpsio[0] = tpsi
    stepso[0] = steps
    toto[0] = tot
    obso[0] = M
    alato[0] = alat


def _pack_policy_params(params) -> Tuple[jax.Array, ...]:
    """Flax ActorCritic params -> pre-transposed f32 kernel operands."""
    pr = params["params"]
    f32 = jnp.float32

    def kt(tower, layer):
        return pr[tower][layer]["kernel"].astype(f32).T

    def bc(tower, layer):
        return pr[tower][layer]["bias"].astype(f32).reshape(-1, 1)

    return (kt("pi_tower", "dense_0"), bc("pi_tower", "dense_0"),
            kt("pi_tower", "dense_1"), bc("pi_tower", "dense_1"),
            pr["action_head"]["kernel"].astype(f32).T,
            pr["action_head"]["bias"].astype(f32).reshape(1, 1),
            kt("vf_tower", "dense_0"), bc("vf_tower", "dense_0"),
            kt("vf_tower", "dense_1"), bc("vf_tower", "dense_1"),
            pr["value_head"]["kernel"].astype(f32).T,
            pr["value_head"]["bias"].astype(f32).reshape(1, 1))


def pack_params_two_towers(params) -> Tuple[jax.Array, ...]:
    """Flax ActorCritic params -> packed two-towers-in-one f32 operands:
    (w1c (128,8), b1c (128,1), w2c (128,128) block-diag, b2c (128,1),
    w3c (8,128) heads in rows 0/1, b3c (8,1)).  The MXU processes a
    128x128 tile per pass regardless of operand size, so one packed matmul
    costs half of two 64-wide ones; the zero blocks keep the towers
    exactly independent."""
    (w1, b1, w2, b2, wa, ba, v1, c1, v2, c2, wv, bv) = (
        _pack_policy_params(params))
    w1c = jnp.concatenate([w1, v1], axis=0)
    b1c = jnp.concatenate([b1, c1], axis=0)
    w2c = jnp.zeros((128, 128), jnp.float32)
    w2c = w2c.at[:64, :64].set(w2).at[64:, 64:].set(v2)
    b2c = jnp.concatenate([b2, c2], axis=0)
    w3c = jnp.zeros((8, 128), jnp.float32)
    w3c = w3c.at[0:1, :64].set(wa).at[1:2, 64:].set(wv)
    b3c = jnp.zeros((8, 1), jnp.float32)
    b3c = b3c.at[0:1].set(ba).at[1:2].set(bv)
    return (w1c, b1c, w2c, b2c, w3c, b3c)


def _check_params(params: EnvParams):
    assert params.max_traffic == 1 and params.min_traffic == 1, (
        "pallas path specializes min_traffic == max_traffic == 1")
    assert (params.airspeed_factor_min == 1.0
            and params.airspeed_factor_max == 1.0), (
        "pallas respawn hard-codes traffic speed == airspeed")
    assert params.bug_compat, (
        "pallas kernels bake in the reference's bug_compat kinematics "
        "quirks; use the XLA rollout for corrected physics")


def _rollout_call(ins, weights, log_std, seed, step_offset, M: int, G: int,
                  K: int, params: EnvParams, interpret: bool):
    """The pallas_call shared by the solo (M=1) and member-grid paths:
    grid (M, G), state/buffer blocks indexed m*G+g over flattened
    (M*G, ...) stacks, weight blocks indexed by the member id."""
    f32 = jnp.float32
    MG = M * G
    blk = pl.BlockSpec((1, 8, 128), lambda m, g: (m * G + g, 0, 0),
                       memory_space=pltpu.VMEM)
    obs_blk = pl.BlockSpec((1, 8, E), lambda m, g: (m * G + g, 0, 0),
                           memory_space=pltpu.VMEM)
    kbuf = pl.BlockSpec((1, K, 8, 128), lambda m, g: (m * G + g, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    kobs = pl.BlockSpec((1, K, 8, E), lambda m, g: (m * G + g, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    # weight stacks are (M, ...): block (1, ...) selected by the member id
    # (bind the rank per-operand — a bare lambda would late-bind the loop
    # variable and give every index map the last operand's rank)
    wspec = [pl.BlockSpec((1,) + w.shape[1:],
                          lambda m, g, r=len(w.shape): (m,) + (0,) * (r - 1),
                          memory_space=pltpu.VMEM)
             for w in weights]

    out_specs = ([blk] * 9 + [obs_blk]
                 + [kobs] + [kbuf] * 5
                 + [kbuf] * 3 + [blk])
    out_shapes = (
        [jax.ShapeDtypeStruct((MG, 8, 128), f32)] * 7
        + [jax.ShapeDtypeStruct((MG, 8, 128), jnp.int32)]
        + [jax.ShapeDtypeStruct((MG, 8, 128), f32)]
        + [jax.ShapeDtypeStruct((MG, 8, E), f32)]
        + [jax.ShapeDtypeStruct((MG, K, 8, E), f32)]     # obs buffer
        + [jax.ShapeDtypeStruct((MG, K, 8, 128), f32)] * 5
        + [jax.ShapeDtypeStruct((MG, K, 8, 128), f32)] * 2
        + [jax.ShapeDtypeStruct((MG, K, 8, 128), jnp.int32)]
        + [jax.ShapeDtypeStruct((MG, 8, 128), f32)])     # final live a_lat
    # fix ep_len buffer dtype (int32) at index -3
    out_shapes[-3] = jax.ShapeDtypeStruct((MG, K, 8, 128), jnp.int32)

    kernel = functools.partial(fused_policy_rollout_kernel, K=K, p=params)
    return pl.pallas_call(
        kernel,
        grid=(M, G),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + wspec + [blk] * 9 + [obs_blk]),
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.array([[seed, step_offset]], jnp.int32), log_std,
      *weights, *ins)


def fused_policy_rollout(px, py, psi, tx, ty, tv, tpsi, steps, total_reward,
                         obs, policy_params, seed, step_offset, K: int,
                         params: EnvParams = DEFAULT_PARAMS,
                         interpret: bool = False
                         ) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Run K fused policy+env autoreset steps.

    Inputs: flat (B,) f32 state arrays + obs (B, 8) + flax params.
    Returns (final_state dict incl. 'obs' (B,8) and 'pa_lat' — the last
    applied lateral acceleration, 0 for envs respawned on their final step,
    so core.observe on the reconstructed state reproduces 'obs' —, buffers
    dict with leaves (K, B) / obs (K, B, 8)).  `step_offset` advances the
    per-step RNG counter across chunked launches.
    """
    _check_params(params)
    B = px.shape[0]
    assert B % E == 0, f"batch {B} must be a multiple of {E}"
    G = B // E
    f32 = jnp.float32

    def tile(x, dtype=f32):
        return x.reshape(G, 8, 128).astype(dtype)

    obs_m = obs.astype(f32).reshape(G, E, 8).swapaxes(1, 2)   # (G, 8f, E)
    ins = [tile(px), tile(py), tile(psi), tile(tx), tile(ty), tile(tv),
           tile(tpsi), tile(steps, jnp.int32), tile(total_reward), obs_m]
    weights = tuple(w[None] for w in pack_params_two_towers(policy_params))
    log_std = policy_params["params"]["log_std"].astype(f32).reshape(1, 1)

    outs = _rollout_call(ins, weights, log_std, seed, step_offset,
                         1, G, K, params, interpret)

    def flat(x):
        return x.reshape(B)

    def flat_k(x):
        return x.swapaxes(0, 1).reshape(K, B)

    state = dict(px=flat(outs[0]), py=flat(outs[1]), psi=flat(outs[2]),
                 tx=flat(outs[3]), ty=flat(outs[4]), tv=flat(outs[5]),
                 tpsi=flat(outs[6]), steps=flat(outs[7]),
                 total_reward=flat(outs[8]),
                 obs=outs[9].swapaxes(1, 2).reshape(B, 8),
                 pa_lat=flat(outs[19]))
    buffers = dict(
        obs=outs[10].transpose(1, 0, 3, 2).reshape(K, B, 8),
        actions=flat_k(outs[11]),
        log_probs=flat_k(outs[12]),
        values=flat_k(outs[13]),
        rewards=flat_k(outs[14]),
        dones=flat_k(outs[15]),
        episode_return=flat_k(outs[16]),
        episode_steps=flat_k(outs[17]),
        outcome=flat_k(outs[18]),
    )
    return state, buffers


def fused_policy_rollout_members(flat_state: Dict[str, jax.Array], obs,
                                 stacked_params, seed, step_offset, K: int,
                                 params: EnvParams = DEFAULT_PARAMS,
                                 interpret: bool = False
                                 ) -> Tuple[Dict[str, jax.Array],
                                            Dict[str, jax.Array]]:
    """Member-grid variant for population training: P member policies roll
    their own env batches in ONE kernel whose grid spans
    (members, env_blocks) — per-member weights are selected by the grid's
    member coordinate, so the whole population rollout costs one launch
    per K steps instead of P (ppo/population.py:make_population_step's
    round-4 restriction removed).

    `flat_state`: dict of (P, B) state arrays (px, py, psi, tx, ty, tv,
    tpsi, steps, total_reward); `obs` (P, B, 8); `stacked_params`: flax
    params with a leading (P,) on every leaf.  Returns (state dict with
    (P, B) leaves + obs (P, B, 8) + pa_lat, buffers with (P, K, B) leaves
    / obs (P, K, B, 8)).  RNG streams are decorrelated per (member,
    env-block) pair and reduce to the solo kernel's streams at P == 1."""
    _check_params(params)
    M, B = flat_state["px"].shape
    assert B % E == 0, f"per-member batch {B} must be a multiple of {E}"
    G = B // E
    f32 = jnp.float32

    def tile(x, dtype=f32):
        return x.reshape(M * G, 8, 128).astype(dtype)

    obs_m = (obs.astype(f32).reshape(M, G, E, 8).swapaxes(2, 3)
             .reshape(M * G, 8, E))
    order = ("px", "py", "psi", "tx", "ty", "tv", "tpsi")
    ins = ([tile(flat_state[k]) for k in order]
           + [tile(flat_state["steps"], jnp.int32),
              tile(flat_state["total_reward"]), obs_m])
    weights = jax.vmap(pack_params_two_towers)(stacked_params)
    log_std = (stacked_params["params"]["log_std"].astype(f32)
               .reshape(M, 1))

    outs = _rollout_call(ins, weights, log_std, seed, step_offset,
                         M, G, K, params, interpret)

    def flat(x):
        return x.reshape(M, B)

    def flat_k(x):
        # (M*G, K, 8, 128) -> (M, K, B)
        return (x.reshape(M, G, K, 8 * 128).swapaxes(1, 2)
                .reshape(M, K, B))

    state = dict(px=flat(outs[0]), py=flat(outs[1]), psi=flat(outs[2]),
                 tx=flat(outs[3]), ty=flat(outs[4]), tv=flat(outs[5]),
                 tpsi=flat(outs[6]), steps=flat(outs[7]),
                 total_reward=flat(outs[8]),
                 obs=(outs[9].reshape(M, G, 8, E).swapaxes(2, 3)
                      .reshape(M, B, 8)),
                 pa_lat=flat(outs[19]))
    buffers = dict(
        obs=(outs[10].reshape(M, G, K, 8, E).transpose(0, 2, 1, 4, 3)
             .reshape(M, K, B, 8)),
        actions=flat_k(outs[11]),
        log_probs=flat_k(outs[12]),
        values=flat_k(outs[13]),
        rewards=flat_k(outs[14]),
        dones=flat_k(outs[15]),
        episode_return=flat_k(outs[16]),
        episode_steps=flat_k(outs[17]),
        outcome=flat_k(outs[18]),
    )
    return state, buffers
