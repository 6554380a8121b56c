"""Fused whole-rollout Pallas TPU kernel for the batched autoreset env.

The XLA path (envs/vector.py) runs one fused program per scan iteration,
round-tripping the (B,)-state through the scan carry each step.  This kernel
goes further: each grid program loads a (8,128)-lane block of envs into VMEM
ONCE, runs the full T-step autoreset rollout in an in-kernel fori_loop
(state never touches HBM between steps), and writes back the final state
plus per-env reward/episode statistics.  Random actions and respawn draws
come from an in-kernel counter-based hash RNG (triple32 finalizer over
(seed, grid program, lane, step, salt)) — stateless, identical on the CPU
interpreter and on TPU, and cheaper than a stateful PRNG.

Scope: the pure-environment hot path (BASELINE.json config 3 — the
env-steps/s headline).  The PPO rollout interleaves a policy network, so
training keeps the XLA path.  Specializations vs the general engine:
  * max_traffic == 1 (the reference's only exercised configuration);
  * traffic heading is constant within an episode (a_lat == 0,
    aircraft.py:20-22), so its direction cosines are episode constants
    cached in registers instead of recomputed per step;
  * float32; angle conversion constant-folds (psi * pi/180);
  * by default observations are not materialized (the pure-stepping
    workload does not consume them — same dead-code shape XLA sees in the
    bench's scan); `with_obs=True` builds and checksums the full 8-feature
    observation every step for the obs-inclusive headline.
Environment *semantics* (geometry, rewards, termination order, bug_compat
quirks kinematics.py:47,57,67,74) are identical; tests compare against the
jnp engine under forced-zero actions and long-horizon outcome statistics.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from acas2d_tpu.config import EnvParams, DEFAULT_PARAMS

LANES = 8 * 128          # envs per grid program
DEG2RAD = math.pi / 180.0
TWO_PI = 2.0 * math.pi


def _triple32(x):
    """Excellent-avalanche 32-bit integer finalizer (public triple32)."""
    x = x ^ (x >> 17)
    x = x * jnp.uint32(0xED5AD4BB)
    x = x ^ (x >> 11)
    x = x * jnp.uint32(0xAC4C1B51)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x31848BAB)
    x = x ^ (x >> 14)
    return x


def _u01_hash(base, step, salt):
    """Counter-based float32 uniform in [0,1) per lane: hash of
    (base=seed+program+lane, step, salt), top 24 bits.

    The step multiplier is deliberately DIFFERENT from the seed multiplier
    used to build `base` (0x9E3779B9): with equal multipliers the hash input
    depends on seed and step only through their sum, so a small seed shift
    (e.g. the per-shard `seed + axis_index * 7919` decorrelation in
    ppo/learner.py) would replay another shard's stream at a step offset.
    Distinct odd multipliers make a seed delta equivalent to a ~uniform
    32-bit step delta — never reachable within a rollout."""
    x = base + jnp.uint32(step * jnp.uint32(0x7FEB352D)) + jnp.uint32(
        salt * jnp.uint32(0x85EBCA6B))
    bits = _triple32(x)
    # Mosaic lacks a direct uint32->f32 cast; (bits >> 8) < 2^24 so the
    # int32 round trip is value-preserving.
    return (bits >> 8).astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 24))


def _atan(x):
    """Branchless f32 arctan (Mosaic has no atan primitive).

    Cephes-style two-interval argument reduction + odd minimax polynomial;
    max abs error ~3e-7 rad — below the engine's f32 tolerance.
    """
    ax = jnp.abs(x)
    big = ax > 2.414213562373095      # tan(3*pi/8)
    mid = ax > 0.4142135623730950     # tan(pi/8)
    safe = jnp.maximum(ax, jnp.float32(1e-30))
    xr = jnp.where(big, -1.0 / safe,
                   jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    off = jnp.where(big, jnp.float32(math.pi / 2),
                    jnp.where(mid, jnp.float32(math.pi / 4), 0.0))
    z = xr * xr
    y = (((jnp.float32(8.05374449538e-2) * z
           - jnp.float32(1.38776856032e-1)) * z
          + jnp.float32(1.99777106478e-1)) * z
         - jnp.float32(3.33329491539e-1)) * z * xr + xr
    return jnp.sign(x) * (off + y)


def _atan2(y, x):
    """f32 atan2 from _atan with quadrant fixup (range (-pi, pi])."""
    safe_x = jnp.where(x == 0.0, jnp.float32(1.0), x)
    base = _atan(y / safe_x)
    pi = jnp.float32(math.pi)
    res = jnp.where(x > 0.0, base,
                    jnp.where(y >= 0.0, base + pi, base - pi))
    return jnp.where(x == 0.0,
                     jnp.where(y > 0.0, pi / 2,
                               jnp.where(y < 0.0, -pi / 2, 0.0)),
                     res)


def _mod360(x):
    return x - 360.0 * jnp.floor(x * jnp.float32(1.0 / 360.0))


def _mod2pi(x):
    return x - TWO_PI * jnp.floor(x / TWO_PI)


# --------------------------------------------------------- shared physics
# In-kernel restatements of the environment semantics, shared by the
# random-action rollout kernel below and the policy-in-kernel rollout
# (ops/pallas_policy.py) so the quirk-laden math exists exactly once.

def goal_bearing(p: EnvParams) -> jnp.float32:
    """Initial player bearing to the goal in degrees (game.py:91)."""
    return jnp.float32(
        math.degrees(math.atan2(p.goal_y - p.player_y0,
                                p.goal_x - p.player_x0) % TWO_PI))


def respawn(rb_psi, rb_sd, rb_tpsi, *, p: EnvParams, bearing):
    """In-kernel respawn from three uniform draws (game.py:84-106
    distributions; specialized to one constant-speed traffic aircraft —
    asserted by the kernel wrappers)."""
    psi = _mod360(bearing + (rb_psi * 2.0 - 1.0)
                  * jnp.float32(p.player_initial_heading_lim))
    starts_down = (rb_sd < 0.5).astype(jnp.float32)
    t_y = jnp.float32(p.collision_radius) + starts_down * jnp.float32(
        p.height - 2 * p.collision_radius)
    t_psi = _mod360(145.0 + starts_down * 70.0 +
                    (rb_tpsi * 2.0 - 1.0) * jnp.float32(
                        p.traffic_initial_heading_lim))
    return (jnp.full_like(psi, p.player_x0),
            jnp.full_like(psi, p.player_y0), psi,
            jnp.full_like(psi, p.width - p.collision_radius), t_y,
            jnp.full_like(psi, p.airspeed), t_psi)


def env_geometry(px, py, cp, sp, psi, tx, ty, tv, tcos, tsin, a_lat,
                 *, v, dt, gx, gy):
    """Player/goal/traffic geometry (game.py:162-191, kinematics.py)
    including the bug_compat quirks: the arctan quadrant collapse in the
    signed CPA distance (kinematics.py:47), the missing /dt in the closing
    -speed heading lookahead (:57,:67) and the v_air aircraft-1/2 typo
    (:74).  `a_lat` is the lateral acceleration the lookahead assumes the
    player holds (the engine's state.pa_lat at observe time)."""
    dxg = gx - px
    dyg = gy - py
    d_goal = jnp.sqrt(dxg * dxg + dyg * dyg)
    h_goal_rad = _mod2pi(_atan2(dyg, dxg))
    d_dev = d_goal * jnp.sin(h_goal_rad)
    dxt = tx - px
    dyt = ty - py
    d_sep = jnp.sqrt(dxt * dxt + dyt * dyt)
    # signed closest-approach distance (kinematics.py:40-49, arctan quirk)
    v12x = v * cp - tv * tcos
    v12y = v * sp - tv * tsin
    h_rel = _atan(v12y / jnp.where(v12x == 0.0, jnp.float32(1e-30), v12x))
    a_rel = _mod2pi(_atan2(dyt, dxt))
    d_cpa = d_sep * jnp.sin(a_rel - h_rel)
    # closing speed via one-step lookahead (kinematics.py:52-79)
    psi1l = (psi + (a_lat / v) * dt) * DEG2RAD
    vx1 = v * jnp.cos(psi1l) * dt
    vy1 = v * jnp.sin(psi1l) * dt
    vx2 = tv * tcos * dt
    vy2 = v * tsin * dt                     # bug_compat: v (player) not tv
    dpx = (px + vx1) - (tx + vx2)
    dpy = (py + vy1) - (ty + tv * tsin * dt)
    nd = jnp.sqrt(dpx * dpx + dpy * dpy)
    v_closing = (((vx1 - vx2) * dpx + (vy1 - vy2) * dpy) / nd) / dt
    return d_goal, h_goal_rad, d_dev, d_sep, d_cpa, v_closing


def shaped_step_reward(psi, h_goal_deg, d_goal, d_dev, d_cpa, v_closing,
                       *, p: EnvParams):
    """step_reward_5 (rewards.py:5-60): multiplicative gating, branch on
    approach (v_closing <= 0) vs separation."""
    dh = jnp.abs(psi - h_goal_deg)
    dh = jnp.minimum(dh, 360.0 - dh)
    r_head = (1.0 - dh * jnp.float32(1.0 / 180.0)) ** 4
    r_cpa = jnp.minimum(1.0, (d_cpa * jnp.float32(
        1.0 / p.safe_distance)) ** 4)
    dev_frac = jnp.abs(d_dev) * jnp.float32(1.0 / p.d_dev_max_reward)
    r_dev = jnp.where(dev_frac > 1.0, 0.0,
                      jnp.sqrt(jnp.maximum(0.0, 1.0 - dev_frac)))
    r_goal = jnp.minimum(1.0, (1.0 - d_goal * jnp.float32(
        1.0 / p.d_goal_max_reward)) ** 4)
    return r_head * jnp.where(v_closing <= 0, r_cpa * r_dev, r_goal)


def fused_rollout_kernel(seed_ref,                       # SMEM (1,1) int32
                         px0, py0, psi0, tx0, ty0, tv0, tpsi0, steps0, tot0,
                         pxo, pyo, psio, txo, tyo, tvo, tpsio, stepso, toto,
                         rsum, ep_count, goal_count, coll_count, osum,
                         *, T: int, p: EnvParams, zero_actions: bool,
                         with_obs: bool):
    """One grid program: full T-step autoreset rollout for LANES envs.

    `with_obs`: build the full 8-feature observation of the post-step
    (post-respawn) state each step — exactly what a training consumer
    receives (envs/core.py:observe) — and fold it into a carried checksum
    so the work cannot be dead-code-eliminated.  The default skips it (the
    pure-stepping workload consumes no observations)."""
    lane = (jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.uint32, (8, 128), 1))
    rng_base = (seed_ref[0, 0].astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                + jnp.uint32(pl.program_id(0)) * jnp.uint32(0xC2B2AE35)
                + lane * jnp.uint32(0x27D4EB2F))

    dt = jnp.float32(p.dt)
    v = jnp.float32(p.airspeed)
    acc = jnp.float32(p.acc_lat_limit)
    gx = jnp.float32(p.goal_x)
    gy = jnp.float32(p.goal_y)
    inv_max_steps = jnp.float32(1.0 / p.max_steps)

    bearing = goal_bearing(p)

    def body(i, carry):
        (px, py, psi, tx, ty, tv, tpsi, tcos, tsin,
         steps, tot, rs, ec, gc, cc, os_) = carry

        # ---- random action in [-1, 1] (or forced zero for parity tests)
        if zero_actions:
            a_lat = jnp.zeros((8, 128), jnp.float32)
        else:
            a = _u01_hash(rng_base, i, 0) * 2.0 - 1.0
            a_lat = a * acc

        # ---- integrate player (aircraft.py:16-26; heading in degrees)
        psi = _mod360(psi + a_lat / v)          # net change a_lat/v degrees
        pr = psi * DEG2RAD
        cp = jnp.cos(pr)
        sp = jnp.sin(pr)
        px = px + v * cp * dt
        py = py + v * sp * dt
        # ---- integrate traffic (straight; direction cosines cached)
        tx = tx + tv * tcos * dt
        ty = ty + tv * tsin * dt

        steps = steps + 1

        d_goal, h_goal_rad, d_dev, d_sep, d_cpa, v_closing = env_geometry(
            px, py, cp, sp, psi, tx, ty, tv, tcos, tsin, a_lat,
            v=v, dt=dt, gx=gx, gy=gy)
        h_goal_deg = h_goal_rad * jnp.float32(1.0 / DEG2RAD)
        r_step = shaped_step_reward(psi, h_goal_deg, d_goal, d_dev, d_cpa,
                                    v_closing, p=p)

        collided = d_sep < jnp.float32(2 * p.collision_radius)
        at_goal = d_goal < jnp.float32(p.goal_radius)
        tdf = 1.0 - steps.astype(jnp.float32) * inv_max_steps
        reward = (r_step * tdf
                  + jnp.where(collided, jnp.float32(p.reward_collision), 0.0)
                  + jnp.where(at_goal, jnp.float32(p.reward_goal), 0.0))
        tot = tot + reward
        rs = rs + reward

        # ---- termination: timeout > collision > goal (game.py:294-314)
        done = (steps > p.max_steps) | collided | at_goal
        ec = ec + done.astype(jnp.int32)
        gc = gc + (at_goal & ~collided & (steps <= p.max_steps)).astype(jnp.int32)
        cc = cc + (collided & (steps <= p.max_steps)).astype(jnp.int32)

        # ---- masked in-graph respawn
        (fpx, fpy, fpsi, ftx, fty, ftv, ftpsi) = respawn(
            _u01_hash(rng_base, i, 1), _u01_hash(rng_base, i, 2),
            _u01_hash(rng_base, i, 3), p=p, bearing=bearing)
        ftr = ftpsi * DEG2RAD
        ftcos = jnp.cos(ftr)
        ftsin = jnp.sin(ftr)
        px = jnp.where(done, fpx, px)
        py = jnp.where(done, fpy, py)
        psi = jnp.where(done, fpsi, psi)
        tx = jnp.where(done, ftx, tx)
        ty = jnp.where(done, fty, ty)
        tv = jnp.where(done, ftv, tv)
        tpsi = jnp.where(done, ftpsi, tpsi)
        tcos = jnp.where(done, ftcos, tcos)
        tsin = jnp.where(done, ftsin, tsin)
        # reset: observe() leaves steps == 1 (game.py:197)
        steps = jnp.where(done, 1, steps)
        tot = jnp.where(done, 0.0, tot)

        if with_obs:
            # observation of the post-step (post-respawn) state — the obs a
            # training consumer receives (envs/core.py:observe; the
            # closing-speed lookahead holds the live a_lat, 0 after respawn)
            a_live = jnp.where(done, jnp.float32(0.0), a_lat)
            pr2 = psi * DEG2RAD
            cp2 = jnp.cos(pr2)
            sp2 = jnp.sin(pr2)
            (d_goal2, h_goal_rad2, d_dev2, d_sep2, d_cpa2,
             v_closing2) = env_geometry(
                px, py, cp2, sp2, psi, tx, ty, tv, tcos, tsin, a_live,
                v=v, dt=dt, gx=gx, gy=gy)
            os_ = (os_
                   + steps.astype(jnp.float32) * inv_max_steps
                   + psi * jnp.float32(1.0 / 360.0)
                   + d_dev2 * jnp.float32(1.0 / p.d_dev_max)
                   + d_goal2 * jnp.float32(1.0 / p.d_goal_max)
                   + (h_goal_rad2 * jnp.float32(1.0 / DEG2RAD))
                   * jnp.float32(1.0 / 360.0)
                   + d_sep2 * jnp.float32(1.0 / p.d_separation_max)
                   + d_cpa2 * jnp.float32(1.0 / p.d_cpa_max)
                   + v_closing2 * jnp.float32(1.0 / p.v_closing_max))
        return (px, py, psi, tx, ty, tv, tpsi, tcos, tsin,
                steps, tot, rs, ec, gc, cc, os_)

    tr = tpsi0[0] * DEG2RAD
    init = (px0[0], py0[0], psi0[0], tx0[0], ty0[0], tv0[0], tpsi0[0],
            jnp.cos(tr), jnp.sin(tr), steps0[0], tot0[0],
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.int32),
            jnp.zeros((8, 128), jnp.int32),
            jnp.zeros((8, 128), jnp.int32),
            jnp.zeros((8, 128), jnp.float32))
    (px, py, psi, tx, ty, tv, tpsi, _, _, steps, tot, rs, ec, gc, cc,
     os_) = jax.lax.fori_loop(0, T, body, init)
    pxo[0] = px
    pyo[0] = py
    psio[0] = psi
    txo[0] = tx
    tyo[0] = ty
    tvo[0] = tv
    tpsio[0] = tpsi
    stepso[0] = steps
    toto[0] = tot
    rsum[0] = rs
    ep_count[0] = ec
    goal_count[0] = gc
    coll_count[0] = cc
    osum[0] = os_


def fused_rollout(px, py, psi, tx, ty, tv, tpsi, steps, total_reward,
                  seed: int, T: int,
                  params: EnvParams = DEFAULT_PARAMS,
                  interpret: bool = False,
                  zero_actions: bool = False,
                  with_obs: bool = False):
    """Run T autoreset steps with in-kernel random actions.

    Inputs are flat (B,) f32 state arrays (traffic arrays squeezed:
    max_traffic == 1) and int32 steps.  Returns the final state plus per-env
    (reward_sum, episodes_ended, goals, collisions, obs_sum).  `with_obs`
    additionally materializes the full post-step observation every step and
    checksums it into obs_sum (zeros otherwise) — the obs-inclusive
    workload a training consumer sees (envs/core.py:observe).
    """
    # The in-kernel respawn (spawn() above) specializes the reference's only
    # exercised configuration: exactly one traffic aircraft at constant
    # airspeed (settings.py:31-32,39-41).  Any other EnvParams would
    # silently produce wrong spawn distributions — fail loudly instead.
    assert params.max_traffic == 1 and params.min_traffic == 1, (
        "pallas path specializes min_traffic == max_traffic == 1 "
        f"(got {params.min_traffic}..{params.max_traffic}); "
        "use envs/vector.py for other configs")
    assert (params.airspeed_factor_min == 1.0
            and params.airspeed_factor_max == 1.0), (
        "pallas respawn hard-codes traffic speed == airspeed "
        f"(got factor range {params.airspeed_factor_min}.."
        f"{params.airspeed_factor_max}); use envs/vector.py")
    assert params.bug_compat, (
        "pallas kernels bake in the reference's bug_compat kinematics "
        "quirks (kinematics.py:47,57,67,74); use envs/vector.py for "
        "corrected physics (bug_compat=False)")
    B = px.shape[0]
    assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
    G = B // LANES

    def shape(x, dtype):
        return x.reshape(G, 8, 128).astype(dtype)

    f32 = jnp.float32
    ins = [shape(px, f32), shape(py, f32), shape(psi, f32),
           shape(tx, f32), shape(ty, f32), shape(tv, f32), shape(tpsi, f32),
           shape(steps, jnp.int32), shape(total_reward, f32)]
    blk = pl.BlockSpec((1, 8, 128), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    out_shapes = ([jax.ShapeDtypeStruct((G, 8, 128), f32)] * 7
                  + [jax.ShapeDtypeStruct((G, 8, 128), jnp.int32)]
                  + [jax.ShapeDtypeStruct((G, 8, 128), f32)] * 2
                  + [jax.ShapeDtypeStruct((G, 8, 128), jnp.int32)] * 3
                  + [jax.ShapeDtypeStruct((G, 8, 128), f32)])

    kernel = functools.partial(fused_rollout_kernel, T=T, p=params,
                               zero_actions=zero_actions, with_obs=with_obs)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)] + [blk] * 9,
        out_specs=[blk] * 14,
        out_shape=out_shapes,
        interpret=interpret,
    )(jnp.array([[seed]], jnp.int32), *ins)

    flat = [o.reshape(B) for o in outs]
    state = dict(px=flat[0], py=flat[1], psi=flat[2], tx=flat[3], ty=flat[4],
                 tv=flat[5], tpsi=flat[6], steps=flat[7], total_reward=flat[8])
    stats = dict(reward_sum=flat[9], episodes=flat[10], goals=flat[11],
                 collisions=flat[12], obs_sum=flat[13])
    return state, stats
