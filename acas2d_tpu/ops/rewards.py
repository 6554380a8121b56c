"""Branchless shaped-reward ops (jax.numpy) for the ACAS-2D engine.

Re-design of `gym_ACAS2D/envs/rewards.py` for XLA: the reference's Python
branches become `jnp.where` selects so a single fused VPU kernel evaluates
the reward for an arbitrary batch of envs.  The reference's ValueError domain
guards (rewards.py:9,50) are dropped — the domains hold by construction in
the step function (headings are %360, distances are nonnegative).

All exponents match the reference defaults.  `x**4` is lowered by XLA to
exact repeated multiplication, which can differ from libm pow() by <=1 ulp;
rewards never feed back into the state, so parity on returns is tolerance-
checked rather than bitwise (tests/test_jax_parity.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from acas2d_tpu.ops.kinematics import delta_heading


def heading_reward(psi, phi, exp: float = 4):
    """(1 - delta_heading/180)^exp (rewards.py:5-9)."""
    return (1 - delta_heading(psi, phi) / 180) ** exp


def closest_approach_reward(v_closing, d_cpa, safe_distance, exp: float = 4):
    """1 when separating, else min(1, (d_cpa/SAFE_DISTANCE)^exp)
    (rewards.py:12-16).  d_cpa is signed; the even power symmetrizes it.
    (The arctan 0/0 corner that would make d_cpa NaN is defined away in
    kinematics.distance_closest_approach — the reference raises there.)"""
    capped = jnp.minimum(1.0, (d_cpa / safe_distance) ** exp)
    return jnp.where(v_closing > 0, 1.0, capped)


def plan_deviation_reward(d_dev, d_dev_max, exp: float = 0.5):
    """(1 - |d_dev|/d_dev_max)^exp inside the band, 0 outside
    (rewards.py:19-27).  The base is clamped at 0 before the fractional
    power so the masked-out branch never produces NaN."""
    frac = jnp.abs(d_dev) / d_dev_max
    inside = jnp.maximum(0.0, 1 - frac) ** exp
    return jnp.where(frac > 1.0, 0.0, inside)


def goal_distance_reward(d_goal, d_goal_max, exp: float = 4):
    """min(1, (1 - d_goal/d_goal_max)^exp) (rewards.py:44-50)."""
    return jnp.minimum(1.0, (1 - d_goal / d_goal_max) ** exp)


def step_reward(v_closing, psi, phi, d_cpa, d_goal, d_dev,
                safe_distance, d_dev_max_reward, d_goal_max_reward):
    """step_reward_5 (rewards.py:53-60): multiplicative gating with a branch
    on approach (v_closing <= 0: heading*cpa*deviation) vs separation
    (heading*goal-distance)."""
    h = heading_reward(psi, phi)
    approach = (closest_approach_reward(v_closing, d_cpa, safe_distance)
                * plan_deviation_reward(d_dev, d_dev_max_reward))
    separating = goal_distance_reward(d_goal, d_goal_max_reward)
    return h * jnp.where(v_closing <= 0, approach, separating)


def polarized_plan_deviation_reward(d_dev, d_cpa, d_dev_max, exp: float = 0.5):
    """rewards.py:30-41 — display-only variant in the reference (used by
    step_reward_6, game.py:421-428); provided for capability parity."""
    frac = jnp.abs(d_dev) / d_dev_max
    inside = jnp.maximum(0.0, 1 - frac) ** exp
    zero = (frac > 1.0) | ((d_cpa * d_dev) < 0)
    return jnp.where(zero, 0.0, inside)


def step_reward_6(v_closing, psi, phi, d_cpa, d_goal, d_dev,
                  safe_distance, d_dev_max_reward, d_goal_max_reward):
    """rewards.py:63-70 — HUD-display reward variant (capability parity)."""
    h = heading_reward(psi, phi)
    approach = (closest_approach_reward(v_closing, d_cpa, safe_distance)
                * polarized_plan_deviation_reward(d_dev, d_cpa, d_dev_max_reward))
    separating = goal_distance_reward(d_goal, d_goal_max_reward)
    return h * jnp.where(v_closing <= 0, approach, separating)
