"""Vectorized geometry/kinematics ops for the ACAS-2D engine (jax.numpy).

TPU-first re-design of the reference's scalar helpers
(`gym_ACAS2D/envs/kinematics.py`, `envs/aircraft.py`): every function here is
a pure elementwise jnp expression that broadcasts over arbitrary leading
batch axes, so a single fused XLA kernel handles millions of env instances on
the VPU.  Heading angles are kept in *degrees* modulo 360 (screen
coordinates: y down, clockwise from +x) exactly as the reference stores them.

Numerical-quirk compatibility (`bug_compat=True`, the default) reproduces
three reference behaviors that are load-bearing for trajectory/return parity
(SURVEY.md §2.2):
  (a) `distance_closest_approach` uses single-argument arctan — quadrant
      ambiguity and IEEE inf/NaN at v12x == 0 (kinematics.py:47);
  (b) `closing_speed` computes psi_dot without the /dt that the integrator
      applies (kinematics.py:57,67 vs aircraft.py:20);
  (c) `closing_speed` uses aircraft 1's airspeed for aircraft 2's y-velocity
      (kinematics.py:74).
Floating-point op order matches the reference so x64 results agree to the
last ulp (verified in tests/test_jax_parity.py).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

TWO_PI = 2.0 * math.pi
RAD_TO_DEG = 180.0 / math.pi


def deg_to_rad(psi_deg):
    """Degrees -> radians with the reference's op order ((psi/360)*2*pi)."""
    return (psi_deg / 360.0) * 2 * math.pi


def distance(x1, y1, x2, y2):
    """Euclidean distance (kinematics.py:7-13)."""
    dx = x1 - x2
    dy = y1 - y2
    return jnp.sqrt(dx * dx + dy * dy)


def relative_angle(x1, y1, x2, y2):
    """Bearing 1->2 in degrees in [0,360) (kinematics.py:16-22)."""
    rads = jnp.arctan2(y2 - y1, x2 - x1) % TWO_PI
    return rads * RAD_TO_DEG


def integrate(x, y, v, psi, a_lat, dt):
    """Euler step of the degree-space unicycle model (aircraft.py:16-26).

    psi_dot = a_lat/(v*dt), psi += psi_dot*dt (net change a_lat/v degrees per
    step), then advance position along the *new* heading.  No bounds
    clamping — aircraft may leave the airspace (aircraft.py:28-29 is unused
    in the RL path).  Returns (x', y', psi').
    """
    psi_dot = a_lat / (v * dt)
    psi = (psi + (psi_dot * dt)) % 360
    psi_rad = deg_to_rad(psi)
    x = x + (v * jnp.cos(psi_rad) * dt)
    y = y + (v * jnp.sin(psi_rad) * dt)
    return x, y, psi


def distance_closest_approach(x1, y1, v1, psi1, x2, y2, v2, psi2,
                              bug_compat: bool = True):
    """Signed distance at closest point of approach (kinematics.py:40-49).

    d_cpa = d * sin(bearing - arctan(v12y/v12x)); sign encodes which side of
    the relative-velocity ray the other aircraft passes on.
    """
    d = distance(x1, y1, x2, y2)
    a_rel_rad = deg_to_rad(relative_angle(x1, y1, x2, y2))
    psi1_rad = deg_to_rad(psi1)
    psi2_rad = deg_to_rad(psi2)
    v12x = v1 * jnp.cos(psi1_rad) - v2 * jnp.cos(psi2_rad)
    v12y = v1 * jnp.sin(psi1_rad) - v2 * jnp.sin(psi2_rad)
    if bug_compat:
        # v12x==0, v12y!=0 -> arctan(+-inf) = +-pi/2 (IEEE), kept.  The
        # 0/0 corner (velocities exactly equal, reachable in f32 after
        # ~1e10 env-steps) is where the reference's scalar-float division
        # raises ZeroDivisionError — undefined behavior, so we define it
        # as h_rel=0 instead of letting NaN poison the whole batch.
        denom = jnp.where((v12x == 0) & (v12y == 0), 1.0, v12x)
        h_rel_rad = jnp.arctan(v12y / denom)
    else:
        h_rel_rad = jnp.arctan2(v12y, v12x)
    return d * jnp.sin(a_rel_rad - h_rel_rad)


def closing_speed(x1, y1, v1, psi1, a_lat1, x2, y2, v2, psi2, a_lat2, dt,
                  bug_compat: bool = True):
    """Closing speed via one-step lookahead (kinematics.py:52-79).

    INVERTED sign convention vs the name: positive => separating (the reward
    code relies on this, rewards.py:13-14,54-60).  Both aircraft are advanced
    one predicted Euler step; velocities are dt-scaled displacements and the
    final /dt restores speed units (kinematics.py:77).
    """
    if bug_compat:
        psi_dot_1 = a_lat1 / v1          # missing /dt vs aircraft.py:20
        psi_dot_2 = a_lat2 / v2
    else:
        psi_dot_1 = a_lat1 / (v1 * dt)
        psi_dot_2 = a_lat2 / (v2 * dt)
    psi_rad_1 = deg_to_rad((psi1 + (psi_dot_1 * dt)) % 360)
    psi_rad_2 = deg_to_rad((psi2 + (psi_dot_2 * dt)) % 360)

    vx1 = v1 * jnp.cos(psi_rad_1) * dt
    vy1 = v1 * jnp.sin(psi_rad_1) * dt
    nx1 = x1 + vx1
    ny1 = y1 + vy1

    vx2 = v2 * jnp.cos(psi_rad_2) * dt
    vy2_speed = v1 if bug_compat else v2   # kinematics.py:74 typo
    vy2 = vy2_speed * jnp.sin(psi_rad_2) * dt
    ny2_vy = v2 * jnp.sin(psi_rad_2) * dt  # position update uses the correct v2
    nx2 = x2 + vx2
    ny2 = y2 + ny2_vy

    num = (vx1 - vx2) * (nx1 - nx2) + (vy1 - vy2) * (ny1 - ny2)
    # Coincident predicted positions (another reference ZeroDivisionError
    # corner): num is 0 there too, so define c = 0 ("approaching") rather
    # than produce 0/0 = NaN / x/0 = inf in the observation.
    d_next = distance(nx1, ny1, nx2, ny2)
    return (num / jnp.where(d_next == 0, 1.0, d_next)) / dt


def delta_heading(psi, phi):
    """Smallest angular difference in degrees (kinematics.py:82-83)."""
    a = jnp.abs(psi - phi)
    return jnp.minimum(a, 360.0 - a)
