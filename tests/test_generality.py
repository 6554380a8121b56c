"""Engine generality beyond the reference's exercised configuration:
multi-traffic (the reference's dead branch, game.py:107-114) and corrected
physics (EnvParams.bug_compat=False).
"""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.envs import core, vector
from acas2d_tpu.ops import kinematics as K


def test_multi_traffic_env_runs_and_masks():
    p = dataclasses.replace(DEFAULT_PARAMS, min_traffic=1, max_traffic=3)
    assert p.obs_dim == 5 + 3 * 3
    B = 64
    states, obs = jax.jit(
        lambda k: vector.reset_batch(k, B, p, jnp.float32))(
            jax.random.PRNGKey(0))
    assert obs.shape == (B, p.obs_dim)
    nt = np.asarray(states.num_traffic)
    assert nt.min() >= 1 and nt.max() <= 3 and len(set(nt.tolist())) > 1

    @jax.jit
    def run(s):
        def body(s, _):
            s, out = vector.step_autoreset_batch(
                s, jnp.full((B,), 0.1, jnp.float32), p)
            return s, None
        s, _ = jax.lax.scan(body, s, None, length=199)
        return vector.step_autoreset_batch(
            s, jnp.full((B,), 0.1, jnp.float32), p)

    states, out = run(states)
    obs = np.asarray(out.obs)
    assert np.isfinite(obs).all()
    # inert traffic slots contribute zeroed features (documented deviation
    # from the reference's buggy 2-zero pad, core.py docstring)
    nt = np.asarray(states.num_traffic)
    for i in range(len(nt)):
        for slot in range(int(nt[i]), 3):
            np.testing.assert_array_equal(obs[i, 5 + 3 * slot: 8 + 3 * slot],
                                          0.0)


def test_multi_traffic_collision_any_slot():
    p = dataclasses.replace(DEFAULT_PARAMS, min_traffic=3, max_traffic=3)
    state, _ = core.reset(jax.random.PRNGKey(1), p, jnp.float32)
    # put traffic slot 2 on top of the player; slots 0/1 far away
    state = state.replace(
        tx=jnp.array([1500.0, 1500.0, float(state.px)], state.tx.dtype),
        ty=jnp.array([100.0, 900.0, float(state.py)], state.ty.dtype))
    _, out = core.step(state, jnp.float32(0.0), p)
    assert bool(out.done)
    assert int(out.outcome) == 2  # collision


def test_bug_compat_false_corrects_dca_quadrant():
    # v12x < 0: arctan collapses the quadrant, atan2 does not
    args = dict(x1=0.0, y1=0.0, v1=100.0, psi1=180.0,   # flying -x
                x2=500.0, y2=10.0, v2=100.0, psi2=0.0)  # flying +x
    buggy = K.distance_closest_approach(**args, bug_compat=True)
    fixed = K.distance_closest_approach(**args, bug_compat=False)
    assert np.isfinite(float(buggy)) and np.isfinite(float(fixed))
    assert abs(float(buggy) - float(fixed)) > 1.0  # quirk is load-bearing
    # corrected value against an independent closed form: |d x v_rel| / |v_rel|
    dx, dy = args["x2"] - args["x1"], args["y2"] - args["y1"]
    vx = args["v1"] * math.cos(math.radians(args["psi1"])) - \
        args["v2"] * math.cos(math.radians(args["psi2"]))
    vy = args["v1"] * math.sin(math.radians(args["psi1"])) - \
        args["v2"] * math.sin(math.radians(args["psi2"]))
    # d_cpa = d*sin(a_rel - h_rel) == (dy*vx - dx*vy)/|v| up to sign conv.
    expected = (dy * vx - dx * vy) / math.hypot(vx, vy)
    np.testing.assert_allclose(float(fixed), expected, rtol=1e-6)


def test_bug_compat_false_closing_speed_consistent():
    # straight-line head-on approach: corrected closing speed must equal
    # -(approach speed) under the inverted sign convention (positive =
    # separating)
    v = 100.0
    c = K.closing_speed(0.0, 0.0, v, 0.0, 0.0, 1000.0, 0.0, v, 180.0, 0.0,
                        dt=0.01, bug_compat=False)
    np.testing.assert_allclose(float(c), -2 * v, rtol=1e-4)
    # and separating tail-to-tail is +2v
    c2 = K.closing_speed(0.0, 0.0, v, 180.0, 0.0, 1000.0, 0.0, v, 0.0, 0.0,
                         dt=0.01, bug_compat=False)
    np.testing.assert_allclose(float(c2), 2 * v, rtol=1e-4)


def test_bug_compat_env_modes_diverge():
    p_fix = dataclasses.replace(DEFAULT_PARAMS, bug_compat=False)

    def total(p):
        s, _ = core.reset(jax.random.PRNGKey(3), p, jnp.float32)

        def body(s, _):
            s, o = core.step(s, jnp.float32(0.3), p)
            return s, o.reward
        _, r = jax.lax.scan(body, s, None, length=300)
        return r.sum()

    r1 = float(jax.jit(lambda: total(DEFAULT_PARAMS))())
    r2 = float(jax.jit(lambda: total(p_fix))())
    assert np.isfinite(r1) and np.isfinite(r2)
    assert r1 != r2  # same trajectory, different reward shaping terms
