"""JAX engine vs NumPy oracle parity on the x64 CPU backend (SURVEY.md §4).

The oracle is itself validated bit-exactly against the reference's committed
golden CSV (test_oracle_csv.py), so these tests close the chain
reference -> oracle -> JAX engine.  XLA may contract mul+add to FMA and its
transcendentals can differ from libm in the last ulp, so positions are
checked to 1e-9 px over full 1000-step episodes (observed <= ~3e-13) and
rewards/obs to 1e-9; outcomes, step counts and termination must match
exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acas2d_tpu.config import DEFAULT_PARAMS, EnvParams
from acas2d_tpu.envs import core, vector
from acas2d_tpu.oracle import MersenneSpawner, OracleEnv

P = DEFAULT_PARAMS


def _jax_reset_from(init, dtype=jnp.float64):
    return core.reset_from(init.player_psi, init.traffic_x, init.traffic_y,
                           init.traffic_v, init.traffic_psi,
                           init.num_traffic, P, dtype)


def _run_pair(actions_per_episode, n_episodes, skip=2, seed=None):
    """Run oracle and jitted JAX env side by side; assert parity."""
    params = P if seed is None else EnvParams(seed=seed)
    sp_o = MersenneSpawner(params, skip_episodes=skip)
    sp_j = MersenneSpawner(params, skip_episodes=skip)
    step_j = jax.jit(lambda s, a: core.step(s, a, P))
    for ep in range(n_episodes):
        o = OracleEnv(P, spawner=sp_o)
        obs_o = o.reset()
        s, obs_j = _jax_reset_from(sp_j.spawn())
        np.testing.assert_allclose(np.asarray(obs_j), obs_o, atol=1e-12, rtol=0)
        for t in range(P.max_steps):
            a = actions_per_episode(ep, t)
            obs_o, r_o, done_o, _ = o.step(np.array([a]))
            s, out = step_j(s, a)
            assert bool(out.done) == done_o, (ep, t)
            if done_o:
                assert int(out.outcome) == o.state.outcome, (ep, t)
                assert int(s.steps) == o.state.steps, (ep, t)
                np.testing.assert_allclose(float(s.total_reward),
                                           o.state.total_reward,
                                           atol=1e-8, rtol=0)
                break
        np.testing.assert_allclose(
            [float(s.px), float(s.py), float(s.ppsi)],
            [o.state.px, o.state.py, o.state.ppsi], atol=1e-9, rtol=0)
        np.testing.assert_allclose(np.asarray(s.tx), o.state.tx, atol=1e-9, rtol=0)
        np.testing.assert_allclose(np.asarray(out.obs), obs_o, atol=1e-9, rtol=0)
        np.testing.assert_allclose(float(out.reward), r_o, atol=1e-9, rtol=0)


def test_zero_action_episodes_match_oracle():
    """Stage-2 parity (BASELINE.json config 1-2): the zero-action baseline."""
    _run_pair(lambda ep, t: 0.0, n_episodes=4)


def test_random_action_episodes_match_oracle():
    rng = np.random.default_rng(42)
    acts = rng.uniform(-1, 1, size=(4, P.max_steps))
    _run_pair(lambda ep, t: float(acts[ep, t]), n_episodes=4)


def test_constant_turn_episodes_match_oracle():
    """gym_main.py:36 scripted policy: action = (episode % 3) - 1."""
    _run_pair(lambda ep, t: float((ep + 1) % 3 - 1), n_episodes=3)


def test_vectorized_batch_matches_single_env():
    """vmap+scan over B envs == B independent single-env rollouts."""
    B, T = 8, 120
    key = jax.random.PRNGKey(7)
    states, obs0 = vector.reset_batch(key, B, P, dtype=jnp.float64)
    acts = jax.random.uniform(jax.random.PRNGKey(8), (T, B), jnp.float64, -1, 1)
    final, outs = jax.jit(
        lambda s, a: vector.rollout_actions(s, a, P, autoreset=False))(states, acts)
    # XLA compiles the batched and scalar programs differently (FMA
    # contraction, vectorization), so equality is to ~ulp tolerance.
    step_j = jax.jit(lambda s, a: core.step(s, a, P))
    for b in range(B):
        s = jax.tree.map(lambda x: x[b], states)
        for t in range(T):
            s, out = step_j(s, acts[t, b])
            np.testing.assert_allclose(np.asarray(out.reward),
                                       np.asarray(outs.reward[t, b]),
                                       atol=1e-12, rtol=0)
        np.testing.assert_allclose(np.asarray(s.px), np.asarray(final.px[b]),
                                   atol=1e-10, rtol=0)
        np.testing.assert_allclose(np.asarray(s.ppsi), np.asarray(final.ppsi[b]),
                                   atol=1e-10, rtol=0)


def test_autoreset_respawns_and_preserves_terminal_info():
    """Auto-reset: done step reports the terminated episode and returns the
    reset observation (SB3 DummyVecEnv semantics, SURVEY.md §3.1)."""
    B, T = 16, 900
    states, obs0 = vector.reset_batch(jax.random.PRNGKey(3), B, P, jnp.float64)
    acts = jnp.zeros((T, B))  # zero action terminates within <=700 steps
    final, outs = jax.jit(
        lambda s, a: vector.rollout_actions(s, a, P, autoreset=True))(states, acts)
    done = np.asarray(outs.done)
    assert done.any(axis=0).all(), "every env should finish at least once"
    ep_steps = np.asarray(outs.episode_steps)
    ep_ret = np.asarray(outs.episode_return)
    next_obs = np.asarray(outs.obs)
    for b in range(B):
        ts = np.nonzero(done[:, b])[0]
        for t in ts:
            assert ep_steps[t, b] > 0
            assert ep_ret[t, b] != 0.0
            # Reset obs: step fraction back to 1/max_steps.
            np.testing.assert_allclose(next_obs[t, b, 0], 1.0 / P.max_steps)
        # after a reset the episode runs fresh: steps at t+1 is 2/max_steps
        for t in ts[ts + 1 < T]:
            np.testing.assert_allclose(next_obs[t + 1, b, 0], 2.0 / P.max_steps)


def test_autoreset_invariant_to_batch_position():
    """Each env's stream depends only on its own key: permuting the batch
    permutes results (resharding-stable reproducibility)."""
    B, T = 8, 300
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    states = jax.vmap(lambda k: core.spawn(k, P, jnp.float64))(keys)
    states, _ = jax.vmap(lambda s: core.observe(s, P))(states)
    acts = jnp.zeros((T, B))
    _, outs = jax.jit(
        lambda s, a: vector.rollout_actions(s, a, P, autoreset=True))(states, acts)

    perm = np.array([3, 1, 7, 0, 5, 2, 6, 4])
    states_p = jax.tree.map(lambda x: x[perm], states)
    _, outs_p = jax.jit(
        lambda s, a: vector.rollout_actions(s, a, P, autoreset=True))(states_p, acts)
    np.testing.assert_array_equal(np.asarray(outs.reward)[:, perm],
                                  np.asarray(outs_p.reward))


def test_singular_kinematics_corners_are_finite():
    """The two 0/0 corners where the reference's scalar-float math raises
    ZeroDivisionError (undefined behavior) must yield finite numbers, not
    NaN/inf that poison a whole training batch (hit in practice after
    ~1e10 f32 env-steps when player and traffic velocities land on the
    same float)."""
    from acas2d_tpu.ops import kinematics as K

    # Exactly equal velocity vectors -> v12x == v12y == 0.
    dca = K.distance_closest_approach(
        jnp.float32(100.0), jnp.float32(200.0), jnp.float32(200.0),
        jnp.float32(37.25), jnp.float32(900.0), jnp.float32(800.0),
        jnp.float32(200.0), jnp.float32(37.25), bug_compat=True)
    assert np.isfinite(float(dca))

    # v12x == 0 with v12y != 0 keeps the reference's IEEE arctan(inf) path.
    dca2 = K.distance_closest_approach(
        jnp.float32(0.0), jnp.float32(0.0), jnp.float32(200.0),
        jnp.float32(90.0), jnp.float32(500.0), jnp.float32(500.0),
        jnp.float32(200.0), jnp.float32(270.0), bug_compat=True)
    assert np.isfinite(float(dca2))

    # Coincident predicted positions -> closing speed defined as 0.
    c = K.closing_speed(
        jnp.float32(100.0), jnp.float32(100.0), jnp.float32(200.0),
        jnp.float32(0.0), jnp.float32(0.0),
        jnp.float32(100.0), jnp.float32(100.0), jnp.float32(200.0),
        jnp.float32(0.0), jnp.float32(0.0), 0.01, bug_compat=True)
    assert float(c) == 0.0
