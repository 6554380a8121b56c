"""Fused policy-in-kernel rollout (ops/pallas_policy.py) vs the XLA path,
interpret mode on CPU.

Three layers of consistency:
  1. the in-kernel MLP matches flax `model.apply` on the kernel's own
     stored observations (values, and log-probs of the stored raw actions);
  2. replaying the kernel's stored (clipped) actions through the XLA
     engine from the same initial states reproduces the stored rewards,
     dones, and observations until each env's first respawn (after which
     the two RNG streams legitimately diverge);
  3. the learner-level wrapper (collect_rollout_fused) fills a RolloutBatch
     whose shapes/dtypes match the XLA collect_rollout contract and trains.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.envs import vector
from acas2d_tpu.models.actor_critic import (ActorCritic, gaussian_log_prob)
from acas2d_tpu.ops import pallas_policy

P = DEFAULT_PARAMS
B = 2 * pallas_policy.E        # two grid programs
K = 8


@pytest.fixture(scope="module")
def setup():
    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, P.obs_dim), jnp.float32))
    s, obs = jax.jit(
        lambda k: vector.reset_batch(k, B, P, jnp.float32))(
            jax.random.PRNGKey(7))
    return model, params, s, obs.astype(jnp.float32)


def _run_fused(params, s, obs, seed=3, offset=0, k=K):
    return pallas_policy.fused_policy_rollout(
        s.px, s.py, s.ppsi, s.tx[:, 0], s.ty[:, 0], s.tv[:, 0],
        s.tpsi[:, 0], s.steps, s.total_reward, obs, params,
        seed=seed, step_offset=offset, K=k, params=P, interpret=True)


def test_in_kernel_mlp_matches_flax(setup):
    model, params, s, obs = setup
    st, buf = _run_fused(params, s, obs)
    # the kernel's first-step obs is exactly the carried obs
    np.testing.assert_allclose(np.asarray(buf["obs"][0]), np.asarray(obs),
                               atol=1e-6)
    mean, log_std, value = jax.vmap(
        lambda o: model.apply(params, o))(buf["obs"].reshape(K * B, 8))
    np.testing.assert_allclose(np.asarray(buf["values"].reshape(-1)),
                               np.asarray(value), atol=2e-4, rtol=1e-4)
    logp = gaussian_log_prob(buf["actions"].reshape(-1, 1),
                             mean, log_std)
    np.testing.assert_allclose(np.asarray(buf["log_probs"].reshape(-1)),
                               np.asarray(logp), atol=2e-4, rtol=1e-4)


def test_stored_actions_replay_through_xla_engine(setup):
    model, params, s, obs = setup
    st, buf = _run_fused(params, s, obs)
    acts = jnp.clip(buf["actions"], -1.0, 1.0)      # (K, B)
    _, out = jax.jit(lambda s, a: vector.rollout_actions(
        s, a, P, autoreset=True))(s, acts)

    # mask: compare only while the env has not yet terminated (respawn RNG
    # streams differ between the kernel and the XLA engine)
    dones = np.asarray(buf["dones"]) > 0
    alive = np.cumsum(np.cumsum(dones, axis=0), axis=0) <= 1  # up to+incl 1st
    frac_alive = alive.mean()
    assert frac_alive > 0.95    # K=8 steps: almost nothing terminates

    np.testing.assert_allclose(
        np.asarray(buf["rewards"])[alive],
        np.asarray(out.reward)[alive], atol=5e-3, rtol=1e-4)
    np.testing.assert_array_equal(dones[alive],
                                  np.asarray(out.done)[alive])
    # obs the kernel fed the policy at step t+1 == engine obs after step t.
    # Tolerance pins the exact observe() semantics (incl. the a_lat the
    # closing-speed lookahead assumes): only f32-vs-engine rounding and the
    # kernel's ~3e-7-rad atan approximation remain.
    obs_k = np.asarray(buf["obs"])[1:]
    obs_x = np.asarray(out.obs)[:-1]
    m = alive[:-1][..., None] & alive[1:][..., None]
    np.testing.assert_allclose(obs_k[np.broadcast_to(m, obs_k.shape)],
                               obs_x[np.broadcast_to(m, obs_x.shape)],
                               atol=2e-5)


def test_chunk_offset_continues_stream(setup):
    """Two K-chunks with step offsets == one 2K run (same RNG counters)."""
    model, params, s, obs = setup
    st1, buf1 = _run_fused(params, s, obs, k=2 * K)

    sta, bufa = _run_fused(params, s, obs, k=K, offset=0)
    # rebuild an EnvState for the second chunk
    s2 = s.replace(px=sta["px"], py=sta["py"], ppsi=sta["psi"],
                   tx=sta["tx"][:, None], ty=sta["ty"][:, None],
                   tv=sta["tv"][:, None], tpsi=sta["tpsi"][:, None],
                   steps=sta["steps"], total_reward=sta["total_reward"])
    stb, bufb = _run_fused(params, s2, sta["obs"], k=K, offset=K)

    np.testing.assert_allclose(
        np.asarray(buf1["rewards"]),
        np.concatenate([bufa["rewards"], bufb["rewards"]]), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(buf1["dones"]),
        np.concatenate([bufa["dones"], bufb["dones"]]))
    np.testing.assert_allclose(np.asarray(st1["px"]), np.asarray(stb["px"]),
                               atol=1e-4)


def test_collect_rollout_fused_contract(setup):
    """Learner wrapper: shapes/dtypes of the RolloutBatch match the XLA
    collect_rollout, metrics dict has the same keys, and a full fused
    train_step runs and returns finite loss."""
    from acas2d_tpu.ppo import learner
    from acas2d_tpu.ppo.config import PPOConfig

    model = ActorCritic()
    cfg = PPOConfig(n_envs=B, n_steps=16, minibatch_size=B * 4,
                    total_timesteps=B * 16, fused_rollout=True,
                    fused_chunk=8)
    st = learner.init_train_state(jax.random.PRNGKey(1), model, cfg, P)
    st_f, batch, last_value, metrics = learner.collect_rollout_fused(
        model, st, cfg, P)
    st_x, batch_x, last_value_x, metrics_x = learner.collect_rollout(
        model, st, cfg, P)
    assert set(metrics) == set(metrics_x)
    # shapes must match exactly; dtype only in kind (the CI suite forces
    # x64, where the XLA path promotes to f64 while the kernel is f32)
    for a, b in zip(jax.tree.leaves(batch), jax.tree.leaves(batch_x)):
        assert a.shape == b.shape, (a.shape, b.shape)
        assert a.dtype.kind == b.dtype.kind, (a.dtype, b.dtype)
    assert last_value.shape == last_value_x.shape

    step = jax.jit(learner.make_train_step(model, cfg, P))
    st2, m = step(st)
    assert np.isfinite(float(m["loss"]))
    assert int(st2.iteration) == 1


def test_fused_state_obs_recompute_consistency():
    """The reconstructed env_state after a fused rollout carries the last
    applied a_lat, so a consumer that RECOMPUTES the observation from that
    state (core.observe — switching fused->XLA rollout mid-run, telemetry,
    make_eval_fn-style stepping) reproduces the obs the kernel carried.
    Before the pa_lat carry, the recomputed closing-speed lookahead
    (game.py:254-255 via kinematics.py:57) silently assumed a_lat=0 for
    every mid-episode env."""
    from acas2d_tpu.envs import core
    from acas2d_tpu.ppo import learner
    from acas2d_tpu.ppo.config import PPOConfig

    model = ActorCritic()
    cfg = PPOConfig(n_envs=B, n_steps=16, minibatch_size=B * 4,
                    total_timesteps=B * 16, fused_rollout=True,
                    fused_chunk=8)
    st = learner.init_train_state(jax.random.PRNGKey(9), model, cfg, P)
    st_f, _, _, _ = learner.collect_rollout_fused(model, st, cfg, P)
    es = st_f.env_state
    # mid-episode envs must carry a live (nonzero) lateral acceleration
    assert float(np.abs(np.asarray(es.pa_lat)).max()) > 0.0
    # observe() increments the step counter; rewind by one so it recomputes
    # the same post-step observation the kernel carried
    es_re = es.replace(steps=es.steps - 1)
    _, obs_re = jax.vmap(lambda s: core.observe(s, P))(es_re)
    np.testing.assert_allclose(np.asarray(obs_re, np.float32),
                               np.asarray(st_f.obs), atol=2e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_fused_rollout_sharded_over_mesh():
    """collect_rollout_fused under shard_map on the ('env',) mesh: runs,
    keeps the batch sharded, distinct RNG per shard (actions differ across
    shards), and a full fused+sharded train_step returns finite loss."""
    from acas2d_tpu.parallel import mesh as mesh_lib
    from acas2d_tpu.ppo import learner
    from acas2d_tpu.ppo.config import PPOConfig

    model = ActorCritic()
    cfg = PPOConfig(n_envs=8 * pallas_policy.E, n_steps=8,
                    minibatch_size=8 * pallas_policy.E * 2,
                    total_timesteps=8 * pallas_policy.E * 8,
                    fused_rollout=True, fused_chunk=4)
    st = learner.init_train_state(jax.random.PRNGKey(2), model, cfg, P)
    mesh = mesh_lib.make_mesh()
    st = st.replace(env_state=mesh_lib.shard_env_pytree(st.env_state, mesh),
                    obs=mesh_lib.shard_env_pytree(st.obs, mesh))

    st2, batch, last_value, metrics = learner.collect_rollout_fused(
        model, st, cfg, P, mesh=mesh)
    assert batch.obs.shape == (8, cfg.n_envs, 8)
    # per-shard RNG streams differ: shard 0 and shard 1 actions not equal
    a = np.asarray(batch.actions[:, :, 0])
    assert not np.allclose(a[:, :pallas_policy.E], 
                           a[:, pallas_policy.E:2 * pallas_policy.E])

    step = jax.jit(learner.make_train_step(model, cfg, P, mesh=mesh))
    st3, m = step(st)
    assert np.isfinite(float(m["loss"]))
