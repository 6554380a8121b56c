"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: the fake-backend stand-in for pod-slice CI)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as Pspec

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.envs import vector
from acas2d_tpu.parallel import mesh as mesh_lib

P = DEFAULT_PARAMS

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 (virtual) devices")


def test_sharded_rollout_matches_single_device():
    """Sharding the env batch over 8 devices must not change results: the
    engine is embarrassingly parallel along the env axis."""
    B, T = 64, 100
    key = jax.random.PRNGKey(0)
    states, obs = jax.jit(
        lambda k: vector.reset_batch(k, B, P, jnp.float64))(key)
    acts = jax.random.uniform(jax.random.PRNGKey(1), (T, B), jnp.float64, -1, 1)

    roll = jax.jit(lambda s, a: vector.rollout_actions(s, a, P, autoreset=True))
    _, out_single = roll(states, acts)

    m = mesh_lib.make_mesh()
    states_sh = mesh_lib.shard_env_pytree(states, m)
    acts_sh = jax.device_put(acts, NamedSharding(m, Pspec(None, "env")))
    _, out_sharded = roll(states_sh, acts_sh)

    np.testing.assert_array_equal(np.asarray(out_single.reward),
                                  np.asarray(out_sharded.reward))
    np.testing.assert_array_equal(np.asarray(out_single.outcome),
                                  np.asarray(out_sharded.outcome))


def test_sharded_rollout_is_actually_distributed():
    """The compiled rollout keeps the env axis sharded (no silent
    all-gather onto one device)."""
    B = 64
    m = mesh_lib.make_mesh()
    key = jax.random.PRNGKey(0)
    states, obs = jax.jit(
        lambda k: vector.reset_batch(k, B, P, jnp.float32))(key)
    states = mesh_lib.shard_env_pytree(states, m)
    acts = jnp.zeros((16, B))
    acts = jax.device_put(acts, NamedSharding(m, Pspec(None, "env")))
    final, outs = jax.jit(
        lambda s, a: vector.rollout_actions(s, a, P, autoreset=True))(
            states, acts)
    assert len(final.px.sharding.device_set) == 8
    assert len(outs.reward.sharding.device_set) == 8


def test_sharded_train_step_matches_replicated():
    """Full PPO iteration: sharded-env mesh vs single device, same params
    out (up to reduction-order noise)."""
    from acas2d_tpu.models.actor_critic import ActorCritic
    from acas2d_tpu.ppo import learner
    from acas2d_tpu.ppo.config import PPOConfig

    cfg = PPOConfig(n_envs=16, n_steps=32, minibatch_size=64,
                    total_timesteps=16 * 32)
    model = ActorCritic()
    st = learner.init_train_state(jax.random.PRNGKey(0), model, cfg, P)
    step = jax.jit(learner.make_train_step(model, cfg, P))
    st_a, m_a = step(st)

    mesh = mesh_lib.make_mesh()
    st_sh = st.replace(
        env_state=mesh_lib.shard_env_pytree(st.env_state, mesh),
        obs=mesh_lib.shard_env_pytree(st.obs, mesh))
    st_b, m_b = step(st_sh)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_sharded_fused_update_train_step_matches_xla():
    """Fused-update kernel shard_mapped over the 8-device env mesh
    (learner.make_fused_grads_fn): a full train_step must track the
    XLA-update train_step to f32 rounding — same rollout/shuffle RNG, only
    the minibatch-gradient path differs (kernel + pmean vs jax.grad with
    XLA's all-reduce).  Interpret mode on CPU; per-device minibatch shard
    1024/8 = 128 rows."""
    import dataclasses

    from acas2d_tpu.models.actor_critic import ActorCritic
    from acas2d_tpu.ppo import learner
    from acas2d_tpu.ppo.config import PPOConfig

    cfg_x = PPOConfig(n_envs=64, n_steps=32, minibatch_size=1024,
                      total_timesteps=64 * 32, n_epochs=2)
    cfg_f = dataclasses.replace(cfg_x, fused_update=True)
    model = ActorCritic()
    st = learner.init_train_state(jax.random.PRNGKey(7), model, cfg_x, P)
    mesh = mesh_lib.make_mesh()
    st = st.replace(env_state=mesh_lib.shard_env_pytree(st.env_state, mesh),
                    obs=mesh_lib.shard_env_pytree(st.obs, mesh))

    st_x, m_x = jax.jit(learner.make_train_step(model, cfg_x, P))(st)
    st_f, m_f = jax.jit(learner.make_train_step(model, cfg_f, P,
                                                mesh=mesh))(st)

    assert set(m_x) == set(m_f)
    np.testing.assert_allclose(float(m_f["loss"]), float(m_x["loss"]),
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(st_x.params),
                    jax.tree.leaves(st_f.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_fused_update_multidevice_requires_mesh():
    """fused_update with a multi-device backend and no mesh must fail
    loudly at build time, not silently gather the minibatch onto one
    device (an un-shard_mapped pallas_call does not partition)."""
    from acas2d_tpu.models.actor_critic import ActorCritic
    from acas2d_tpu.ppo import learner
    from acas2d_tpu.ppo.config import PPOConfig

    cfg = PPOConfig(n_envs=16, n_steps=32, minibatch_size=128,
                    total_timesteps=16 * 32, fused_update=True)
    with pytest.raises(ValueError, match="mesh"):
        learner.make_train_step(ActorCritic(), cfg, P)


def test_scaling_bench_harness():
    """bench.py --scaling harness: both measurement paths run sharded over
    1 and 8 devices and report finite positive throughput (the efficiency
    NUMBER is only meaningful on real multi-chip hardware; here we pin that
    the harness executes the sharded programs it claims to measure)."""
    import bench

    for n in (1, 8):
        devs = jax.devices()[:n]
        sps = bench.measure_rollout_at(devs, n_envs=8 * n, T=8,
                                       iters=1, repeats=1)
        assert np.isfinite(sps) and sps > 0
        sps = bench.measure_train_at(devs, n_envs=8 * n, n_steps=8,
                                     iters=1, repeats=1)
        assert np.isfinite(sps) and sps > 0
