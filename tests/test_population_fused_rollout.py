"""Member-grid fused rollout (ops/pallas_policy.py:
fused_policy_rollout_members) and the population step built on it
(ppo/population.py:make_population_step_fused_rollout), interpret mode.

Consistency layers:
  1. the member grid REDUCES to the solo kernel at P == 1 (bit-exact
     outputs, same RNG streams — the solo path's committed behavior is
     untouched by the generalization);
  2. per-(member, block) RNG streams are decorrelated (identical params +
     identical env states still produce different action noise);
  3. the in-kernel MLP uses each member's OWN weights (stored values
     match flax applied with that member's params);
  4. the full population step with fused_rollout runs, trains, and its
     rollout reward statistics match the XLA population path's.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.envs import vector
from acas2d_tpu.models.actor_critic import ActorCritic
from acas2d_tpu.ops import pallas_policy
from acas2d_tpu.ppo import learner, population
from acas2d_tpu.ppo.config import PPOConfig

P = DEFAULT_PARAMS
E = pallas_policy.E
K = 8


def _flat_state(s):
    return dict(px=s.px, py=s.py, psi=s.ppsi, tx=s.tx[..., 0],
                ty=s.ty[..., 0], tv=s.tv[..., 0], tpsi=s.tpsi[..., 0],
                steps=s.steps, total_reward=s.total_reward)


def test_member_grid_reduces_to_solo_at_p1():
    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, P.obs_dim), jnp.float32))
    s, obs = jax.jit(lambda k: vector.reset_batch(k, E, P, jnp.float32))(
        jax.random.PRNGKey(7))
    obs = obs.astype(jnp.float32)

    st_solo, buf_solo = pallas_policy.fused_policy_rollout(
        s.px, s.py, s.ppsi, s.tx[:, 0], s.ty[:, 0], s.tv[:, 0],
        s.tpsi[:, 0], s.steps, s.total_reward, obs, params,
        seed=3, step_offset=0, K=K, params=P, interpret=True)

    flat1 = {k: v[None] for k, v in _flat_state(s).items()}
    st_m, buf_m = pallas_policy.fused_policy_rollout_members(
        flat1, obs[None], jax.tree.map(lambda x: x[None], params),
        seed=3, step_offset=0, K=K, params=P, interpret=True)

    for k in st_solo:
        np.testing.assert_array_equal(
            np.asarray(st_solo[k]), np.asarray(st_m[k][0]), err_msg=k)
    for k in buf_solo:
        np.testing.assert_array_equal(
            np.asarray(buf_solo[k]), np.asarray(buf_m[k][0]), err_msg=k)


def test_member_streams_decorrelated():
    """Two members with IDENTICAL params and IDENTICAL env states draw
    different gaussian action noise (the flattened program id feeds the
    hash RNG) — members are independent lottery tickets, not copies."""
    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, P.obs_dim), jnp.float32))
    s, obs = jax.jit(lambda k: vector.reset_batch(k, E, P, jnp.float32))(
        jax.random.PRNGKey(7))
    flat2 = {k: jnp.stack([v, v]) for k, v in _flat_state(s).items()}
    obs2 = jnp.stack([obs, obs]).astype(jnp.float32)
    tiled = jax.tree.map(lambda x: jnp.stack([x, x]), params)

    _, buf = pallas_policy.fused_policy_rollout_members(
        flat2, obs2, tiled, seed=3, step_offset=0, K=2, params=P,
        interpret=True)
    a = np.asarray(buf["actions"])
    assert not np.allclose(a[0], a[1])
    # same policy, same spawn distribution: mean behavior agrees
    assert abs(a[0].mean() - a[1].mean()) < 0.1


def test_member_kernel_uses_each_members_weights():
    """Stored values/means come from each member's own parameters: flax
    model.apply with member m's params on member m's stored obs must
    reproduce the stored values."""
    model = ActorCritic()
    p0 = model.init(jax.random.PRNGKey(0),
                    jnp.zeros((1, P.obs_dim), jnp.float32))
    p1 = model.init(jax.random.PRNGKey(1),
                    jnp.zeros((1, P.obs_dim), jnp.float32))
    stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]), p0, p1)
    s, obs = jax.jit(lambda k: vector.reset_batch(k, E, P, jnp.float32))(
        jax.random.PRNGKey(7))
    flat2 = {k: jnp.stack([v, v]) for k, v in _flat_state(s).items()}
    obs2 = jnp.stack([obs, obs]).astype(jnp.float32)

    _, buf = pallas_policy.fused_policy_rollout_members(
        flat2, obs2, stacked, seed=3, step_offset=0, K=2, params=P,
        interpret=True)
    for m, pm in enumerate((p0, p1)):
        o = jnp.asarray(buf["obs"][m].reshape(-1, 8))
        _, _, v = model.apply(pm, o)
        np.testing.assert_allclose(
            np.asarray(buf["values"][m]).reshape(-1), np.asarray(v),
            rtol=2e-4, atol=2e-4, err_msg=f"member {m}")


def test_population_step_fused_rollout_trains_and_matches_xla_stats():
    """make_population_step with fused_rollout: per-member metrics, params
    actually update, and the rollout's reward statistics agree with the
    XLA population path (RNG families differ — hash vs threefry — so the
    comparison is statistical, the same contract as solo
    --fused-rollout)."""
    cfg_f = PPOConfig(n_envs=E, n_steps=8, fused_chunk=4, minibatch_size=2048,
                      total_timesteps=E * 8, n_epochs=1, fused_rollout=True,
                      fused_update=True, fused_update_packed=True, seed=5)
    cfg_x = dataclasses.replace(cfg_f, fused_rollout=False,
                                fused_update=False,
                                fused_update_packed=False)
    model = ActorCritic()
    pop = 2
    st = population.init_population(model, cfg_f, P, pop)
    p_before = jax.tree.map(np.asarray, st.params)

    st_f, m_f = jax.jit(population.make_population_step(model, cfg_f, P))(st)
    st2 = population.init_population(model, cfg_x, P, pop)
    st_x, m_x = jax.jit(population.make_population_step(model, cfg_x, P))(st2)

    assert m_f["loss"].shape == (pop,)
    assert np.isfinite(np.asarray(m_f["loss"])).all()
    # params moved
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(p_before),
                        jax.tree.leaves(st_f.params)))
    assert moved
    # same spawn distribution + same (fresh-init) policy family: the
    # per-member mean step reward must agree across rollout backends
    r_f = np.asarray(m_f["ep_return_mean"])
    r_x = np.asarray(m_x["ep_return_mean"])
    assert np.isfinite(r_f).all() and np.isfinite(r_x).all()
    # episode returns at fresh init are O(-100..150); agree within noise
    assert abs(r_f.mean() - r_x.mean()) < 120.0, (r_f, r_x)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multiple devices")
def test_population_fused_rollout_shard_mapped_over_mesh():
    """Members shard across devices: each device runs its own member-grid
    kernel (seed folded with the device index); the step executes and
    yields finite per-member metrics."""
    from acas2d_tpu.parallel import mesh as mesh_lib

    cfg = PPOConfig(n_envs=E, n_steps=4, fused_chunk=2, minibatch_size=1024,
                    total_timesteps=E * 4, n_epochs=1, fused_rollout=True,
                    seed=5)
    model = ActorCritic()
    pop = 2
    devices = jax.devices()[:2]
    mesh = mesh_lib.make_mesh(devices)
    st = population.init_population(model, cfg, P, pop)
    st = jax.device_put(st, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("env")))
    step = jax.jit(population.make_population_step(model, cfg, P, mesh=mesh))
    st, m = step(st)
    assert m["loss"].shape == (pop,)
    assert np.isfinite(np.asarray(m["loss"])).all()
