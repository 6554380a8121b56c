"""PPO stack unit tests: GAE, gaussian policy math, learner step, sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.models.actor_critic import (ActorCritic, gaussian_entropy,
                                            gaussian_log_prob, sample_action)
from acas2d_tpu.ppo import learner
from acas2d_tpu.ppo.config import PPOConfig
from acas2d_tpu.ppo.gae import compute_gae

P = DEFAULT_PARAMS


def _gae_numpy(rewards, values, dones, last_value, gamma, lam):
    """Straightforward reverse-loop reference (SB3 semantics)."""
    T, B = rewards.shape
    adv = np.zeros((T, B))
    gae = np.zeros(B)
    next_value = last_value
    next_nonterminal = 1.0 - dones[-1]  # placeholder, set per step below
    for t in reversed(range(T)):
        nonterminal = 1.0 - dones[t]
        delta = rewards[t] + gamma * next_value * nonterminal - values[t]
        gae = delta + gamma * lam * nonterminal * gae
        adv[t] = gae
        next_value = values[t]
    return adv, adv + values


def test_gae_matches_numpy_reference():
    rng = np.random.default_rng(0)
    T, B = 40, 7
    rewards = rng.normal(size=(T, B))
    values = rng.normal(size=(T, B))
    dones = (rng.uniform(size=(T, B)) < 0.1).astype(np.float64)
    last_value = rng.normal(size=B)
    adv_ref, ret_ref = _gae_numpy(rewards, values, dones, last_value, 0.99, 0.95)
    adv, ret = jax.jit(lambda *a: compute_gae(*a, 0.99, 0.95))(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(dones),
        jnp.asarray(last_value))
    np.testing.assert_allclose(np.asarray(adv), adv_ref, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ret), ret_ref, atol=1e-10)


def test_gaussian_log_prob_and_entropy():
    from scipy import stats
    mean = np.array([0.3, -0.7])
    log_std = np.array([0.2, -0.5])
    x = np.array([0.5, 0.1])
    lp = float(gaussian_log_prob(jnp.asarray(x), jnp.asarray(mean),
                                 jnp.asarray(log_std)))
    lp_ref = stats.norm.logpdf(x, mean, np.exp(log_std)).sum()
    np.testing.assert_allclose(lp, lp_ref, rtol=1e-12)
    ent = float(gaussian_entropy(jnp.asarray(log_std)))
    ent_ref = stats.norm.entropy(mean, np.exp(log_std)).sum()
    np.testing.assert_allclose(ent, ent_ref, rtol=1e-12)


def test_actor_critic_matches_sb3_architecture():
    """Separate 64-64 tanh towers, orthogonal init with the recorded gains,
    zero log_std (SURVEY.md §6 PPO config of record)."""
    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, P.obs_dim)))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = {"/".join(str(p) for p in path): leaf.shape for path, leaf in flat}
    kernels = {k: v for k, v in names.items() if "kernel" in k}
    assert any("pi_tower" in k for k in kernels)
    assert any("vf_tower" in k for k in kernels)
    p = params["params"]
    assert p["pi_tower"]["dense_0"]["kernel"].shape == (P.obs_dim, 64)
    assert p["pi_tower"]["dense_1"]["kernel"].shape == (64, 64)
    assert p["action_head"]["kernel"].shape == (64, 1)
    assert p["value_head"]["kernel"].shape == (64, 1)
    np.testing.assert_array_equal(np.asarray(p["log_std"]), [0.0])
    # Orthogonality: W^T W proportional to I with gain^2 on the diagonal.
    W = np.asarray(p["pi_tower"]["dense_1"]["kernel"])
    np.testing.assert_allclose(W.T @ W, 2.0 * np.eye(64), atol=1e-4)
    Wa = np.asarray(p["action_head"]["kernel"])
    np.testing.assert_allclose((Wa.T @ Wa)[0, 0], 0.01 ** 2, rtol=1e-4)
    mean, log_std, value = model.apply(params, jnp.zeros((3, P.obs_dim)))
    assert mean.shape == (3, 1) and value.shape == (3,)


def test_train_step_runs_and_advances():
    cfg = PPOConfig(n_envs=16, n_steps=32, minibatch_size=128,
                    total_timesteps=16 * 32 * 2)
    model = ActorCritic()
    st = learner.init_train_state(jax.random.PRNGKey(0), model, cfg, P)
    step = jax.jit(learner.make_train_step(model, cfg, P))
    st2, m = step(st)
    assert int(m["iteration"]) == 1
    for k in ("loss", "policy_loss", "value_loss", "approx_kl",
              "explained_variance"):
        assert np.isfinite(float(m[k])), k
    # params actually changed
    diff = jax.tree_util.tree_reduce(
        lambda acc, x: acc + float(jnp.abs(x).sum()),
        jax.tree.map(lambda a, b: a - b, st.params, st2.params), 0.0)
    assert diff > 0


def test_eval_fn_completes_episodes():
    cfg = PPOConfig(n_envs=4, n_steps=8, minibatch_size=32,
                    total_timesteps=64, eval_episodes=6)
    model = ActorCritic()
    st = learner.init_train_state(jax.random.PRNGKey(0), model, cfg, P)
    ev = jax.jit(learner.make_eval_fn(model, cfg, P))(
        st.params, jax.random.PRNGKey(5))
    assert bool(ev["eval_done_all"])
    assert 1 <= float(ev["eval_length_mean"]) <= P.max_steps + 1


def test_exact_eval_fn_mersenne_protocol():
    """make_exact_eval_fn (training_main.py:28-35 protocol): same metric
    keys as make_eval_fn; episodes draw from ONE continuing Mersenne
    stream — a second call advances it, a fresh fn with the same seed
    reproduces the first call bit-exactly."""
    cfg = PPOConfig(n_envs=4, n_steps=8, minibatch_size=32,
                    total_timesteps=64, eval_episodes=6)
    model = ActorCritic()
    st = learner.init_train_state(jax.random.PRNGKey(0), model, cfg, P)

    f1 = learner.make_exact_eval_fn(model, cfg, P)
    m1 = jax.device_get(f1(st.params))
    ref = jax.device_get(jax.jit(learner.make_eval_fn(model, cfg, P))(
        st.params, jax.random.PRNGKey(5)))
    assert set(m1) == set(ref)
    assert bool(m1["eval_done_all"])

    m2 = jax.device_get(f1(st.params))           # stream advanced
    m1b = jax.device_get(
        learner.make_exact_eval_fn(model, cfg, P)(st.params))
    assert float(m1b["eval_return_mean"]) == float(m1["eval_return_mean"])
    assert float(m2["eval_return_mean"]) != float(m1["eval_return_mean"])

    # resume fast-forward: a fresh fn skipping one eval's worth of
    # episodes reproduces the SECOND call of the continuing stream
    m2b = jax.device_get(learner.make_exact_eval_fn(
        model, cfg, P, skip_episodes=cfg.eval_episodes)(st.params))
    assert float(m2b["eval_return_mean"]) == float(m2["eval_return_mean"])


def test_sharded_train_step_on_8_device_mesh():
    """BASELINE.json configs 4-5 in miniature: env batch sharded over an
    8-device mesh, replicated params, full PPO step compiles and runs."""
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_rollout_respects_sb3_clipping_semantics():
    """Raw actions keep their log-probs; env gets the clipped action."""
    cfg = PPOConfig(n_envs=8, n_steps=16, minibatch_size=32,
                    total_timesteps=128)
    model = ActorCritic()
    st = learner.init_train_state(jax.random.PRNGKey(0), model, cfg, P)
    st2, batch, last_v, _ = jax.jit(
        lambda s: learner.collect_rollout(model, s, cfg, P))(st)
    acts = np.asarray(batch.actions)
    mean, log_std, _ = model.apply(st.params, batch.obs)
    lp = gaussian_log_prob(batch.actions, mean, log_std)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(batch.log_probs),
                               rtol=1e-6)
    assert batch.obs.shape == (16, 8, P.obs_dim)
    assert last_v.shape == (8,)


def test_shuffle_block_resolution():
    from acas2d_tpu.ppo.config import tpu_default
    # Reference config (minibatch 64): exact SB3 row-level shuffle.
    assert PPOConfig().shuffle_block == 1
    # TPU-scale config (minibatch 65536): 512-row block shuffle.
    assert tpu_default().shuffle_block == 512
    # Explicit override wins; must divide minibatch and buffer.
    cfg = PPOConfig(n_envs=8, n_steps=64, minibatch_size=128,
                    shuffle_block_size=32, total_timesteps=1024)
    assert cfg.shuffle_block == 32
    bad = PPOConfig(n_envs=8, n_steps=64, minibatch_size=128,
                    shuffle_block_size=48, total_timesteps=1024)
    with pytest.raises(AssertionError):
        bad.shuffle_block


def test_train_step_with_block_shuffle():
    cfg = PPOConfig(n_envs=16, n_steps=32, minibatch_size=128,
                    shuffle_block_size=32, total_timesteps=16 * 32 * 2)
    model = ActorCritic()
    st = learner.init_train_state(jax.random.PRNGKey(0), model, cfg, P)
    step = jax.jit(learner.make_train_step(model, cfg, P))
    st2, m = step(st)
    assert np.isfinite(float(m["loss"]))
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     st.params, st2.params)
    assert max(jax.tree.leaves(d)) > 0


def test_update_remat_matches_exact():
    """cfg.update_remat only reschedules the backward (recompute vs stored
    activations): same float ops, params must match the non-remat train_step
    to the tightest tolerance."""
    import dataclasses

    cfg = PPOConfig(n_envs=16, n_steps=32, minibatch_size=128,
                    total_timesteps=16 * 32, n_epochs=2)
    model = ActorCritic()
    st = learner.init_train_state(jax.random.PRNGKey(3), model, cfg, P)
    st_a, m_a = jax.jit(learner.make_train_step(model, cfg, P))(st)
    cfg_r = dataclasses.replace(cfg, update_remat=True)
    st_b, m_b = jax.jit(learner.make_train_step(model, cfg_r, P))(st)
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(st_a.params), jax.tree.leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-8)
