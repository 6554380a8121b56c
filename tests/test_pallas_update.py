"""Fused PPO update kernel (ops/pallas_update.py) vs jax.grad of the XLA
loss, interpret mode on CPU.

The kernel's hand-derived backward must reproduce jax.grad(learner.ppo_loss)
exactly — including where gradients are zeroed by the ratio clip, the min()
branch selection, the log-ratio safety clamp, and the straight-through
log-std clamp — and a full train_step with fused_update=True must track the
XLA train_step to f32 rounding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.models.actor_critic import ActorCritic, gaussian_log_prob
from acas2d_tpu.ops import pallas_update
from acas2d_tpu.ppo import learner
from acas2d_tpu.ppo.config import PPOConfig

P = DEFAULT_PARAMS


def _make_minibatch(params, model, n=256, seed=1, ratio_spread=0.3):
    """Random minibatch whose ratios straddle the clip band (both min()
    branches and the in-band region are exercised)."""
    rng = np.random.default_rng(seed)
    obs = rng.normal(size=(n, 8)).astype(np.float32) * 0.3
    mean, log_std, value = model.apply(params, jnp.asarray(obs))
    act = np.asarray(mean) + rng.normal(size=(n, 1)).astype(np.float32) * 0.7
    old_logp = np.asarray(
        gaussian_log_prob(jnp.asarray(act), mean, log_std))
    old_logp = old_logp + rng.normal(size=n).astype(np.float32) * ratio_spread
    adv = rng.normal(size=n).astype(np.float32)
    ret = rng.normal(size=n).astype(np.float32)
    vals = np.asarray(value)
    packed = np.concatenate(
        [obs, act, old_logp[:, None], vals[:, None], adv[:, None],
         ret[:, None]], axis=1)
    fields = (jnp.asarray(obs), jnp.asarray(act), jnp.asarray(old_logp),
              jnp.asarray(vals), jnp.asarray(adv), jnp.asarray(ret))
    return jnp.asarray(packed), fields


def test_grads_match_jax_grad():
    model = ActorCritic()
    cfg = PPOConfig(n_envs=2, n_steps=128, minibatch_size=256,
                    total_timesteps=256)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.float32))
    packed, fields = _make_minibatch(params, model)

    (loss, aux), ref = jax.value_and_grad(learner.ppo_loss, has_aux=True)(
        params, model, fields, cfg)
    grads, kaux = pallas_update.ppo_minibatch_grads(
        params, packed, clip_range=cfg.clip_range, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True)

    # both clip regimes must actually be exercised by the fixture
    assert 0.1 < float(aux["clip_fraction"]) < 0.9

    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref),
            jax.tree_util.tree_leaves_with_path(grads)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        assert np.abs(a - b).max() / scale < 1e-5, jax.tree_util.keystr(pa)

    np.testing.assert_allclose(float(kaux["loss"]), float(loss), rtol=1e-6)
    for k in ("policy_loss", "value_loss", "entropy", "approx_kl",
              "clip_fraction"):
        np.testing.assert_allclose(float(kaux[k]), float(aux[k]), rtol=1e-5,
                                   atol=1e-7)


def test_grads_match_with_nonzero_ent_coef():
    model = ActorCritic()
    cfg = PPOConfig(n_envs=2, n_steps=128, minibatch_size=256,
                    total_timesteps=256, ent_coef=0.01)
    params = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 8), jnp.float32))
    packed, fields = _make_minibatch(params, model, seed=3)

    (_, _), ref = jax.value_and_grad(learner.ppo_loss, has_aux=True)(
        params, model, fields, cfg)
    grads, _ = pallas_update.ppo_minibatch_grads(
        params, packed, clip_range=cfg.clip_range, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True)
    a = np.asarray(ref["params"]["log_std"])
    b = np.asarray(grads["params"]["log_std"])
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-8)


def test_supported_predicate():
    assert pallas_update.supported(128)
    assert pallas_update.supported(65536)
    assert not pallas_update.supported(64)
    with pytest.raises(ValueError):
        pallas_update._chunk_cols(192)


def test_fused_update_train_step_tracks_xla():
    """Full train_step with fused_update=True: identical rollout/shuffle
    RNG, gradients differ only by f32-vs-x64 rounding — params must track
    the XLA train_step closely and metrics must agree.  The test backend is
    multi-device (conftest's virtual 8), so the fused path takes a 1-device
    mesh (the multi-device guard requires one; the 8-device case is
    tests/test_sharding.py::test_sharded_fused_update_train_step_matches_xla)."""
    from acas2d_tpu.parallel import mesh as mesh_lib

    model = ActorCritic()
    n_envs, n_steps = 64, 32
    cfg_x = PPOConfig(n_envs=n_envs, n_steps=n_steps, minibatch_size=512,
                      total_timesteps=n_envs * n_steps, n_epochs=2)
    cfg_f = PPOConfig(n_envs=n_envs, n_steps=n_steps, minibatch_size=512,
                      total_timesteps=n_envs * n_steps, n_epochs=2,
                      fused_update=True)
    st = learner.init_train_state(jax.random.PRNGKey(5), model, cfg_x, P)
    mesh1 = mesh_lib.make_mesh(jax.devices()[:1])

    st_x, m_x = jax.jit(learner.make_train_step(model, cfg_x, P))(st)
    st_f, m_f = jax.jit(learner.make_train_step(model, cfg_f, P,
                                                mesh=mesh1))(st)

    assert set(m_x) == set(m_f)
    np.testing.assert_allclose(float(m_f["loss"]), float(m_x["loss"]),
                               rtol=1e-3)
    for a, b in zip(jax.tree.leaves(st_x.params), jax.tree.leaves(st_f.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)


def test_bf16_grads_track_f32():
    """bf16 MXU operands (cfg.fused_update_bf16): gradients stay within
    bf16 rounding (~1e-2 relative) of the f32 kernel and the losses agree —
    the opt-in fast path trades bit-compat for ~4x MXU rate, not
    correctness."""
    model = ActorCritic()
    cfg = PPOConfig(n_envs=2, n_steps=128, minibatch_size=256,
                    total_timesteps=256)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.float32))
    packed, _ = _make_minibatch(params, model)

    g32, a32 = pallas_update.ppo_minibatch_grads(
        params, packed, clip_range=cfg.clip_range, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True)
    g16, a16 = pallas_update.ppo_minibatch_grads(
        params, packed, clip_range=cfg.clip_range, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True, bf16=True)

    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g32),
            jax.tree_util.tree_leaves_with_path(g16)):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-12
        # relative to leaf scale, with an absolute floor: near-zero-gradient
        # leaves inherit upstream bf16 rounding proportional to the LARGE
        # intermediates, not their own magnitude
        assert np.abs(a - b).max() < 3e-2 * scale + 5e-6, \
            jax.tree_util.keystr(pa)
    np.testing.assert_allclose(float(a16["loss"]), float(a32["loss"]),
                               rtol=5e-3)


# ----------------------------------------------- packed-parameter update

def test_pack_unpack_roundtrip():
    """pack_params_tree -> unpack_params_tree is bit-exact, and the packed
    off-diagonal blocks are exactly zero (the invariant the masked grads
    preserve through elementwise optimizers)."""
    model = ActorCritic()
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 8), jnp.float32))
    packed = pallas_update.pack_params_tree(params)
    back = pallas_update.unpack_params_tree(packed, params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    w2 = np.asarray(packed["w2c"])
    assert (w2[:64, 64:] == 0).all() and (w2[64:, :64] == 0).all()
    w3 = np.asarray(packed["w3c"])
    assert (w3[2:] == 0).all() and (w3[0, 64:] == 0).all() \
        and (w3[1, :64] == 0).all()


def test_packed_grads_equal_flax_grads():
    """ppo_minibatch_grads_packed computes the SAME kernel math as
    ppo_minibatch_grads — the packed grads slice bit-exactly to the flax
    grads, the masked off-diagonals are zero, and aux matches."""
    model = ActorCritic()
    cfg = PPOConfig(n_envs=2, n_steps=128, minibatch_size=256,
                    total_timesteps=256)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.float32))
    packed_mb, _ = _make_minibatch(params, model)

    g_flax, a_flax = pallas_update.ppo_minibatch_grads(
        params, packed_mb, clip_range=cfg.clip_range, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True)
    gp, a_packed = pallas_update.ppo_minibatch_grads_packed(
        pallas_update.pack_params_tree(params), packed_mb,
        clip_range=cfg.clip_range, vf_coef=cfg.vf_coef,
        ent_coef=cfg.ent_coef, interpret=True)

    # masked off-diagonals exactly zero
    w2 = np.asarray(gp["w2c"])
    assert (w2[:64, 64:] == 0).all() and (w2[64:, :64] == 0).all()
    assert (np.asarray(gp["w3c"])[2:] == 0).all()
    assert (np.asarray(gp["b3c"])[2:] == 0).all()
    # slicing the packed grads reproduces the flax grads bit-exactly
    back = pallas_update.unpack_params_tree(gp, params)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_flax),
            jax.tree_util.tree_leaves_with_path(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(path))
    for k in a_flax:
        np.testing.assert_array_equal(np.asarray(a_flax[k]),
                                      np.asarray(a_packed[k]), err_msg=k)


def test_packed_update_train_step_matches_fused():
    """Full train_step with fused_update_packed: identical RNG streams;
    params/opt-state must track the unpacked fused train_step to float
    rounding (the ONLY difference is global-norm summation order over 7 vs
    11 leaves) and the returned metrics must agree."""
    from acas2d_tpu.parallel import mesh as mesh_lib

    model = ActorCritic()
    n_envs, n_steps = 64, 32
    kw = dict(n_envs=n_envs, n_steps=n_steps, minibatch_size=512,
              total_timesteps=n_envs * n_steps, n_epochs=2)
    cfg_f = PPOConfig(fused_update=True, **kw)
    cfg_p = PPOConfig(fused_update=True, fused_update_packed=True, **kw)
    st = learner.init_train_state(jax.random.PRNGKey(5), model, cfg_f, P)
    mesh1 = mesh_lib.make_mesh(jax.devices()[:1])

    st_f, m_f = jax.jit(learner.make_train_step(model, cfg_f, P,
                                                mesh=mesh1))(st)
    st_p, m_p = jax.jit(learner.make_train_step(model, cfg_p, P,
                                                mesh=mesh1))(st)

    assert set(m_f) == set(m_p)
    np.testing.assert_allclose(float(m_p["loss"]), float(m_f["loss"]),
                               rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(st_f.params),
            jax.tree_util.tree_leaves_with_path(st_p.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(path))
    # optimizer state: same tree structure, moments match
    assert (jax.tree_util.tree_structure(st_f.opt_state)
            == jax.tree_util.tree_structure(st_p.opt_state))
    for a, b in zip(jax.tree.leaves(st_f.opt_state),
                    jax.tree.leaves(st_p.opt_state)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-6)
