"""End-to-end behavioral parity: the reference's committed TRAINED policy,
imported into our flax model and evaluated greedily on our engine, must
reproduce its recorded eval performance (best eval 1226.55 @ len 690,
final eval 1198.22 +/- 85.34 @ len 771.6 — BASELINE.md).

Observed on 100 episodes: mean 1208.06 +/- 68.75, len 706.8, 100% Goal.
This closes the loop over the full stack at once: spawn distributions,
observation layout + normalizers, dynamics, reward, termination, and the
policy architecture mapping.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.envs import core, vector
from acas2d_tpu.models.actor_critic import ActorCritic
from acas2d_tpu.oracle import MersenneSpawner

from acas2d_tpu.utils.reference import reference_path

BEST = reference_path("gym_ACAS2D", "models", "best_model_1048576_11",
                      "best_model.zip")

pytestmark = pytest.mark.skipif(not os.path.exists(BEST),
                                reason="reference checkpoint unavailable")

P = DEFAULT_PARAMS


def test_reference_policy_reproduces_recorded_reward():
    from acas2d_tpu.compat.sb3_import import load_sb3_policy

    params = load_sb3_policy(BEST)
    model = ActorCritic()
    N = 30
    sp = MersenneSpawner(P, skip_episodes=2)
    inits = sp.spawn_batch(N)
    psi = np.array([i.player_psi for i in inits])
    tx = np.stack([i.traffic_x for i in inits])
    ty = np.stack([i.traffic_y for i in inits])
    tv = np.stack([i.traffic_v for i in inits])
    tpsi = np.stack([i.traffic_psi for i in inits])
    nt = np.array([i.num_traffic for i in inits])

    def policy(o, _key=None):
        mean, _, _ = model.apply(params, o.astype(jnp.float32))
        return jnp.clip(mean[..., 0], -1.0, 1.0).astype(jnp.float64)

    @jax.jit
    def run(psi, tx, ty, tv, tpsi, nt):
        def one(psi, tx, ty, tv, tpsi, nt):
            state, obs = core.reset_from(psi, tx, ty, tv, tpsi, nt, P,
                                         jnp.float64)
            def body(carry, _):
                s, o, ret, length, outcome, seen = carry
                a = policy(o)
                s, out = core.step(s, a, P)
                active = ~seen
                ret = ret + jnp.where(active, out.reward, 0.0)
                length = length + jnp.where(active, 1, 0)
                outcome = jnp.where(active & out.done, out.outcome, outcome)
                seen = seen | out.done
                return (s, out.obs, ret, length, outcome, seen), None
            init = (state, obs, 0.0, 0, 0, False)
            (s, o, ret, length, outcome, seen), _ = jax.lax.scan(
                body, init, None, length=P.max_steps)
            return ret, length, outcome
        return jax.vmap(one)(psi, tx, ty, tv, tpsi, nt)

    ret, length, outcome = jax.device_get(run(psi, tx, ty, tv, tpsi, nt))
    assert (outcome == 1).all(), f"non-goal outcomes: {outcome}"
    assert 1100 < ret.mean() < 1330, ret.mean()
    assert 600 < length.mean() < 820, length.mean()


def test_sb3_import_roundtrip_shapes():
    from acas2d_tpu.compat.sb3_import import load_sb3_policy

    params = load_sb3_policy(BEST)
    model = ActorCritic()
    mean, log_std, value = model.apply(params, jnp.zeros((4, P.obs_dim)))
    assert mean.shape == (4, 1) and value.shape == (4,)
    assert np.isfinite(np.asarray(mean)).all()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, P.obs_dim)))
    t1 = jax.tree_util.tree_structure(ref)
    t2 = jax.tree_util.tree_structure(jax.tree.map(jnp.asarray, params))
    assert t1 == t2, "imported pytree structure must match ActorCritic's"
