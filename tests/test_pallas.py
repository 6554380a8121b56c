"""Pallas fused-rollout kernel vs the jnp engine (interpret mode on CPU).

The kernel (ops/pallas_step.py) reimplements the full autoreset step —
integration, geometry incl. the bug_compat quirks (kinematics.py:47,57,67,74),
shaped reward (rewards.py:5-60), termination order (game.py:294-314) — with
in-kernel transcendental approximations.  Under forced-zero actions from
identical initial states the trajectory must match the reference-parity jnp
engine to f32 accumulation tolerance.
"""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.envs import vector
from acas2d_tpu.ops import pallas_step

P = DEFAULT_PARAMS
B = pallas_step.LANES          # one grid program
T = 64                         # < first possible termination under a=0


@pytest.fixture(scope="module")
def initial_states():
    s, _ = jax.jit(
        lambda k: vector.reset_batch(k, B, P, jnp.float32))(
            jax.random.PRNGKey(42))
    return s


def _run_jnp(s, T):
    def body(st, _):
        st, out = vector.step_autoreset_batch(
            st, jnp.zeros((B,), jnp.float32), P)
        return st, out.reward
    return jax.lax.scan(body, s, None, length=T)


def test_fused_rollout_matches_jnp_engine(initial_states):
    s = initial_states
    stj, rj = jax.jit(lambda s: _run_jnp(s, T))(s)
    stp, stats = pallas_step.fused_rollout(
        s.px, s.py, s.ppsi, s.tx[:, 0], s.ty[:, 0], s.tv[:, 0],
        s.tpsi[:, 0], s.steps, s.total_reward,
        seed=7, T=T, params=P, interpret=True, zero_actions=True)

    np.testing.assert_array_equal(np.asarray(stj.steps),
                                  np.asarray(stp["steps"]))
    for name, a, b in [("px", stj.px, stp["px"]), ("py", stj.py, stp["py"]),
                       ("psi", stj.ppsi, stp["psi"]),
                       ("tx", stj.tx[:, 0], stp["tx"]),
                       ("ty", stj.ty[:, 0], stp["ty"])]:
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-2, err_msg=name)
    # per-step reward error is bounded by the atan approximation (~3e-7 rad)
    np.testing.assert_allclose(np.asarray(rj.sum(0)),
                               np.asarray(stats["reward_sum"]),
                               rtol=2e-3, atol=2e-3)
    # no terminations inside the window
    assert int(np.asarray(stats["episodes"]).sum()) == 0


def test_fused_rollout_atan_helpers():
    xs = jnp.asarray(np.linspace(-50, 50, 4001), jnp.float32)
    np.testing.assert_allclose(np.asarray(pallas_step._atan(xs)),
                               np.arctan(np.asarray(xs)), atol=5e-7)
    ys = jnp.asarray(np.random.default_rng(0).normal(size=512), jnp.float32)
    xs = jnp.asarray(np.random.default_rng(1).normal(size=512), jnp.float32)
    np.testing.assert_allclose(np.asarray(pallas_step._atan2(ys, xs)),
                               np.arctan2(np.asarray(ys), np.asarray(xs)),
                               atol=1e-6)


def test_hash_rng_seed_shift_does_not_alias_step_shift():
    """Regression: _u01_hash must use DIFFERENT multipliers for seed (in
    rng_base) and step, else shard d+1's stream (seed + d*7919,
    ppo/learner.py) replays shard d's at a +7919 step offset."""
    lane = jnp.arange(64, dtype=jnp.uint32)

    def base(seed):
        return (jnp.uint32(seed) * jnp.uint32(0x9E3779B9)
                + lane * jnp.uint32(0x27D4EB2F))

    for delta in (1, 7919):
        a = np.asarray(pallas_step._u01_hash(base(13 + delta), 100, 4))
        b = np.asarray(pallas_step._u01_hash(base(13), 100 + delta, 4))
        assert not np.array_equal(a, b), f"seed shift {delta} aliases step"


def test_fused_rollout_respawn_statistics():
    """Long random-action rollout: episodes end and respawn in-kernel;
    outcome mix must be sane (every episode is goal, collision or timeout)."""
    s, _ = jax.jit(
        lambda k: vector.reset_batch(k, B, P, jnp.float32))(
            jax.random.PRNGKey(3))
    _, stats = pallas_step.fused_rollout(
        s.px, s.py, s.ppsi, s.tx[:, 0], s.ty[:, 0], s.tv[:, 0],
        s.tpsi[:, 0], s.steps, s.total_reward,
        seed=11, T=1100, params=P, interpret=True)
    ep = int(np.asarray(stats["episodes"]).sum())
    goals = int(np.asarray(stats["goals"]).sum())
    colls = int(np.asarray(stats["collisions"]).sum())
    assert ep > 0
    assert 0 <= goals + colls <= ep
    assert np.isfinite(np.asarray(stats["reward_sum"])).all()


@pytest.mark.tpu
@pytest.mark.skipif(os.environ.get("ACAS2D_TPU_CHECK", "0") != "1",
                    reason="on-chip check: set ACAS2D_TPU_CHECK=1 (needs a "
                           "real TPU; ~10 min first Mosaic compile)")
def test_fused_rollout_on_tpu():
    """Run scripts/pallas_tpu_check.py in a clean subprocess (default
    platform, NOT this suite's forced-CPU config): deterministic + 
    statistical comparison of the Mosaic-lowered kernel vs the XLA engine
    on the real chip.  The most recent passing run is committed as
    artifacts/pallas_tpu_check.json."""
    import json
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "scripts/pallas_tpu_check.py"],
        capture_output=True, text=True, timeout=2400, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stdout + proc.stderr
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    if "skipped" in result:
        pytest.skip(result["skipped"])
    assert result["ok"], result["failures"]


def test_fused_rollout_obs_checksum_matches_engine(initial_states):
    """with_obs=True: the kernel's per-env obs checksum (sum of all 8
    features over all steps) equals the XLA engine's summed observations
    under forced-zero actions — pins that the obs-inclusive bench variant
    really computes observe()'s features, not a cheaper proxy."""
    s = initial_states

    def run_jnp_obs(s):
        def body(st, _):
            st, out = vector.step_autoreset_batch(
                st, jnp.zeros((B,), jnp.float32), P)
            return st, out.obs.sum(-1)
        return jax.lax.scan(body, s, None, length=T)

    _, osums = jax.jit(run_jnp_obs)(s)
    _, stats = pallas_step.fused_rollout(
        s.px, s.py, s.ppsi, s.tx[:, 0], s.ty[:, 0], s.tv[:, 0],
        s.tpsi[:, 0], s.steps, s.total_reward,
        seed=7, T=T, params=P, interpret=True, zero_actions=True,
        with_obs=True)
    ref = np.asarray(osums.sum(0))
    np.testing.assert_allclose(np.asarray(stats["obs_sum"]), ref,
                               rtol=1e-5, atol=2e-4)
    # and the default path really skips it
    _, stats0 = pallas_step.fused_rollout(
        s.px, s.py, s.ppsi, s.tx[:, 0], s.ty[:, 0], s.tv[:, 0],
        s.tpsi[:, 0], s.steps, s.total_reward,
        seed=7, T=T, params=P, interpret=True, zero_actions=True)
    assert float(np.abs(np.asarray(stats0["obs_sum"])).max()) == 0.0
