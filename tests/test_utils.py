"""Utility-layer tests: env checker, checkpoint round trip, metrics logger."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.utils.env_check import (EnvCheckError, check_functional_env,
                                        check_gym_env)

P = DEFAULT_PARAMS


def test_check_functional_env_passes():
    check_functional_env(P, n_random_steps=50)


def test_check_gym_env_passes():
    from acas2d_tpu.envs.gym_compat import LegacyACAS2DEnv
    check_gym_env(LegacyACAS2DEnv(P), n_random_steps=30)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    from acas2d_tpu.models.actor_critic import ActorCritic
    from acas2d_tpu.ppo import learner
    from acas2d_tpu.ppo.config import PPOConfig
    from acas2d_tpu.utils.checkpoint import CheckpointManager

    cfg = PPOConfig(n_envs=8, n_steps=16, minibatch_size=32,
                    total_timesteps=8 * 16 * 3)
    model = ActorCritic()
    st = learner.init_train_state(jax.random.PRNGKey(0), model, cfg, P)
    step = jax.jit(learner.make_train_step(model, cfg, P))
    st, m = step(st)

    mgr = CheckpointManager(str(tmp_path / "ck"),
                            best_fn_key="eval_return_mean")
    mgr.save(int(st.iteration) * cfg.batch_size, st,
             metrics={"eval_return_mean": 1.0})
    mgr.wait()
    assert mgr.latest_step() == 8 * 16

    template = learner.init_train_state(jax.random.PRNGKey(0), model, cfg, P)
    restored = mgr.restore(template)
    for a, b in zip(jax.tree.leaves(st.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.iteration) == int(st.iteration)
    np.testing.assert_array_equal(np.asarray(st.env_state.px),
                                  np.asarray(restored.env_state.px))

    # resumed training continues deterministically from the same state
    st2a, _ = step(restored)
    st2b, _ = step(st)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(st2a.params)[0]),
        np.asarray(jax.tree.leaves(st2b.params)[0]), atol=1e-7)

    best = mgr.restore_best(template)
    assert int(best.iteration) == 1
    mgr.close()


def test_metrics_logger_writes_csv_jsonl(tmp_path):
    from acas2d_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path), "t", tensorboard=False, echo=False)
    lg.log({"a": 1.0, "b": 2}, step=10)
    lg.log({"a": 3.0, "b": 4}, step=20)
    lg.close()
    lines = open(tmp_path / "t.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["a"] == 3.0
    import pandas as pd
    df = pd.read_csv(tmp_path / "t.csv")
    assert list(df["global_step"]) == [10, 20]


def test_metrics_logger_widens_csv_on_new_keys(tmp_path):
    """Keys first appearing after the first log() call must land in the CSV
    (VERDICT.md weak #5: they used to be silently dropped)."""
    from acas2d_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path), "w", tensorboard=False, echo=False)
    lg.log({"a": 1.0}, step=1)
    lg.log({"a": 2.0, "extra": 9.0}, step=2)
    lg.log({"a": 3.0, "extra": 10.0}, step=3)
    lg.close()
    import pandas as pd
    df = pd.read_csv(tmp_path / "w.csv")
    assert list(df.columns[:1]) == ["a"]
    assert "extra" in df.columns
    assert df["extra"].tolist()[1:] == [9.0, 10.0]
    import math
    assert math.isnan(df["extra"][0])


def test_legacy_env_spaces_without_gymnasium(monkeypatch):
    """LegacyACAS2DEnv must expose observation/action spaces even when
    gymnasium is absent (VERDICT.md weak #7)."""
    from acas2d_tpu.envs import gym_compat

    monkeypatch.setattr(gym_compat, "_HAS_GYMNASIUM", False)
    env = gym_compat.LegacyACAS2DEnv()
    obs = env.reset()
    assert env.observation_space.shape == (8,)
    assert env.action_space.shape == (1,)
    assert env.observation_space.contains(obs)
    assert env.action_space.contains(np.array([0.5]))
    assert not env.action_space.contains(np.array([1.5]))


def test_legacy_gym_registration():
    """When a 4-tuple-era `gym` (< 0.26) is importable, importing
    gym_compat registers the reference's exact surface
    (gym_ACAS2D/__init__.py:3-6): gym.make("ACAS2D-v0") -> 4-tuple env.
    Skipped when gym is absent or >= 0.26 (the 5-tuple-API releases wrap
    envs in checkers that reject the legacy surface; those users get the
    gymnasium registration instead — docs/MIGRATION.md §7)."""
    gym = pytest.importorskip("gym")
    from acas2d_tpu.envs import gym_compat
    if not gym_compat._old_gym_api(gym):
        pytest.skip(f"gym {gym.__version__} uses the 5-tuple API; "
                    "legacy registration intentionally skipped")

    env = gym.make("ACAS2D-v0")
    obs = env.reset()
    out = env.step([0.0])
    assert len(out) == 4
    obs2, reward, done, info = out
    assert np.asarray(obs).shape[-1] == 8 and info == {}
