"""Golden-artifact parity: the NumPy oracle vs the reference's committed CSV.

The reference repo commits `models/logs/baseline_ACAS2D_PPO_11_100.csv`
(produced by baseline_main.py: 100 zero-action episodes under seed 13, with
full float-repr player/traffic trajectories).  This is the ground truth the
entire framework is anchored to: the oracle must reproduce it bit-exactly,
and the JAX engine is then tested against the oracle.

Spawn-stream offset: baseline_main.py:19-22 constructs the game twice before
episode 1 (gym.make -> ACAS2DEnv.__init__ -> ACAS2DGame, then SB3 check_env
-> env.reset), so episode i uses spawn i+2 of the seed-13 Mersenne stream.
"""

import ast
import os

import numpy as np
import pandas as pd
import pytest

from acas2d_tpu.config import DEFAULT_PARAMS, OUTCOME_NAMES
from acas2d_tpu.oracle import MersenneSpawner, OracleEnv

from acas2d_tpu.utils.reference import reference_path

CSV = reference_path("gym_ACAS2D", "models", "logs",
                     "baseline_ACAS2D_PPO_11_100.csv")

pytestmark = pytest.mark.skipif(
    not os.path.exists(CSV), reason="reference golden CSV not available")


@pytest.fixture(scope="module")
def golden():
    return pd.read_csv(CSV)


def test_all_100_episodes_bit_exact(golden):
    env = OracleEnv(spawner=MersenneSpawner(DEFAULT_PARAMS, skip_episodes=2))
    for i in range(len(golden)):
        res = env.run_episode()
        assert OUTCOME_NAMES[res["outcome"]] == golden.loc[i, "Outcome"], i
        assert res["steps"] == golden.loc[i, "Time Steps"], i
        # Positions are bit-exact (state never depends on the reward path).
        ref_path = np.array(ast.literal_eval(golden.loc[i, "Path"]))
        assert ref_path.shape == np.array(res["path"]).shape, i
        np.testing.assert_array_equal(ref_path, np.array(res["path"]))
        ref_tp = np.array(ast.literal_eval(golden.loc[i, "Traffic Paths"])[0])
        np.testing.assert_array_equal(ref_tp, np.array(res["traffic_paths"][0]))
        # Returns match to accumulated-rounding tolerance (<= ~5e-13 observed).
        assert abs(res["total_reward"] - golden.loc[i, "Total Reward"]) < 1e-9, i


def test_outcome_aggregates(golden):
    """The headline baseline stats from BASELINE.md."""
    env = OracleEnv(spawner=MersenneSpawner(DEFAULT_PARAMS, skip_episodes=2))
    outcomes = [env.run_episode()["outcome"] for _ in range(100)]
    assert sum(o == 1 for o in outcomes) == 42   # Goal
    assert sum(o == 2 for o in outcomes) == 58   # Collision
    assert sum(o == 3 for o in outcomes) == 0    # Timeout
