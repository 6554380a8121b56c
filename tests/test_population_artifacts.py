"""Committed population-run artifacts: the seed lottery is dead.

Round-3 verdict: no committed configuration *reliably* reached a >=1200
policy — the flagship (1252) was a selected seed among many.  Round 4's
`train.py --population 32` (one vmapped device program; per-member top-k
snapshot archives; end-of-run 512-episode re-eval of all snapshots) was
run at three fresh master seeds, and every run's auto-selected policy
clears 1200 on the strict 100-episode Mersenne protocol (the reference's
own final eval: 1198.22 over 10 episodes).

Artifacts per master seed under artifacts/population/:
  pop32_s<seed>_selected.npz   — the auto-selected policy
  pop32_s<seed>_population.json — per-member archive + selection record
  pop32_s<seed>_strict.json     — strict 100-episode eval result + repro cmd
"""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts", "population")
# 701/801/901: XLA-update pipeline (~14 min/seed); 1101/1201: the
# fused-update pipeline (33.4M agg env-steps/s, ~6 min/seed) — five
# fresh master seeds, all >= 1200 strict
# (1209.2 / 1208.8 / 1203.8 / 1223.1 / 1222.5)
SEEDS = (701, 801, 901, 1101, 1201)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ART), reason="population artifacts not present")


@pytest.mark.parametrize("seed", SEEDS)
def test_strict_protocol_clears_1200(seed):
    """Every master seed's auto-selected policy recorded >=1200 mean and
    100/100 goals on the strict 100-episode exact protocol."""
    with open(os.path.join(ART, f"pop32_s{seed}_strict.json")) as f:
        s = json.load(f)
    assert s["episodes"] == 100
    assert s["mean_reward"] >= 1200.0, s
    assert s["goals"] == 100, s


@pytest.mark.parametrize("seed", SEEDS)
def test_selection_record_is_two_stage(seed):
    """The committed policy came from the full pipeline: a 32-member
    stage-1 population, then a 16-member polish population warm-started
    from its winner, each selected by a 512-episode fresh re-eval over
    the snapshot archive (not the noisy in-training argmax); the recorded
    re-eval value is consistent with the strict result."""
    with open(os.path.join(ART, f"pop32_s{seed}_population.json")) as f:
        p = json.load(f)
    with open(os.path.join(ART, f"pop32_s{seed}_strict.json")) as f:
        s = json.load(f)
    assert p["stage1"]["population"] == 32
    assert p["stage1"]["master_seed"] == seed
    assert p["population"] == 16          # the polish stage's record
    assert p["selected_by"] == "final_reval"
    assert p["reval_episodes"] >= 256
    # fresh-episode re-eval and the fixed strict set agree within noise
    assert abs(p["selected_reval"] - s["mean_reward"]) < 60.0


# generation-2 pipeline (round 5, scripts/population_pipeline.sh: one
# train.py command — 32-member 1024-env 268M-step stage (the flagship
# recipe's Adam-step count at half the samples) + two chained diversified
# polish stages — plus score-gated escalation): five fresh master seeds,
# ~4-6 min wall each, no escalation needed
SEEDS_V2 = (2101, 2201, 2301, 2401, 2501)


@pytest.mark.parametrize("seed", SEEDS_V2)
def test_pipeline_v2_strict_clears_1200(seed):
    """Every generation-2 master seed's auto-selected policy recorded
    >=1200 mean and 100/100 goals on the strict 100-episode exact
    protocol, from a single-command ~4-minute pipeline (escalation
    included in the recorded wall for weak masters)."""
    path = os.path.join(ART, f"pipe5_s{seed}_strict.json")
    if not os.path.exists(path):
        pytest.skip("generation-2 artifacts not present")
    with open(path) as f:
        s = json.load(f)
    assert s["episodes"] == 100
    assert s["mean_reward"] >= 1200.0, s
    assert s["goals"] == 100, s


@pytest.mark.parametrize("seed", SEEDS_V2)
def test_pipeline_v2_selection_record(seed):
    """The generation-2 record carries the pipeline provenance: selection
    by risk-adjusted fresh re-eval (never the strict set), the recorded
    training wall, and the best-of-chain stage."""
    path = os.path.join(ART, f"pipe5_s{seed}_population.json")
    if not os.path.exists(path):
        pytest.skip("generation-2 artifacts not present")
    with open(path) as f:
        p = json.load(f)
    assert p["selected_by"] == "final_reval"
    assert p["reval_episodes"] >= 256
    assert p.get("risk_adjusted_selection") is True
    assert p["training_wall_s"] > 0
    assert "best_of_chain" in p
    with open(os.path.join(ART, f"pipe5_s{seed}_strict.json")) as f:
        s = json.load(f)
    # fresh-episode re-eval and the fixed strict set agree within noise
    assert abs(p["selected_reval"] - s["mean_reward"]) < 60.0


@pytest.mark.slow
@pytest.mark.parametrize("seed", SEEDS)
def test_selected_policy_reproduces_quality(seed):
    """The shipped npz actually achieves its claimed quality: >=1150 mean
    and >=97% goals over 64 FRESH episodes (the same robustness bar the
    flagship artifact is held to in test_parity_artifacts.py)."""
    import jax

    from acas2d_tpu.config import DEFAULT_PARAMS
    from acas2d_tpu.models.actor_critic import ActorCritic
    from acas2d_tpu.ppo import learner
    from acas2d_tpu.ppo.config import PPOConfig
    from acas2d_tpu.utils.params_io import load_params_npz

    params = load_params_npz(os.path.join(ART, f"pop32_s{seed}_selected.npz"))
    cfg = PPOConfig(eval_episodes=64)
    eval_fn = jax.jit(learner.make_eval_fn(
        ActorCritic(), cfg, DEFAULT_PARAMS))
    m = jax.device_get(eval_fn(params, jax.random.PRNGKey(7)))
    assert m["eval_done_all"]
    assert float(m["eval_return_mean"]) >= 1150.0, m
    assert float(m["eval_goal_rate"]) >= 0.97, m
