"""Train-loop mechanics: fused K-iteration device program and cadences.

Covers the two round-1 gaps flagged in VERDICT.md: (1) `--iters-per-call`
must actually change behavior (learner.make_train_loop wired into train.py)
and be semantically identical to K sequential train_step calls; (2)
`--checkpoint-every` must fire on its own cadence, not only when an eval
happens to fire (train.py previously nested the two).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from acas2d_tpu.config import DEFAULT_PARAMS
from acas2d_tpu.models.actor_critic import ActorCritic
from acas2d_tpu.ppo import learner
from acas2d_tpu.ppo.config import PPOConfig

import train as train_main


def _tiny_cfg(**kw):
    base = dict(n_envs=8, n_steps=16, minibatch_size=32, n_epochs=2,
                total_timesteps=8 * 16 * 4, seed=3)
    base.update(kw)
    return PPOConfig(**base)


def test_fused_loop_matches_sequential():
    """K iterations fused via lax.scan == K sequential train_step calls:
    same final params, same per-iteration metrics (stacked on axis 0)."""
    cfg = _tiny_cfg()
    model = ActorCritic()
    K = 3

    state0 = learner.init_train_state(
        jax.random.PRNGKey(cfg.seed), model, cfg, DEFAULT_PARAMS, jnp.float64)

    step_fn = jax.jit(learner.make_train_step(model, cfg, DEFAULT_PARAMS))
    seq_state, seq_metrics = state0, []
    for _ in range(K):
        seq_state, m = step_fn(seq_state)
        seq_metrics.append(jax.device_get(m))

    loop_fn = jax.jit(learner.make_train_loop(model, cfg, DEFAULT_PARAMS, K))
    fused_state, fused_metrics = loop_fn(state0)
    fused_metrics = jax.device_get(fused_metrics)

    for a, b in zip(jax.tree.leaves(seq_state.params),
                    jax.tree.leaves(fused_state.params)):
        np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
    assert int(fused_state.iteration) == K
    for i in range(K):
        for k in ("loss", "ep_return_mean", "episodes", "iteration"):
            np.testing.assert_allclose(
                fused_metrics[k][i], seq_metrics[i][k], rtol=1e-12,
                err_msg=f"metric {k} differs at fused iteration {i}")


def test_train_main_iters_per_call_logs_every_iteration(tmp_path):
    """train.py --iters-per-call K still logs one CSV row per PPO iteration
    with correct global_step values."""
    out = str(tmp_path)
    rc = train_main.main([
        "--platform", "cpu", "--n-envs", "8", "--n-steps", "32",
        "--total-steps", "1024", "--minibatch-size", "64",
        "--n-epochs", "2", "--iters-per-call", "2",
        "--eval-every", "1024", "--checkpoint-every", "1024",
        "--run-name", "fused", "--out-dir", out])
    assert rc == 0
    df = pd.read_csv(os.path.join(out, "fused", "train.csv"))
    assert list(df["global_step"]) == [256, 512, 768, 1024]


def test_checkpoint_cadence_decoupled_from_eval(tmp_path):
    """--checkpoint-every smaller than --eval-every must still checkpoint at
    its own cadence (VERDICT.md weak #2: it used to degrade to the eval
    cadence)."""
    out = str(tmp_path)
    rc = train_main.main([
        "--platform", "cpu", "--n-envs", "8", "--n-steps", "32",
        "--total-steps", "1024", "--minibatch-size", "64",
        "--n-epochs", "2",
        "--eval-every", "1024",          # evals only at the very end
        "--checkpoint-every", "256",     # ... but checkpoints every iteration
        "--run-name", "cad", "--out-dir", out])
    assert rc == 0
    ckpt_dir = os.path.join(out, "cad", "checkpoints")
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    # orbax max_to_keep=5 retains the newest; all 4 cadence points fit.
    assert steps == [256, 512, 768, 1024], steps
    # best/ exists too: the final eval fired and best-tracking rode it.
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))


def test_count_prior_evals_from_persisted_log(tmp_path):
    """--exact-eval resume fast-forward counts the evals that ACTUALLY fired
    (eval.jsonl rows at or before the restored step), not the threshold
    formula — one device call spanning several eval thresholds produces one
    row, and rows past the restored checkpoint re-fire after resume."""
    import json
    from train import count_prior_evals

    cfg = _tiny_cfg(eval_every_steps=256)      # batch = 128
    run = tmp_path / "run"
    run.mkdir()
    # a K*batch=512 call fired ONE eval covering thresholds 256+512, then
    # another at 1024; a row at 1536 was logged after the restored ckpt.
    with open(run / "eval.jsonl", "w") as f:
        for s in (0, 512, 1024, 1536):
            f.write(json.dumps({"global_step": s}) + "\n")
    assert count_prior_evals(str(run), 1024, cfg) == 3
    assert count_prior_evals(str(run), 1536, cfg) == 4
    assert count_prior_evals(str(run), 0, cfg) == 0
    # no surviving log: cadence-formula fallback (thresholds fire once each)
    assert count_prior_evals(str(tmp_path / "gone"), 1024, cfg) == 5


def test_count_prior_evals_dedupes_refired_rows(tmp_path):
    """A crash-then-resume cycle re-fires evals past the restored checkpoint
    and appends DUPLICATE rows at the same global_step; a second resume must
    count distinct steps, not raw rows, or it over-fast-forwards the
    Mersenne eval stream (advisor r4)."""
    import json
    from train import count_prior_evals

    cfg = _tiny_cfg(eval_every_steps=256)
    run = tmp_path / "run"
    run.mkdir()
    with open(run / "eval.jsonl", "w") as f:
        for s in (256, 512, 512, 768, 768):   # 512/768 re-fired after resume
            f.write(json.dumps({"global_step": s}) + "\n")
    assert count_prior_evals(str(run), 768, cfg) == 3


def test_eval_count_survives_deleted_eval_log(tmp_path):
    """VERDICT r4 #7: the eval count is persisted with every checkpoint, so
    a resume whose run dir lost eval.jsonl (partial copy) still
    fast-forwards the exact-eval Mersenne stream by the TRUE number of
    prior evals — not the cadence formula, which miscounts when one device
    call spans several thresholds."""
    from train import count_prior_evals
    from acas2d_tpu.ppo.config import PPOConfig

    out = str(tmp_path)
    rc = train_main.main([
        "--platform", "cpu", "--n-envs", "8", "--n-steps", "32",
        "--total-steps", "1024", "--minibatch-size", "64",
        "--n-epochs", "2",
        "--eval-every", "256", "--checkpoint-every", "256",
        "--run-name", "evc", "--out-dir", out])
    assert rc == 0
    run = os.path.join(out, "evc")
    cfg = PPOConfig(n_envs=8, n_steps=32, eval_every_steps=256)
    # 4 evals actually fired (steps 256..1024; the step-256 one covered
    # thresholds 0 AND 256); the formula fallback would claim 5
    n_true = count_prior_evals(run, 1024, cfg)
    assert n_true == 4, n_true
    os.remove(os.path.join(run, "eval.jsonl"))
    assert count_prior_evals(run, 1024, cfg) == n_true
    # checkpoints/eval_counts.json is the surviving record
    assert os.path.exists(os.path.join(run, "checkpoints",
                                       "eval_counts.json"))


def test_resolve_iters_per_call_never_coarsens_eval_cadence():
    """The auto default must satisfy K * batch <= eval_every (evals fire at
    most once per train_fn call), for every preset shape."""
    from train import resolve_iters_per_call
    from acas2d_tpu.ppo.config import PPOConfig, tpu_default

    cfg = tpu_default()                        # eval_every = 4 iterations
    k = resolve_iters_per_call(None, "tpu", "tpu", cfg)
    assert 1 <= k and k * cfg.batch_size <= cfg.eval_every_steps

    # explicit request always wins; CPU / reference preset default to 1
    assert resolve_iters_per_call(32, "tpu", "tpu", cfg) == 32
    assert resolve_iters_per_call(None, "tpu", "cpu", cfg) == 1
    assert resolve_iters_per_call(None, "reference", "tpu", PPOConfig()) == 1
