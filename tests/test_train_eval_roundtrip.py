"""End-to-end driver round trip: train.py -> orbax checkpoint -> eval.py.

Covers the seam the reference never had (it could save but not reload for
training, SURVEY.md §5) and the optimizer-topology independence of eval's
checkpoint loading (an --anneal-lr run's opt_state contains schedule state
that a constant-lr template cannot mirror).
"""

import os

import pandas as pd

import train as train_main
import eval as eval_main


def test_train_then_eval_best(tmp_path):
    out = str(tmp_path)
    rc = train_main.main([
        "--platform", "cpu", "--n-envs", "16", "--n-steps", "32",
        "--total-steps", "1024", "--minibatch-size", "128",
        "--n-epochs", "2", "--anneal-lr", "--eval-every", "512",
        "--checkpoint-every", "512", "--run-name", "rt", "--out-dir", out])
    assert rc == 0
    run_dir = os.path.join(out, "rt")
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "best"))

    csv_path = os.path.join(run_dir, "eval_rt.csv")
    rc = eval_main.main([
        "--run", run_dir, "--best", "--episodes", "2",
        "--platform", "cpu", "--out", csv_path])
    assert rc == 0
    df = pd.read_csv(csv_path)
    assert len(df) == 2
    assert set(["Episode", "Outcome", "Total Reward", "Path"]) <= set(df.columns)
