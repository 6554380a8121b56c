"""Export pipeline run(s) into the committed population-artifact schema.

For each master seed, copies the polish stage's selected policy and merged
population.json into artifacts/population/ and builds the strict-eval
record from the exact-protocol CSV:

    <prefix>_s<seed>_selected.npz     the auto-selected policy
    <prefix>_s<seed>_population.json  per-member archive + selection record
                                      (with the stage1/pipeline keys merged
                                      by scripts/population_merge.py or
                                      train.py --polish-steps)
    <prefix>_s<seed>_strict.json      strict 100-episode eval + repro cmd

    python scripts/export_population_artifacts.py --run-prefix pipe5 \
        --seeds 2101,2201 --stage final [--produced-by "..."]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def strict_record(csv_path: str, art_npz: str, produced_by: str) -> dict:
    import pandas as pd
    df = pd.read_csv(csv_path)
    outcomes = df["Outcome"].tolist()
    return {
        "episodes": len(df),
        "mean_reward": round(float(df["Total Reward"].mean()), 2),
        "std_reward": round(float(df["Total Reward"].std(ddof=0)), 2),
        "goals": outcomes.count("Goal"),
        "collisions": outcomes.count("Collision"),
        "timeouts": outcomes.count("Timeout"),
        "mean_steps": round(float(df["Time Steps"].mean()), 2),
        "protocol": ("eval.py --exact --episodes 100 (skip_episodes 2, "
                     "seed-13 Mersenne stream; the reference testing_main "
                     "protocol, float64 CPU stepping)"),
        "reproduce": (f"python eval.py --params-npz {art_npz} "
                      "--exact --episodes 100"),
        "produced_by": [produced_by],
    }


def export_seed(run_prefix: str, seed: int, art_prefix: str,
                produced_by: str, stage: str = "polish") -> dict:
    run = os.path.join(REPO, "runs", "ppo", f"{run_prefix}_s{seed}_{stage}")
    art = os.path.join(REPO, "artifacts", "population")
    os.makedirs(art, exist_ok=True)
    sel_dst = os.path.join(art, f"{art_prefix}_s{seed}_selected.npz")
    shutil.copy(os.path.join(run, "selected_best.npz"), sel_dst)
    shutil.copy(os.path.join(run, "population.json"),
                os.path.join(art, f"{art_prefix}_s{seed}_population.json"))
    csv = os.path.join(run, "eval_100_exact.csv")
    rel_npz = os.path.relpath(sel_dst, REPO)
    rec = strict_record(csv, rel_npz, produced_by)
    with open(os.path.join(art, f"{art_prefix}_s{seed}_strict.json"),
              "w") as f:
        json.dump(rec, f, indent=4)
    return rec


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run-prefix", required=True,
                    help="runs/ppo/<run-prefix>_s<seed>_polish must exist "
                         "with selected_best.npz, population.json, and "
                         "eval_100_exact.csv")
    ap.add_argument("--seeds", required=True,
                    help="comma-separated master seeds")
    ap.add_argument("--art-prefix", default=None,
                    help="artifact name prefix (default = run prefix)")
    ap.add_argument("--stage", default="polish",
                    help="run-dir stage suffix holding the final policy "
                         "('final' for best-of-chain pipeline output)")
    ap.add_argument("--produced-by", default="scripts/population_pipeline.sh")
    args = ap.parse_args(argv)
    art_prefix = args.art_prefix or args.run_prefix
    rows = []
    for s in args.seeds.split(","):
        rec = export_seed(args.run_prefix, int(s), art_prefix,
                          args.produced_by, stage=args.stage)
        rows.append((int(s), rec["mean_reward"], rec["goals"]))
        print(f"seed {s}: strict {rec['mean_reward']} "
              f"({rec['goals']}/100 goals)")
    means = [r[1] for r in rows]
    print(f"{len(rows)} seeds exported; min strict {min(means)}, "
          f"max {max(means)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
