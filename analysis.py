"""Offline analysis driver — the reference notebooks' reporting, as a CLI.

The reference's de-facto reporting layer is three Jupyter notebooks
(SURVEY.md §2 C12: outcome counts, trajectory scatter plots, reward-shape
exploration) reading the driver CSVs.  This driver produces the same
artifacts headlessly from any baseline.py / eval.py CSV (or the reference's
own committed CSVs):

    python analysis.py --csv runs/eval_100.csv --out-dir runs/analysis
    python analysis.py --csv ... --episodes 1 5 7     # per-episode replays
    python analysis.py --learning-curve runs/ppo/<run>/eval.csv

Outputs: outcome summary (stdout + summary.json), trajectory overview plot
(all episodes, colored by outcome — the simulation notebook's scatter),
per-episode replay PNGs, and learning-curve PNG/comparison against the
reference's committed evaluations.npz when available.
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys

import numpy as np

REF_EVALS = ("/root/reference/gym_ACAS2D/models/best_model_1048576_11/"
             "results/evaluations.npz")


def outcome_summary(df) -> dict:
    counts = df["Outcome"].value_counts().to_dict()
    return {
        "episodes": int(len(df)),
        "goal": int(counts.get("Goal", 0)),
        "collision": int(counts.get("Collision", 0)),
        "timeout": int(counts.get("Timeout", 0)),
        "mean_total_reward": float(df["Total Reward"].mean()),
        "std_total_reward": float(df["Total Reward"].std()),
        "mean_time_steps": float(df["Time Steps"].mean()),
    }


def trajectory_overview(df, params, out_png: str):
    """All-episode trajectory scatter colored by outcome (the
    simulation/baseline notebooks' headline plot)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from acas2d_tpu.render import _new_axes, _draw_scene   # noqa

    fig, ax = _new_axes(params)
    colors = {"Goal": (0, 1, 0, 0.5), "Collision": (1, 0, 0, 0.5),
              "Timeout": (1, 1, 0, 0.5)}
    for _, row in df.iterrows():
        p = np.asarray(ast.literal_eval(row["Path"]))
        ax.plot(p[:, 0], p[:, 1], color=colors[row["Outcome"]], lw=0.6)
    import matplotlib.patches as mpatches
    ax.add_patch(mpatches.Circle((params.goal_x, params.goal_y),
                                 params.goal_radius, fill=False,
                                 color=(1, 1, 0), lw=2))
    handles = [plt.Line2D([0], [0], color=c[:3], lw=2, label=k)
               for k, c in colors.items()]
    ax.legend(handles=handles, loc="lower left")
    ax.set_title(f"{len(df)} episodes")
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    fig.savefig(out_png, bbox_inches="tight", dpi=100)
    plt.close(fig)
    return out_png


def learning_curve(eval_csv: str, out_png: str, compare_reference: bool = True):
    """Plot eval_return_mean vs global_step; overlay the reference's
    committed learning curve (evaluations.npz) when present."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    df = pd.read_csv(eval_csv)
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.plot(df["global_step"], df["eval_return_mean"], "-o", ms=3,
            label="acas2d_tpu")
    if compare_reference and os.path.exists(REF_EVALS):
        z = np.load(REF_EVALS)
        ax.plot(z["timesteps"], z["results"].mean(axis=1), "-s", ms=3,
                alpha=0.7, label="reference (SB3, evaluations.npz)")
    ax.set_xlabel("environment steps")
    ax.set_ylabel("mean eval return (10 greedy episodes)")
    ax.axhline(1198.22, color="gray", ls="--", lw=0.8,
               label="reference final (1198.22)")
    ax.legend()
    ax.grid(alpha=0.3)
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    fig.savefig(out_png, bbox_inches="tight", dpi=100)
    plt.close(fig)
    return out_png


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--csv", help="episode CSV from baseline.py/eval.py")
    ap.add_argument("--learning-curve", dest="lc",
                    help="eval.csv from a training run")
    ap.add_argument("--out-dir", default="runs/analysis")
    ap.add_argument("--episodes", type=int, nargs="*",
                    help="episode numbers for per-episode replay PNGs")
    args = ap.parse_args(argv)

    from acas2d_tpu.config import DEFAULT_PARAMS
    os.makedirs(args.out_dir, exist_ok=True)

    if args.csv:
        import pandas as pd
        df = pd.read_csv(args.csv)
        summary = outcome_summary(df)
        print(json.dumps(summary, indent=2))
        with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
            json.dump(summary, f, indent=2)
        trajectory_overview(df, DEFAULT_PARAMS,
                            os.path.join(args.out_dir, "trajectories.png"))
        if args.episodes:
            from acas2d_tpu.render import render_run_csv
            render_run_csv(args.csv, args.out_dir, args.episodes)
        print(f"wrote {args.out_dir}", file=sys.stderr)

    if args.lc:
        png = learning_curve(args.lc,
                             os.path.join(args.out_dir, "learning_curve.png"))
        print(f"wrote {png}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
