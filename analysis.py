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

from acas2d_tpu.utils.reference import reference_path

REF_EVALS = reference_path("gym_ACAS2D", "models", "best_model_1048576_11",
                           "results", "evaluations.npz")


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


def reward_shapes(params, out_png: str):
    """Reward-term shape exploration (the rewards.ipynb notebook, C12):
    each of the four shaped-reward terms over its domain, plus the
    polarized variant and the time-discount factor."""
    import numpy as np
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import jax.numpy as jnp

    from acas2d_tpu.ops import rewards as R

    fig, axes = plt.subplots(2, 3, figsize=(15, 8))

    dh = np.linspace(0, 360, 721)
    axes[0, 0].plot(dh, np.asarray(R.heading_reward(jnp.asarray(dh), 0.0)))
    axes[0, 0].set_title("heading_reward vs Δheading [deg]")

    d_cpa = np.linspace(-2 * params.safe_distance, 2 * params.safe_distance,
                        801)
    for vc, label in [(-1.0, "closing (v_c<=0)"), (1.0, "separating")]:
        axes[0, 1].plot(d_cpa, np.asarray(R.closest_approach_reward(
            jnp.full_like(jnp.asarray(d_cpa), vc), jnp.asarray(d_cpa),
            params.safe_distance)), label=label)
    axes[0, 1].axvline(params.safe_distance, ls=":", c="gray")
    axes[0, 1].legend()
    axes[0, 1].set_title("closest_approach_reward vs d_cpa [px]")

    dd = np.linspace(-params.d_dev_max_reward * 1.2,
                     params.d_dev_max_reward * 1.2, 801)
    axes[0, 2].plot(dd, np.asarray(R.plan_deviation_reward(
        jnp.asarray(dd), params.d_dev_max_reward)))
    axes[0, 2].set_title("plan_deviation_reward vs d_dev [px]")

    dg = np.linspace(0, params.d_goal_max_reward, 801)
    axes[1, 0].plot(dg, np.asarray(R.goal_distance_reward(
        jnp.asarray(dg), params.d_goal_max_reward)))
    axes[1, 0].set_title("goal_distance_reward vs d_goal [px]")

    for dcpa_v, label in [(50.0, "d_cpa=+50"), (-50.0, "d_cpa=-50")]:
        axes[1, 1].plot(dd, np.asarray(R.polarized_plan_deviation_reward(
            jnp.asarray(dd), jnp.full_like(jnp.asarray(dd), dcpa_v),
            params.d_dev_max_reward)), label=label)
    axes[1, 1].legend()
    axes[1, 1].set_title("polarized_plan_deviation_reward (display-only)")

    steps = np.arange(0, params.max_steps + 1)
    axes[1, 2].plot(steps, 1.0 - steps / params.max_steps)
    axes[1, 2].set_title("time-discount factor vs step")

    for ax in axes.flat:
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
    ap.add_argument("--reward-shapes", action="store_true",
                    help="plot the shaped-reward terms (rewards.ipynb)")
    ap.add_argument("--out-dir", default="runs/analysis")
    ap.add_argument("--episodes", type=int, nargs="*",
                    help="episode numbers for per-episode replay PNGs")
    args = ap.parse_args(argv)

    # Analysis is a host-side reporting tool; never touch the accelerator
    # (it may be held by a training run, and plotting needs no TPU).
    import jax
    jax.config.update("jax_platforms", "cpu")

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

    if args.reward_shapes:
        png = reward_shapes(DEFAULT_PARAMS,
                            os.path.join(args.out_dir, "reward_shapes.png"))
        print(f"wrote {png}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
