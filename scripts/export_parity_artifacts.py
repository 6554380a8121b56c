"""Export sample-efficiency-parity evidence from a parity sweep.

Turns `scripts/parity_sweep.sh` output (runs/parity/*) into committed
artifacts:

  artifacts/ppo_ref_s<seed>_evaluations.npz   eval curve, reference
                                              evaluations.npz schema
                                              (timesteps/results/ep_lengths)
  artifacts/ppo_ref_s<seed>_best.npz          best-eval policy params
                                              (flat npz, utils/params_io)
  artifacts/parity_sweep_summary.json         final/best eval of every run

The reference's single committed run (training_main.py:44-52 ->
models/best_model_1048576_11/results/evaluations.npz) ends at mean eval
reward 1198.2 after exactly 1,048,576 env-steps; the exported runs are the
sweep members that match that endpoint at the identical sample budget.
"""

from __future__ import annotations

import csv
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Host-side tool: restore sweep checkpoints (written on the CPU backend) on
# CPU — under the axon TPU backend orbax cannot map TFRT_CPU_0 shardings.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def read_eval_csv(path: str):
    rows = list(csv.DictReader(open(path)))
    return {
        "timesteps": np.array([int(r["global_step"]) for r in rows]),
        "results": np.array([float(r["eval_return_mean"]) for r in rows]),
        "ep_lengths": np.array([float(r["eval_length_mean"]) for r in rows]),
        "goal_rate": np.array([float(r["eval_goal_rate"]) for r in rows]),
    }


def export_run(run_dir: str, name: str, with_params: bool):
    curve = read_eval_csv(os.path.join(run_dir, "eval.csv"))
    out = os.path.join(REPO, "artifacts", f"{name}_evaluations.npz")
    np.savez(out, timesteps=curve["timesteps"], results=curve["results"],
             ep_lengths=curve["ep_lengths"], goal_rate=curve["goal_rate"])
    print(f"wrote {out} (final={curve['results'][-1]:.1f}, "
          f"best={curve['results'].max():.1f})")

    ckpt_dir = os.path.join(run_dir, "checkpoints")
    if with_params and os.path.isdir(os.path.join(ckpt_dir, "best")):
        from acas2d_tpu.utils.checkpoint import CheckpointManager
        from acas2d_tpu.utils.params_io import save_params_npz
        raw = CheckpointManager(ckpt_dir).restore_raw(best=True)
        params = raw["params"] if "params" in raw else raw
        pout = os.path.join(REPO, "artifacts", f"{name}_best.npz")
        save_params_npz(pout, params)
        print(f"wrote {pout}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    sweep_dir = argv[0] if argv else os.path.join(REPO, "runs", "parity")
    # Headline: ref_s12 — a reference-config run whose FINAL checkpoint is
    # both endpoint-parity (10-ep eval 1215.2 at exactly 2048*512 steps vs
    # the reference's 1198.22) and robust (1203.4 mean / 100% goal over 64
    # fresh episodes).  ref_s9/env8_s2: additional endpoint-parity curves
    # (~1195 final).  ref_s8: best-during-training policy, 1215/98% at 64
    # episodes.  env8_s8: the 8-env variant's robust endpoint (1233/100%).
    exports = argv[1:] or ["ref_s12", "ref_s9", "env8_s2", "ref_s8",
                           "env8_s8"]
    params_for = {"ref_s8", "ref_s12", "env8_s8"}

    summary = {}
    for d in sorted(glob.glob(os.path.join(sweep_dir, "*_s*", ""))):
        run = os.path.basename(os.path.dirname(d))
        c = read_eval_csv(os.path.join(d, "eval.csv"))
        i = int(c["results"].argmax())
        summary[run] = {
            "final_eval_return": round(float(c["results"][-1]), 2),
            "final_goal_rate": round(float(c["goal_rate"][-1]), 2),
            "best_eval_return": round(float(c["results"][i]), 2),
            "best_at_step": int(c["timesteps"][i]),
            "total_steps": int(c["timesteps"][-1]),
        }
    sout = os.path.join(REPO, "artifacts", "parity_sweep_summary.json")
    if summary:
        with open(sout, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {sout} ({len(summary)} runs)")
    else:
        # e.g. a bad sweep_dir argument: never clobber the committed
        # summary with an empty one
        print(f"no runs under {sweep_dir}; {sout} left untouched")

    for name in exports:
        export_run(os.path.join(sweep_dir, name), f"ppo_{name}",
                   with_params=name in params_for)
    return 0


if __name__ == "__main__":
    sys.exit(main())
