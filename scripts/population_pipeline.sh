#!/bin/bash
# Reference-beating policy, reliably, from one master seed — no lottery.
#
#   bash scripts/population_pipeline.sh <master_seed> [out_prefix]
#
# ONE train.py command runs the whole pipeline (~4 min wall on one v5e,
# warm compile cache):
#   Stage 1: 32 member policies trained in one device program
#            (member-grid fused rollout + packed fused update), 1024 envs
#            x 134.2M env-steps each — the SAME Adam-step count as the
#            original 2048-env x 268M recipe at half the samples (policy
#            quality on this task is update-count-bound, measured round 5)
#            — per-member top-k snapshot archives, risk-adjusted
#            512-episode re-eval selection.
#   Stage 2+3: TWO chained in-process 16-member polish stages
#            (train.py --polish-steps --polish-rounds 2; 33.6M steps at
#            lr 1e-4 each), every polish member warm-started ROUND-ROBIN
#            from the previous stage's top-3 snapshot lineages (a single
#            winner's lineage sometimes plateaus under polish).
# Then best-of-chain selection (a later polish round can regress below an
# earlier one; ship the stage with the best risk-adjusted score) and the
# strict 100-episode exact-protocol eval.
#
# Committed evidence (artifacts/population/, pinned by
# tests/test_population_artifacts.py):
#   generation 1 (two-process, 2048 envs x 268M, ~6-14 min/seed): five
#     fresh master seeds 701/801/901/1101/1201 -> 1209.2/1208.8/1203.8/
#     1223.1/1222.5 strict, 100/100 goals each;
#   generation 2 (this script): fresh master seeds — see the pipe3_*
#     artifacts and README for the validated set.
# (Reference's own run: 1198.22 final, 1226.55 best, over 10-episode
# evals; 244.8 min.)
set -euo pipefail
S=${1:?usage: population_pipeline.sh <master_seed> [out_prefix]}
PREFIX=${2:-pop_pipeline}

# the tunneled accelerator grant occasionally fails a process at launch
# (observed once across ~20 round-4 runs); one retry absorbs it
retry() { "$@" || { echo "[pipeline] stage failed; retrying once" >&2; "$@"; }; }

t0=$SECONDS
retry python train.py --preset tpu --anneal-lr --population 32 \
  --fused-rollout --fused-update-packed \
  --n-envs 1024 --minibatch-size 32768 \
  --total-steps 134217728 --checkpoint-every 134217728 \
  --eval-episodes 32 --reval-episodes 512 \
  --polish-steps 33554432 --polish-pop 16 --polish-rounds 2 \
  --seed "$S" --run-name "${PREFIX}_s${S}"
WALL=$((SECONDS - t0))
echo "[pipeline] seed $S training wall: ${WALL} s"

# best-of-chain selection + a stable 'final' stage dir for artifacts
python - "$S" "$PREFIX" "$WALL" <<'EOF'
import json, os, shutil, sys
S, P, wall = sys.argv[1], sys.argv[2], float(sys.argv[3])
cands = [f"runs/ppo/{P}_s{S}_polish", f"runs/ppo/{P}_s{S}_polish_polish"]
best, bv = None, float("-inf")
for c in cands:
    try:
        with open(os.path.join(c, "population.json")) as f:
            d = json.load(f)
    except OSError:
        continue
    v = d.get("selected_score") or d.get("selected_reval") or -1e9
    if v > bv:
        best, bv = c, v
assert best, "no polish stage produced a selection"
final = f"runs/ppo/{P}_s{S}_final"
os.makedirs(final, exist_ok=True)
shutil.copy(os.path.join(best, "selected_best.npz"),
            os.path.join(final, "selected_best.npz"))
with open(os.path.join(best, "population.json")) as f:
    d = json.load(f)
d["best_of_chain"] = best
d["training_wall_s"] = wall
with open(os.path.join(final, "population.json"), "w") as f:
    json.dump(d, f, indent=1)
print(f"[pipeline] best-of-chain: {best} (score {bv:.1f}) -> {final}")
EOF

retry python eval.py \
  --params-npz "runs/ppo/${PREFIX}_s${S}_final/selected_best.npz" \
  --exact --episodes 100 \
  --out "runs/ppo/${PREFIX}_s${S}_final/eval_100_exact.csv"
