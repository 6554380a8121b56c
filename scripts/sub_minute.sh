#!/bin/bash
# Best-effort reference-beating policy from scratch in about a minute:
#
#   bash scripts/sub_minute.sh <master_seed> [out_prefix]
#
# ONE train.py command: an 8-member population (member-grid fused rollout
# + packed fused update, 1024 envs x 134.2M steps each) + in-process
# 8-member polish.  Measured: 316.7 s on a first-ever (cold-compile) run
# on a degraded tunnel session (artifacts/demo_subminute_s3001.json:
# ~200 s of that was compiles + session slowdown; a warm-cache healthy-
# session wall is ~75-120 s).  The true sub-minute artifact remains the
# r4 P=4 demo (artifacts/demo_47s_s2201.json, 47.4 s).
#
# HONEST ODDS: with only 8 lottery tickets the winner clears 1200 on the
# strict protocol for SOME seeds, not all — measured across the five
# committed pipeline runs, only 14 of 160 members (8.75%) re-eval >=1220
# (the true-mean headroom 1200-strict needs), so max-of-8 finds one ~52%
# of the time vs ~95% for the pipeline's max-of-32.  The every-seed
# reliable path is scripts/population_pipeline.sh (~6-10 min).  Physics,
# round 5: the population step is measured AT its VPU wall and quality is
# Adam-step-count bound (docs/PERFORMANCE.md) — a sub-75 s wall cannot
# fund the member count x update count that reliability costs on one
# v5e chip.
set -euo pipefail
S=${1:?usage: sub_minute.sh <master_seed> [out_prefix]}
PREFIX=${2:-subminute}

t0=$(date +%s.%N)
python train.py --preset tpu --anneal-lr --population 8 \
  --fused-rollout --fused-update-packed \
  --n-envs 1024 --minibatch-size 32768 \
  --total-steps 134217728 --checkpoint-every 134217728 \
  --eval-episodes 32 --reval-episodes 512 \
  --polish-steps 33554432 --polish-pop 8 \
  --seed "$S" --run-name "${PREFIX}_s${S}"
t1=$(date +%s.%N)
WALL=$(python -c "print(f'{$t1 - $t0:.1f}')")
echo "[sub_minute] seed $S training wall: ${WALL} s"
python - "$WALL" "runs/ppo/${PREFIX}_s${S}_polish/population.json" <<'EOF'
import json, sys
wall, path = float(sys.argv[1]), sys.argv[2]
with open(path) as f:
    d = json.load(f)
d["training_wall_s"] = wall
with open(path, "w") as f:
    json.dump(d, f, indent=1)
EOF

# strict verification (CPU float64 exact protocol; not part of the wall)
python eval.py \
  --params-npz "runs/ppo/${PREFIX}_s${S}_polish/selected_best.npz" \
  --exact --episodes 100 \
  --out "runs/ppo/${PREFIX}_s${S}_polish/eval_100_exact.csv"
