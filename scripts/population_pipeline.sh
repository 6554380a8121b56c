#!/bin/bash
# Reference-beating policy, reliably, from one master seed — no lottery.
#
#   bash scripts/population_pipeline.sh <master_seed> [out_prefix]
#
# Attempt = ONE train.py command (~4-6 min wall on one v5e, warm cache):
#   Stage 1: 32 member policies trained in one device program
#            (member-grid fused rollout + packed fused update), 1024 envs
#            x 268.4M env-steps each — the FLAGSHIP recipe's Adam-step
#            count (2048 iterations) at half its samples; quality on this
#            task is update-count-bound (measured round 5), and the 2048-
#            iteration budget lifts member true peaks ~25 points over the
#            1024-iteration one (winner re-evals 1229-1232 vs 1193-1224)
#            — per-member top-k snapshot archives, risk-adjusted
#            512-episode re-eval selection.
#   Stage 2+3: TWO chained in-process 16-member polish stages
#            (train.py --polish-steps --polish-rounds 2; 33.6M steps at
#            lr 1e-4 each), every polish member warm-started ROUND-ROBIN
#            from the previous stage's top-3 snapshot lineages.
#
# SCORE GATE + ESCALATION: the strict protocol is a FIXED 100-episode
# set, so a policy's strict result is its true mean plus a per-POLICY
# ~sigma=12 draw (measured round 5: strict - reval512 spread across 13
# runs).  Clearing 1200 strict reliably therefore needs a true mean
# ~1220+: the gate requires the best risk-adjusted score
# (reval512 mean - 2*std/sqrt(100)) to reach 1210, and a below-gate
# attempt escalates with a fresh stage-1 at master_seed + 1000*k; the
# final policy is the best-scoring selection across ALL attempts
# (monotone in attempts).  At the shipped 268M stage the gate is rarely
# needed — all five committed seeds cleared it (scores 1215.3-1218.5) in
# ONE ~6-10 min attempt; it exists for the tail.  The strict eval
# afterwards is verification, never selection — the strict set is never
# used to choose.
#
# Committed evidence (artifacts/population/, pinned by
# tests/test_population_artifacts.py):
#   generation 1 (two-process, 2048 envs x 268M, ~6-14 min/seed): five
#     fresh master seeds 701/801/901/1101/1201 -> 1209.2/1208.8/1203.8/
#     1223.1/1222.5 strict, 100/100 goals each;
#   generation 2 (this script): five fresh master seeds 2101-2501 ->
#     1211.1/1237.4/1239.2/1239.6/1210.6 strict, 100/100 goals, one
#     attempt each (pipe5_* artifacts; see README).
# (Reference's own run: 1198.22 final, 1226.55 best, over 10-episode
# evals; 244.8 min.)
set -euo pipefail
S=${1:?usage: population_pipeline.sh <master_seed> [out_prefix]}
PREFIX=${2:-pop_pipeline}
GATE=${GATE:-1210}
MAX_ATTEMPTS=${MAX_ATTEMPTS:-4}

# the tunneled accelerator grant occasionally fails a process at launch
# (observed once across ~20 round-4 runs); one retry absorbs it
retry() { "$@" || { echo "[pipeline] stage failed; retrying once" >&2; "$@"; }; }

t0=$SECONDS
DIRS=()
ATTEMPTS=0
for ((a = 0; a < MAX_ATTEMPTS; a++)); do
  SA=$((S + 1000 * a))
  NAME="${PREFIX}_s${S}"
  [ "$a" -gt 0 ] && NAME="${PREFIX}_s${S}_esc${a}"
  retry python train.py --preset tpu --anneal-lr --population 32 \
    --fused-rollout --fused-update-packed \
    --n-envs 1024 --minibatch-size 32768 \
    --total-steps 268435456 --checkpoint-every 268435456 \
    --eval-episodes 32 --reval-episodes 512 \
    --polish-steps 33554432 --polish-pop 16 --polish-rounds 2 \
    --seed "$SA" --run-name "$NAME"
  ATTEMPTS=$((ATTEMPTS + 1))
  DIRS+=("runs/ppo/${NAME}_polish" "runs/ppo/${NAME}_polish_polish")
  # the ONE best-selection definition (also used for the final pick below)
  BEST_SCORE=$(python scripts/best_selection.py "${DIRS[@]}" | cut -f1)
  echo "[pipeline] seed $S attempt ${ATTEMPTS}: best score ${BEST_SCORE}"
  python -c "import sys; sys.exit(0 if float('${BEST_SCORE}') >= ${GATE} else 1)" && break
  echo "[pipeline] score below gate ${GATE}; escalating with master seed $((S + 1000 * (a + 1)))"
done
WALL=$((SECONDS - t0))
echo "[pipeline] seed $S training wall: ${WALL} s (${ATTEMPTS} attempt(s))"

# best-across-attempts selection + a stable 'final' stage dir for artifacts
BEST_LINE=$(python scripts/best_selection.py "${DIRS[@]}")
python - "$S" "$PREFIX" "$WALL" "$ATTEMPTS" "$BEST_LINE" <<'EOF'
import json, os, shutil, sys
S, P, wall, attempts = (sys.argv[1], sys.argv[2], float(sys.argv[3]),
                        int(sys.argv[4]))
bv, best = sys.argv[5].split("\t")
assert best, "no polish stage produced a selection"
final = f"runs/ppo/{P}_s{S}_final"
os.makedirs(final, exist_ok=True)
shutil.copy(os.path.join(best, "selected_best.npz"),
            os.path.join(final, "selected_best.npz"))
with open(os.path.join(best, "population.json")) as f:
    d = json.load(f)
d["best_of_chain"] = best
d["training_wall_s"] = wall
d["attempts"] = attempts
with open(os.path.join(final, "population.json"), "w") as f:
    json.dump(d, f, indent=1)
print(f"[pipeline] best-across-attempts: {best} (score {float(bv):.1f}) "
      f"-> {final}")
EOF

retry python eval.py \
  --params-npz "runs/ppo/${PREFIX}_s${S}_final/selected_best.npz" \
  --exact --episodes 100 \
  --out "runs/ppo/${PREFIX}_s${S}_final/eval_100_exact.csv"
