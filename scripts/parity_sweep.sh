#!/bin/bash
# Seed sweep at the reference config of record (1 env x 2048 x 512 iters)
# plus an 8-env variant: evidence base for sample-efficiency parity vs
# the reference's single committed run (evaluations.npz, final 1198).
cd /root/repo
for s in 0 1 2 3 4 5 6 7 8 9; do
  timeout 900 python train.py --platform cpu --seed $s \
    --run-name ref_s$s --out-dir runs/parity \
    > runs/parity/ref_s$s.log 2>&1
  tail -2 runs/parity/ref_s$s.log
done
for s in 0 1 2 3; do
  timeout 900 python train.py --platform cpu --seed $s --n-envs 8 \
    --run-name env8_s$s --out-dir runs/parity \
    > runs/parity/env8_s$s.log 2>&1
  tail -2 runs/parity/env8_s$s.log
done
# Mersenne-protocol eval curve (round 3, artifacts/ppo_exact_eval_ref_s12_*):
# the config of record evaluated with --exact-eval, so the logged curve is
# protocol-identical to the reference's evaluations.npz.
timeout 900 python train.py --platform cpu --seed 12 --exact-eval \
  --run-name exact_eval_ref_s12 --out-dir runs/parity \
  > runs/parity/exact_eval_ref_s12.log 2>&1
tail -2 runs/parity/exact_eval_ref_s12.log
