#!/bin/bash
# Stall-tolerant training launcher for the tunneled TPU backend.
# The experimental axon tunnel intermittently wedges the first device program
# of a large process (futex-parked forever, no error).  This wrapper watches
# the run's train.jsonl; if it stops growing for STALL_S seconds the exact
# child PID is killed and training relaunches with --resume (orbax restores
# params/opt/env/PRNG state, so no progress is lost beyond the last
# checkpoint).
# Usage: supervise.sh <run_name> <logfile> <train.py args...>
set -u
RUN_NAME=$1; LOG=$2; shift 2
STALL_S=${STALL_S:-360}
MAX_TRIES=${MAX_TRIES:-6}
JSONL="runs/ppo/${RUN_NAME}/train.jsonl"

for try in $(seq 1 "$MAX_TRIES"); do
  RESUME=""
  [ -d "runs/ppo/${RUN_NAME}/checkpoints" ] && \
    [ -n "$(ls -A "runs/ppo/${RUN_NAME}/checkpoints" 2>/dev/null)" ] && RESUME="--resume"
  echo "[supervise] try $try: python train.py --run-name $RUN_NAME $RESUME $*" >> "$LOG"
  python train.py --run-name "$RUN_NAME" $RESUME "$@" >> "$LOG" 2>&1 &
  PID=$!
  while true; do
    sleep 60
    if ! kill -0 "$PID" 2>/dev/null; then
      wait "$PID"; RC=$?
      if [ "$RC" -eq 0 ]; then
        echo "[supervise] completed ok" >> "$LOG"; exit 0
      fi
      echo "[supervise] exited rc=$RC; retrying" >> "$LOG"; break
    fi
    if [ -f "$JSONL" ]; then
      AGE=$(( $(date +%s) - $(stat -c %Y "$JSONL") ))
    else
      AGE=$(( $(date +%s) - $(stat -c %Y "/proc/$PID") ))
    fi
    if [ "$AGE" -gt "$STALL_S" ]; then
      echo "[supervise] stalled ${AGE}s; killing $PID" >> "$LOG"
      kill "$PID" 2>/dev/null; sleep 5; kill -9 "$PID" 2>/dev/null
      sleep 30   # let the tunnel grant release
      break
    fi
  done
done
echo "[supervise] giving up after $MAX_TRIES tries" >> "$LOG"
exit 1
