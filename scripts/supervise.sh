#!/bin/bash
# Stall-tolerant training launcher for the tunneled TPU backend.
# The experimental axon tunnel intermittently wedges the first device program
# of a large process (futex-parked forever, no error).  This wrapper watches
# the run's train.jsonl; if it stops growing for STALL_S seconds the exact
# child PID is killed and training relaunches with --resume (orbax restores
# params/opt/env/PRNG state, so no progress is lost beyond the last
# checkpoint).
# Usage: [STALL_S=360] [MAX_TRIES=6] [OUT_DIR=runs/ppo] \
#        supervise.sh <run_name> <logfile> <train.py args...>
# NOTE: pass --out-dir to train.py via OUT_DIR so stall detection and resume
# detection watch the right paths.
set -u
RUN_NAME=$1; LOG=$2; shift 2
STALL_S=${STALL_S:-360}
MAX_TRIES=${MAX_TRIES:-6}
OUT_DIR=${OUT_DIR:-runs/ppo}
JSONL="${OUT_DIR}/${RUN_NAME}/train.jsonl"

for try in $(seq 1 "$MAX_TRIES"); do
  RESUME=""
  [ -d "${OUT_DIR}/${RUN_NAME}/checkpoints" ] && \
    [ -n "$(ls -A "${OUT_DIR}/${RUN_NAME}/checkpoints" 2>/dev/null)" ] && RESUME="--resume"
  echo "[supervise] try $try: python train.py --run-name $RUN_NAME --out-dir $OUT_DIR $RESUME $*" >> "$LOG"
  python train.py --run-name "$RUN_NAME" --out-dir "$OUT_DIR" $RESUME "$@" >> "$LOG" 2>&1 &
  PID=$!
  LAUNCH_T=$(date +%s)
  while true; do
    sleep 60
    if ! kill -0 "$PID" 2>/dev/null; then
      wait "$PID"; RC=$?
      if [ "$RC" -eq 0 ]; then
        echo "[supervise] completed ok" >> "$LOG"; exit 0
      fi
      echo "[supervise] exited rc=$RC; retrying" >> "$LOG"; break
    fi
    # age = time since the newer of (this try's launch, last metrics write):
    # a stale train.jsonl from a previous try must not count against a
    # freshly launched child that is still restoring/compiling.
    LAST=$LAUNCH_T
    if [ -f "$JSONL" ]; then
      M=$(stat -c %Y "$JSONL")
      [ "$M" -gt "$LAST" ] && LAST=$M
    fi
    AGE=$(( $(date +%s) - LAST ))
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
