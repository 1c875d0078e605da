#!/bin/bash
# Run a TPU python tool with auto-retry on startup wedge: if the log file
# does not grow for $STALL_S seconds, kill and restart (the axon tunnel
# occasionally wedges an RPC forever; a fresh process typically succeeds).
# Usage: tpu_retry.sh LOGFILE TIMEOUT_S CMD...
#
# STALL_S defaults to 450 s — ABOVE the worst observed degraded-tunnel
# cold compile (200-400 s, CLAUDE.md); a lower value kills healthy runs
# mid-compile. The command runs in its own process group (setsid) so the
# stall kill reaches the python child even when it is blocked in an
# uninterruptible RPC and ignores the first signal — killing only the
# timeout wrapper would orphan a zombie still holding the TPU.
LOG=$1; TO=$2; shift 2
for attempt in 1 2 3 4; do
  : > "$LOG"
  setsid timeout -k 5 "$TO" "$@" >> "$LOG" 2>&1 &
  PID=$!
  last_size=0; stall=0
  while kill -0 $PID 2>/dev/null; do
    sleep 10
    size=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    if [ "$size" -gt "$last_size" ]; then last_size=$size; stall=0
    else stall=$((stall+10)); fi
    if [ $stall -ge ${STALL_S:-450} ]; then
      echo "[tpu_retry] attempt $attempt stalled; killing group $PID" >> "$LOG"
      kill -- -$PID 2>/dev/null; sleep 2; kill -9 -- -$PID 2>/dev/null
      break
    fi
  done
  wait $PID 2>/dev/null; rc=$?
  if [ $rc -eq 0 ]; then echo "[tpu_retry] done rc=0" >> "$LOG"; exit 0; fi
  echo "[tpu_retry] attempt $attempt rc=$rc; retrying" >> "$LOG"
done
echo "[tpu_retry] giving up" >> "$LOG"; exit 1
