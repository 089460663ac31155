#!/bin/bash
# Watchdog: run a python script; if its output file grows no new bytes for
# STALL_SECS, kill and restart (persistent jax cache makes retries cheap).
SCRIPT=$1; LOG=$2; STALL_SECS=${3:-300}; MAX_TRIES=${4:-5}
for try in $(seq 1 $MAX_TRIES); do
  echo "[watchdog] attempt $try" >> "$LOG"
  python -u "$SCRIPT" >> "$LOG" 2>&1 &
  PID=$!
  LAST_SIZE=0; LAST_CHANGE=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 15
    SIZE=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
    NOW=$(date +%s)
    if [ "$SIZE" != "$LAST_SIZE" ]; then LAST_SIZE=$SIZE; LAST_CHANGE=$NOW; fi
    if [ $((NOW - LAST_CHANGE)) -gt $STALL_SECS ]; then
      echo "[watchdog] stall detected, killing $PID" >> "$LOG"
      kill -9 $PID; sleep 5; break
    fi
  done
  wait $PID 2>/dev/null
  RC=$?
  if [ $RC -eq 0 ]; then echo "[watchdog] success" >> "$LOG"; exit 0; fi
done
echo "[watchdog] giving up" >> "$LOG"; exit 1
