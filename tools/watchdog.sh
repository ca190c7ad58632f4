#!/bin/bash
# Stall watchdog for long TPU runs on this host's flaky tunnel.
#
# The axon TPU tunnel drops for minutes at a time (observed r4+r5:
# in-flight RPCs hang, sometimes recover, sometimes not). Long training
# runs must survive that. This supervisor launches the command, watches
# its LOGFILE for output progress, and on a stall (no log growth for
# STALL_SECS) kills the process BY PID and relaunches it with
# --resume-train appended — the resident trainer then continues from its
# last chunk-boundary checkpoint (engine/trainer.py train_resident).
#
# Usage: tools/watchdog.sh LOGFILE STALL_SECS PIDFILE -- cmd args...
# Exit: the command's exit code once it terminates on its own
#       (rc 0/1 = run completed with PASS/FAIL verdict — not restarted).
set -u
log=$1; stall=$2; pidfile=$3; shift 3
[ "${1:-}" = "--" ] && shift
resume=""
restarts=0
max_restarts=30
while :; do
  # shellcheck disable=SC2086
  "$@" $resume >> "$log" 2>&1 &
  pid=$!
  echo "$pid" > "$pidfile"
  echo "[watchdog] launched pid=$pid resume='${resume}'" >> "$log"
  killed=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    now=$(date +%s); mt=$(stat -c %Y "$log" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$stall" ]; then
      echo "[watchdog] no output for >${stall}s — killing $pid" >> "$log"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      killed=1
      break
    fi
  done
  wait "$pid"; rc=$?
  if [ "$killed" -eq 0 ] && [ "$rc" -le 1 ]; then
    echo "[watchdog] command finished rc=$rc" >> "$log"
    exit "$rc"
  fi
  restarts=$((restarts + 1))
  if [ "$restarts" -gt "$max_restarts" ]; then
    echo "[watchdog] giving up after $max_restarts restarts" >> "$log"
    exit 70
  fi
  resume="--resume-train"
  echo "[watchdog] restart #$restarts in 15s (rc=$rc)" >> "$log"
  sleep 15
done
