#!/bin/bash
# Auto-resume babysitter for long TPU training runs.
#
# The axon relay wedges 1-3 times per chip-evening; the trainers exit
# cleanly on wedge via their --stall-s progress watchdog (never kill a
# TPU process externally — that wedges the device for 10-60 min, see
# CLAUDE.md). This loop waits for the trainer to EXIT ON ITS OWN, checks
# whether it printed its completion sentinel, and otherwise waits for
# TPU health (scripts/tpu_watch.py) and relaunches with --resume.
#
# Usage:
#   scripts/babysit.sh LOGFILE MAX_RESTARTS -- python scripts/... args
#
# The command is launched as given on the first round and with --resume
# appended on every restart. Run the babysitter itself under nohup:
#   nohup scripts/babysit.sh /tmp/sw5.log 6 -- python scripts/siam_overfit.py ... \
#       > /tmp/sw5_babysit.log 2>&1 & echo $! > /tmp/sw5_babysit.pid
set -u
REPO="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
LOG="$1"; MAX="$2"; shift 3   # LOGFILE MAX_RESTARTS --

# Optional global deadline (epoch seconds, env DEADLINE_EPOCH): no
# restart starts within 20 min of it, and every restart appends a
# recomputed --watchdog-s (argparse last-wins) so the trainer exits
# BEFORE the deadline — e.g. before a session-end judged bench needs
# the chip to itself.
DEADLINE="${DEADLINE_EPOCH:-}"

for attempt in $(seq 0 "$MAX"); do
  extra=()
  if [ -n "$DEADLINE" ]; then
    left=$(( DEADLINE - $(date +%s) - 600 ))
    if [ "$left" -lt 1200 ]; then
      echo "[babysit] within 20 min of deadline — not (re)starting"
      exit 1
    fi
    extra=(--watchdog-s "$left")
  fi
  if [ "$attempt" -eq 0 ]; then
    "$@" "${extra[@]}" >> "$LOG" 2>&1
  else
    echo "[babysit] restart $attempt/$MAX with --resume $(date +%H:%M:%S)"
    "$@" --resume "${extra[@]}" >> "$LOG" 2>&1
  fi
  rc=$?
  if grep -q "^done" "$LOG"; then
    echo "[babysit] completion sentinel found (rc=$rc) — exiting"
    exit 0
  fi
  echo "[babysit] trainer exited rc=$rc without sentinel $(date +%H:%M:%S)"
  if [ "$attempt" -lt "$MAX" ]; then
    echo "[babysit] waiting for TPU health before resume..."
    python "${TPU_WATCH:-$REPO/scripts/tpu_watch.py}" 5400 || {
      echo "[babysit] TPU did not recover within 90 min — giving up"
      exit 1
    }
    sleep 30
  fi
done
echo "[babysit] restart budget exhausted"
exit 1
