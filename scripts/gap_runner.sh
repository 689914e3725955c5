#!/bin/bash
# TPU-gap runner: waits for the fresh-corpus babysitter to exit, then
# uses the brief uncontended window for the queued kernel measurements
# and the judged-bench pre-warm, then hands the chip to the sw5
# flagship run. Fully unattended — survives the driver session dying.
#
#   DEADLINE_EPOCH=<sw5 deadline> GAP_BUDGET_S=2400 nohup scripts/gap_runner.sh \
#       > /tmp/gap_runner.log 2>&1 & echo $! > /tmp/gap_runner.pid
#
# Each probe self-bounds in-process (faulthandler watchdogs — never
# `timeout`, killing a TPU holder wedges the relay); between steps the
# runner checks its own gap budget and skips remaining probes rather
# than delay the flagship launch.
set -u
cd "$(dirname "${BASH_SOURCE[0]}")/.." || exit 1
BUDGET="${GAP_BUDGET_S:-2400}"

echo "[gap] waiting for fresh babysitter to exit..."
if [ -f /tmp/fresh_babysit.pid ]; then
  while kill -0 "$(cat /tmp/fresh_babysit.pid)" 2>/dev/null; do sleep 60; done
fi
T0=$(date +%s)
echo "[gap] chip free at $(date +%H:%M:%S); budget ${BUDGET}s"

left() { echo $(( BUDGET - ($(date +%s) - T0) )); }

if [ "$(left)" -gt 600 ]; then
  echo "[gap] 1/4 grid overhead probe"
  python scripts/grid_overhead_probe.py >> /tmp/gap_runner.log 2>&1
fi
if [ "$(left)" -gt 900 ]; then
  echo "[gap] 2/4 whole128 vs whole128fori sweep"
  SWEEP_ONLY=whole128,whole128fori python scripts/kernel_block_sweep.py \
    >> /tmp/gap_runner.log 2>&1
fi
if [ "$(left)" -gt 600 ]; then
  echo "[gap] 3/4 parity probe at block 128"
  python scripts/kernel_parity_probe.py --block 128 >> /tmp/gap_runner.log 2>&1
fi
if [ "$(left)" -gt 300 ]; then
  echo "[gap] 4/4 judged bench pre-warm"
  python bench.py > /tmp/bench_prewarm.log 2>&1
  tail -1 /tmp/bench_prewarm.log
fi

echo "[gap] launching sw5 at $(date +%H:%M:%S) (deadline ${DEADLINE_EPOCH:-unset})"
bash scripts/sw5_launch.sh
