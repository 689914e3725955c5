#!/bin/bash
# Round-5 flagship: full-config overfit with the StormGuard hindsight
# machinery (mptpu/train/guard.py), gain-reg (kill refine_required:
# VERDICT r4 item 2), holdout evals riding along (item 6), and
# --commit-artifacts (item 5).
#
# Knob provenance: the b2 0.95 + trust-ratio 0.1 PAIR storms
# deterministically at full config (sw5/sw5c, iter ~153 cliff) and the
# sw5c guarded leg still learned nothing (alive_events 0). Fall back to
# the sw4 knob set (b2 0.999, no trust-ratio — reached 7.6k steps and
# 7.80 dB before an OLD-guard storm death), now with the tested guards
# making storms recoverable, plus gain-reg 1e-3 (validated at medium in
# knobs_medium_all3: +2.1 dB, zero storms).
#
#   ROUND_END=<epoch> scripts/sw6_launch.sh [extra trainer args...]
# Never under `timeout`; the trainer self-bounds via --watchdog-s.
cd "$(dirname "${BASH_SOURCE[0]}")/.." || exit 1
if [ -z "${ROUND_END:-}" ] && [ -z "${DEADLINE_EPOCH:-}" ]; then
  echo "ERROR: set ROUND_END or DEADLINE_EPOCH (epoch seconds)" >&2
  exit 2
fi
ROUND_END="${ROUND_END:-$DEADLINE_EPOCH}"
if [ "$ROUND_END" -le "$(date +%s)" ]; then
  echo "ERROR: ROUND_END $ROUND_END is already in the past" >&2
  exit 2
fi
if [ -z "${DEADLINE_EPOCH:-}" ] || [ "${DEADLINE_EPOCH}" -gt "$ROUND_END" ]; then
  export DEADLINE_EPOCH="$ROUND_END"
fi
nohup scripts/babysit.sh /tmp/sw6.log 8 -- python scripts/siam_overfit.py \
  --stream-windows 3 --audio-events 12 --seed 3 \
  --waveform-weight 2000 --fixed-noise --switch-bias-init 1.0 \
  --selection-leak 0.02 --selection-floor 0.02 \
  --attn-floor 0.01 --attn-leak 0.1 \
  --eval-regress-db 2.0 --gain-refit 1e-3 --align-refine 256 --ema 0.999 \
  --residual-handoff 1000 --balance-windows \
  --b2 0.999 --gain-reg 1e-3 \
  --lr 3e-4 --iterations 30000 --eval-every 250 --walk-eval-every 1000 \
  --holdout-eval --commit-artifacts \
  --stall-s 1200 \
  --out trained_weights/siam_overfit_full_sw6 \
  "$@" \
  > /tmp/sw6_babysit.log 2>&1 &
echo $! > /tmp/sw6_babysit.pid
echo "sw6 babysitter launched (pid $(cat /tmp/sw6_babysit.pid)); tail -f /tmp/sw6.log"
