#!/bin/bash
# Round-4/5 flagship runway: full-config overfit with EVERYTHING proven
# this round — residual-handoff training (default-walk parity, sw4),
# balance-windows, and the optimizer-knob pair that carried the medium
# quality run 30,775 steps with zero rollback storms (b2 0.95 +
# trust-ratio 0.1; knobs_medium_all3 reached 17.26 dB in 900 steps).
#
# Knob provenance (full-config bisect, 2026-08-20, /tmp/bisect_*.log):
# each knob SOLO is storm-free for 300 steps (b2 2.25 dB, tr 2.59 dB,
# gain-reg clean) — the sw4-attempt-1 storm at step ~153 needed the
# all-three combination. gain-reg is therefore DROPPED here (its
# benefit, wire-gain calibration, is secondary to the flagship bar)
# rather than carried into an untested triple.
#
# Run under the auto-resume babysitter with a global deadline:
#   DEADLINE_EPOCH=... scripts/sw5_launch.sh
# Never under `timeout`; the trainer self-bounds via --watchdog-s.
cd "$(dirname "${BASH_SOURCE[0]}")/.." || exit 1
# Cap the deadline so the chip is free for the end-of-round judged
# bench even if the caller passed a later (stale) DEADLINE_EPOCH from an
# earlier session. The round clock RESTARTS when the VM resets (the
# 2026-08-20 09:07 reset moved round-4's end from the assumed 12:21 to
# ~1 h after the new PROGRESS.jsonl start) — so the cap must come from
# the CALLER's current knowledge, not a baked-in epoch. Default keeps
# the old value only as a backstop.
if [ -z "${ROUND_END:-}" ] && [ -z "${DEADLINE_EPOCH:-}" ]; then
  # Refuse to guess: a baked-in epoch goes stale the moment a VM reset
  # moves the round clock (ADVICE r4 — the old 1787227200 backstop
  # would cap every post-12:00Z launch into an immediate exit).
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
nohup scripts/babysit.sh /tmp/sw5.log 6 -- python scripts/siam_overfit.py \
  --stream-windows 3 --audio-events 12 --seed 3 \
  --waveform-weight 2000 --fixed-noise --switch-bias-init 1.0 \
  --selection-leak 0.02 --selection-floor 0.02 \
  --attn-floor 0.01 --attn-leak 0.1 \
  --eval-regress-db 2.0 --gain-refit 1e-3 --align-refine 256 --ema 0.999 \
  --residual-handoff 1000 --balance-windows \
  --b2 0.95 --trust-ratio 0.1 \
  --lr 3e-4 --iterations 30000 --eval-every 250 \
  --stall-s 1200 \
  --out trained_weights/siam_overfit_full_sw5 \
  > /tmp/sw5_babysit.log 2>&1 &
echo $! > /tmp/sw5_babysit.pid
echo "sw5 babysitter launched (pid $(cat /tmp/sw5_babysit.pid)); tail -f /tmp/sw5.log"
