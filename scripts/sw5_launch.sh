#!/bin/bash
# Round-5 flagship runway: full-config overfit with EVERYTHING proven in
# round 4 — residual-handoff training (default-walk parity, sw4),
# balance-windows, and the optimizer-knob combo that reached 17.26 dB in
# 900 steps with zero rollbacks at medium scale (knobs_medium_all3).
#
# BEFORE launching: run scripts/knob_bisect.sh — the all-three combo hit
# a deterministic rollback storm at step ~153 at FULL config, so drop
# (or soften) whichever knob the bisect convicts.
#
# Never under `timeout`; the trainer self-bounds via --watchdog-s.
nohup python scripts/siam_overfit.py \
  --stream-windows 3 --audio-events 12 --seed 3 \
  --waveform-weight 2000 --fixed-noise --switch-bias-init 1.0 \
  --selection-leak 0.02 --selection-floor 0.02 \
  --attn-floor 0.01 --attn-leak 0.1 \
  --eval-regress-db 2.0 --gain-refit 1e-3 --align-refine 256 --ema 0.999 \
  --residual-handoff 1000 --balance-windows \
  --b2 0.95 --trust-ratio 0.1 --gain-reg 1e-3 \
  --lr 3e-4 --iterations 30000 --eval-every 250 \
  --watchdog-s "${WATCHDOG_S:-28000}" --stall-s 1200 \
  --out trained_weights/siam_overfit_full_sw5 > /tmp/sw5.log 2>&1 &
echo $! > /tmp/sw5.pid
echo "sw5 launched (pid $(cat /tmp/sw5.pid)); tail -f /tmp/sw5.log"
