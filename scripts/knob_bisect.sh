#!/bin/bash
# Full-config knob bisect: sw4 attempt 1 (all three knobs) hit a
# deterministic rollback storm at step ~153 under fixed noise; each arm
# runs 300 steps with ONE knob to isolate the trigger. ~8 min/arm on the
# v5e (warm cache from sw4).
set -x
BASE="--stream-windows 3 --audio-events 12 --seed 3 \
 --waveform-weight 2000 --fixed-noise --switch-bias-init 1.0 \
 --selection-leak 0.02 --selection-floor 0.02 --attn-floor 0.01 --attn-leak 0.1 \
 --eval-regress-db 2.0 --gain-refit 1e-3 --align-refine 256 --ema 0.999 \
 --lr 3e-4 --iterations 300 --eval-every 100 --watchdog-s 2400 --stall-s 1200"
python scripts/siam_overfit.py $BASE --b2 0.95        --out /tmp/bisect_b2    > /tmp/bisect_b2.log 2>&1
python scripts/siam_overfit.py $BASE --trust-ratio 0.1 --out /tmp/bisect_tr   > /tmp/bisect_tr.log 2>&1
python scripts/siam_overfit.py $BASE --gain-reg 1e-3   --out /tmp/bisect_gr   > /tmp/bisect_gr.log 2>&1
for f in b2 tr gr; do echo "== $f =="; grep -cE "ROLLBACK" /tmp/bisect_$f.log; grep -E "^eval" /tmp/bisect_$f.log | tail -1; done
