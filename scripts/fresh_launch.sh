#!/bin/bash
# ROADMAP #1: the infinite-corpus generalization run. Identical recipe
# to trained_weights/siam_quality_medium (30k steps, every holdout
# metric flat — memorization of a 144 s corpus) except the corpus:
# --fresh-corpus streams a NEW seedable synthetic segment every batch
# (holdout-disjoint seed space), removing the corpus-entropy ceiling.
# Done = first-half holdout LSD breaks below the 25.1 +/- 0.6 dB
# plateau; then watch whether waveform SNR follows.
#
# Run under the auto-resume babysitter with a global deadline:
#   DEADLINE_EPOCH=... scripts/fresh_launch.sh
cd "$(dirname "${BASH_SOURCE[0]}")/.." || exit 1
nohup scripts/babysit.sh /tmp/fresh.log 6 -- python scripts/siam_quality.py \
  --medium --fresh-corpus --fixed-noise \
  --waveform-weight 2000 --selection-leak 0.02 --selection-floor 0.02 \
  --switch-bias-init 1.0 --attn-floor 0.01 --attn-leak 0.1 \
  --lr 3e-4 --b2 0.95 --trust-ratio 0.1 \
  --iterations 30000 --eval-every 500 --stream-eval-every 2000 \
  --stall-s 1200 \
  --out trained_weights/siam_quality_fresh \
  > /tmp/fresh_babysit.log 2>&1 &
echo $! > /tmp/fresh_babysit.pid
echo "fresh-corpus babysitter launched (pid $(cat /tmp/fresh_babysit.pid)); tail -f /tmp/fresh.log"
