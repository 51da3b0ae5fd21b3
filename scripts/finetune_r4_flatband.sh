#!/bin/sh
# Round-4 flat-band consistency fine-tune (DESIGN.md §4f): the flat-band
# x-height-aware rescale (rec_flat_band_frac) fixes the 1-3-glyph
# case-size tail (+9..11 lines on the controlled-length tiers) but costs
# exactly 2 caps shape-twin lines on the straight tier because the
# shipped weights never saw flat-band geometry in training. This is the
# r3 quality recipe + --flat-snap 0.3 (synth.flat_snap_strip applies the
# SERVING flat-band transform to eligible training strips).
#
# Ship criteria (eval BEFORE copying over assets/rec.safetensors, all
# with --flat-frac 0.46..0.50 on the candidate):
#   straight >= 0.975 (the r3 bar restored), rotated >= 0.93,
#   eval_xheight ALL >= 0.90 (the flat-band gains held),
#   degraded tiers not worse than the r3 sweep (soup if needed).
set -e
cd "$(dirname "$0")/.."
python scripts/train_rec_assets.py \
  --finetune --steps 4000 --lr 3e-4 \
  --mix-det-crops 192 --det-rotation 10 \
  --p-word 0.25 --confusable-bias 2 --l-bias 2 \
  --p-space 0.06 --aug-rotation 4 --quantize-p 0.5 --stretch 0.15 \
  --font-bias DejaVuSans.ttf:2 --font-anneal-frac 0.25 \
  --degrade 0.3 --degrade-anneal-frac 0.25 \
  --flat-snap 0.3 \
  --ckpt-dir /tmp/rec_ft_r4 \
  --out /tmp/rec_candidate_r4.safetensors "$@"
