#!/bin/sh
# Round-5 soft-posterior fine-tune (VERDICT r4 next #2): the shipped
# CRNN's frame posteriors are peaked enough that K=8 beam NEVER diverges
# from greedy (0/256 on degraded strips, DESIGN.md §4h) — beam cannot
# rescue the weak degraded-0.75/1.0 tiers. This run changes the
# posteriors, not the decoder: the r4 flat-band recipe with
#   * HEAVIER degradation (0.45 vs 0.3) and a SHORTER clean anneal tail
#     (0.1 vs 0.25) — more probability mass stays on the degraded
#     distribution at freeze time;
#   * frame-entropy regularization (--ent-reg, rec_trainer) that keeps
#     alternatives alive in the frame distributions.
#
# Ship protocol (soup per DESIGN.md §4e/§4f before replacing
# assets/rec.safetensors):
#   scripts/soup_weights.py assets/rec.safetensors \
#       /tmp/rec_candidate_r5.safetensors --alpha {0.4,0.5,0.6}
#   eval_multiseed.py --degrade on each; ship needs degraded-0.75 and
#   -1.0 up with straight/rotated/held-out within noise, then
#   scripts/eval_beam.py on the winner for the beam re-verdict.
set -e
cd "$(dirname "$0")/.."
python scripts/train_rec_assets.py \
  --finetune --steps 4000 --lr 3e-4 \
  --mix-det-crops 192 --det-rotation 10 \
  --p-word 0.25 --confusable-bias 2 --l-bias 2 \
  --p-space 0.06 --aug-rotation 4 --quantize-p 0.5 --stretch 0.15 \
  --font-bias DejaVuSans.ttf:2 --font-anneal-frac 0.25 \
  --degrade 0.45 --degrade-anneal-frac 0.1 \
  --flat-snap 0.3 \
  --ent-reg 0.03 \
  --ckpt-dir /tmp/rec_ft_r5 \
  --out /tmp/rec_candidate_r5.safetensors "$@"
