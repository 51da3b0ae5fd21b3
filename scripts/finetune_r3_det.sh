#!/bin/sh
# Round-3 detector fine-tune (SHIPPED as assets/det.safetensors —
# DESIGN.md §4d). Targets the two measured r2 detection failure classes:
# dense-row merging (BASELINE.json:11 "hundreds of lines/page" — rows
# with ~5px gaps merged, dense-page exact 0.785) and degraded-scan recall
# collapse (det_recall 0.44-0.54 across degradation tiers).
#
# Ship gates (all passed 2026-08-19, see DESIGN.md §4d):
#   dense diag exact >= 0.90 (scripts/diag_dense.py --det-weights ...),
#   multiseed straight/rotated det_recall no regression
#   (scripts/eval_multiseed.py --det-weights ... --degrade).
set -e
cd "$(dirname "$0")/.."
python scripts/train_det_assets.py \
  --finetune --steps 1500 \
  --p-dense 0.35 --degrade 0.3 --p-word 0.25 \
  --ckpt-dir /tmp/det_ft_r3 \
  --out /tmp/det_candidate_r3.safetensors "$@"
