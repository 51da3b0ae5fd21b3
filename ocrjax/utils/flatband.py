"""Shared flat-band gate (DESIGN.md §4f) — ONE definition of the
"uniform-height glyphs" predicate used by three consumers that must stay
in sync for train/serve consistency:

  * ops/warp.ink_boxes (device, JAX — imports the constants),
  * api_det._ink_crop_host (host crop mirror — calls flat_band_gate),
  * train/synth.flat_snap_strip (training augmentation — calls it too).

A band is "flat" when its ink columns segment (by blank columns) into at
most FLAT_MAX_GLYPHS runs whose per-run ink tops and bottoms each agree
within max(2, FLAT_TOL_FRAC·band_h) rows — AND, when the caller can
supply the full line height, the band is LOWERCASE-SIZED relative to it
(band_h ≤ FLAT_CASE_MAX_FRAC·line_h).

The case condition (r5, VERDICT r4 next #3): detector boxes (and synth
training strips) cover the font-metric line height, within which ink
renders at x-height ≈ 0.40·line_h for lowercase bands but ≈ 0.52·line_h
for caps/digit bands (synth.render_line sizes the font at 0.72·h).
Rescaling a CAPS band toward the x-height position is exactly the
shape-twin confusion the r4 ship measured ('YO'→'Y0', 'OS' — straight
8-seed 0.9758 → 0.9698): caps glyphs arrive at lowercase size and drift
into their lowercase/digit twins. 0.46 sits midway between the two
anchors; only bands below it (x-height-sized, the strips the rescale
demonstrably helps) are rescaled.
"""

from __future__ import annotations

import os

import numpy as np

FLAT_TOL_FRAC = 0.18
FLAT_MAX_GLYPHS = 3
# Env override exists for A/B evaluation sweeps only (e.g. 99 = case
# condition off); production uses the default.
FLAT_CASE_MAX_FRAC = float(os.environ.get(
    "OCRJAX_FLAT_CASE_MAX_FRAC", "0.46"))


def flat_band_gate(band_ink: np.ndarray, line_h: float = 0.0) -> bool:
    """band_ink: (band_h, W) bool ink mask of the row band. NumPy host
    twin of the JAX formulation in ops/warp.ink_boxes.

    line_h > 0 enables the case-aware condition: the band must sit at
    x-height scale relative to the full line height (band_h ≤
    FLAT_CASE_MAX_FRAC·line_h) — caps/digit bands near full line height
    keep the full-band mapping."""
    band_h, _ = band_ink.shape
    if line_h > 0 and band_h > FLAT_CASE_MAX_FRAC * line_h:
        return False
    cols = band_ink.sum(axis=0) >= 1
    if not cols.any():
        return False
    col_top = np.where(cols, band_ink.argmax(axis=0), band_h)
    col_bot = np.where(cols, band_h - 1 - band_ink[::-1].argmax(axis=0), -1)
    on = cols & ~np.concatenate([[False], cols[:-1]])
    ng = int(on.sum())
    if ng == 0 or ng > FLAT_MAX_GLYPHS:
        return False
    seg = np.cumsum(on) - 1
    gtop = [col_top[(seg == g) & cols].min() for g in range(ng)]
    gbot = [col_bot[(seg == g) & cols].max() for g in range(ng)]
    tol = max(2.0, FLAT_TOL_FRAC * band_h)
    return (max(gtop) - min(gtop)) <= tol and \
        (max(gbot) - min(gbot)) <= tol
