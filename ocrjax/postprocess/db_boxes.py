"""On-device DB postprocess: prob map → oriented text boxes.

The reference does this on host: threshold the prob map, trace contours,
filter by score, unclip polygons, fit min-area rects — scalar loops over
every page (SURVEY.md §2.1 R3, §3.1). Here the whole pipeline is one
fixed-shape XLA program on-device (BASELINE.json:5 mandates a
"binarization/box-extraction postprocess" that stays on-TPU):

  1. binarize: prob > thresh.
  2. connected components: iterative min-label propagation (3x3 window →
     8-connectivity, same as cv2) alternated with pointer jumping
     (label <- label[label]), so path compression makes convergence
     logarithmic — `det_cc_iters` sweeps cover even page-wide components.
  3. component compaction to a fixed candidate count C (raster order,
     deterministic), then two scatter passes:
       pass 1 — moments (count, Σx, Σy, Σxx, Σyy, Σxy, Σprob) + AABB;
       pass 2 — min/max projections along each component's PCA axis.
  4. oriented box = PCA-axis rectangle of the component, expanded by the
     DB unclip rule δ = area·ratio / perimeter (exact for rectangles —
     SURVEY.md §7 "Polygon unclip"); score = mean prob over the component.

Outputs are fixed-shape (C, 4, 2) quads + scores + validity mask; the only
dynamic thing is the mask. A host/NumPy+cv2 parity path lives in
ocrjax.postprocess.host_boxes for exactness testing.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

_BIG = 2 ** 30  # background/invalid label sentinel (python int: usable as a
                # static init value in reduce_window and in jnp comparisons)


def _propagate_jump(labels: jnp.ndarray, fg: jnp.ndarray, n_iters: int
                    ) -> jnp.ndarray:
    """Min-label propagation + pointer jumping on an (H, W) label image."""
    H, W = labels.shape

    def body(_, lab):
        # 8-neighborhood min (background stays BIG)
        nb = jax.lax.reduce_window(
            lab, _BIG, jax.lax.min, (3, 3), (1, 1), "SAME")
        nb = jnp.where(fg, nb, _BIG)
        flat = lab.reshape(-1)
        nbf = nb.reshape(-1)
        # union-find merge: write my neighborhood min into the pixel my label
        # points at (scatter-min). When two chains meet, the *root* learns the
        # smaller label immediately — without this, a smaller label can only
        # invade a foreign component one pixel per sweep (plain propagation
        # reaches a non-converging fixpoint under pointer jumping).
        idx = jnp.clip(flat, 0, H * W - 1)
        flat = flat.at[idx].min(nbf)
        flat = jnp.minimum(flat, nbf)
        # pointer jumping: path compression doubles reach per jump
        for _jump in range(2):
            idx = jnp.clip(flat, 0, H * W - 1)
            jumped = flat[idx]
            flat = jnp.where(flat < _BIG, jnp.minimum(flat, jumped), _BIG)
        return flat.reshape(H, W)

    return jax.lax.fori_loop(0, n_iters, body, labels)


def label_components(bitmap: jnp.ndarray, n_iters: int = 32) -> jnp.ndarray:
    """(H, W) bool → (H, W) int32 labels (root linear index; BIG=background)."""
    H, W = bitmap.shape
    lin = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    labels = jnp.where(bitmap, lin, _BIG)
    return _propagate_jump(labels, bitmap, n_iters)


@functools.partial(
    jax.jit,
    static_argnames=("max_candidates", "cc_iters"))
def extract_boxes(
    prob: jnp.ndarray,
    *,
    thresh: float = 0.3,
    box_thresh: float = 0.6,
    unclip_ratio: float = 1.5,
    max_candidates: int = 256,
    min_box_size: float = 3,
    cc_iters: int = 32,
) -> Dict[str, jnp.ndarray]:
    """Single prob map (H, W) float → C fixed candidate boxes.

    Returns dict:
      boxes  (C, 4, 2) float32 — corners TL,TR,BR,BL in canvas pixel coords
                                 (unclipped, PCA-oriented rectangles);
      scores (C,) float32      — mean prob over the component;
      valid  (C,) bool         — candidate passes score/size filters.
    Batch via jax.vmap.
    """
    H, W = prob.shape
    C = max_candidates
    prob = prob.astype(jnp.float32)
    fg = prob > thresh

    labels = label_components(fg, cc_iters)
    flat_lab = labels.reshape(-1)
    lin = jnp.arange(H * W, dtype=jnp.int32)

    # ---- compact roots to component ids 0..C-1 (raster order) -------------
    is_root = (flat_lab == lin)
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1          # (H*W,)
    root_rank = jnp.where(is_root, rank, 0)
    comp = root_rank[jnp.clip(flat_lab, 0, H * W - 1)]        # (H*W,)
    comp = jnp.where((flat_lab < _BIG) & (comp < C), comp, C)  # C = dropped/bg

    # ---- pass 1: moments + AABB ------------------------------------------
    ys = (lin // W).astype(jnp.float32)
    xs = (lin % W).astype(jnp.float32)
    pv = prob.reshape(-1)

    def scat_add(v):
        return jnp.zeros((C + 1,), jnp.float32).at[comp].add(v)[:C]

    cnt = scat_add(jnp.ones_like(xs))
    sx, sy = scat_add(xs), scat_add(ys)
    sxx, syy, sxy = scat_add(xs * xs), scat_add(ys * ys), scat_add(xs * ys)
    sp = scat_add(pv)

    n = jnp.maximum(cnt, 1.0)
    mx, my = sx / n, sy / n
    cxx = sxx / n - mx * mx
    cyy = syy / n - my * my
    cxy = sxy / n - mx * my
    theta = 0.5 * jnp.arctan2(2.0 * cxy, cxx - cyy)           # PCA major axis
    ct, st = jnp.cos(theta), jnp.sin(theta)

    # ---- pass 2: extents along each component's axis ----------------------
    ct_p = jnp.concatenate([ct, jnp.ones((1,))])[comp]        # per-pixel gather
    st_p = jnp.concatenate([st, jnp.zeros((1,))])[comp]
    u = xs * ct_p + ys * st_p
    v = -xs * st_p + ys * ct_p

    def scat_min(val):
        return jnp.full((C + 1,), jnp.inf, jnp.float32).at[comp].min(val)[:C]

    def scat_max(val):
        return jnp.full((C + 1,), -jnp.inf, jnp.float32).at[comp].max(val)[:C]

    umin, umax = scat_min(u), scat_max(u)
    vmin, vmax = scat_min(v), scat_max(v)

    # ---- filters (pre-unclip, like DB's sside check) ----------------------
    bw = umax - umin + 1.0
    bh = vmax - vmin + 1.0
    score = sp / n
    valid = (cnt > 0) & (score >= box_thresh) \
        & (jnp.minimum(bw, bh) >= min_box_size)

    # ---- unclip ------------------------------------------------------------
    # unclip_ratio > 0: classic DB rule, grow the rect by δ = A·r/P.
    # unclip_ratio <= 0: exact shrink inversion — the detected region is the
    # training-time shrunk kernel (δs = 0.84·wh/P of the ORIGINAL box), so
    # recover the true box by solving δ = 0.84·(w'+2δ)(h'+2δ) /
    # (2(w'+2δ) + 2(h'+2δ)), which reduces to the quadratic
    # 4.64δ² + 0.32δ(w'+h') − 0.84w'h' = 0 (positive root). A plain ratio
    # either under-recovers the height of thin boxes or buries short text in
    # margin (measured in scripts/calibrate_unclip.py).
    area = bw * bh
    perim = 2.0 * (bw + bh)
    ratio_delta = area * unclip_ratio / jnp.maximum(perim, 1e-6)

    s_ = bw + bh
    disc = (0.32 * s_) ** 2 + 4.0 * 4.64 * 0.84 * area
    invert_delta = (-0.32 * s_ + jnp.sqrt(disc)) / (2.0 * 4.64)

    delta = jnp.where(unclip_ratio > 0, ratio_delta, invert_delta)
    umin, umax = umin - delta, umax + delta
    vmin, vmax = vmin - delta, vmax + delta

    # ---- corners back to image frame --------------------------------------
    # inverse rotation: x = u·c - v·s, y = u·s + v·c
    us = jnp.stack([umin, umax, umax, umin], axis=1)          # (C, 4)
    vs = jnp.stack([vmin, vmin, vmax, vmax], axis=1)
    bx = us * ct[:, None] - vs * st[:, None]
    by = us * st[:, None] + vs * ct[:, None]
    boxes = jnp.stack([bx, by], axis=-1)                      # (C, 4, 2)
    boxes = jnp.clip(boxes, 0.0,
                     jnp.array([W - 1, H - 1], jnp.float32))

    return {"boxes": boxes, "scores": score, "valid": valid}


def extract_boxes_from_config(prob: jnp.ndarray, cfg) -> Dict[str, jnp.ndarray]:
    return extract_boxes(
        prob,
        thresh=cfg.det_thresh,
        box_thresh=cfg.det_box_thresh,
        unclip_ratio=cfg.det_unclip_ratio,
        max_candidates=cfg.det_max_candidates,
        min_box_size=cfg.det_min_box_size,
        cc_iters=cfg.det_cc_iters,
    )
