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


def _segmented_run_min(labels: jnp.ndarray, fg: jnp.ndarray, axis: int
                       ) -> jnp.ndarray:
    """Min label over each contiguous foreground run along `axis`.

    Dense log-depth segmented scan (lax.associative_scan) — the TPU-friendly
    replacement for pointer jumping: one pass propagates a label across an
    ENTIRE run, with zero gathers/scatters (XLA TPU executes random gathers
    near-serially; the original union-find formulation spent >10 s/page-batch
    in them).
    """
    flags = ~fg  # background elements reset the running minimum

    def comb(a, b):
        av, ab_ = a
        bv, bb = b
        return jnp.where(bb, bv, jnp.minimum(av, bv)), ab_ | bb

    fwd, _ = jax.lax.associative_scan(comb, (labels, flags), axis=axis)
    bwd, _ = jax.lax.associative_scan(comb, (labels, flags), axis=axis,
                                      reverse=True)
    out = jnp.minimum(fwd, bwd)
    return jnp.where(fg, out, _BIG)


def label_components(bitmap: jnp.ndarray, n_iters: int = 6) -> jnp.ndarray:
    """(H, W) bool → (H, W) int32 labels (component min linear index;
    BIG=background). 8-connectivity (cv2-compatible).

    Each iteration: full-row run-min scan, full-column run-min scan, one 3x3
    window min (diagonal hops). Reach per iteration is a whole row/column
    run, so convergence is the component's "bend count" — 2-3 iterations for
    the filled bands DB produces. Worst case: thin (1-2 px) diagonal strokes,
    whose runs are ~2 px — those need ~length/2 iterations (raise n_iters if
    labeling such inputs directly). All dense ops.
    """
    H, W = bitmap.shape
    lin = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    labels = jnp.where(bitmap, lin, _BIG)

    def body(_, lab):
        lab = _segmented_run_min(lab, bitmap, axis=1)
        lab = _segmented_run_min(lab, bitmap, axis=0)
        nb = jax.lax.reduce_window(
            lab, _BIG, jax.lax.min, (3, 3), (1, 1), "SAME")
        return jnp.where(bitmap, jnp.minimum(lab, nb), _BIG)

    return jax.lax.fori_loop(0, n_iters, body, labels)


# Empirical VMEM ceiling for the whole-grid Pallas CCL kernel: the scoped
# stack peaks at ~156 B/cell (labels + Hillis-Steele roll temporaries), and
# the TPU scoped-vmem limit is 16 MB → ~107k cells. 90k leaves margin: the
# 960-canvas coarse grid (240² = 57.6k) routes to Pallas, the 2048-tile
# grid (512² = 262k, measured 39 MB > limit) falls back to the XLA scans.
_PALLAS_CCL_MAX_CELLS = 90_000


def _label_components_fast(bitmap: jnp.ndarray, n_iters: int) -> jnp.ndarray:
    """label_components, routed to the VMEM-resident Pallas kernel on TPU.

    Same contract and per-iteration reach (full row/col runs + 3x3 hop);
    parity is pinned by tests/test_pallas_ccl.py and the TPU parity test.
    Measured at the production size (16x 240² coarse grids): 19.8 ms XLA
    scans vs 4.4 ms Pallas — the HBM round trips per scan pass dominate the
    XLA formulation (see ops/pallas/cc_label.py). CPU jax keeps the scans
    (interpret-mode Pallas is orders slower); grids past the kernel's VMEM
    ceiling (C5's 512² tile grids) keep them too."""
    H, W = bitmap.shape[-2:]
    if (jax.devices()[0].platform == "tpu"
            and H * W <= _PALLAS_CCL_MAX_CELLS):
        from ocrjax.ops.pallas.cc_label import label_components_pallas
        return label_components_pallas(bitmap, n_iters)
    return label_components(bitmap, n_iters)


@functools.partial(
    jax.jit,
    static_argnames=("max_candidates", "cc_iters", "cc_downsample",
                     "coord_stride"))
def extract_boxes(
    prob: jnp.ndarray,
    *,
    thresh: float = 0.3,
    box_thresh: float = 0.6,
    unclip_ratio: float = 1.5,
    max_candidates: int = 256,
    min_box_size: float = 3,
    cc_iters: int = 4,
    cc_downsample: int = 1,
    coord_stride: int = 1,
    angle_aniso_floor: float = 0.30,
    angle_flip_below: float = 0.75,
    angle_coherence_min: float = 0.75,
) -> Dict[str, jnp.ndarray]:
    """Single prob map (H, W) float → C fixed candidate boxes.

    coord_stride: canvas pixels per prob-map pixel (the det head's output
    stride — see models.db.DBHead). Box coordinates and the min_box_size
    filter are expressed in CANVAS pixels regardless of map resolution;
    unclip is scale-invariant (δ = A·r/P is linear in scale).

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

    # Optional coarse-grid CCL (cc_downsample=2 → 4x less scan traffic):
    # labels come from the OR-pooled bitmap and are repeated back to full
    # res; stats stay full-res (mask below is ANDed with fine-grid fg).
    # Caveat: components separated by < cc_downsample px may merge — safe
    # for DB kernels (shrunk regions have wide gaps), off by default.
    if cc_downsample > 1:
        d = cc_downsample
        if H % d or W % d:
            raise ValueError(f"H, W must be multiples of cc_downsample={d}")
        fg_c = jax.lax.reduce_window(
            fg, False, jnp.logical_or, (d, d), (d, d), "VALID")
        labels_c = _label_components_fast(fg_c, cc_iters)
        roots_flat = labels_c.reshape(-1)
        lin_c = jnp.arange((H // d) * (W // d), dtype=jnp.int32)
        is_root = (roots_flat == lin_c)
        root_src = roots_flat
        labels = jnp.repeat(jnp.repeat(labels_c, d, 0), d, 1)
        # stats on a stride-d pixel subsample — one sample per coarse CCL
        # cell, so every component cell carries equal weight (uniform
        # moments) and the partition is exact (labels are block-constant
        # after the repeat). Extents lose ≤ d-1 px per side (compensated
        # below, residual absorbed by unclip); the (P, C) broadcast
        # reductions — the dominant postprocess cost at full res — shrink
        # d² x (measured 11.5 → 3 ms per 16-page batch at d=4).
        stat_stride = d
    else:
        labels = _label_components_fast(fg, cc_iters)
        lin_f = jnp.arange(H * W, dtype=jnp.int32)
        is_root = (labels.reshape(-1) == lin_f)
        root_src = labels.reshape(-1)
        stat_stride = 1

    s_ = stat_stride
    fg_s = fg[::s_, ::s_]
    labels_s = labels[::s_, ::s_]
    prob_s = prob[::s_, ::s_]
    Hs_, Ws_ = fg_s.shape
    flat_lab = jnp.where(fg_s.reshape(-1), labels_s.reshape(-1), _BIG)
    lin = jnp.arange(Hs_ * Ws_, dtype=jnp.int32)
    root_vals = jnp.where(is_root, root_src, _BIG)
    # smallest C root indices == raster-order components
    neg_top, _ = jax.lax.top_k(-root_vals, C)                 # (C,)
    root_ids = -neg_top                                        # ascending
    has_comp = root_ids < _BIG                                 # (C,)

    # ---- per-(pixel, component) mask, fused into MXU/VPU reductions -------
    # mask[p, c] = labels_p == root_c. Never materialized in HBM: XLA fuses
    # the broadcast-compare into each reduction below. This replaces 10
    # scatter ops (near-serial on TPU) with dense matmul/reduce traffic.
    mask = (flat_lab[:, None] == root_ids[None, :])            # (P, C)

    ys = (lin // Ws_).astype(jnp.float32) * s_   # original-pixel coords
    xs = (lin % Ws_).astype(jnp.float32) * s_
    pv = prob_s.reshape(-1)
    # centered coords keep the second moments in f32's exact range (raw
    # x*x sums cancel catastrophically in var = E[x²] − E[x]²)
    xc = xs - (W - 1) / 2.0
    yc = ys - (H - 1) / 2.0
    vals = jnp.stack(
        [jnp.ones_like(xs), xc, yc, xc * xc, yc * yc, xc * yc, pv],
        axis=1)                                                # (P, 7)
    # precision=HIGHEST: the TPU MXU default truncates f32 operands to bf16,
    # which destroys the second moments (var = E[x²]−E[x]² cancels at ~0.4%
    # relative error → garbage PCA angles → tilted boxes)
    moments = jnp.einsum(
        "pc,pv->cv", mask.astype(jnp.float32), vals,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                   # (C, 7)
    cnt, sx, sy, sxx, syy, sxy, sp = [moments[:, i] for i in range(7)]

    n = jnp.maximum(cnt, 1.0)
    mx, my = sx / n, sy / n
    cxx = sxx / n - mx * mx
    cyy = syy / n - my * my
    cxy = sxy / n - mx * my
    theta = 0.5 * jnp.arctan2(2.0 * cxy, cxx - cyy)           # PCA major axis

    # ---- angle robustness for short lines ----------------------------------
    # The PCA axis of a near-square component (1-2 glyph lines) is noise: the
    # eigenvalue gap vanishes, so the "major" direction — and with it the
    # rectifying warp — can land 45-90° off (measured: 2-char rotated lines
    # decode as garbage while 3+-char neighbors are exact). Text direction is
    # a PAGE property though, so borrow it: anisotropy = (λ1−λ2)/(λ1+λ2)
    # says how trustworthy each component's own axis is, and the
    # count-weighted circular mean (in 2θ, axes are π-periodic) over the
    # trustworthy components gives the page angle.
    #   aniso ≥ flip_below: keep own axis (long lines; exact to <1°);
    #   floor ≤ aniso < flip_below: own axis, but flipped 90° if that lands
    #     closer to the page angle (PCA may pick the cross axis);
    #   aniso < floor: page angle outright.
    # With no trustworthy component on the page, atan2(0,0) = 0 falls back
    # to horizontal. Borrowing assumes ONE dominant text direction: on a
    # mixed-orientation page (a rotated stamp among horizontal lines) the
    # trusted axes disagree, the circular mean is meaningless, and forcing
    # it would rectify short lines at an angle no text on the page has. The
    # mean resultant length R = |Σ w·e^{i2θ}|/Σw measures that agreement
    # (R=1: identical axes; R→0: uniform spread); below ~0.75 (≈ ±20°
    # spread) each component keeps its own PCA axis instead (ADVICE r1).
    # score is needed early here; it only depends on moments.
    score = sp / n
    lam_gap = jnp.sqrt((cxx - cyy) ** 2 + 4.0 * cxy * cxy)
    aniso = lam_gap / jnp.maximum(cxx + cyy, 1e-6)
    w_page = jnp.where(
        has_comp & (score >= box_thresh) & (aniso >= angle_flip_below),
        cnt, 0.0)
    sin_sum = jnp.sum(w_page * jnp.sin(2.0 * theta))
    cos_sum = jnp.sum(w_page * jnp.cos(2.0 * theta))
    theta_page = 0.5 * jnp.arctan2(sin_sum, cos_sum)
    w_sum = jnp.sum(w_page)
    res_len = jnp.sqrt(sin_sum ** 2 + cos_sum ** 2) / jnp.maximum(w_sum, 1e-6)
    # no trusted components (w_sum≈0) keeps the legacy horizontal fallback
    coherent = (res_len >= angle_coherence_min) | (w_sum <= 1e-6)
    half_pi = jnp.float32(jnp.pi / 2.0)

    def _wrap_half(a):  # wrap axis-angle difference to [-π/2, π/2)
        return jnp.mod(a + half_pi, 2.0 * half_pi) - half_pi

    d_own = _wrap_half(theta - theta_page)
    d_flip = _wrap_half(theta + half_pi - theta_page)
    theta_r = jnp.where(
        coherent & (aniso < angle_flip_below)
        & (jnp.abs(d_flip) < jnp.abs(d_own)),
        theta + half_pi, theta)
    theta = jnp.where(coherent & (aniso < angle_aniso_floor),
                      theta_page, theta_r)
    # Re-wrap to [-π/2, π/2): theta_r = theta + π/2 can exceed π/2, and an
    # un-wrapped angle makes cos(θ) < 0 below, which reverses the corner
    # ordering — the quad's TL→TR edge points in −x, the rectifying warp
    # reads the strip right-to-left, and a 2-char line decodes 180°-flipped
    # ('I0' → '0I': measured on rotated-page seeds 9/77).
    theta = _wrap_half(theta)
    ct, st = jnp.cos(theta), jnp.sin(theta)

    # ---- extents along each component's axis (fused broadcast reduce) -----
    u_pc = xs[:, None] * ct[None, :] + ys[:, None] * st[None, :]
    v_pc = -xs[:, None] * st[None, :] + ys[:, None] * ct[None, :]
    inf = jnp.float32(jnp.inf)
    umin = jnp.min(jnp.where(mask, u_pc, inf), axis=0)
    umax = jnp.max(jnp.where(mask, u_pc, -inf), axis=0)
    vmin = jnp.min(jnp.where(mask, v_pc, inf), axis=0)
    vmax = jnp.max(jnp.where(mask, v_pc, -inf), axis=0)
    if s_ > 1:
        # strided sampling misses boundary pixels at odd coords: extents are
        # biased tight by up to (s-1) px per side — enough to clip edge
        # glyphs and flip characters. Compensate outward.
        pad_ = float(s_ - 1)
        umin, umax = umin - pad_, umax + pad_
        vmin, vmax = vmin - pad_, vmax + pad_

    # Empty lanes (no component, or every pixel missed by the stat stride)
    # leave ±inf extents; zero them so the trig products below stay finite —
    # the whole program's outputs are NaN-free, and jax_debug_nans runs
    # clean over it (SURVEY.md §4.2 sanitizers).
    none_ = cnt < 0.5
    umin = jnp.where(none_, 0.0, umin)
    umax = jnp.where(none_, 0.0, umax)
    vmin = jnp.where(none_, 0.0, vmin)
    vmax = jnp.where(none_, 0.0, vmax)

    # ---- filters (pre-unclip, like DB's sside check) ----------------------
    bw = jnp.where(has_comp, umax - umin + 1.0, 0.0)
    bh = jnp.where(has_comp, vmax - vmin + 1.0, 0.0)
    valid = has_comp & (cnt > 0) & (score >= box_thresh) \
        & (jnp.minimum(bw, bh) * coord_stride >= min_box_size)

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
    if coord_stride > 1:  # map px → canvas px (cell centers)
        boxes = boxes * coord_stride + 0.5 * (coord_stride - 1)
    boxes = jnp.clip(boxes, 0.0,
                     jnp.array([W * coord_stride - 1,
                                H * coord_stride - 1], jnp.float32))

    return {"boxes": boxes, "scores": score, "valid": valid}


def static_kwargs_from_config(cfg) -> Dict:
    """The static extract_boxes params implied by a config: with a strided
    det head the prob map is already coarse, so the residual CCL downsample
    is det_cc_downsample / det_head_stride (total coarsening unchanged)."""
    hs = getattr(cfg, "det_head_stride", 1)
    return dict(
        max_candidates=cfg.det_max_candidates,
        cc_iters=cfg.det_cc_iters,
        cc_downsample=max(1, cfg.det_cc_downsample // hs),
        coord_stride=hs,
    )


def extract_boxes_from_config(prob: jnp.ndarray, cfg) -> Dict[str, jnp.ndarray]:
    return extract_boxes(
        prob,
        thresh=cfg.det_thresh,
        box_thresh=cfg.det_box_thresh,
        unclip_ratio=cfg.det_unclip_ratio,
        min_box_size=cfg.det_min_box_size,
        **static_kwargs_from_config(cfg),
    )
