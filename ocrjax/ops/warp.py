"""Batched perspective crop/rectify of detected quads (SURVEY.md §2.1 R4).

The reference loops over detected quads on host, perspective-warping each
into an axis-aligned strip with per-pixel scalar math (SURVEY.md §3.1 "host
loop over N lines"). Here the whole handoff is one fixed-shape device op
(BASELINE.json:5: "vectorized as a batched gather/warp kernel so whole pages
stay on-TPU"):

  * homographies for all N quads are solved as one batched 8x8 linear system
    (DLT from the 4 corner correspondences),
  * all N strips sample the page through one bilinear gather
    (N, H_rec, W_bucket) — vmap over quads, XLA gather on device,
  * per-strip valid widths (aspect-preserving) are returned for CTC masking;
    pixels beyond a strip's width are zero.

Rotated-rect quads make the homography an affine map — the DLT solve handles
both that and true perspective quads identically.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def solve_homographies(quads: jnp.ndarray, heights: jnp.ndarray,
                       widths: jnp.ndarray) -> jnp.ndarray:
    """DLT homographies mapping strip coords → page coords.

    quads: (N, 4, 2) corners TL,TR,BR,BL in page coords.
    heights/widths: (N,) target strip sizes (the mapped dst rectangle).
    Returns (N, 3, 3) with H @ [u, v, 1]^T ~ [x, y, 1]^T.
    """
    N = quads.shape[0]
    w = jnp.maximum(widths.astype(jnp.float32), 1.0)
    h = jnp.maximum(heights.astype(jnp.float32), 1.0)
    zeros = jnp.zeros((N,), jnp.float32)
    # dst corners (u, v): TL (0,0), TR (w-1,0), BR (w-1,h-1), BL (0,h-1)
    dst = jnp.stack([
        jnp.stack([zeros, zeros], -1),
        jnp.stack([w - 1, zeros], -1),
        jnp.stack([w - 1, h - 1], -1),
        jnp.stack([zeros, h - 1], -1),
    ], axis=1)                                               # (N, 4, 2)
    src = quads.astype(jnp.float32)

    def one(dst4, src4):
        # rows: [u, v, 1, 0, 0, 0, -u*x, -v*x] h = x ; same for y
        rows = []
        rhs = []
        zero = jnp.float32(0.0)
        one_ = jnp.float32(1.0)
        for i in range(4):
            u, v = dst4[i, 0], dst4[i, 1]
            x, y = src4[i, 0], src4[i, 1]
            rows.append(jnp.stack(
                [u, v, one_, zero, zero, zero, -u * x, -v * x]))
            rows.append(jnp.stack(
                [zero, zero, zero, u, v, one_, -u * y, -v * y]))
            rhs.extend([x, y])
        A = jnp.stack(rows)                                  # (8, 8)
        b = jnp.stack(rhs)                                   # (8,)
        # tiny ridge keeps degenerate (zero-area) quads solvable; their
        # strips are masked out downstream anyway
        A = A + 1e-6 * jnp.eye(8)
        sol = jnp.linalg.solve(A, b)
        return jnp.concatenate([sol, jnp.ones((1,))]).reshape(3, 3)

    return jax.vmap(one)(dst, src)


def _bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                     ) -> jnp.ndarray:
    """img (H, W) float; x/y sample coords (any shape) → samples.

    Clamp-to-edge BEFORE flooring: a coordinate like -1e-6 otherwise floors
    to -1 with dx≈1, silently sampling the wrong texel at image borders.
    """
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0 = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - dy) * ((1 - dx) * v00 + dx * v01)
            + dy * ((1 - dx) * v10 + dx * v11))


def quad_strip_widths(quads: jnp.ndarray, rec_height: int,
                      max_width: int) -> jnp.ndarray:
    """Aspect-preserving strip widths for each quad (clipped to the bucket)."""
    e_top = jnp.linalg.norm(quads[:, 1] - quads[:, 0], axis=-1)
    e_bot = jnp.linalg.norm(quads[:, 2] - quads[:, 3], axis=-1)
    e_left = jnp.linalg.norm(quads[:, 3] - quads[:, 0], axis=-1)
    e_right = jnp.linalg.norm(quads[:, 2] - quads[:, 1], axis=-1)
    # +1: corners sit at pixel centers, so corner-to-corner norms are size-1
    qw = jnp.maximum(e_top, e_bot) + 1.0
    qh = jnp.maximum(jnp.maximum(e_left, e_right) + 1.0, 1.0)
    w = jnp.round(qw * rec_height / qh)
    return jnp.clip(w, 1, max_width).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("rec_height", "bucket_width"))
def warp_quads(
    page: jnp.ndarray,
    quads: jnp.ndarray,
    *,
    rec_height: int = 32,
    bucket_width: int = 320,
    pad_value: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop+rectify all quads from a page in one batched gather.

    page: (H, W) float32 (already normalized grayscale).
    quads: (N, 4, 2) float32 page coords, TL,TR,BR,BL.
    Returns (strips (N, rec_height, bucket_width) float32 — pad_value
    beyond each strip's width; widths (N,) int32). The recognizer is trained
    on u8-zero (black) padded strips, so recognition callers must pass
    pad_value=(0 - rec_mean)/rec_std; the 0.0 default (mid-gray) is
    out-of-distribution for the backward LSTM and hallucinates edge
    characters (measured: trailing '|').
    """
    N = quads.shape[0]
    widths = quad_strip_widths(quads, rec_height, bucket_width)
    heights = jnp.full((N,), rec_height, jnp.int32)
    Hs = solve_homographies(quads, heights, widths)           # (N, 3, 3)

    u = jax.lax.broadcasted_iota(jnp.float32, (rec_height, bucket_width), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (rec_height, bucket_width), 0)
    ones = jnp.ones_like(u)
    grid = jnp.stack([u, v, ones], axis=-1)                   # (h, W, 3)

    def one(Hm, w):
        s = grid @ Hm.T                                       # (h, W, 3)
        denom = s[..., 2]
        denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        x = s[..., 0] / denom
        y = s[..., 1] / denom
        samp = _bilinear_sample(page, x, y)
        mask = (jax.lax.broadcasted_iota(
            jnp.int32, samp.shape, 1) < w)
        return jnp.where(mask, samp, pad_value)

    strips = jax.vmap(one)(Hs, widths)
    return strips, widths


@functools.partial(jax.jit, static_argnames=("rec_height", "bucket_width"))
def warp_quads_multi(
    pages: jnp.ndarray,
    page_ids: jnp.ndarray,
    quads: jnp.ndarray,
    *,
    rec_height: int = 32,
    bucket_width: int = 320,
    pad_value: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pooled multi-page variant (C4): quads may come from different pages.

    pages: (B, H, W) float32 normalized grayscale canvases.
    page_ids: (N,) int32 page index per quad.
    quads: (N, 4, 2) float32 in canvas coords.
    One batched gather for ALL line crops of the whole page batch.
    """
    N = quads.shape[0]
    widths = quad_strip_widths(quads, rec_height, bucket_width)
    heights = jnp.full((N,), rec_height, jnp.int32)
    Hs = solve_homographies(quads, heights, widths)

    u = jax.lax.broadcasted_iota(jnp.float32, (rec_height, bucket_width), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (rec_height, bucket_width), 0)
    grid = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)

    def one(Hm, w, pid):
        page = jax.lax.dynamic_index_in_dim(pages, pid, 0, keepdims=False)
        s = grid @ Hm.T
        denom = s[..., 2]
        denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        samp = _bilinear_sample(page, s[..., 0] / denom, s[..., 1] / denom)
        mask = (jax.lax.broadcasted_iota(
            jnp.int32, samp.shape, 1) < w)
        return jnp.where(mask, samp, pad_value)

    strips = jax.vmap(one)(Hs, widths, page_ids.astype(jnp.int32))
    return strips, widths


@functools.partial(jax.jit, static_argnames=("rec_height", "bucket_width"))
def warp_quads_grouped(
    pages: jnp.ndarray,
    quads: jnp.ndarray,
    *,
    rec_height: int = 32,
    bucket_width: int = 320,
    pad_value: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grouped variant: quads come pre-grouped per page (B, K, 4, 2).

    The nested vmap closes over each page once instead of dynamically
    selecting it per strip (the per-strip page select in warp_quads_multi
    costs a page-sized copy per lane on TPU). Returns
    (strips (B, K, rec_height, bucket_width), widths (B, K)).
    """
    B, K = quads.shape[:2]
    flat = quads.reshape(B * K, 4, 2)
    widths = quad_strip_widths(flat, rec_height, bucket_width).reshape(B, K)
    heights = jnp.full((B * K,), rec_height, jnp.int32)
    Hs = solve_homographies(flat, heights,
                            widths.reshape(-1)).reshape(B, K, 3, 3)

    u = jax.lax.broadcasted_iota(jnp.float32, (rec_height, bucket_width), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (rec_height, bucket_width), 0)
    grid = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)

    def one(page, Hm, w):
        s = grid @ Hm.T
        denom = s[..., 2]
        denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
        samp = _bilinear_sample(page, s[..., 0] / denom, s[..., 1] / denom)
        mask = jax.lax.broadcasted_iota(jnp.int32, samp.shape, 1) < w
        return jnp.where(mask, samp, pad_value)

    strips = jax.vmap(  # over pages
        lambda page, Hs_k, w_k: jax.vmap(
            lambda Hm, w: one(page, Hm, w))(Hs_k, w_k)
    )(pages, Hs, widths)
    return strips, widths


@functools.partial(jax.jit, static_argnames=("rec_height", "bucket_width"))
def warp_quads_separable(
    pages: jnp.ndarray,
    quads: jnp.ndarray,
    *,
    rec_height: int = 32,
    bucket_width: int = 320,
    pad_value: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Separable (MXU) crop+resize of each quad's axis-aligned hull.

    out = Wy @ page @ Wx^T with per-strip bilinear weight matrices — two
    matmuls instead of a 41k-point gather per strip (measured 9x faster on
    TPU: XLA gathers execute near-serially). Exact for axis-aligned quads;
    rotated quads are cropped by their AABB, so the text keeps its rotation
    inside the strip (use warp_quads/_multi for exact rectification of
    heavily rotated lines).

    pages: (B, S, S) float32; quads: (B, K, 4, 2) →
    (strips (B, K, rec_height, bucket_width), widths (B, K)).
    """
    B, K = quads.shape[:2]
    S = pages.shape[-1]
    Hh, W = rec_height, bucket_width
    x0 = quads[..., 0].min(axis=-1)
    x1 = quads[..., 0].max(axis=-1)
    y0 = quads[..., 1].min(axis=-1)
    y1 = quads[..., 1].max(axis=-1)
    widths = jnp.clip(
        jnp.round((x1 - x0 + 1.0) * Hh / jnp.maximum(y1 - y0 + 1.0, 1.0)),
        1, W).astype(jnp.int32)

    vout = jax.lax.broadcasted_iota(jnp.float32, (Hh, 1), 0)
    uout = jax.lax.broadcasted_iota(jnp.float32, (W, 1), 0)
    src = jax.lax.broadcasted_iota(jnp.float32, (1, S), 1)

    def per_page(page, a, b, c, d, wk):
        def one(xa, xb, ya, yb, w):
            ys = ya + vout * (yb - ya) / (Hh - 1.0)           # (Hh, 1)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys - src))    # (Hh, S)
            xs = xa + uout * (xb - xa) / jnp.maximum(
                w.astype(jnp.float32) - 1.0, 1.0)             # (W, 1)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - src))    # (W, S)
            out = (wy @ page) @ wx.T                          # (Hh, W)
            mask = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) < w
            return jnp.where(mask, out, pad_value)
        return jax.vmap(one)(a, b, c, d, wk)

    strips = jax.vmap(per_page)(pages, x0, x1, y0, y1, widths)
    return strips, widths


@functools.partial(jax.jit, static_argnames=(
    "rec_height", "bucket_width", "tile_h"))
def warp_quads_multi_separable(
    pages: jnp.ndarray,
    page_ids: jnp.ndarray,
    quads: jnp.ndarray,
    *,
    rec_height: int = 32,
    bucket_width: int = 320,
    tile_h: int = 128,
    pad_value: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pooled separable (MXU) AABB crop+resize — the fast path of the
    pooled/bucketed warp, mirroring what warp_quads_separable is to the
    fused path.

    warp_quads_multi costs ~1.4 ms/strip on the v5e (measured via
    scripts/diag_rec_fetch.py: 531 pooled strips = ~800 ms device time,
    93% of the bucketed path's dominant stage): a 41k-point bilinear
    gather per strip (XLA TPU gathers execute near-serially) plus a
    per-lane dynamic page select. Here each strip instead
    dynamic-slices a (tile_h, S) row band around its quad's AABB — one
    contiguous block copy — and resamples with two bilinear-weight
    matmuls on the MXU: wy (H, tile_h) @ tile (tile_h, S) @ wx^T
    (S, W). Exact for axis-aligned quads (same mapping as
    warp_quads_separable); callers must route quads that are tilted or
    taller than tile_h to warp_quads_multi (see
    bucketing.recognize_pooled).

    pages: (B, Hp, Wp) float32 normalized canvases.
    page_ids: (N,) int32 page per quad. quads: (N, 4, 2) canvas coords.
    Quads whose AABB height exceeds tile_h are sampled only within the
    tile (rows below it read as the tile's last row) — route them away.
    """
    Hp, Wp = pages.shape[1], pages.shape[2]
    Hh, W, TH = rec_height, bucket_width, min(tile_h, Hp)
    x0 = quads[..., 0].min(axis=-1)
    x1 = quads[..., 0].max(axis=-1)
    y0 = quads[..., 1].min(axis=-1)
    y1 = quads[..., 1].max(axis=-1)
    widths = jnp.clip(
        jnp.round((x1 - x0 + 1.0) * Hh / jnp.maximum(y1 - y0 + 1.0, 1.0)),
        1, W).astype(jnp.int32)
    # tile origin: one row of bilinear slack above the quad, clamped inside
    ty = jnp.clip(jnp.floor(y0) - 1.0, 0.0, float(max(Hp - TH, 0)))

    vout = jax.lax.broadcasted_iota(jnp.float32, (Hh, 1), 0)
    uout = jax.lax.broadcasted_iota(jnp.float32, (W, 1), 0)
    src_y = jax.lax.broadcasted_iota(jnp.float32, (1, TH), 1)
    src_x = jax.lax.broadcasted_iota(jnp.float32, (1, Wp), 1)

    def one(pid, ty_i, xa, xb, ya, yb, w):
        tile = jax.lax.dynamic_slice(
            pages, (pid, ty_i.astype(jnp.int32), 0), (1, TH, Wp))[0]
        ys = (ya - ty_i) + vout * (yb - ya) / (Hh - 1.0)       # (Hh, 1)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys - src_y))       # (Hh, TH)
        xs = xa + uout * (xb - xa) / jnp.maximum(
            w.astype(jnp.float32) - 1.0, 1.0)                  # (W, 1)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs - src_x))       # (W, Wp)
        out = (wy @ tile) @ wx.T                               # (Hh, W)
        mask = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1) < w
        return jnp.where(mask, out, pad_value)

    strips = jax.vmap(one)(page_ids.astype(jnp.int32), ty,
                           x0, x1, y0, y1, widths)
    return strips, widths


@functools.partial(jax.jit, static_argnames=(
    "rec_height", "bucket_width", "tile_h", "margin_fracs",
    "x_margin_keep", "flat_frac", "case_gate"))
def warp_quads_multi_sep_refined(pages, page_ids, quads, bounds, *,
                                 rec_height: int = 32,
                                 bucket_width: int = 320,
                                 tile_h: int = 128,
                                 ink_thresh: float = 0.0,
                                 margin_fracs=None,
                                 x_margin_keep: float = 1.0,
                                 pad_value: float = 0.0, orig_quads=None,
                                 flat_frac: float = 0.0,
                                 case_gate: bool = False
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-pass warp_quads_multi_separable: probe → AABB ink refine →
    re-warp (the pooled twin of the fused path's separable two-pass;
    refine_aabb_to_ink matches the separable warp's linear mapping).
    The refined quad is contained in the expanded probe quad, so the
    pass-2 tile routing constraint is inherited from pass 1."""
    strips, widths = warp_quads_multi_separable(
        pages, page_ids, quads,
        rec_height=rec_height, bucket_width=bucket_width, tile_h=tile_h,
        pad_value=pad_value)
    refined = refine_aabb_to_ink(
        strips, widths, quads, rec_height=rec_height, bounds=bounds,
        ink_thresh=ink_thresh, margin_fracs=margin_fracs,
        x_margin_keep=x_margin_keep, orig_quads=orig_quads,
        flat_frac=flat_frac, case_gate=case_gate)
    return warp_quads_multi_separable(
        pages, page_ids, refined,
        rec_height=rec_height, bucket_width=bucket_width, tile_h=tile_h,
        pad_value=pad_value)


def expand_quads(quads, frac_y: float, frac_x: float, bounds=None):
    """Grow each quad outward by a fraction of its own height.

    Detection boxes carry a +-15%-of-height margin error vs the tight ink box
    (measured: SURVEY.md-style e2e probe); recognition therefore warps an
    EXPANDED crop and re-crops to the ink band on-device
    (snap_strips_to_ink), recovering glyphs the detector clipped. Margins are
    height-scaled on both axes — a long line needs the same few-pixel slack
    as a short one.

    quads: (..., 4, 2) TL,TR,BR,BL (np or jnp). bounds: optional (max_x,
    max_y) array broadcastable against the result — e.g. (2,) scalar page
    bounds, or (N, 1, 2) per-quad — clipped against so expansion never
    samples canvas padding.
    """
    xp = jnp if isinstance(quads, jnp.ndarray) else __import__("numpy")
    down = (quads[..., 3, :] + quads[..., 2, :]) \
        - (quads[..., 0, :] + quads[..., 1, :])              # 2·(bottom-top)
    h = xp.sqrt(xp.maximum((down * down).sum(-1), 1e-12)) * 0.5  # (...,)
    ey = down / (2.0 * h[..., None])                         # unit down vec
    right = (quads[..., 1, :] + quads[..., 2, :]) \
        - (quads[..., 0, :] + quads[..., 3, :])
    wlen = xp.sqrt(xp.maximum((right * right).sum(-1), 1e-12)) * 0.5
    ex = right / (2.0 * wlen[..., None])                     # unit right vec
    my = (frac_y * h)[..., None, None] * ey[..., None, :]    # (..., 1, 2)
    mx = (frac_x * h)[..., None, None] * ex[..., None, :]
    sy = xp.asarray([-1.0, -1.0, 1.0, 1.0]).reshape(
        (1,) * (quads.ndim - 2) + (4, 1))
    sx = xp.asarray([-1.0, 1.0, 1.0, -1.0]).reshape(
        (1,) * (quads.ndim - 2) + (4, 1))
    out = quads + sy * my + sx * mx
    if bounds is not None:
        out = xp.clip(out, 0.0, xp.asarray(bounds, out.dtype))
    return out


def ink_boxes(strips: jnp.ndarray, widths: jnp.ndarray,
              *, ink_thresh: float = 0.0, min_count: int = 2,
              pad_y: float = 2.0, pad_x: float = 3.0,
              x_lo=None, x_hi=None, gap_fill: float = 0.10,
              flat_frac: float = 0.0, line_h=None):
    """Per-strip padded bbox of the ink band containing the vertical center.

    The contiguous-run-through-center rule rejects fragments of NEIGHBORING
    lines that an expanded crop pulls in at the strip's top/bottom edge.
    x_lo/x_hi (optional, (N,) float strip coords) bound the columns that may
    count as ink — the horizontal mirror of that rule: a side-neighbor's
    glyph edge inside the expansion margin would otherwise stretch the band
    (and decode as a phantom '|'-class character). Returns (x0, y0, x1, y1,
    ok) — float strip coords (may poke outside the strip by the pads;
    samplers clamp), ok=False where no ink was found.

    gap_fill: before taking the center run, blank row-runs of length
    <= max(2, gap_fill*H) WITH INK ON BOTH SIDES are closed. Underscores
    (and stacked diacritics) are same-line ink separated from the glyph
    body by a small blank gap — ~2 rows at H=32 for DejaVu '_' on a line
    with no other descenders — and the plain contiguous rule cropped them
    out, decoding '_' as ' '. Closing is bounded by the outermost ink, so
    a neighbor fragment separated by more than the gap stays rejected.

    Returns (x0, y0, x1, y1, ok, flat): flat is the per-strip mask of
    bands the flat-band rescale below actually fired on (all-False when
    flat_frac == 0) — callers use it to keep flat-specific geometry
    (e.g. the bounds translation) away from non-flat strips.

    flat_frac > 0 enables the FLAT-BAND (x-height-aware) rescale
    (cfg.rec_flat_band_frac): when every glyph in the strip shares the
    same ink top AND bottom (segmented by blank columns; tolerance
    0.18·band), the band box is expanded about its center so the ink
    renders at flat_frac of the strip height instead of full height.
    Training strips render ink centered at font-proportional size
    (x-height ≈ 0.40·H, caps ≈ 0.52·H — synth.render_line), so blowing a
    1-3-glyph uniform-height band to full height is out-of-distribution
    and erases the case-size cue (x→X — DESIGN.md §4e). Per-glyph (not
    per-column) structure is used because a glyph's own outline ('x', 'o')
    makes column profiles non-flat; any ascender/descender/mixed-case
    content breaks per-glyph uniformity and keeps the full-band mapping.

    line_h (optional, (N,) float strip rows): the full detector-box line
    height per strip — enables the CASE-AWARE condition (utils.flatband
    .FLAT_CASE_MAX_FRAC): only bands at x-height scale relative to the
    line (band ≤ 0.46·line_h) rescale; caps/digit bands near full line
    height keep the full-band mapping (VERDICT r4 next #3 — rescaling
    caps created 'YO'→'Y0' shape-twin drift).
    """
    N, H, W = strips.shape
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)
    col_in = col_idx < widths[:, None]
    if x_lo is not None:
        col_in &= col_idx.astype(jnp.float32) >= x_lo[:, None]
    if x_hi is not None:
        col_in &= col_idx.astype(jnp.float32) <= x_hi[:, None]
    ink = (strips < ink_thresh) & col_in[:, None, :]          # (N, H, W)

    # --- row band: contiguous ink-row run containing the center row -------
    rows = jnp.sum(ink, axis=2) >= min_count                  # (N, H)
    r = jnp.arange(H)
    if gap_fill > 0:
        G = max(int(round(gap_fill * H)), 2)
        la = jax.lax.cummax(jnp.where(rows, r[None, :], -4 * H), axis=1)
        fb = jnp.flip(jax.lax.cummin(
            jnp.flip(jnp.where(rows, r[None, :], 4 * H), 1), axis=1), 1)
        # blank row between ink rows: run length = da + db - 1
        rows = rows | ((r[None, :] - la) + (fb - r[None, :]) <= G + 1)
    center = H // 2
    empty = ~rows
    last_empty_above = jax.lax.cummax(
        jnp.where(empty, r[None, :], -1), axis=1)
    first_empty_below = jnp.flip(jax.lax.cummin(
        jnp.flip(jnp.where(empty, r[None, :], H), 1), axis=1), 1)
    band_y0 = last_empty_above[:, center] + 1
    band_y1 = first_empty_below[:, center] - 1
    band_ok = band_y1 >= band_y0
    # fallback: global row bbox (text line sits off-center in the strip)
    any_row = rows.any(axis=1)
    g_y0 = jnp.argmax(rows, axis=1)
    g_y1 = H - 1 - jnp.argmax(jnp.flip(rows, 1), axis=1)
    y0 = jnp.where(band_ok, band_y0, g_y0).astype(jnp.float32)
    y1 = jnp.where(band_ok, band_y1, g_y1).astype(jnp.float32)

    # --- column bbox inside the row band -----------------------------------
    band = (r[None, :] >= y0[:, None]) & (r[None, :] <= y1[:, None])
    ink_band = ink & band[:, :, None]
    cols = jnp.sum(ink_band, axis=1) >= 1                     # (N, W)
    any_col = cols.any(axis=1)
    x0 = jnp.argmax(cols, axis=1).astype(jnp.float32)
    x1 = (W - 1 - jnp.argmax(jnp.flip(cols, 1), axis=1)).astype(jnp.float32)
    ok = (band_ok | any_row) & any_col

    if flat_frac > 0.0:
        # per-column first/last ink row, then per-GLYPH extrema via
        # blank-column segmentation (glyph id = running count of
        # blank→ink column transitions)
        top = jnp.where(cols, jnp.argmax(ink_band, axis=1),
                        H).astype(jnp.float32)
        bot = jnp.where(
            cols, H - 1 - jnp.argmax(jnp.flip(ink_band, 1), axis=1),
            -1).astype(jnp.float32)
        prev = jnp.concatenate(
            [jnp.zeros_like(cols[:, :1]), cols[:, :-1]], axis=1)
        seg = jnp.clip(jnp.cumsum(cols & ~prev, axis=1) - 1, 0, W - 1)
        gtop = jax.vmap(lambda t, s: jax.ops.segment_min(
            t, s, num_segments=W))(jnp.where(cols, top, jnp.inf), seg)
        gbot = jax.vmap(lambda b, s: jax.ops.segment_max(
            b, s, num_segments=W))(jnp.where(cols, bot, -jnp.inf), seg)
        gv = jnp.isfinite(gtop)
        t_spread = (jnp.max(jnp.where(gv, gtop, -jnp.inf), axis=1)
                    - jnp.min(jnp.where(gv, gtop, jnp.inf), axis=1))
        b_spread = (jnp.max(jnp.where(gv, gbot, -jnp.inf), axis=1)
                    - jnp.min(jnp.where(gv, gbot, jnp.inf), axis=1))
        from ocrjax.utils.flatband import FLAT_MAX_GLYPHS, FLAT_TOL_FRAC
        ih = y1 - y0 + 1.0
        tol = jnp.maximum(2.0, FLAT_TOL_FRAC * ih)
        # ≤FLAT_MAX_GLYPHS segments only: the measured error class is
        # 1-3-glyph strips (scripts/eval_xheight.py); on LONGER uniform
        # strings (all-caps/digit runs) the shrink measurably hurt the
        # straight tier (0.9758 → 0.9699 ungated), while ≥4-glyph strips
        # carry enough shape context to decode at full height. The
        # constants + the numpy host/training twins live in
        # utils/flatband (train/serve consistency).
        n_glyphs = jnp.sum(gv, axis=1)
        flat = (ok & (t_spread <= tol) & (b_spread <= tol)
                & (n_glyphs <= FLAT_MAX_GLYPHS))
        if line_h is not None:
            from ocrjax.utils.flatband import FLAT_CASE_MAX_FRAC
            flat &= ih <= FLAT_CASE_MAX_FRAC * line_h
        yc = (y0 + y1) * 0.5
        half = ih / (2.0 * flat_frac)
        y0 = jnp.where(flat, yc - half, y0)
        y1 = jnp.where(flat, yc + half, y1)
    else:
        flat = jnp.zeros((N,), bool)
    return x0 - pad_x, y0 - pad_y, x1 + pad_x, y1 + pad_y, ok, flat


def _ink_x_window(widths, m_left, m_right, keep: float):
    """Allowed ink-column window for the refines: the unexpanded det box
    starts m_left/m_right strip-px in from each side; ink may extend
    keep·margin beyond it. keep=1 admits the whole expansion margin
    (neighbor-leak prone); keep≈0.5 still recovers clipped glyph slivers
    while rejecting side-neighbor ink (calibrated in tests/test_tpu e2e
    gates). Margins are PER SIDE: expand_quads clamps against page bounds,
    so a line at the page edge has a smaller applied margin there — masking
    the nominal margin would swallow genuine edge-glyph columns."""
    return (m_left * (1.0 - keep),
            widths.astype(jnp.float32) - 1.0 - m_right * (1.0 - keep))


def _applied_x_margins(exp_quads, orig_quads):
    """Per-side expansion margins actually applied, in page px: the original
    quad's left/right edge midpoints projected onto the expanded quad's
    x-direction, measured from the expanded edges. Clamping (expand_quads
    bounds) shows up here as a reduced margin on the clamped side."""
    right = (exp_quads[:, 1] + exp_quads[:, 2]) \
        - (exp_quads[:, 0] + exp_quads[:, 3])
    wlen = jnp.sqrt(jnp.maximum((right * right).sum(-1), 1e-12))
    ex = right / wlen[:, None]                               # unit x dir
    ml_o = (orig_quads[:, 0] + orig_quads[:, 3]) * 0.5       # left edge mid
    ml_e = (exp_quads[:, 0] + exp_quads[:, 3]) * 0.5
    mr_o = (orig_quads[:, 1] + orig_quads[:, 2]) * 0.5       # right edge mid
    mr_e = (exp_quads[:, 1] + exp_quads[:, 2]) * 0.5
    m_left = jnp.maximum(((ml_o - ml_e) * ex).sum(-1), 0.0)
    m_right = jnp.maximum(((mr_e - mr_o) * ex).sum(-1), 0.0)
    return m_left, m_right


def _shift_into_bounds(quads: jnp.ndarray, bounds) -> jnp.ndarray:
    """Translate each quad to fit [0, bounds] BEFORE the clip: the
    flat-band expansion (ink_boxes flat_frac) can push a refined box past
    the page/tile bound, and clipping alone would cut it — the band then
    renders off-center and larger than flat_frac, exactly the geometry
    the rescale exists to avoid (header/footer lines). Translation
    preserves the box SIZE (the scale cue); boxes already inside their
    bounds shift by zero, so this is a no-op for every non-expanded
    refinement (the probe quad was bounds-clamped by expand_quads)."""
    b = jnp.asarray(bounds, quads.dtype)
    lo = jnp.maximum(0.0, -jnp.min(quads, axis=-2, keepdims=True))
    hi = jnp.maximum(0.0, jnp.max(quads, axis=-2, keepdims=True) - b)
    return quads + lo - hi


def refine_quads_to_ink(strips: jnp.ndarray, widths: jnp.ndarray,
                        quads: jnp.ndarray, *, rec_height: int,
                        ink_thresh: float = 0.0, min_count: int = 2,
                        pad_y: float = 2.0, pad_x: float = 3.0,
                        bounds=None, margin_fracs=None,
                        x_margin_keep: float = 1.0,
                        orig_quads=None,
                        flat_frac: float = 0.0,
                        case_gate: bool = False) -> jnp.ndarray:
    """Two-pass warp refinement, homography variant (warp_quads/_multi).

    Pass 1 warps an EXPANDED detection quad (see expand_quads) into a probe
    strip; this maps the probe's ink band back through the SAME pass-1
    homography into page coords. Re-warping the refined quad samples the
    page at full resolution — unlike snapping the probe strip itself, which
    upscales pixels the loose pass-1 crop already blurred (measured: strip-
    space snap cost 0.2 line-exact e2e; two-pass refine is lossless).

    strips/widths: pass-1 output for `quads`. margin_fracs: the (frac_y,
    frac_x) the quads were expanded by — with x_margin_keep < 1 this bounds
    how far the ink band may reach into the expansion margin (see
    _ink_x_window). orig_quads (the pre-expansion detection quads, when
    available) makes that window use the ACTUALLY-APPLIED per-side margins,
    so page-edge lines whose expansion was clamped keep their edge glyphs.
    Returns refined quads; strips with no detectable ink keep their
    original quad.
    """
    N, H, W = strips.shape
    x_lo = x_hi = None
    if margin_fracs is not None and x_margin_keep < 1.0:
        fy, fx = margin_fracs
        w_exp = jnp.sqrt(jnp.sum((quads[:, 1] - quads[:, 0]) ** 2, -1))
        to_strip = (widths.astype(jnp.float32) - 1.0) \
            / jnp.maximum(w_exp, 1.0)
        if orig_quads is not None:
            m_l, m_r = _applied_x_margins(quads, orig_quads)
            m_l, m_r = m_l * to_strip, m_r * to_strip
        else:
            h_exp = jnp.sqrt(jnp.sum((quads[:, 3] - quads[:, 0]) ** 2, -1))
            h_orig = h_exp / (1.0 + 2.0 * fy)
            m_l = m_r = fx * h_orig * to_strip
        x_lo, x_hi = _ink_x_window(widths, m_l, m_r, x_margin_keep)
    line_h = None
    if flat_frac > 0.0 and case_gate:
        # full line height in strip rows for the case-aware flat gate:
        # the strip's H rows span the EXPANDED quad height, so the
        # detector-box line height is H·h_orig/h_exp (nominal
        # H/(1+2·fy) when the pre-expansion quads are unavailable)
        h_exp = jnp.sqrt(jnp.sum((quads[:, 3] - quads[:, 0]) ** 2, -1))
        if orig_quads is not None:
            h_orig = jnp.sqrt(jnp.sum(
                (orig_quads[:, 3] - orig_quads[:, 0]) ** 2, -1))
            line_h = H * h_orig / jnp.maximum(h_exp, 1e-6)
        elif margin_fracs is not None:
            line_h = jnp.full((N,), H / (1.0 + 2.0 * margin_fracs[0]))
    x0, y0, x1, y1, ok, flat = ink_boxes(
        strips, widths, ink_thresh=ink_thresh, min_count=min_count,
        pad_y=pad_y, pad_x=pad_x, x_lo=x_lo, x_hi=x_hi,
        flat_frac=flat_frac, line_h=line_h)
    heights = jnp.full((N,), rec_height, jnp.int32)
    Hs = solve_homographies(quads, heights, widths)           # strip→page
    us = jnp.stack([x0, x1, x1, x0], axis=1)                  # (N, 4)
    vs = jnp.stack([y0, y0, y1, y1], axis=1)
    pts = jnp.stack([us, vs, jnp.ones_like(us)], axis=-1)     # (N, 4, 3)
    proj = jnp.einsum("nij,nkj->nki", Hs, pts)
    denom = proj[..., 2:]
    denom = jnp.where(jnp.abs(denom) < 1e-6, 1e-6, denom)
    refined = proj[..., :2] / denom
    refined = jnp.where(ok[:, None, None], refined, quads)
    if bounds is not None:
        if flat_frac > 0.0:
            # translate ONLY the flat-expanded strips into bounds (the
            # expansion may poke past the page/tile edge and clipping
            # would destroy the size cue); non-flat refinements keep the
            # pre-existing clip-only behavior (ADVICE r4: the shift ran
            # on every refined quad once rec_flat_band_frac > 0)
            refined = jnp.where(flat[:, None, None],
                                _shift_into_bounds(refined, bounds),
                                refined)
        refined = jnp.clip(refined, 0.0, jnp.asarray(bounds, refined.dtype))
    return refined


def refine_aabb_to_ink(strips: jnp.ndarray, widths: jnp.ndarray,
                       quads: jnp.ndarray, *, rec_height: int,
                       ink_thresh: float = 0.0, min_count: int = 2,
                       pad_y: float = 2.0, pad_x: float = 3.0,
                       bounds=None, margin_fracs=None,
                       x_margin_keep: float = 1.0,
                       orig_quads=None,
                       flat_frac: float = 0.0,
                       case_gate: bool = False) -> jnp.ndarray:
    """Two-pass refinement, AABB variant (matches warp_quads_separable's
    linear strip↔page mapping). quads (N, 4, 2) → refined RECT quads.
    margin_fracs/x_margin_keep/orig_quads: see refine_quads_to_ink."""
    N, H, W = strips.shape
    xa = quads[..., 0].min(axis=-1)
    xb = quads[..., 0].max(axis=-1)
    ya = quads[..., 1].min(axis=-1)
    yb = quads[..., 1].max(axis=-1)
    sy = (yb - ya) / (rec_height - 1.0)
    sx = (xb - xa) / jnp.maximum(widths.astype(jnp.float32) - 1.0, 1.0)
    x_lo = x_hi = None
    if margin_fracs is not None and x_margin_keep < 1.0:
        fy, fx = margin_fracs
        if orig_quads is not None:
            m_l = jnp.maximum(
                orig_quads[..., 0].min(axis=-1) - xa, 0.0) \
                / jnp.maximum(sx, 1e-6)
            m_r = jnp.maximum(
                xb - orig_quads[..., 0].max(axis=-1), 0.0) \
                / jnp.maximum(sx, 1e-6)
        else:
            h_orig = (yb - ya) / (1.0 + 2.0 * fy)
            m_l = m_r = fx * h_orig / jnp.maximum(sx, 1e-6)
        x_lo, x_hi = _ink_x_window(widths, m_l, m_r, x_margin_keep)
    line_h = None
    if flat_frac > 0.0 and case_gate:
        # case-aware flat gate: detector-box line height in strip rows
        # (sy maps strip rows to page y — see refine_quads_to_ink)
        if orig_quads is not None:
            o_h = (orig_quads[..., 1].max(axis=-1)
                   - orig_quads[..., 1].min(axis=-1))
            line_h = o_h / jnp.maximum(sy, 1e-6)
        elif margin_fracs is not None:
            line_h = jnp.full((N,), H / (1.0 + 2.0 * margin_fracs[0]))
    xs0, ys0, xs1, ys1, ok, flat = ink_boxes(
        strips, widths, ink_thresh=ink_thresh, min_count=min_count,
        pad_y=pad_y, pad_x=pad_x, x_lo=x_lo, x_hi=x_hi,
        flat_frac=flat_frac, line_h=line_h)
    ya2 = ya + ys0 * sy
    yb2 = ya + ys1 * sy
    xa2 = xa + xs0 * sx
    xb2 = xa + xs1 * sx
    refined = jnp.stack([
        jnp.stack([xa2, ya2], -1), jnp.stack([xb2, ya2], -1),
        jnp.stack([xb2, yb2], -1), jnp.stack([xa2, yb2], -1)], axis=-2)
    refined = jnp.where(ok[:, None, None], refined, quads)
    if bounds is not None:
        if flat_frac > 0.0:
            # flat strips only — see refine_quads_to_ink (ADVICE r4)
            refined = jnp.where(flat[:, None, None],
                                _shift_into_bounds(refined, bounds),
                                refined)
        refined = jnp.clip(refined, 0.0, jnp.asarray(bounds, refined.dtype))
    return refined


@jax.jit
def snap_strips_to_ink(strips: jnp.ndarray, widths: jnp.ndarray,
                       *, ink_thresh: float = 0.0, min_count: int = 2,
                       pad_y: float = 2.0, pad_x: float = 3.0
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Re-crop each strip to the ink band containing its vertical center.

    Strip-space resample: cheap, but upscaling re-blurs detail the pass-1
    warp already lost — prefer the two-pass refine_quads_to_ink /
    refine_aabb_to_ink + re-warp when the source page is available.

    strips: (N, H, W) float32, normalized grayscale (ink < ink_thresh <
    background; zero beyond each strip's width). Returns (snapped strips,
    new widths); strips with no detectable ink pass through unchanged.
    """
    N, H, W = strips.shape
    x0, y0, x1, y1, ok, _flat = ink_boxes(
        strips, widths, ink_thresh=ink_thresh, min_count=min_count,
        pad_y=pad_y, pad_x=pad_x)

    # --- padded source box → aspect-preserving affine resample -------------
    src_h = y1 - y0 + 1.0
    src_w = x1 - x0 + 1.0
    s = jnp.minimum(H / src_h, W / src_w)     # cap: never overflow the bucket
    new_w = jnp.clip(jnp.round(src_w * s), 1, W).astype(jnp.int32)
    new_h = jnp.clip(jnp.round(src_h * s), 1, H).astype(jnp.int32)

    oy = (jnp.arange(H)[None, :] + 0.5) / s[:, None] + y0[:, None] - 0.5
    ox = (jnp.arange(W)[None, :] + 0.5) / s[:, None] + x0[:, None] - 0.5

    def one(img, xs, ys, nw, nh, okk, w_old):
        X = jnp.broadcast_to(xs[None, :], (H, W))
        Y = jnp.broadcast_to(ys[:, None], (H, W))
        out = _bilinear_sample(img, X, Y)
        keep = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 1) < nw) \
            & (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) < nh)
        return jnp.where(okk, jnp.where(keep, out, 0.0), img), \
            jnp.where(okk, nw, w_old)

    return jax.vmap(one)(strips, ox, oy, new_w, new_h, ok, widths)


@functools.partial(jax.jit, static_argnames=(
    "rec_height", "bucket_width", "margin_fracs", "x_margin_keep",
    "flat_frac", "case_gate"))
def warp_quads_refined(page, quads, bounds, *, rec_height: int = 32,
                       bucket_width: int = 320, ink_thresh: float = 0.0,
                       margin_fracs=None, x_margin_keep: float = 1.0,
                       pad_value: float = 0.0, orig_quads=None,
                       flat_frac: float = 0.0,
                       case_gate: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-pass warp_quads: probe → ink-band refine → full-res re-warp.

    quads should already be EXPANDED (expand_quads) so clipped glyphs fall
    inside the probe. bounds: (2,) or (N, 1, 2) page-valid (max_x, max_y).
    ink_thresh: normalized value below which a pixel is ink — for a page
    normalized as (luma/255 - mean)/std that is (0.5 - mean)/std.
    margin_fracs/x_margin_keep/orig_quads: see refine_quads_to_ink.
    """
    strips, widths = warp_quads(
        page, quads, rec_height=rec_height, bucket_width=bucket_width,
        pad_value=pad_value)
    refined = refine_quads_to_ink(
        strips, widths, quads, rec_height=rec_height, bounds=bounds,
        ink_thresh=ink_thresh, margin_fracs=margin_fracs,
        x_margin_keep=x_margin_keep, orig_quads=orig_quads,
        flat_frac=flat_frac, case_gate=case_gate)
    return warp_quads(
        page, refined, rec_height=rec_height, bucket_width=bucket_width,
        pad_value=pad_value)


@functools.partial(jax.jit, static_argnames=(
    "rec_height", "bucket_width", "margin_fracs", "x_margin_keep",
    "flat_frac", "case_gate"))
def warp_quads_multi_refined(pages, page_ids, quads, bounds, *,
                             rec_height: int = 32, bucket_width: int = 320,
                             ink_thresh: float = 0.0,
                             margin_fracs=None, x_margin_keep: float = 1.0,
                             pad_value: float = 0.0, orig_quads=None,
                             flat_frac: float = 0.0,
                             case_gate: bool = False
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-pass warp_quads_multi (pooled strips from a page batch)."""
    strips, widths = warp_quads_multi(
        pages, page_ids, quads,
        rec_height=rec_height, bucket_width=bucket_width,
        pad_value=pad_value)
    refined = refine_quads_to_ink(
        strips, widths, quads, rec_height=rec_height, bounds=bounds,
        ink_thresh=ink_thresh, margin_fracs=margin_fracs,
        x_margin_keep=x_margin_keep, orig_quads=orig_quads,
        flat_frac=flat_frac, case_gate=case_gate)
    return warp_quads_multi(
        pages, page_ids, refined,
        rec_height=rec_height, bucket_width=bucket_width,
        pad_value=pad_value)


# ---------------------------------------------------------------------------
# Curved-baseline rectification (r5, VERDICT r4 next #6)
# ---------------------------------------------------------------------------

def dewarp_curl(strips: jnp.ndarray, widths: jnp.ndarray, *,
                ink_thresh: float = 0.0, segments: int = 16,
                min_dev_px: float = 2.0, max_shift_px: float = 10.0,
                pad_value: float = 0.0):
    """Straighten curved text baselines in warped strips (page curl /
    strong keystone — the r4 projective tier's residual error class:
    det_recall 1.0 at every severity but line-exact 0.899 at 1.0, because
    the homography rectification cannot normalize a BOWED baseline,
    DESIGN.md §4g).

    Per strip: (1) column-wise ink ENVELOPE MIDPOINTS (mean of first and
    last ink row — less typography-sensitive than the ink mass center,
    which over-weights tall glyphs); (2) closed-form least-squares
    quadratic fit over inked columns; (3) ONLY the fit's QUADRATIC
    component becomes the vertical displacement field δ(x): the pass-1
    homography already normalizes linear tilt, and the dangerous
    false-positive class — systematic ascender/descender sorting inside
    a straight line ('lll ppp') — shows up as a LINEAR midline trend
    that must not be "corrected" (it encodes case/height cues), while
    page curl is a bow. δ is applied as a piecewise-linear column
    shift.

    TPU mechanics: the resample never gathers. δ is sampled at
    `segments`+1 node columns; each node gets a bilinear one-hot (H, H)
    row matrix, each of the `segments` column blocks is contracted with
    its two flanking node matrices on the MXU, and the block's columns
    lerp between the two results — an exact piecewise-(bi)linear
    displacement warp built from reshapes + small matmuls (the same
    no-gather discipline as flip_strips_by_width / the CTC compaction).

    The STRAIGHT-tier guarantee: strips whose fitted peak-to-peak
    deviation is below min_dev_px get δ≡0, and a zero shift yields
    bit-exact identity one-hots — flat text is untouched. Deviations
    clamp to ±max_shift_px. Returns (strips, curved mask).
    """
    N, H, W = strips.shape
    if W % segments:
        segments = max(1, W // (W // segments + 1))
        while W % segments:
            segments -= 1
    S = segments
    cols = jnp.arange(W, dtype=jnp.float32)
    rows = jnp.arange(H, dtype=jnp.float32)
    col_in = cols[None, :] < widths[:, None].astype(jnp.float32)
    ink = (strips < ink_thresh) & col_in[:, None, :]           # (N, H, W)

    cnt = jnp.sum(ink, axis=1).astype(jnp.float32)             # (N, W)
    top = jnp.where(cnt > 0, jnp.argmax(ink, axis=1).astype(jnp.float32),
                    0.0)
    bot = jnp.where(cnt > 0,
                    (H - 1 - jnp.argmax(ink[:, ::-1, :], axis=1)
                     ).astype(jnp.float32), 0.0)
    v = (cnt >= 1.0) & col_in                                  # inked cols

    # normalized x in [-1, 1] over each strip's valid width
    xn = (cols[None, :] / jnp.maximum(
        widths[:, None].astype(jnp.float32) - 1.0, 1.0)) * 2.0 - 1.0
    phi = jnp.stack([jnp.ones_like(xn), xn, xn * xn], axis=-1)  # (N, W, 3)
    vw = v.astype(jnp.float32)[..., None]
    A = jnp.einsum("nwi,nwj->nij", phi * vw, phi)              # (N, 3, 3)
    A = A + 1e-3 * jnp.eye(3)[None]
    # separate quadratic fits of the TOP and BOTTOM ink envelopes: true
    # page curl displaces both equally, while typography (ascender/
    # descender distribution along the line) bends them differently —
    # 'ppp' dips only the bottom, 'lll' only the top. Requiring the two
    # curvatures to AGREE kills the straight-page false fires that a
    # midpoint-only fit suffered (measured: −8 pts straight line-exact
    # from quadratic fits of ordinary mixed-height text).
    b_top = jnp.einsum("nwi,nw->ni", phi * vw, top)
    b_bot = jnp.einsum("nwi,nw->ni", phi * vw, bot)
    c_top = jnp.linalg.solve(A, b_top[..., None])[..., 0]      # (N, 3)
    c_bot = jnp.linalg.solve(A, b_bot[..., None])[..., 0]
    a_top, a_bot = c_top[:, 2], c_bot[:, 2]
    coef = 0.5 * (c_top + c_bot)

    # quadratic component only: q(x) = a·(x² − mean_v x²)
    n_v = jnp.maximum(jnp.sum(vw[..., 0], axis=1), 1.0)
    x2 = xn * xn
    x2_mean = jnp.sum(jnp.where(v, x2, 0.0), axis=1) / n_v
    quad = coef[:, 2:3] * (x2 - x2_mean[:, None])              # (N, W)
    delta = jnp.clip(quad, -max_shift_px, max_shift_px)
    dev_pp = (jnp.max(jnp.where(v, quad, -jnp.inf), axis=1)
              - jnp.min(jnp.where(v, quad, jnp.inf), axis=1))
    enough = jnp.sum(vw[..., 0], axis=1) >= 16.0  # fit needs support
    agree = ((a_top * a_bot > 0.0)
             & (jnp.abs(a_top - a_bot)
                <= 0.6 * jnp.maximum(jnp.abs(a_top), jnp.abs(a_bot))))
    curved = (jnp.isfinite(dev_pp) & (dev_pp >= min_dev_px)
              & enough & agree)
    delta = jnp.where(curved[:, None], delta, 0.0)

    # ---- piecewise-linear displacement via segment node matmuls ----------
    Wb = W // S
    node_cols = jnp.clip(jnp.arange(S + 1) * Wb, 0, W - 1)     # (S+1,)
    d_nodes = delta[:, node_cols]                              # (N, S+1)
    lo = jnp.floor(d_nodes)
    f = d_nodes - lo                                           # (N, S+1)
    ii = rows[None, None, :, None]                             # 1,1,H,1
    hh = jnp.arange(H)[None, None, None, :]                    # 1,1,1,H
    src0 = jnp.clip(ii + lo[:, :, None, None], 0, H - 1)
    src1 = jnp.clip(ii + lo[:, :, None, None] + 1.0, 0, H - 1)
    R = ((hh == src0) * (1.0 - f[:, :, None, None])
         + (hh == src1) * f[:, :, None, None])                 # (N,S+1,H,H)
    blocks = strips.reshape(N, H, S, Wb)
    left = jnp.einsum("nsih,nhsw->nisw", R[:, :-1], blocks,
                      precision=jax.lax.Precision.HIGHEST)
    right = jnp.einsum("nsih,nhsw->nisw", R[:, 1:], blocks,
                       precision=jax.lax.Precision.HIGHEST)
    t = (jnp.arange(Wb, dtype=jnp.float32) / float(Wb))[None, None, None, :]
    out = ((1.0 - t) * left + t * right).reshape(N, H, W)
    out = jnp.where(col_in[:, None, :], out, pad_value)
    return jnp.where(curved[:, None, None], out, strips), curved


def maybe_dewarp_curl(strips: jnp.ndarray, widths: jnp.ndarray, cfg
                      ) -> jnp.ndarray:
    """Config-gated dewarp_curl on normalized strips (the shared insertion
    point of the three rec entries: staged/pooled _rec_strips_jit, the C1
    _rec_step programs, and the fused e2e program)."""
    if not getattr(cfg, "rec_dewarp_curl", False):
        return strips
    out, _ = dewarp_curl(
        strips, widths,
        ink_thresh=(0.5 - cfg.rec_mean) / cfg.rec_std,
        min_dev_px=cfg.rec_dewarp_min_dev_px,
        max_shift_px=cfg.rec_dewarp_max_px,
        pad_value=(0.0 - cfg.rec_mean) / cfg.rec_std)
    return out
