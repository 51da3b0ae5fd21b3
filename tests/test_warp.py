"""Batched warp vs cv2.warpPerspective oracle (SURVEY.md §4.2)."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from ocrjax.ops.warp import (quad_strip_widths, solve_homographies,
                             warp_quads)


def _checker(h, w, cell=8):
    y, x = np.mgrid[0:h, 0:w]
    return (((x // cell) + (y // cell)) % 2).astype(np.float32)


def test_axis_aligned_crop_matches_slice():
    page = np.asarray(
        np.random.RandomState(0).rand(128, 128), np.float32)
    # quad = exact pixel rect (TL TR BR BL), height 32, width 64
    quad = np.array([[[10, 20], [73, 20], [73, 51], [10, 51]]], np.float32)
    strips, widths = warp_quads(
        jnp.asarray(page), jnp.asarray(quad), rec_height=32, bucket_width=64)
    assert int(widths[0]) == 64
    got = np.asarray(strips)[0]
    want = page[20:52, 10:74]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rotated_quad_matches_cv2():
    page = _checker(160, 160)
    # 45°-rotated rectangle
    c, s = np.cos(np.pi / 6), np.sin(np.pi / 6)
    center = np.array([80, 80])
    hw, hh = 40.0, 12.0
    corners = np.array([[-hw, -hh], [hw, -hh], [hw, hh], [-hw, hh]])
    R = np.array([[c, -s], [s, c]])
    quad = (corners @ R.T + center).astype(np.float32)[None]

    strips, widths = warp_quads(
        jnp.asarray(page), jnp.asarray(quad), rec_height=32, bucket_width=128)
    w = int(widths[0])
    got = np.asarray(strips)[0][:, :w]

    dst = np.array([[0, 0], [w - 1, 0], [w - 1, 31], [0, 31]], np.float32)
    M = cv2.getPerspectiveTransform(quad[0], dst)
    want = cv2.warpPerspective(page, M, (w, 32), flags=cv2.INTER_LINEAR)
    # interiors must agree; borders differ by clamp-vs-constant policy
    diff = np.abs(got[2:-2, 2:-2] - want[2:-2, 2:-2])
    assert np.mean(diff) < 0.02, np.mean(diff)


def test_strip_width_aspect():
    quad = np.array([[[0, 0], [99, 0], [99, 19], [0, 19]]], np.float32)
    w = quad_strip_widths(jnp.asarray(quad), 32, 512)
    # 100x20 quad at height 32 → width ~160
    assert abs(int(w[0]) - 160) <= 4


def test_width_clipped_to_bucket():
    quad = np.array([[[0, 0], [499, 0], [499, 19], [0, 19]]], np.float32)
    w = quad_strip_widths(jnp.asarray(quad), 32, 128)
    assert int(w[0]) == 128


def test_mask_beyond_width_is_zero():
    page = np.ones((64, 64), np.float32)
    quad = np.array([[[0, 0], [31, 0], [31, 31], [0, 31]]], np.float32)
    strips, widths = warp_quads(
        jnp.asarray(page), jnp.asarray(quad), rec_height=32, bucket_width=64)
    w = int(widths[0])
    s = np.asarray(strips)[0]
    assert np.all(s[:, w:] == 0.0)
    assert np.all(s[:, :w] > 0.9)


def test_degenerate_quad_no_nan():
    page = np.ones((64, 64), np.float32)
    quad = np.zeros((1, 4, 2), np.float32)  # all corners identical
    strips, widths = warp_quads(
        jnp.asarray(page), jnp.asarray(quad), rec_height=32, bucket_width=64)
    assert np.all(np.isfinite(np.asarray(strips)))


def test_homography_roundtrip_corners():
    quad = np.array([[[15, 10], [90, 22], [85, 60], [12, 48]]], np.float32)
    widths = jnp.array([64], jnp.int32)
    heights = jnp.array([32], jnp.int32)
    H = np.asarray(solve_homographies(jnp.asarray(quad), heights, widths))[0]
    dst = np.array([[0, 0, 1], [63, 0, 1], [63, 31, 1], [0, 31, 1]],
                   np.float32)
    mapped = dst @ H.T
    mapped = mapped[:, :2] / mapped[:, 2:3]
    np.testing.assert_allclose(mapped, quad[0], atol=0.05)


def test_multi_separable_matches_grouped_separable():
    """The pooled separable warp (dynamic row tile + matmuls) is the same
    mapping as warp_quads_separable — identical strips when the pooled
    (page_ids, quads) layout mirrors the grouped one."""
    from ocrjax.ops.warp import (warp_quads_multi_separable,
                                 warp_quads_separable)

    rng = np.random.RandomState(5)
    pages = jnp.asarray(rng.rand(2, 160, 160).astype(np.float32))
    grouped = np.array([
        [[[10, 20], [95, 20], [95, 45], [10, 45]],
         [[5, 100], [80, 100], [80, 125], [5, 125]]],
        [[[30, 30], [120, 30], [120, 55], [30, 55]],
         [[0, 0], [63, 0], [63, 31], [0, 31]]],
    ], np.float32)
    sg, wg = warp_quads_separable(pages, jnp.asarray(grouped),
                                  rec_height=32, bucket_width=128)
    page_ids = jnp.asarray(np.array([0, 0, 1, 1], np.int32))
    sm, wm = warp_quads_multi_separable(
        pages, page_ids, jnp.asarray(grouped.reshape(4, 4, 2)),
        rec_height=32, bucket_width=128, tile_h=64)
    np.testing.assert_array_equal(np.asarray(wm),
                                  np.asarray(wg).reshape(-1))
    np.testing.assert_allclose(np.asarray(sm),
                               np.asarray(sg).reshape(4, 32, 128),
                               atol=2e-5)


def test_multi_separable_matches_gather_multi():
    """On axis-aligned quads the pooled separable warp agrees with the
    pooled gather warp it replaces (the fast-path routing contract of
    bucketing.recognize_pooled)."""
    from ocrjax.ops.warp import warp_quads_multi, warp_quads_multi_separable

    rng = np.random.RandomState(7)
    pages = jnp.asarray(rng.rand(3, 200, 200).astype(np.float32))
    quads = np.array([
        [[12, 18], [150, 18], [150, 43], [12, 43]],
        [[4, 90], [100, 90], [100, 118], [4, 118]],
        [[40, 160], [190, 160], [190, 185], [40, 185]],
    ], np.float32)
    page_ids = jnp.asarray(np.array([0, 1, 2], np.int32))
    sm, wm = warp_quads_multi_separable(
        pages, page_ids, jnp.asarray(quads),
        rec_height=32, bucket_width=256, tile_h=64)
    sh, wh = warp_quads_multi(
        pages, page_ids, jnp.asarray(quads),
        rec_height=32, bucket_width=256)
    np.testing.assert_array_equal(np.asarray(wm), np.asarray(wh))
    for i in range(3):
        w = int(wm[i])
        np.testing.assert_allclose(
            np.asarray(sm)[i][:, :w], np.asarray(sh)[i][:, :w], atol=2e-3)


def test_sep_warp_mask_routing():
    """Routing predicate: straight lines take the separable warp; tilted
    (beyond the noise-aware threshold), landscape (~90°), and
    taller-than-tile quads keep the homography warp."""
    from ocrjax.bucketing import sep_warp_mask
    from ocrjax.config import OcrConfig

    cfg = OcrConfig(fused_rotation_reroute_deg=3.0,
                    fused_reroute_noise_px=6.0,
                    pooled_sep_tile_h=128)

    def rect(cx, cy, w, h, deg=0.0):
        c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
        R = np.array([[c, -s], [s, c]], np.float32)
        base = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                         [w / 2, h / 2], [-w / 2, h / 2]], np.float32)
        return base @ R.T + np.array([cx, cy], np.float32)

    quads = np.stack([
        rect(200, 50, 300, 30),            # straight long line → sep
        rect(200, 120, 80, 30, deg=3.8),   # short, under noise floor → sep
        rect(200, 200, 300, 30, deg=8.0),  # genuinely tilted → hom
        rect(200, 300, 300, 30, deg=90.0),  # landscape line → hom
        rect(200, 420, 300, 150),          # taller than tile → hom
    ])
    mask = sep_warp_mask(quads, quads, cfg)
    np.testing.assert_array_equal(mask, [True, True, False, False, False])

    cfg_off = cfg.replace(pooled_sep_tile_h=256)
    mask2 = sep_warp_mask(quads, quads, cfg_off)
    assert bool(mask2[4])  # taller tile admits the tall quad


def test_separable_matches_gather_axis_aligned():
    """Separable (matmul) warp equals the gather warp on axis-aligned quads."""
    import jax.numpy as jnp
    from ocrjax.ops.warp import warp_quads_grouped, warp_quads_separable

    rng = np.random.RandomState(3)
    pages = jnp.asarray(rng.rand(2, 128, 128).astype(np.float32))
    quads = np.array([
        [[[10, 20], [95, 20], [95, 45], [10, 45]],
         [[5, 60], [80, 60], [80, 80], [5, 80]]],
        [[[30, 30], [120, 30], [120, 55], [30, 55]],
         [[0, 0], [63, 0], [63, 31], [0, 31]]],
    ], np.float32)
    sa, wa = warp_quads_separable(pages, jnp.asarray(quads),
                                  rec_height=32, bucket_width=128)
    sg, wg = warp_quads_grouped(pages, jnp.asarray(quads),
                                rec_height=32, bucket_width=128)
    np.testing.assert_array_equal(np.asarray(wa), np.asarray(wg))
    for b in range(2):
        for k in range(2):
            w = int(wa[b, k])
            np.testing.assert_allclose(
                np.asarray(sa)[b, k][:, :w], np.asarray(sg)[b, k][:, :w],
                atol=2e-3)
