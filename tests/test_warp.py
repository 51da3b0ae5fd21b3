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
