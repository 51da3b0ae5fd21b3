import numpy as np

from ocrjax.train.det_gt import db_gt_maps, SHRINK_RATIO, THRESH_MAX, THRESH_MIN


def _rect_quad(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)


def test_shrink_region_inside_quad():
    quad = _rect_quad(20, 30, 80, 50)
    gts, gtt, gtm = db_gt_maps([quad], (100, 100))
    ys, xs = np.where(gts > 0)
    assert len(ys) > 0
    # shrunk region strictly inside the quad
    assert xs.min() > 20 and xs.max() < 80
    assert ys.min() > 30 and ys.max() < 50
    # shrink delta = A(1-r^2)/P = (60*20)(1-0.16)/160 = 6.3
    delta = (60 * 20) * (1 - SHRINK_RATIO ** 2) / 160
    assert abs(xs.min() - (20 + delta)) < 1.5


def test_thresh_band_straddles_edge():
    quad = _rect_quad(20, 30, 80, 50)
    gts, gtt, gtm = db_gt_maps([quad], (100, 100))
    # band contains pixels on both sides of the left edge x=20
    row = 40
    assert gtm[row, 17] == 1.0 and gtm[row, 23] == 1.0
    assert gtm[row, 5] == 0.0
    # value peaks at the edge, decays outward
    assert gtt[row, 20] > gtt[row, 24] > 0
    assert gtt.max() <= THRESH_MAX + 1e-6
    assert gtt[gtm > 0].min() >= THRESH_MIN - 1e-6


def test_multiple_quads_dont_interfere():
    quads = [_rect_quad(10, 10, 40, 25), _rect_quad(60, 60, 95, 80)]
    gts, _, _ = db_gt_maps(quads, (100, 100))
    assert gts[15, 25] == 1.0 and gts[70, 78] == 1.0
    assert gts[45, 50] == 0.0


def test_tiny_quad_skipped():
    gts, gtt, gtm = db_gt_maps([_rect_quad(5, 5, 7, 7)], (20, 20))
    assert gts.sum() == 0
