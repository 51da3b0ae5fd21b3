import numpy as np

from ocrjax.geometry import (merge_quads, quad_iou_aabb, scale_quads,
                             sort_reading_order)


def _q(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)


def test_reading_order_rows_then_columns():
    quads = [_q(50, 40, 90, 50),   # row 2 right
             _q(5, 38, 45, 50),    # row 2 left (slightly higher top)
             _q(5, 5, 60, 18),     # row 1
             _q(10, 80, 70, 95)]   # row 3
    order = sort_reading_order(quads)
    assert order == [2, 1, 0, 3]


def test_reading_order_tolerates_wavy_baseline():
    quads = [_q(60, 12, 100, 24), _q(5, 8, 50, 20)]  # same row, offset tops
    assert sort_reading_order(quads) == [1, 0]


def test_reading_order_empty():
    assert sort_reading_order([]) == []


def test_scale_quads():
    q = _q(10, 20, 30, 40)
    out = scale_quads(q, 0.5)
    np.testing.assert_allclose(out, q / 0.5)


def test_iou_and_merge():
    a, b = _q(0, 0, 10, 10), _q(5, 0, 15, 10)
    iou = quad_iou_aabb(a, b)
    assert abs(iou - 50 / 150) < 1e-6
    m = merge_quads(a, b)
    np.testing.assert_allclose(m, _q(0, 0, 15, 10))
    assert quad_iou_aabb(_q(0, 0, 5, 5), _q(20, 20, 30, 30)) == 0.0
