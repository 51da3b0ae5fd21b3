"""Dense-page (C5 spec density) unit tests — BASELINE.json:11 calls for
"hundreds of lines/page"; these pin the host-side machinery on CPU, and
tests/test_tpu.py::test_c5_dense_page_on_tpu runs the full path on hardware.
"""

import numpy as np

from ocrjax.charset import default_charset
from ocrjax.tiling import _merge_seam_boxes


def _aabb_quad(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]], np.float32)


def test_render_page_dense_reaches_spec_density():
    from ocrjax.train.synth import render_page_dense

    rng = np.random.RandomState(7)
    page, quads, texts = render_page_dense(
        rng, default_charset(), size=(2048, 2048), n_lines=200)
    assert len(texts) == 200
    assert len(quads) == 200
    # quads are tight strip boxes inside the page and mutually disjoint
    q = np.stack(quads)
    assert q[:, :, 0].min() >= 0 and q[:, :, 0].max() < 2048
    assert q[:, :, 1].min() >= 0 and q[:, :, 1].max() < 2048
    x0, y0 = q[:, :, 0].min(1), q[:, :, 1].min(1)
    x1, y1 = q[:, :, 0].max(1), q[:, :, 1].max(1)
    iw = np.minimum(x1[:, None], x1) - np.maximum(x0[:, None], x0)
    ih = np.minimum(y1[:, None], y1) - np.maximum(y0[:, None], y0)
    overlap = (iw > 0) & (ih > 0)
    np.fill_diagonal(overlap, False)
    assert not overlap.any()
    # the page really is dense: plenty of ink
    assert (page < 128).sum() > 20000


def test_seam_merge_keeps_same_tile_neighbors_apart():
    """Two unclip-expanded NEIGHBOR lines in one row of one tile overlap by
    a few px and must NOT merge; the same geometry ACROSS tiles is a seam
    fragment pair and must merge."""
    a = _aabb_quad(10, 10, 110, 40)
    b = _aabb_quad(105, 10, 200, 40)   # x-ranges meet by 5 px, same row

    q, s = _merge_seam_boxes([a, b], [0.9, 0.8], iou_thresh=0.3,
                             x_bands=[(100, 130)], tile_ids=[0, 0])
    assert len(q) == 2, "same-tile neighbors must stay separate"

    q, s = _merge_seam_boxes([a, b], [0.9, 0.8], iou_thresh=0.3,
                             x_bands=[(100, 130)], tile_ids=[0, 1])
    assert len(q) == 1, "cross-tile fragments must merge"
    assert s[0] == 0.9


def test_seam_merge_in_band_gap_and_iou_duplicate():
    # small gap inside a seam band, different tiles → merge
    a = _aabb_quad(10, 10, 100, 40)
    b = _aabb_quad(110, 10, 200, 40)   # 10-px gap inside band (90, 140)
    q, _ = _merge_seam_boxes([a, b], [0.9, 0.8], iou_thresh=0.3,
                             x_bands=[(90, 140)], tile_ids=[0, 1])
    assert len(q) == 1
    # same gap NOT inside any band → no merge
    q, _ = _merge_seam_boxes([a, b], [0.9, 0.8], iou_thresh=0.3,
                             x_bands=[(300, 340)], tile_ids=[0, 1])
    assert len(q) == 2
    # IoU duplicates merge regardless of tile provenance
    c = _aabb_quad(12, 11, 102, 41)
    q, _ = _merge_seam_boxes([a, c], [0.9, 0.8], iou_thresh=0.3,
                             x_bands=[], tile_ids=[0, 0])
    assert len(q) == 1


def test_seam_merge_dense_scale_is_fast():
    """300 quads through the vectorized merge in well under a second (the
    per-pair Python loop took seconds at this n)."""
    import time

    rng = np.random.RandomState(0)
    quads, scores = [], []
    for i in range(300):
        x0 = float(rng.randint(0, 1900))
        y0 = float(i * 6)
        quads.append(_aabb_quad(x0, y0, x0 + 80, y0 + 4))
        scores.append(0.9)
    t0 = time.time()
    q, s = _merge_seam_boxes(quads, scores, iou_thresh=0.3,
                             x_bands=[(1000, 1100)],
                             tile_ids=list(range(300)))
    dt = time.time() - t0
    assert dt < 1.0, dt
    assert len(q) <= 300


def test_det_batch_dense_degraded_shapes():
    from ocrjax.train.det_gt import make_det_batch

    rng = np.random.RandomState(3)
    imgs, gts, gtt, gtm = make_det_batch(
        rng, default_charset(), 2, 256, degrade=1.0, p_dense=1.0)
    assert imgs.shape == (2, 256, 256, 3)
    assert gts.shape == (2, 256, 256)
    assert gts.sum() > 0 and gtm.sum() > 0
