"""On-device DB box extraction vs host cv2 parity (SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocrjax.postprocess.db_boxes import extract_boxes, label_components
from ocrjax.postprocess.host_boxes import extract_boxes_host, unclip_polygon


def _synthetic_prob(rects, shape=(128, 128), val=0.9):
    prob = np.zeros(shape, np.float32)
    for (x0, y0, x1, y1) in rects:
        prob[y0:y1, x0:x1] = val
    return prob


def _iou_aabb(a, b):
    ax0, ay0 = a.min(axis=0); ax1, ay1 = a.max(axis=0)
    bx0, by0 = b.min(axis=0); bx1, by1 = b.max(axis=0)
    ix = max(0, min(ax1, bx1) - max(ax0, bx0))
    iy = max(0, min(ay1, by1) - max(ay0, by0))
    inter = ix * iy
    ua = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
    return inter / max(ua, 1e-9)


def test_label_components_counts():
    bm = np.zeros((32, 32), bool)
    bm[2:6, 2:10] = True
    bm[20:26, 18:30] = True
    bm[10, 15] = True  # single pixel
    labels = np.asarray(label_components(jnp.asarray(bm), 16))
    fg_labels = labels[bm]
    assert len(np.unique(fg_labels)) == 3
    assert (labels[~bm] >= 2 ** 30).all()


def test_label_components_long_snake():
    # a long thin S-shape — pointer jumping must converge way under H*W steps
    bm = np.zeros((64, 64), bool)
    bm[2, 2:60] = True
    bm[2:40, 59] = True
    bm[39, 4:60] = True
    labels = np.asarray(label_components(jnp.asarray(bm), 24))
    assert len(np.unique(labels[bm])) == 1


def test_extract_single_rect():
    prob = _synthetic_prob([(20, 30, 80, 50)])
    out = extract_boxes(jnp.asarray(prob), max_candidates=16)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 1
    box = np.asarray(out["boxes"])[valid][0]
    score = np.asarray(out["scores"])[valid][0]
    assert abs(score - 0.9) < 1e-3
    # unclipped box contains the seed rect
    assert box[:, 0].min() <= 20 and box[:, 0].max() >= 79
    assert box[:, 1].min() <= 30 and box[:, 1].max() >= 49


def test_extract_multiple_and_order():
    rects = [(10, 10, 40, 20), (60, 12, 110, 26), (15, 70, 100, 90)]
    prob = _synthetic_prob(rects)
    out = extract_boxes(jnp.asarray(prob), max_candidates=16)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 3
    boxes = np.asarray(out["boxes"])[valid]
    # raster-order determinism: first root encountered first
    assert boxes[0][:, 1].mean() < boxes[2][:, 1].mean()


def test_score_filter_drops_weak():
    prob = _synthetic_prob([(10, 10, 40, 20)], val=0.9)
    prob[60:70, 10:40] = 0.4  # above thresh, below box_thresh
    out = extract_boxes(jnp.asarray(prob), thresh=0.3, box_thresh=0.6,
                        max_candidates=16)
    assert np.asarray(out["valid"]).sum() == 1


def test_min_size_filter():
    prob = _synthetic_prob([(10, 10, 12, 12)])  # 2x2 — below min 3
    out = extract_boxes(jnp.asarray(prob), max_candidates=16)
    assert np.asarray(out["valid"]).sum() == 0


def test_rotated_component_gets_oriented_box():
    # diagonal bar at 45°: PCA box must be much tighter than the AABB
    prob = np.zeros((128, 128), np.float32)
    for i in range(60):
        prob[30 + i, 30 + i] = 0.95
        prob[31 + i, 30 + i] = 0.95
        prob[30 + i, 31 + i] = 0.95
    # cc_iters=24: thin diagonals are the worst case for run-scan CCL (row
    # runs are ~2 px), unlike the filled bands real DB kernels produce
    out = extract_boxes(jnp.asarray(prob), max_candidates=8, min_box_size=1,
                        unclip_ratio=0.0, cc_iters=24)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 1
    box = np.asarray(out["boxes"])[valid][0]
    e1 = np.linalg.norm(box[1] - box[0])
    e2 = np.linalg.norm(box[3] - box[0])
    long, short = max(e1, e2), min(e1, e2)
    assert long > 70          # ~60*sqrt(2)
    assert short < 10         # thin bar, not the 60-wide AABB


def test_device_vs_host_parity_axis_aligned():
    rects = [(20, 30, 80, 50), (16, 70, 116, 94)]
    prob = _synthetic_prob(rects)
    dev = extract_boxes(jnp.asarray(prob), max_candidates=16)
    valid = np.asarray(dev["valid"])
    dev_boxes = np.asarray(dev["boxes"])[valid]
    host_boxes, host_scores = extract_boxes_host(prob)
    assert len(host_boxes) == len(dev_boxes) == 2
    # match by IoU — same regions, near-identical extents
    for hb in host_boxes:
        ious = [_iou_aabb(hb, db) for db in dev_boxes]
        assert max(ious) > 0.85, (hb, dev_boxes)


def test_unclip_polygon_rect_exact():
    rect = np.array([[10, 10], [50, 10], [50, 30], [10, 30]], np.float32)
    # area=800, perim=120, ratio=1.5 → δ=10
    out = unclip_polygon(rect, 1.5)
    assert out.shape == (4, 2)
    xs, ys = out[:, 0], out[:, 1]
    np.testing.assert_allclose(sorted(set(np.round(xs))), [0, 60], atol=1e-4)
    np.testing.assert_allclose(sorted(set(np.round(ys))), [0, 40], atol=1e-4)


def test_empty_prob_map():
    out = extract_boxes(jnp.zeros((64, 64)), max_candidates=8)
    assert np.asarray(out["valid"]).sum() == 0
    hb, hs = extract_boxes_host(np.zeros((64, 64), np.float32))
    assert len(hb) == 0


def test_near_square_component_borrows_page_angle():
    # A long trustworthy line at ~6 deg plus a near-square blob: the blob's
    # own PCA axis is noise (eigenvalue gap ~0), so its box must align with
    # the page-dominant angle instead of landing 45-90 deg off.
    prob = np.zeros((192, 256), np.float32)
    t = np.tan(np.radians(6.0))
    for x in range(15, 230):
        yc = 60 + (x - 15) * t
        prob[int(yc) - 6:int(yc) + 7, x] = 0.9
    prob[130:148, 40:58] = 0.9  # 18x18 square blob
    out = extract_boxes(jnp.asarray(prob), max_candidates=8, cc_iters=8)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 2
    boxes = np.asarray(out["boxes"])[valid]
    sq = min(boxes, key=lambda b: abs(b[:, 0].mean() - 49.0))
    e = sq[1] - sq[0]
    ang = np.degrees(np.arctan2(e[1], e[0])) % 90.0
    ang = min(ang, 90.0 - ang)
    assert abs(ang - 6.0) < 2.5, ang


def test_warp_pad_value_fills_beyond_width():
    from ocrjax.ops.warp import warp_quads, warp_quads_separable

    page = jnp.ones((128, 128), jnp.float32)
    quads = jnp.asarray(
        [[[10.0, 20.0], [40.0, 20.0], [40.0, 35.0], [10.0, 35.0]]])
    strips, widths = warp_quads(page, quads, rec_height=16, bucket_width=96,
                                pad_value=-1.0)
    w = int(widths[0])
    assert w < 96
    np.testing.assert_allclose(np.asarray(strips)[0, :, w:], -1.0)
    s2, w2 = warp_quads_separable(page[None], quads[None], rec_height=16,
                                  bucket_width=96, pad_value=-1.0)
    np.testing.assert_allclose(np.asarray(s2)[0, 0, :, int(w2[0, 0]):], -1.0)


def test_refine_x_window_rejects_side_neighbor():
    # main ink block + a neighbor sliver that only the expansion margin
    # reaches: x_margin_keep < 1 must exclude it from the refined box,
    # keep=1.0 (legacy) includes it.
    from ocrjax.ops.warp import (expand_quads, refine_aabb_to_ink,
                                 warp_quads_separable)

    page = np.ones((256, 256), np.float32)
    page[24:41, 40:151] = -1.0     # the line's ink
    page[24:41, 160:163] = -1.0    # side-neighbor sliver
    det = np.asarray([[[38.0, 22.0], [152.0, 22.0],
                       [152.0, 42.0], [38.0, 42.0]]], np.float32)
    fy, fx = 0.15, 0.55            # wide x margin so the probe sees 160..162
    exp = expand_quads(det, fy, fx)
    strips, widths = warp_quads_separable(
        jnp.asarray(page[None]), jnp.asarray(exp[None]),
        rec_height=32, bucket_width=320, pad_value=1.0)
    kw = dict(rec_height=32, ink_thresh=0.0, margin_fracs=(fy, fx))
    loose = refine_aabb_to_ink(
        strips[0], widths[0], jnp.asarray(exp), x_margin_keep=1.0, **kw)
    tight = refine_aabb_to_ink(
        strips[0], widths[0], jnp.asarray(exp), x_margin_keep=0.2, **kw)
    assert float(np.asarray(loose)[0, :, 0].max()) >= 158.0
    assert float(np.asarray(tight)[0, :, 0].max()) <= 157.0
    assert float(np.asarray(tight)[0, :, 0].max()) >= 148.0  # kept the ink


def test_cross_axis_flip_keeps_reading_direction():
    """A tall-ish near-square component on a horizontal page takes the
    cross-axis flip branch (theta + pi/2); the final angle must be re-wrapped
    so the emitted quad's TL->TR edge still points in +x — an un-wrapped
    angle reverses the corner order and the strip decodes 180-flipped
    ('I0' -> '0I' on rotated-page seeds 9/77)."""
    prob = _synthetic_prob([(10, 10, 110, 22),    # long line: page angle ~0
                            (60, 60, 70, 80)])    # 10x20 blob: aniso ~0.6,
    out = extract_boxes(jnp.asarray(prob), max_candidates=16)  # PCA axis 90°
    valid = np.asarray(out["valid"])
    boxes = np.asarray(out["boxes"])[valid]
    assert len(boxes) == 2
    for box in boxes:
        dx = box[1, 0] - box[0, 0]          # TL -> TR
        assert dx > 0, box


def test_mixed_orientation_page_keeps_own_axis():
    # Two long trusted lines at 0 and 60 deg: their axes disagree (mean
    # resultant length ~0.5 in 2-theta space), so page-angle borrowing must
    # NOT fire — a short wide-ish component at 70 deg keeps its own PCA
    # axis instead of being rectified at the meaningless circular mean.
    prob = np.zeros((256, 256), np.float32)
    prob[30:42, 20:230] = 0.9                      # long line at 0 deg
    cot60 = 1.0 / np.tan(np.radians(60.0))
    for y in range(90, 240):                       # long line at 60 deg
        xc = 150 + (y - 90) * cot60
        prob[y, int(xc) - 6:int(xc) + 7] = 0.9
    # 20x15 rect rotated 70 deg at (x=60, y=150): aniso ~0.28 < floor 0.30
    a = np.radians(70.0)
    ca, sa = np.cos(a), np.sin(a)
    yy, xx = np.mgrid[130:170, 40:80]
    u = (xx - 60) * ca + (yy - 150) * sa
    v = -(xx - 60) * sa + (yy - 150) * ca
    prob[130:170, 40:80][(np.abs(u) < 10) & (np.abs(v) < 7.5)] = 0.9
    out = extract_boxes(jnp.asarray(prob), max_candidates=8, cc_iters=16)
    valid = np.asarray(out["valid"])
    assert valid.sum() == 3, valid.sum()
    boxes = np.asarray(out["boxes"])[valid]
    blob = min(boxes, key=lambda b: np.hypot(b[:, 0].mean() - 60,
                                             b[:, 1].mean() - 150))
    e = blob[1] - blob[0]
    e = e / np.hypot(*e)
    d = np.array([ca, sa])
    assert abs(e @ d) > np.cos(np.radians(8.0)), (e, blob)
    # sanity: with borrowing forced (coherence gate off) the blob would NOT
    # sit on its own axis — the gate is what preserved it
    out2 = extract_boxes(jnp.asarray(prob), max_candidates=8, cc_iters=16,
                         angle_coherence_min=0.0)
    boxes2 = np.asarray(out2["boxes"])[np.asarray(out2["valid"])]
    blob2 = min(boxes2, key=lambda b: np.hypot(b[:, 0].mean() - 60,
                                               b[:, 1].mean() - 150))
    e2 = blob2[1] - blob2[0]
    e2 = e2 / np.hypot(*e2)
    assert abs(e2 @ d) < np.cos(np.radians(8.0)), (e2, blob2)
