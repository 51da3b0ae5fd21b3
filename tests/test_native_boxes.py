"""Native C++ postprocess vs cv2 host implementation (SURVEY.md §4.2)."""

import cv2
import numpy as np
import pytest

from ocrjax.postprocess import native_boxes
from ocrjax.postprocess.host_boxes import extract_boxes_host

pytestmark = pytest.mark.skipif(
    not native_boxes.native_available(),
    reason="no C++ toolchain to build the native library")


def test_label_components_matches_cv2():
    rng = np.random.RandomState(0)
    bm = (rng.rand(64, 64) > 0.7).astype(np.uint8)
    labels, n = native_boxes.label_components_native(bm)
    n_cv, labels_cv = cv2.connectedComponents(bm, connectivity=8)
    assert n == n_cv - 1  # cv2 counts background as a component
    # same partition: bijection between label ids
    fg = bm.astype(bool)
    pairs = set(zip(labels[fg].tolist(), labels_cv[fg].tolist()))
    assert len(pairs) == n
    assert (labels[~fg] == -1).all()


def test_extract_boxes_matches_host_on_rects():
    prob = np.zeros((128, 128), np.float32)
    prob[30:50, 20:80] = 0.9
    prob[70:94, 16:116] = 0.8
    nat_b, nat_s = native_boxes.extract_boxes_native(prob)
    host_b, host_s = extract_boxes_host(prob)
    assert len(nat_b) == len(host_b) == 2
    # same scores, near-identical corners (different rect algorithms agree
    # exactly on axis-aligned components)
    for nb, ns in zip(nat_b, nat_s):
        dists = [np.abs(nb - hb).max() for hb in host_b]
        k = int(np.argmin(dists))
        assert dists[k] < 1.5, (nb, host_b[k])
        assert abs(ns - host_s[k]) < 1e-3


def test_extract_boxes_rotated():
    # rotated bar: min-area rect must be tight (not the AABB)
    prob = np.zeros((128, 128), np.float32)
    for i in range(60):
        for t in range(3):
            prob[20 + i, 30 + i + t] = 0.95
    boxes, scores = native_boxes.extract_boxes_native(
        prob, min_box_size=1, unclip_ratio=0.0)
    assert len(boxes) == 1
    b = boxes[0]
    e1 = np.linalg.norm(b[1] - b[0])
    e2 = np.linalg.norm(b[3] - b[0])
    assert max(e1, e2) > 70 and min(e1, e2) < 10


def test_empty():
    boxes, scores = native_boxes.extract_boxes_native(
        np.zeros((32, 32), np.float32))
    assert len(boxes) == 0


def test_score_filter():
    prob = np.zeros((64, 64), np.float32)
    prob[10:20, 10:40] = 0.9
    prob[40:50, 10:40] = 0.45
    boxes, scores = native_boxes.extract_boxes_native(prob, box_thresh=0.6)
    assert len(boxes) == 1 and scores[0] > 0.8
