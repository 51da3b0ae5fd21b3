"""Host (NumPy + cv2) DB postprocess — parity/fallback path.

This is the classic DB box extraction the reference runs in host Rust
(SURVEY.md §2.1 R3): threshold → contours → score filter → polygon unclip →
min-area rect. Kept for (a) exactness tests against the on-device
implementation (tests/test_db_boxes.py) and (b) an "exact contours" mode for
users who want bit-faithful classic-DB behavior over TPU throughput. The
production path is ocrjax.postprocess.db_boxes (on-device).

A C++ implementation of the same routine (ocrjax/native) replaces the cv2
calls where available; see ocrjax.postprocess.native_boxes.
"""

from __future__ import annotations

from typing import List, Tuple

import cv2
import numpy as np


def unclip_polygon(poly: np.ndarray, ratio: float) -> np.ndarray:
    """Expand a polygon by δ = area·ratio / perimeter.

    Exact Clipper-style offsetting of a convex polygon, implemented by
    shifting each edge outward by δ along its normal and intersecting
    neighboring edges (miter join) — for rectangles this equals the Vatti
    offset's min-area rect (SURVEY.md §7 "Polygon unclip").
    """
    poly = np.asarray(poly, np.float64)
    area = abs(cv2.contourArea(poly.astype(np.float32)))
    perim = cv2.arcLength(poly.astype(np.float32), True)
    if perim <= 1e-6:
        return poly.astype(np.float32)
    delta = area * ratio / perim

    n = len(poly)
    # ensure counter-clockwise orientation (positive signed area)
    signed = 0.0
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        signed += x1 * y2 - x2 * y1
    if signed < 0:
        poly = poly[::-1]

    out = []
    for i in range(n):
        p_prev = poly[(i - 1) % n]
        p_cur = poly[i]
        p_next = poly[(i + 1) % n]
        # outward normals of the two adjacent edges (CCW → outward = (dy, -dx))
        lines = []
        for a, b in ((p_prev, p_cur), (p_cur, p_next)):
            d = b - a
            l = np.hypot(*d)
            if l < 1e-9:
                continue
            nvec = np.array([d[1], -d[0]]) / l
            lines.append((a + nvec * delta, b + nvec * delta))
        if len(lines) == 1:
            out.append(lines[0][1])
            continue
        (a1, b1), (a2, b2) = lines
        d1, d2 = b1 - a1, b2 - a2
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(denom) < 1e-9:  # collinear edges: just offset the vertex
            out.append((b1 + a2) / 2)
        else:
            t = ((a2[0] - a1[0]) * d2[1] - (a2[1] - a1[1]) * d2[0]) / denom
            out.append(a1 + t * d1)
    res = np.asarray(out, np.float32)
    if signed < 0:
        res = res[::-1]
    return res


def order_quad(pts: np.ndarray) -> np.ndarray:
    """Order 4 points TL, TR, BR, BL."""
    pts = np.asarray(pts, np.float32)
    s = pts.sum(axis=1)
    d = pts[:, 0] - pts[:, 1]
    tl = pts[np.argmin(s)]
    br = pts[np.argmax(s)]
    tr = pts[np.argmax(d)]
    bl = pts[np.argmin(d)]
    return np.stack([tl, tr, br, bl])


def extract_boxes_host(
    prob: np.ndarray,
    thresh: float = 0.3,
    box_thresh: float = 0.6,
    unclip_ratio: float = 1.5,
    max_candidates: int = 256,
    min_box_size: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Classic DB postprocess. prob (H, W) float → (boxes (N,4,2), scores)."""
    prob = np.asarray(prob, np.float32)
    H, W = prob.shape
    bitmap = (prob > thresh).astype(np.uint8)
    contours, _ = cv2.findContours(
        bitmap, cv2.RETR_LIST, cv2.CHAIN_APPROX_SIMPLE)
    boxes: List[np.ndarray] = []
    scores: List[float] = []
    for contour in contours[:max_candidates]:
        # component mean score via mask
        mask = np.zeros((H, W), np.uint8)
        cv2.drawContours(mask, [contour], -1, 1, thickness=-1)
        score = float((prob * mask).sum() / max(mask.sum(), 1))
        if score < box_thresh:
            continue
        rect = cv2.minAreaRect(contour)
        sside = min(rect[1])
        if sside < min_box_size:
            continue
        quad = cv2.boxPoints(rect)
        expanded = unclip_polygon(quad, unclip_ratio)
        rect2 = cv2.minAreaRect(expanded.astype(np.float32))
        quad2 = order_quad(cv2.boxPoints(rect2))
        quad2[:, 0] = np.clip(quad2[:, 0], 0, W - 1)
        quad2[:, 1] = np.clip(quad2[:, 1], 0, H - 1)
        boxes.append(quad2)
        scores.append(score)
    if not boxes:
        return np.zeros((0, 4, 2), np.float32), np.zeros((0,), np.float32)
    return np.stack(boxes), np.asarray(scores, np.float32)
