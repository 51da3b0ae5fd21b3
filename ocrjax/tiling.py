"""Tiled detection for high-res pages (C5, BASELINE.json:11; SURVEY.md §2.3
N12 and §5 "long-context": the OCR analogue of sequence parallelism is
spatial tiling with overlap + seam merging).

Pages larger than `tile_size` are split into overlapping tiles; all tiles of
a page run through the DB forward as ONE batched device call (the tile axis
is just a batch axis — and the natural DP shard axis on a mesh); boxes are
mapped back to page coords and boxes that meet across a seam are merged by
IoU/adjacency union on host.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ocrjax import geometry, preprocess


def tile_grid(h: int, w: int, tile: int, overlap: int) -> List[Tuple[int, int]]:
    """Top-left corners of overlapping tiles covering (h, w)."""
    stride = max(tile - overlap, 1)

    def starts(total):
        if total <= tile:
            return [0]
        s = list(range(0, total - tile, stride))
        s.append(total - tile)
        return s

    return [(y, x) for y in starts(h) for x in starts(w)]


def _merge_seam_boxes(quads: List[np.ndarray], scores: List[float],
                      iou_thresh: float) -> Tuple[List[np.ndarray], List[float]]:
    """Union-merge quads whose hulls overlap (seam duplicates/fragments)."""
    n = len(quads)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if geometry.quad_iou_aabb(quads[i], quads[j]) > iou_thresh:
                parent[find(i)] = find(j)

    groups = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    out_q, out_s = [], []
    for members in groups.values():
        q = quads[members[0]]
        s = scores[members[0]]
        for m in members[1:]:
            q = geometry.merge_quads(q, quads[m])
            s = max(s, scores[m])
        out_q.append(q)
        out_s.append(s)
    return out_q, out_s


def detect_tiled(engine, image) -> List["DetBox"]:
    """C5 detection: tile → batched DB forward → seam merge → reading order.

    Coordinates are returned in the ORIGINAL image frame. Small pages
    (≤ tile_size) degrade gracefully to one tile.
    """
    from ocrjax.api import DetBox
    from ocrjax.api_det import _det_state
    from ocrjax.postprocess import db_boxes

    cfg = engine.config
    img = preprocess.load_image(image)
    h, w = img.shape[:2]
    T = cfg.tile_size
    corners = tile_grid(h, w, T, cfg.tile_overlap)

    # pad image so every tile is full-size (fixed shapes); luma tiles —
    # single-channel uploads (see det_normalize_gray)
    gray = preprocess.to_gray(img)
    ph, pw = max(h, T), max(w, T)
    padded = np.zeros((ph, pw), np.uint8)
    padded[:h, :w] = gray

    tiles = np.stack([padded[y:y + T, x:x + T] for (y, x) in corners])

    st = _det_state(engine)

    from ocrjax.api_det import pack_det, unpack_det

    @jax.jit
    def fwd(variables, tiles_u8):
        x = preprocess.det_normalize_gray(
            tiles_u8, cfg.det_mean, cfg.det_std)
        prob = st.model.apply(variables, x)["prob"]
        return pack_det(jax.vmap(
            lambda p: db_boxes.extract_boxes_from_config(p, cfg))(prob))

    def run_chunked(tiles_np: np.ndarray, depth: int = 0):
        """OOM fallback (SURVEY.md §5 failure detection): halve the tile
        batch and retry when the device runs out of memory."""
        try:
            return unpack_det(
                np.asarray(fwd(st.variables, jnp.asarray(tiles_np))),
                cfg.det_max_candidates)
        except Exception as e:  # jaxlib raises XlaRuntimeError on OOM
            if "RESOURCE_EXHAUSTED" not in str(e) or depth >= 3 \
                    or len(tiles_np) <= 1:
                raise
            mid = len(tiles_np) // 2
            parts = [run_chunked(tiles_np[:mid], depth + 1),
                     run_chunked(tiles_np[mid:], depth + 1)]
            return tuple(np.concatenate([p[i] for p in parts])
                         for i in range(3))

    boxes, scores, valid = run_chunked(tiles)  # boxes (n_tiles, C, 4, 2)

    quads, ss = [], []
    for t, (y, x) in enumerate(corners):
        for i in np.where(valid[t])[0]:
            q = boxes[t, i] + np.array([x, y], np.float32)
            # clip to the real (unpadded) page
            q[:, 0] = np.clip(q[:, 0], 0, w - 1)
            q[:, 1] = np.clip(q[:, 1], 0, h - 1)
            quads.append(q)
            ss.append(float(scores[t, i]))

    quads, ss = _merge_seam_boxes(quads, ss, cfg.tile_merge_iou)
    order = geometry.sort_reading_order(quads)
    return [DetBox(quads[i], ss[i]) for i in order]
