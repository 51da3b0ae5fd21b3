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


def _seam_bands(corners: List[Tuple[int, int]], tile: int):
    """X- and Y-intervals covered by tile overlaps (the seam regions)."""
    xs = sorted({x for (_, x) in corners})
    ys = sorted({y for (y, _) in corners})

    def bands(starts):
        out = []
        for a, b in zip(starts, starts[1:]):
            if b < a + tile:                      # overlapping neighbors
                out.append((b, a + tile))
        return out

    return bands(xs), bands(ys)


def _same_line_fragments(qa: np.ndarray, qb: np.ndarray,
                         x_bands) -> bool:
    """True when two quads look like left/right fragments of ONE text line
    cut by a tile seam: their vertical bands coincide and their x-ranges
    meet — or are separated by a small gap lying INSIDE a tile-overlap
    band (detection shrink can leave an inter-character gap right at the
    cut). AABB IoU alone misses both cases — two wide fragments sharing
    only the overlap strip have tiny IoU (measured: seam-split lines
    decoded as two half-strings)."""
    ya0, ya1 = qa[:, 1].min(), qa[:, 1].max()
    yb0, yb1 = qb[:, 1].min(), qb[:, 1].max()
    inter_y = min(ya1, yb1) - max(ya0, yb0)
    min_h = max(min(ya1 - ya0, yb1 - yb0), 1.0)
    if inter_y < 0.7 * min_h:
        return False
    xa0, xa1 = qa[:, 0].min(), qa[:, 0].max()
    xb0, xb1 = qb[:, 0].min(), qb[:, 0].max()
    meet = min(xa1, xb1) - max(xa0, xb0)
    if meet >= 2.0:                              # ranges meet/overlap
        return True
    gap0, gap1 = min(xa1, xb1), max(xa0, xb0)    # the gap interval
    if gap1 - gap0 > 1.5 * min_h:                # more than ~a character
        return False
    pad = 4.0
    return any(gap0 >= b0 - pad and gap1 <= b1 + pad
               for (b0, b1) in x_bands)


def _merge_seam_boxes(quads: List[np.ndarray], scores: List[float],
                      iou_thresh: float, x_bands=()
                      ) -> Tuple[List[np.ndarray], List[float]]:
    """Union-merge seam duplicates (hull overlap) and seam line-fragments
    (same row band, meeting x-ranges or a small in-seam gap)."""
    n = len(quads)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if geometry.quad_iou_aabb(quads[i], quads[j]) > iou_thresh \
                    or _same_line_fragments(quads[i], quads[j], x_bands):
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


def _run_tiles(engine, img: np.ndarray):
    """Tile a page and run chunked DB detection over the tiles.

    Returns (corners, dev_tiles, boxes, scores, valid, merged) where
    dev_tiles is the list of uploaded (packed) device tile chunks — kept so
    ocr_tiled's recognition reuses the SAME upload — and merged is the
    seam-merged (quads, scores) in the original image frame.
    """
    from ocrjax.api_det import _det_state, pack_det, unpack_det
    from ocrjax.postprocess import db_boxes

    cfg = engine.config
    h, w = img.shape[:2]
    T = cfg.tile_size
    corners = tile_grid(h, w, T, cfg.tile_overlap)

    # pad image so every tile is full-size (fixed shapes); luma tiles —
    # single-channel uploads (see det_normalize_gray). REPLICATE padding:
    # zero padding puts a hard white→black edge at the page border, which
    # the detector reads as a text-like stroke (measured: a tall spurious
    # box hugging the border that also corrupts reading-order row
    # clustering); edge replication makes the pad seamless for any
    # background shade.
    gray = preprocess.to_gray(img)
    ph, pw = max(h, T), max(w, T)
    padded = np.pad(gray, ((0, ph - h), (0, pw - w)), mode="edge")

    tiles = np.stack([padded[y:y + T, x:x + T] for (y, x) in corners])

    st = _det_state(engine)

    @jax.jit
    def fwd(variables, tiles_u8):
        tiles_u8 = preprocess.unpack_on_device(tiles_u8, cfg)
        x = preprocess.det_normalize_gray(
            tiles_u8, cfg.det_mean, cfg.det_std)
        from ocrjax.models import db_int8
        prob = db_int8.apply_prob(st.model, variables, x, cfg.det_int8)
        return pack_det(jax.vmap(
            lambda p: db_boxes.extract_boxes_from_config(p, cfg))(prob))

    dev_tiles = []

    def run_chunked(tiles_np: np.ndarray, depth: int = 0):
        """OOM fallback (SURVEY.md §5 failure detection): halve the tile
        batch and retry when the device runs out of memory."""
        try:
            dev = jnp.asarray(preprocess.pack_for_upload(tiles_np, cfg))
            out = unpack_det(np.asarray(fwd(st.variables, dev)),
                             cfg.det_max_candidates)
            dev_tiles.append(dev)
            return out
        except Exception as e:  # jaxlib raises XlaRuntimeError on OOM
            if "RESOURCE_EXHAUSTED" not in str(e) or depth >= 3 \
                    or len(tiles_np) <= 1:
                raise
            from ocrjax.utils.logging import get_logger, log_fields
            log_fields(get_logger("ocrjax.tiling"), "warning",
                       "device OOM: halving tile batch",
                       tiles=len(tiles_np), depth=depth)
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

    x_bands, _ = _seam_bands(corners, T)
    merged = _merge_seam_boxes(quads, ss, cfg.tile_merge_iou, x_bands)
    return corners, dev_tiles, boxes, scores, valid, merged


def detect_tiled(engine, image) -> List["DetBox"]:
    """C5 detection: tile → batched DB forward → seam merge → reading order.

    Coordinates are returned in the ORIGINAL image frame. Small pages
    (≤ tile_size) degrade gracefully to one tile.
    """
    from ocrjax.api import DetBox

    img = preprocess.load_image(image)
    _, _, _, _, _, (quads, ss) = _run_tiles(engine, img)
    order = geometry.sort_reading_order(quads)
    return [DetBox(quads[i], ss[i]) for i in order]


def ocr_tiled(engine, image, beam: bool = False,
              _allow_rot90: bool = True) -> "OcrResult":
    """C5 end-to-end: tiled detection + pooled ink-refined recognition
    (BASELINE.json:11 "hundreds of lines/page").

    Recognition reuses the detection upload: each merged quad is assigned
    to a tile that fully contains its expanded crop and recognized through
    the same pooled refined-warp machinery as C4 (bucketing.recognize_
    pooled) with tile rows as pages — full-resolution crops, two-pass ink
    refinement, zero extra link bytes. Quads no tile fully contains (lines
    longer than tile_size - 2*overlap) fall back to host full-res crops.
    """
    from ocrjax import bucketing
    from ocrjax.api import DetBox, OcrLine, OcrResult
    from ocrjax.api_det import _gray_norm_jit, _ink_crop_host

    cfg = engine.config
    img = preprocess.load_image(image)
    h, w = img.shape[:2]
    T = cfg.tile_size
    corners, dev_tiles, _, _, _, (quads, ss) = _run_tiles(engine, img)
    if not quads:
        return OcrResult(lines=[])

    # Landscape-scan reroute (mirrors api_det.ocr): redo the whole document
    # rotated 90° ccw; the line cls resolves the leftover 180° ambiguity.
    if (_allow_rot90 and cfg.rec_try_flip and cfg.rot90_tilt_deg > 0
            and float(np.median(geometry.quad_tilt_deg(
                np.asarray(quads)))) > cfg.rot90_tilt_deg):
        res = ocr_tiled(engine, np.ascontiguousarray(np.rot90(img)),
                        beam=beam, _allow_rot90=False)
        return OcrResult(lines=[
            OcrLine(box=DetBox(geometry.rot90_ccw_to_orig(l.box.quad, w),
                               l.box.score),
                    text=l.text, confidence=l.confidence)
            for l in res.lines
        ], truncated=res.truncated)

    # ---- assign each merged quad to a containing tile ----------------------
    tile_ids, tile_quads, tile_bounds, pooled_idx, host_idx = [], [], [], [], []
    for qi, q in enumerate(quads):
        qh = q[:, 1].max() - q[:, 1].min() + 1.0
        m = cfg.rec_crop_margin * qh + 2.0 if cfg.rec_snap_to_ink else 2.0
        x0, x1 = q[:, 0].min() - m, q[:, 0].max() + m
        y0, y1 = q[:, 1].min() - m, q[:, 1].max() + m
        best = None
        for t, (ty, tx) in enumerate(corners):
            # containment within the PAGE-valid part of the tile (or the
            # page border itself — expansion clamps there anyway)
            cx0 = max(x0, 0.0)
            cy0 = max(y0, 0.0)
            cx1 = min(x1, w - 1.0)
            cy1 = min(y1, h - 1.0)
            if cx0 >= tx and cy0 >= ty and cx1 < tx + T and cy1 < ty + T:
                # prefer the tile whose center is closest to the quad's
                c = abs(tx + T / 2 - (x0 + x1) / 2) \
                    + abs(ty + T / 2 - (y0 + y1) / 2)
                if best is None or c < best[1]:
                    best = (t, c)
        if best is None:
            host_idx.append(qi)
            continue
        t = best[0]
        ty, tx = corners[t]
        pooled_idx.append(qi)
        tile_ids.append(t)
        tile_quads.append(q - np.array([tx, ty], np.float32))
        tile_bounds.append([min(T, w - tx) - 1.0, min(T, h - ty) - 1.0])

    texts = [None] * len(quads)
    confs = [0.0] * len(quads)
    flipped = [False] * len(quads)

    if pooled_idx:
        normed = [_gray_norm_jit(d, cfg.upload_bits,
                                 cfg.rec_mean, cfg.rec_std)
                  for d in dev_tiles]
        gray_dev = (jnp.concatenate(normed, axis=0) if len(normed) > 1
                    else normed[0])
        ptexts, pconfs, pflips = bucketing.recognize_pooled(
            engine, gray_dev,
            np.asarray(tile_ids, np.int32),
            np.asarray(tile_quads, np.float32),
            np.asarray(tile_bounds, np.float32)[:, None, :],
            beam=beam, timer=getattr(engine, "stage_timer", None),
            # all tiles belong to ONE document: one orientation-prior group
            prior_ids=np.zeros(len(tile_ids), np.int32))
        for k, qi in enumerate(pooled_idx):
            texts[qi] = ptexts[k]
            confs[qi] = pconfs[k]
            flipped[qi] = pflips[k]

    if host_idx:
        # host full-res crops with the same ink-crop canonicalization
        gray = preprocess.to_gray(img)
        strips = []
        for qi in host_idx:
            q = quads[qi]
            margin = cfg.rec_crop_margin * (
                q[:, 1].max() - q[:, 1].min() + 1) \
                if cfg.rec_snap_to_ink else 0.0
            x0 = int(max(0, np.floor(q[:, 0].min() - margin)))
            x1 = int(min(w, np.ceil(q[:, 0].max() + margin) + 1))
            y0 = int(max(0, np.floor(q[:, 1].min() - margin)))
            y1 = int(min(h, np.ceil(q[:, 1].max() + margin) + 1))
            strips.append(_ink_crop_host(
                gray, x0, y0, x1, y1,
                margin_left_px=max(0.0, q[:, 0].min() - x0),
                margin_right_px=max(0.0, (x1 - 1) - q[:, 0].max()),
                x_margin_keep=cfg.rec_ink_x_margin_keep)
                if cfg.rec_snap_to_ink else gray[y0:y1, x0:x1])
        rs = engine.recognize_strips(strips, beam=beam, same_page=True)
        for k, qi in enumerate(host_idx):
            texts[qi] = rs[k].text
            confs[qi] = rs[k].confidence
            flipped[qi] = rs[k].flipped

    if sum(flipped) * 2 > len(quads):  # upside-down document
        order = geometry.sort_reading_order([-q for q in quads])
    else:
        order = geometry.sort_reading_order(quads)
    return OcrResult(lines=[
        OcrLine(box=DetBox(quads[i], ss[i]), text=texts[i],
                confidence=confs[i])
        for i in order])
