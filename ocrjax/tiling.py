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

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ocrjax import geometry, preprocess


@functools.partial(jax.jit, static_argnames=("T",))
def _pad_tiles_jit(x, T: int):
    """(n, th, tw) → (n, T, T), zero-padded bottom/right (never sampled:
    the pooled warp clamps to per-tile bounds)."""
    return jnp.pad(x, ((0, 0), (0, T - x.shape[1]), (0, T - x.shape[2])))


def axis_plan(total: int, tile: int, overlap: int, quantum: int
              ) -> List[Tuple[int, int]]:
    """(start, size) intervals covering [0, total) with ≥`overlap` overlap.

    Full-size tiles march at stride tile−overlap; the REMAINDER is covered
    by a final tile whose size is `total−covered+overlap` rounded UP to a
    multiple of `quantum` (≤ tile), anchored at the end. The classic
    square grid instead appends a FULL tile at total−tile, which for a
    3072-row page at tile 2048 recomputes 1024 redundant rows per column —
    33% of the page's det FLOPs (measured: the DB forward at 2048² is 195
    of the 482 ms steady dense window). Quantizing remainder sizes bounds
    the number of XLA program shapes to ≤ tile/quantum per axis, and in
    practice the pages of one document share one shape set."""
    if total <= tile:
        size = min(tile, -(-total // quantum) * quantum)
        return [(0, size)]
    stride = max(tile - overlap, 1)
    starts = list(range(0, total - tile, stride))   # ≥ [0] since total > tile
    rem = total - (starts[-1] + tile) + overlap     # > overlap by construction
    size = min(tile, -(-rem // quantum) * quantum)
    return [(s, tile) for s in starts] + [(total - size, size)]


def tile_plan(h: int, w: int, cfg) -> List[Tuple[int, int, int, int]]:
    """(y, x, th, tw) tiles covering (h, w), same-shape tiles contiguous
    (sorted by shape) so each shape group uploads + runs as one batch."""
    q = max(cfg.tile_size // 8, 32)
    ys = axis_plan(h, cfg.tile_size, cfg.tile_overlap, q)
    xs = axis_plan(w, cfg.tile_size, cfg.tile_overlap, q)
    corners = [(y, x, th, tw) for (y, th) in ys for (x, tw) in xs]
    corners.sort(key=lambda c: (c[2], c[3], c[0], c[1]))
    return corners


def tile_grid(h: int, w: int, tile: int, overlap: int) -> List[Tuple[int, int]]:
    """Top-left corners of a SQUARE overlapping grid covering (h, w).
    Kept for the uniform-tile case / tests; production planning is
    tile_plan (heterogeneous remainder tiles)."""
    stride = max(tile - overlap, 1)

    def starts(total):
        if total <= tile:
            return [0]
        s = list(range(0, total - tile, stride))
        s.append(total - tile)
        return s

    return [(y, x) for y in starts(h) for x in starts(w)]


def _seam_bands(corners: List[Tuple[int, int, int, int]]):
    """X- and Y-intervals covered by tile overlaps (the seam regions)."""

    def bands(ivals):
        ivals = sorted(set(ivals))
        out = []
        for (a0, a1), (b0, b1) in zip(ivals, ivals[1:]):
            if b0 < a1:                           # overlapping neighbors
                out.append((b0, min(a1, b1)))
        return out

    return (bands([(x, x + tw) for (_, x, _, tw) in corners]),
            bands([(y, y + th) for (y, _, th, _) in corners]))


def _merge_seam_boxes(quads: List[np.ndarray], scores: List[float],
                      iou_thresh: float, x_bands=(), tile_ids=None
                      ) -> Tuple[List[np.ndarray], List[float]]:
    """Union-merge seam duplicates (hull overlap) and seam line-fragments.

    Two quads are fragments of ONE text line cut by a tile seam when their
    vertical bands coincide and their x-ranges meet — or are separated by a
    small gap lying INSIDE a tile-overlap band (detection shrink can leave
    an inter-character gap right at the cut). AABB IoU alone misses both
    cases — two wide fragments sharing only the overlap strip have tiny IoU
    (measured: seam-split lines decoded as two half-strings).

    tile_ids (optional, (n,) int): the fragment rule only fires across
    DIFFERENT tiles — seam fragments by definition come from two tiles,
    while on a dense page two unclip-expanded NEIGHBOR lines in one row of
    one tile can overlap by a few px and must NOT merge (measured: whole
    rows collapsing into one box at 200 lines/page). The IoU-duplicate
    rule stays tile-agnostic.

    All pair predicates are vectorized numpy over (n, n) AABB matrices:
    dense C5 pages carry hundreds of quads, where the original per-pair
    Python loop was O(n²) interpreter work (~1.7 s at n=300, measured)."""
    n = len(quads)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    if n > 1:
        q = np.stack(quads)                      # (n, 4, 2)
        x0, y0 = q[:, :, 0].min(axis=1), q[:, :, 1].min(axis=1)
        x1, y1 = q[:, :, 0].max(axis=1), q[:, :, 1].max(axis=1)
        iw = np.minimum(x1[:, None], x1) - np.maximum(x0[:, None], x0)
        ih = np.minimum(y1[:, None], y1) - np.maximum(y0[:, None], y0)
        inter = np.maximum(iw, 0) * np.maximum(ih, 0)
        area = (x1 - x0) * (y1 - y0)
        iou = inter / np.maximum(area[:, None] + area - inter, 1e-9)
        dup = iou > iou_thresh

        min_h = np.maximum(np.minimum(
            (y1 - y0)[:, None], (y1 - y0)[None, :]), 1.0)
        same_row = ih >= 0.7 * min_h
        meet = iw >= 2.0
        gap0 = np.minimum(x1[:, None], x1)       # the gap interval
        gap1 = np.maximum(x0[:, None], x0)
        small_gap = (gap1 - gap0) <= 1.5 * min_h  # ≤ ~a character wide
        in_band = np.zeros((n, n), bool)
        for (b0, b1) in x_bands:
            in_band |= (gap0 >= b0 - 4.0) & (gap1 <= b1 + 4.0)
        frag = same_row & (meet | (small_gap & in_band))
        if tile_ids is not None:
            t = np.asarray(tile_ids)
            frag &= t[:, None] != t[None, :]

        ii, jj = np.nonzero(np.triu(dup | frag, k=1))
        for i, j in zip(ii.tolist(), jj.tolist()):
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




def _tile_forward(engine):
    """Cached jitted tile program: packed luma tiles → packed candidates.

    Cached per engine + config (the original per-call @jax.jit closure
    retraced AND recompiled the DB tile graph on EVERY page — multi-page
    C5 documents paid a full XLA compile per page). Returns (fwd, tcfg)
    where tcfg carries the per-tile candidate cap (dense C5 tiles hold
    250+ lines where det_max_candidates, sized for 960px C4 canvases,
    silently drops raster-late components — BASELINE.json:11).
    """
    from ocrjax.api_det import _det_state, pack_det
    from ocrjax.postprocess import db_boxes

    cfg = engine.config
    cached = getattr(engine, "_tile_fwd_cache", None)
    if cached is not None and cached[0] == cfg:
        return cached[1], cached[2]
    tcfg = cfg.replace(det_max_candidates=max(
        cfg.det_max_candidates, cfg.tile_max_candidates))
    # Dedicated tile-scale detector (VERDICT r4 next #1): when the cheap
    # variant asset is loaded and enabled, tiles run IT instead of the
    # flagship DB — ~5x fewer FLOPs on the top compute sink of a dense C5
    # page (DESIGN.md §6c). Its head stride flows into tcfg so candidate
    # coordinates scale back to tile pixels (db_boxes.coord_stride).
    arch = getattr(engine, "tile_det_arch", None)
    use_tile_det = (cfg.tile_det_enable
                    and getattr(engine, "tile_det_variables", None)
                    is not None)
    if use_tile_det:
        from ocrjax.models.db import create_db_arch
        tcfg = tcfg.replace(det_head_stride=int(
            (arch or {}).get("head_stride", 1)))
        model = create_db_arch(cfg, arch or {})
        int8 = False  # measured a wash at tile shapes (DESIGN.md §6b)
    else:
        model = _det_state(engine).model
        int8 = cfg.det_int8

    @jax.jit
    def fwd(variables, tiles_u8):
        tiles_u8 = preprocess.unpack_on_device(tiles_u8, cfg)
        x = preprocess.det_normalize_gray(
            tiles_u8, cfg.det_mean, cfg.det_std)
        from ocrjax.models import db_int8
        prob = db_int8.apply_prob(model, variables, x, int8)
        return pack_det(jax.vmap(
            lambda p: db_boxes.extract_boxes_from_config(p, tcfg))(prob))

    engine._tile_fwd_cache = (cfg, fwd, tcfg)
    return fwd, tcfg


def _tile_det_vars(engine):
    """The weights matching _tile_forward's model: the dedicated tile
    detector's when active, the flagship detection stage's otherwise."""
    from ocrjax.api_det import _det_state
    if (engine.config.tile_det_enable
            and getattr(engine, "tile_det_variables", None) is not None):
        return engine.tile_det_variables
    return _det_state(engine).variables


def _prep_page(engine, img: np.ndarray):
    """Host-side tile plan: (corners, shape groups).

    corners: list of (y, x, th, tw) in shape-group order (tile_plan).
    groups: list of (n_g, th, tw) u8 luma stacks, one per distinct tile
    shape, concatenation aligned with corners. Heterogeneous remainder
    tiles (axis_plan) cut the redundant-overlap det compute; luma tiles —
    single-channel uploads (see det_normalize_gray). REPLICATE padding:
    zero padding puts a hard white→black edge at the page border, which
    the detector reads as a text-like stroke (measured: a tall spurious
    box hugging the border that also corrupts reading-order row
    clustering); edge replication makes the pad seamless for any
    background shade.
    """
    cfg = engine.config
    h, w = img.shape[:2]
    corners = tile_plan(h, w, cfg)
    gray = preprocess.to_gray(img)
    ph = max(h, max(y + th for (y, _, th, _) in corners))
    pw = max(w, max(x + tw for (_, x, _, tw) in corners))
    padded = np.pad(gray, ((0, ph - h), (0, pw - w)), mode="edge")
    if cfg.tile_blank_skip and len(corners) > 1:
        # Blank-tile prescreen (VERDICT r4 next #1): a tile with no
        # stroke-level luma contrast cannot contain text — skip its
        # upload AND det forward entirely. The <24-level rule is
        # conservative by construction: any tile holding visible ink has
        # far more contrast, and even sensor noise on degraded scans
        # exceeds it (such pages simply keep every tile). Downstream
        # stays consistent because corners/groups shrink together: the
        # dropped tiles can host no candidates and no quad's expanded
        # crop (a quad needs ink, so some kept tile fully contains it —
        # the same containment the assignment uses).
        def _has_ink(y, x, th, tw):
            t = padded[y:y + th, x:x + tw]
            sub = t[::4, ::4]
            return int(sub.max()) - int(sub.min()) >= 24
        kept = [c for c in corners if _has_ink(*c)]
        corners = kept if kept else corners[:1]  # ≥1 tile: empty result
    groups = []
    k = 0
    while k < len(corners):
        th, tw = corners[k][2], corners[k][3]
        j = k
        while j < len(corners) and corners[j][2:] == (th, tw):
            j += 1
        groups.append(np.stack([padded[y:y + th, x:x + tw]
                                for (y, x, _, _) in corners[k:j]]))
        k = j
    return corners, groups


def _dispatch_group(engine, tiles: np.ndarray):
    """Upload one shape group's tiles and launch the detection program
    WITHOUT reading the result (dispatch ahead, fetch late — DESIGN.md
    §2): returns (dev, packed, tiles) for _fetch_page."""
    fwd, _ = _tile_forward(engine)
    n = len(tiles)
    mesh = getattr(engine, "tile_mesh", None)
    if mesh is None:
        dev = jnp.asarray(preprocess.pack_for_upload(tiles, engine.config))
        packed = fwd(_tile_det_vars(engine), dev)
    else:
        # dp-sharded C5 serving (parallel.mesh.shard_tiled_serving): the
        # tile axis is the natural DP axis — per-tile chains are
        # independent, so GSPMD inserts zero collectives and detection
        # throughput scales with the dp size. Tiles pad to a dp multiple
        # with WHITE (no-ink) rows; the [:n] slice drops their candidate
        # rows before anything is fetched.
        from ocrjax.parallel import mesh as M
        dp = mesh.shape[M.DP_AXIS]
        pad = (-n) % dp
        arr = tiles if not pad else np.concatenate(
            [tiles, np.full((pad,) + tiles.shape[1:], 255, tiles.dtype)])
        fwd_s = _tile_forward_sharded(engine, mesh)
        dev = jax.device_put(
            preprocess.pack_for_upload(arr, engine.config),
            M.batch_sharding(mesh))
        packed = fwd_s(_tile_det_vars(engine), dev)[:n]
    try:
        packed.copy_to_host_async()
    except (AttributeError, NotImplementedError):
        pass
    return dev, packed, tiles


def _tile_forward_sharded(engine, mesh):
    """The _tile_forward program jit'd over the mesh (tile axis dp-sharded,
    params replicated, packed candidates dp-sharded); cached per
    (config, mesh)."""
    from ocrjax.parallel import mesh as M
    cfg = engine.config
    cached = getattr(engine, "_tile_fwd_sharded_cache", None)
    if cached is not None and cached[0] == (cfg, mesh):
        return cached[1]
    inner = _tile_forward(engine)[0].__wrapped__
    bs, rep = M.batch_sharding(mesh), M.replicated(mesh)
    fwd_s = jax.jit(inner, in_shardings=(rep, bs), out_shardings=bs)
    engine._tile_fwd_sharded_cache = ((cfg, mesh), fwd_s)
    return fwd_s


def _dispatch_page(engine, groups) -> list:
    """Dispatch every shape group of a page; returns the group list for
    _fetch_page."""
    return [_dispatch_group(engine, tiles) for tiles in groups]


def _fetch_group(engine, dispatched, depth: int = 0):
    """Block on one dispatched group's candidates → (devs, boxes, scores,
    valid). On device OOM the group's tiles redo in halves (SURVEY.md §5
    failure detection), synchronously."""
    from ocrjax.api_det import fetch_det

    _, tcfg = _tile_forward(engine)
    dev, packed, tiles = dispatched
    adapt = getattr(engine, "_det_fetch_adapt", None)
    if adapt is None:
        adapt = engine._det_fetch_adapt = {}
    try:
        out = fetch_det([packed], tcfg, adapt=adapt,
                        timer=getattr(engine, "stage_timer", None),
                        stage="tile_det_fetch")
        return [dev], out[0], out[1], out[2]
    except Exception as e:  # jaxlib raises XlaRuntimeError on OOM
        if "RESOURCE_EXHAUSTED" not in str(e) or depth >= 3 \
                or len(tiles) <= 1:
            raise
        from ocrjax.utils.logging import get_logger, log_fields
        log_fields(get_logger("ocrjax.tiling"), "warning",
                   "device OOM: halving tile batch",
                   tiles=len(tiles), depth=depth)
        del dev, packed
        mid = len(tiles) // 2
        parts = [_fetch_group(engine, _dispatch_group(engine, tiles[:mid]),
                              depth + 1),
                 _fetch_group(engine, _dispatch_group(engine, tiles[mid:]),
                              depth + 1)]
        return (parts[0][0] + parts[1][0],
                np.concatenate([parts[0][1], parts[1][1]]),
                np.concatenate([parts[0][2], parts[1][2]]),
                np.concatenate([parts[0][3], parts[1][3]]))


def _fetch_page(engine, dispatched):
    """Block on a dispatched page (all shape groups) → (dev_tiles, boxes,
    scores, valid), row order aligned with the page's corners. The common
    path fetches every group's packed payload through ONE fetch_det call
    per group (each is already async-copying); OOM halving is group-local
    (_fetch_group)."""
    devs, bs, ss, vs = [], [], [], []
    for d in dispatched:
        dv, b, s, v = _fetch_group(engine, d)
        devs.extend(dv)
        bs.append(b)
        ss.append(s)
        vs.append(v)
    if len(bs) == 1:
        return devs, bs[0], ss[0], vs[0]
    return (devs, np.concatenate(bs), np.concatenate(ss),
            np.concatenate(vs))


def _merge_page(engine, corners, boxes, scores, valid, h, w):
    """Candidates → seam-merged page-frame (quads, scores) + saturation.

    Truncation semantics (BASELINE.json:11 beyond-capacity pages): a tile
    whose valid candidates REACH the per-tile cap may hold more lines than
    extract_boxes could return (components past the cap drop in raster
    order, i.e. the page bottom goes first) — the page is flagged truncated
    rather than silently short."""
    cfg = engine.config
    _, tcfg = _tile_forward(engine)
    saturated = bool((valid.sum(axis=1) >= tcfg.det_max_candidates).any())
    if saturated:
        from ocrjax.utils.logging import get_logger, log_fields
        log_fields(get_logger("ocrjax.tiling"), "warning",
                   "tile candidate cap reached — page likely truncated",
                   cap=tcfg.det_max_candidates, tiles=len(corners))

    quads, ss, tids = [], [], []
    for t, (y, x, _, _) in enumerate(corners):
        for i in np.where(valid[t])[0]:
            q = boxes[t, i] + np.array([x, y], np.float32)
            # clip to the real (unpadded) page
            q[:, 0] = np.clip(q[:, 0], 0, w - 1)
            q[:, 1] = np.clip(q[:, 1], 0, h - 1)
            quads.append(q)
            ss.append(float(scores[t, i]))
            tids.append(t)

    x_bands, _ = _seam_bands(corners)
    merged = _merge_seam_boxes(quads, ss, cfg.tile_merge_iou, x_bands,
                               tile_ids=tids)
    return merged, saturated


def _run_tiles(engine, img: np.ndarray):
    """Tile a page and run chunked DB detection over the tiles.

    Returns (corners, dev_tiles, merged, saturated) where dev_tiles is the
    list of uploaded (packed) device tile chunks — kept so recognition
    reuses the SAME upload — and merged is the seam-merged (quads, scores)
    in the original image frame.
    """
    h, w = img.shape[:2]
    corners, groups = _prep_page(engine, img)
    dev_tiles, boxes, scores, valid = _fetch_page(
        engine, _dispatch_page(engine, groups))
    merged, saturated = _merge_page(engine, corners, boxes, scores, valid,
                                    h, w)
    return corners, dev_tiles, merged, saturated


def detect_tiled(engine, image) -> List["DetBox"]:
    """C5 detection: tile → batched DB forward → seam merge → reading order.

    Coordinates are returned in the ORIGINAL image frame. Small pages
    (≤ tile_size) degrade gracefully to one tile.
    """
    from ocrjax.api import DetBox

    img = preprocess.load_image(
        image, auto_invert=engine.config.auto_invert)
    _, _, (quads, ss), _ = _run_tiles(engine, img)
    order = geometry.sort_reading_order(quads)
    return [DetBox(quads[i], ss[i]) for i in order]


def _assign_quads_to_tiles(cfg, corners, quads, h, w):
    """Assign each merged quad to a tile that fully contains its expanded
    crop. Returns (tile_ids, tile_quads, tile_bounds, pooled_idx, host_idx):
    quads no tile fully contains (lines longer than tile_size − 2·overlap)
    go to host_idx for full-res host crops."""
    tile_ids, tile_quads, tile_bounds = [], [], []
    pooled_idx, host_idx = [], []
    for qi, q in enumerate(quads):
        qh = q[:, 1].max() - q[:, 1].min() + 1.0
        m = cfg.rec_crop_margin * qh + 2.0 if cfg.rec_snap_to_ink else 2.0
        x0, x1 = q[:, 0].min() - m, q[:, 0].max() + m
        y0, y1 = q[:, 1].min() - m, q[:, 1].max() + m
        # containment within the PAGE-valid part of the tile (or the page
        # border itself — expansion clamps there anyway)
        cx0, cy0 = max(x0, 0.0), max(y0, 0.0)
        cx1, cy1 = min(x1, w - 1.0), min(y1, h - 1.0)
        best = None
        for t, (ty, tx, th, tw) in enumerate(corners):
            if cx0 >= tx and cy0 >= ty and cx1 < tx + tw and cy1 < ty + th:
                # prefer the tile whose center is closest to the quad's
                c = abs(tx + tw / 2 - (x0 + x1) / 2) \
                    + abs(ty + th / 2 - (y0 + y1) / 2)
                if best is None or c < best[1]:
                    best = (t, c)
        if best is None:
            host_idx.append(qi)
            continue
        t = best[0]
        ty, tx, th, tw = corners[t]
        pooled_idx.append(qi)
        tile_ids.append(t)
        tile_quads.append(q - np.array([tx, ty], np.float32))
        tile_bounds.append([min(tw, w - tx) - 1.0, min(th, h - ty) - 1.0])
    return tile_ids, tile_quads, tile_bounds, pooled_idx, host_idx


def _host_fallback_strips(engine, img, quads, host_idx):
    """Full-res host crops (ink-canonicalized) for quads no tile contains."""
    from ocrjax.api_det import _ink_crop_host

    cfg = engine.config
    h, w = img.shape[:2]
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
            x_margin_keep=cfg.rec_ink_x_margin_keep,
            flat_frac=cfg.rec_flat_band_frac,
            box_h_px=(float(np.linalg.norm(q[3] - q[0]))
                      if cfg.rec_flat_case_gate else 0.0))
            if cfg.rec_snap_to_ink else gray[y0:y1, x0:x1])
    return strips


def max_pool_tiles(cfg) -> int:
    """Window tile cap from the HBM budget (cfg.tile_window_hbm_mb).

    Per-tile live footprint while a window is pooled: the normalized
    float32 copy (T²·4 B) + the packed luma upload (T²·bits/8 B) + the
    det-forward transient share (prob map f32 + the NHWC bf16 feature
    pyramid, ~12 B/px at stride-1 head). At T=2048/4-bit upload that is
    ~66 MB/tile → the default 1536 MB budget admits 23 tiles/window
    (the old fixed cap was 16). Detection double-buffering keeps two
    windows live at once; the budget is per window.
    """
    bytes_per_tile = cfg.tile_size * cfg.tile_size * (
        4.0 + cfg.upload_bits / 8.0 + 12.0)
    return max(2, int(cfg.tile_window_hbm_mb * 2**20 / bytes_per_tile))


def ocr_tiled_batch(engine, images, beam: bool = False,
                    _allow_rot90: bool = True) -> List["OcrResult"]:
    """Multi-page C5 driver: pooled tiled OCR with per-page isolation.

    Pages stream through in windows bounded by max_pool_tiles(cfg): within
    a window every page's tile detection is dispatched before any result
    is read (upload of page k+1 rides the link while page k computes), and
    recognition pools ALL the window's line crops across pages into shared
    width buckets — the same cross-page pooling bucketing.ocr_pages does
    for C4, so an N-page document no longer pays N serial per-page
    pipelines (VERDICT r2 weak #5). Windows are DOUBLE-BUFFERED: window
    k+1's tile uploads + DB forwards are dispatched before window k's
    candidates are fetched, so the device runs detection of the next
    window while the host seam-merges, assigns and decodes the current
    one (VERDICT r3 weak #1 — the phases were serial per window). A
    failed page decode yields an empty result without failing the batch
    (SURVEY.md §5).
    """
    from ocrjax import bucketing
    from ocrjax.api import DetBox, OcrLine, OcrResult
    from ocrjax.api_det import _gray_norm_jit

    cfg = engine.config
    B = len(images)
    results: List = [None] * B
    timer = getattr(engine, "stage_timer", None)
    T = timer if timer is not None else bucketing._NullStage()

    # ---- streaming windows: page i+1's decode + tile plan runs on the
    # prefetch thread while page i uploads/dispatches, so only the FIRST
    # page's host prep sits on the critical path (measured 95 ms of the
    # 482 ms steady dense window when it was a serial upfront loop).
    # Window budget: the HBM cap, tightened to tile_pipeline_tiles for
    # multi-page batches so the double-buffer below has ≥2 windows to
    # overlap. -----------------------------------------------------------
    from ocrjax.fused import _get_prefetch_pool

    cap = max_pool_tiles(cfg)
    if B > 1 and cfg.tile_pipeline_tiles > 0:
        cap = min(cap, cfg.tile_pipeline_tiles)

    def _prep(i):
        try:
            img = preprocess.load_image(
                images[i], auto_invert=cfg.auto_invert)
            corners, tiles = _prep_page(engine, img)
            return (i, img, corners, tiles)
        except (FileNotFoundError, ValueError, OSError):
            return (i, None, None, None)

    def _iter_windows():
        pool = _get_prefetch_pool()
        fut = pool.submit(_prep, 0) if B else None
        window, budget = [], 0
        first = B > 1  # ramp-up: the FIRST window is a single page, so
        #              its (blocking) upload + detection start immediately
        #              and the pipeline fills while later windows prep
        for i in range(B):
            with T.stage("tile_prep"):
                page = fut.result()
            fut = pool.submit(_prep, i + 1) if i + 1 < B else None
            if page[1] is None:
                results[page[0]] = OcrResult(lines=[])
                continue
            # heterogeneous tiles, in full-tile equivalents: the upload +
            # det-transient terms scale with real pixel area, but the f32
            # term is counted at a FULL tile per tile — phase 3 pads every
            # remainder tile to (T, T) float32 before the pooled concat,
            # so a remainder-heavy window's live f32 stack is full-sized
            # regardless of pixel area (ADVICE r4: the fractional budget
            # overshot tile_window_hbm_mb by ~35% on such windows).
            area_terms = cfg.upload_bits / 8.0 + 12.0
            per_full_tile = 4.0 + area_terms
            n_tiles = sum(
                g.shape[0] * (4.0 + area_terms * g.shape[1] * g.shape[2]
                              / float(cfg.tile_size ** 2))
                for g in page[3]) / per_full_tile
            if window and (first or budget + n_tiles > cap):
                yield window
                window, budget = [], 0
                first = False
            window.append(page)
            budget += n_tiles
        if window:
            yield window

    def _dispatch_window(window):
        """Batch same-shape tiles ACROSS the window's pages into one
        dispatch per shape: the v5e det forward at batch 1 measured ~1.7x
        worse per pixel than batch ≥2, and every extra fetch costs a full
        link RTT (~25 ms on this tunnel). Returns a list of
        (spans, dispatched) where spans = [(page_pos, n_tiles), ...] in
        concat order; shape groups are sorted by (th, tw) — the same order
        tile_plan sorts a page's corners — so per-page rows concatenate
        back into corner order."""
        with T.stage("tile_det_dispatch"):
            by_shape = {}
            for pi, (_, _, _, groups) in enumerate(window):
                for g in groups:
                    by_shape.setdefault(g.shape[1:], []).append((pi, g))
            disp = []
            for sh in sorted(by_shape):
                items = by_shape[sh]
                tiles = (np.concatenate([g for _, g in items])
                         if len(items) > 1 else items[0][1])
                spans = [(pi, len(g)) for pi, g in items]
                disp.append((spans, _dispatch_group(engine, tiles)))
            return disp

    def _fetch_window(window, disp):
        """Fetch all shape groups (one RTT each, halving on OOM), scatter
        rows back per page in corner order, and compute each tile's global
        row in the window's pooled (padded) tile stack.

        Returns (per_page, devs): per_page[pi] = (boxes, scores, valid,
        rows) aligned with window[pi]'s corners; devs = packed device
        uploads in group order (phase 3 normalizes + pads + concats these
        into the pooled recognition stack, whose row order is exactly the
        fetch order here)."""
        n_pages = len(window)
        parts = [[] for _ in range(n_pages)]   # (boxes, scores, valid)
        rows = [[] for _ in range(n_pages)]
        devs = []
        row_off = 0
        # ONE link round trip for ALL shape groups: packed candidate rows
        # share one width across tile shapes (the cap lives in tcfg, not
        # the tile dims), so the groups concat on device and cross as a
        # single buffer — n_groups−1 fewer RTTs per window (~23 ms each on
        # this tunnel; a het-tile dense page has 2+ groups). Device OOM
        # falls back to the per-group halving fetch.
        group_results = None
        if len(disp) > 1:
            try:
                from ocrjax.api_det import fetch_det
                _, tcfg = _tile_forward(engine)
                adapt = getattr(engine, "_det_fetch_adapt", None)
                if adapt is None:
                    adapt = engine._det_fetch_adapt = {}
                pcat = jnp.concatenate([d[1] for _, d in disp])
                with T.stage("tile_det_fetch"):
                    b_all, s_all, v_all = fetch_det(
                        [pcat], tcfg, adapt=adapt,
                        timer=getattr(engine, "stage_timer", None),
                        stage="tile_det_fetch")
                group_results, off = [], 0
                for _, d in disp:
                    n_g = d[1].shape[0]
                    group_results.append(
                        ([d[0]], b_all[off:off + n_g],
                         s_all[off:off + n_g], v_all[off:off + n_g]))
                    off += n_g
            except Exception as e:  # noqa: BLE001 — OOM → per-group path
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                group_results = None
        for gi, (spans, d) in enumerate(disp):
            if group_results is not None:
                dv, b, s, v = group_results[gi]
            else:
                with T.stage("tile_det_fetch"):
                    dv, b, s, v = _fetch_group(engine, d)
            devs.extend(dv)
            off = 0
            for pi, n in spans:
                parts[pi].append((b[off:off + n], s[off:off + n],
                                  v[off:off + n]))
                rows[pi].extend(range(row_off + off, row_off + off + n))
                off += n
            row_off += off
        per_page = []
        for pi in range(n_pages):
            bs, ss, vs = zip(*parts[pi])
            per_page.append((
                np.concatenate(bs) if len(bs) > 1 else bs[0],
                np.concatenate(ss) if len(ss) > 1 else ss[0],
                np.concatenate(vs) if len(vs) > 1 else vs[0],
                rows[pi]))
        return per_page, devs

    rot90_pages = []  # (i, img)
    win_it = _iter_windows()
    w_cur = next(win_it, None)
    disp = _dispatch_window(w_cur) if w_cur is not None else None
    while w_cur is not None:
        window, d_cur = w_cur, disp
        # dispatch the NEXT window's detection before touching this one's
        # results: det(k+1) fills the device while the host works on k
        w_cur = next(win_it, None)
        disp = _dispatch_window(w_cur) if w_cur is not None else None

        # -- phase 2: window fetch, then seam merge per page ----------------
        per_page, dev_groups = _fetch_window(window, d_cur)
        win = []   # per-page dicts for the recognition pool
        for (i, img, corners, _), (boxes, scores, valid, rows) in zip(
                window, per_page):
            h, w = img.shape[:2]
            with T.stage("tile_seam_merge"):
                (quads, ss), saturated = _merge_page(
                    engine, corners, boxes, scores, valid, h, w)
            if not quads:
                results[i] = OcrResult(lines=[], truncated=saturated)
                continue
            # landscape-scan reroute (mirrors api_det.ocr): redo the whole
            # document rotated 90° ccw at the end, batched with its peers;
            # the line cls resolves the leftover 180° ambiguity.
            if (_allow_rot90 and cfg.rec_try_flip and cfg.rot90_tilt_deg > 0
                    and float(np.median(geometry.quad_tilt_deg(
                        np.asarray(quads)))) > cfg.rot90_tilt_deg):
                rot90_pages.append((i, img))
                continue
            win.append(dict(i=i, img=img, corners=corners, rows=rows,
                            quads=quads, ss=ss, saturated=saturated))

        if not win:
            continue

        # -- phase 3: one pooled recognition across the window --------------
        with T.stage("tile_assign"):
            g_tids, g_tquads, g_tbounds, g_prior = [], [], [], []
            pooled_refs = []  # (page dict, qi) aligned with the pooled rows
            for p in win:
                h, w = p["img"].shape[:2]
                tids, tquads, tbounds, pooled_idx, host_idx = \
                    _assign_quads_to_tiles(
                        cfg, p["corners"], p["quads"], h, w)
                p["host_idx"] = host_idx
                p["texts"] = [None] * len(p["quads"])
                p["confs"] = [0.0] * len(p["quads"])
                p["flipped"] = [False] * len(p["quads"])
                for k, qi in enumerate(pooled_idx):
                    g_tids.append(p["rows"][tids[k]])
                    g_tquads.append(tquads[k])
                    g_tbounds.append(tbounds[k])
                    g_prior.append(p["i"])
                    pooled_refs.append((p, qi))
            normed = []
            for d in dev_groups:
                g = _gray_norm_jit(
                    d, cfg.upload_bits, cfg.rec_mean, cfg.rec_std)
                # pad heterogeneous (remainder) tiles up to (T, T) so
                # the window's tiles stack into ONE pooled page array;
                # per-quad bounds (tile_bounds) keep the warp's
                # samples inside the real tile, so pad content is
                # never read. No-op (and no copy) for full tiles.
                if g.shape[1:] != (cfg.tile_size, cfg.tile_size):
                    g = _pad_tiles_jit(g, cfg.tile_size)
                normed.append(g)

        if pooled_refs:
            gray_dev = (jnp.concatenate(normed, axis=0) if len(normed) > 1
                        else normed[0])
            ptexts, pconfs, pflips = bucketing.recognize_pooled(
                engine, gray_dev,
                np.asarray(g_tids, np.int32),
                np.asarray(g_tquads, np.float32),
                np.asarray(g_tbounds, np.float32)[:, None, :],
                beam=beam, timer=timer,
                # tiles of one document share one orientation-prior group
                prior_ids=np.asarray(g_prior, np.int32))
            for k, (p, qi) in enumerate(pooled_refs):
                p["texts"][qi] = ptexts[k]
                p["confs"][qi] = pconfs[k]
                p["flipped"][qi] = pflips[k]

        # -- phase 4: host-fallback crops + per-page assembly ----------------
        for p in win:
            if p["host_idx"]:
                with T.stage("tile_host_fallback"):
                    strips = _host_fallback_strips(
                        engine, p["img"], p["quads"], p["host_idx"])
                    rs = engine.recognize_strips(strips, beam=beam,
                                                 same_page=True)
                    for k, qi in enumerate(p["host_idx"]):
                        p["texts"][qi] = rs[k].text
                        p["confs"][qi] = rs[k].confidence
                        p["flipped"][qi] = rs[k].flipped
            with T.stage("tile_assembly"):
                quads, ss = p["quads"], p["ss"]
                if sum(p["flipped"]) * 2 > len(quads):  # upside-down doc
                    order = geometry.sort_reading_order([-q for q in quads])
                else:
                    order = geometry.sort_reading_order(quads)
                results[p["i"]] = OcrResult(lines=[
                    OcrLine(box=DetBox(quads[k], ss[k]), text=p["texts"][k],
                            confidence=p["confs"][k])
                    for k in order], truncated=p["saturated"])

    # ---- rot90 redo: ONE recursive batched call for all landscape pages ---
    if rot90_pages:
        rres = ocr_tiled_batch(
            engine, [np.ascontiguousarray(np.rot90(img))
                     for (_, img) in rot90_pages],
            beam=beam, _allow_rot90=False)
        for (i, img), rr in zip(rot90_pages, rres):
            w = img.shape[1]
            results[i] = OcrResult(lines=[
                OcrLine(box=DetBox(
                    geometry.rot90_ccw_to_orig(l.box.quad, w), l.box.score),
                    text=l.text, confidence=l.confidence)
                for l in rr.lines], truncated=rr.truncated)
    return results


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
    The single-page case of ocr_tiled_batch.
    """
    return ocr_tiled_batch(engine, [image], beam=beam,
                           _allow_rot90=_allow_rot90)[0]
