"""Width/count bucketing + the pooled batched end-to-end path (C4).

SURVEY.md §2.3 N13 / BASELINE.json:10: a 32-page batch produces hundreds of
line crops of wildly varying widths. Dynamic shapes would force a recompile
per page, so crops are pooled ACROSS pages and routed into a fixed set of
(line-count, strip-width) buckets; each bucket is one cached XLA program.
Masking (strip widths → CTC frame lengths) keeps padded lanes from
corrupting decoded strings.

Pipeline (ocr_pages):
  1. one batched DB forward + on-device box extraction over all canvases;
  2. host: gather valid quads of all pages, estimate strip widths, group
     into width buckets;
  3. per bucket: pooled multi-page warp (one gather) + CRNN + CTC decode;
  4. scatter decoded lines back to their pages, reading-order per page.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ocrjax import geometry, preprocess
from ocrjax.ops.warp import (expand_quads, warp_quads_multi,
                             warp_quads_multi_refined,
                             warp_quads_multi_sep_refined,
                             warp_quads_multi_separable)


def assign_width_buckets(est_widths: np.ndarray, buckets: Sequence[int]
                         ) -> Dict[int, np.ndarray]:
    """Group indices by the smallest bucket ≥ estimated width."""
    out: Dict[int, List[int]] = {}
    arr = np.asarray(buckets)
    for i, w in enumerate(est_widths):
        b = int(arr[np.searchsorted(arr, min(w, arr[-1]))])
        out.setdefault(b, []).append(i)
    return {k: np.asarray(v, np.int64) for k, v in out.items()}


def pad_count(n: int, cfg) -> int:
    return cfg.line_bucket_for_count(n)


def sep_warp_mask(quads: np.ndarray, warp_src: np.ndarray, cfg,
                  page_h: int | None = None) -> np.ndarray:
    """Which pooled quads may take the separable MXU warp (cfg.pooled_sep_warp).

    A quad qualifies when its tilt from horizontal sits within the same
    per-box noise-aware threshold the fused rotation reroute trusts
    (max(fused_rotation_reroute_deg, atan(noise_px / long_side)) — below
    that, measured tilt is prob-map extent noise and an AABB crop matches
    the homography crop after ink refinement, the identical argument the
    fused path's default separable warp rests on), and when the expanded
    AABB fits the warp's row tile. Tilted, near-vertical (landscape), and
    tall quads keep the exact homography gather warp.
    """
    q = np.asarray(quads, np.float32)
    tilt = geometry.quad_tilt_deg(q)          # [0, 90] from horizontal
    w_len = np.linalg.norm(q[:, 1] - q[:, 0], axis=1)
    h_len = np.linalg.norm(q[:, 3] - q[:, 0], axis=1)
    long_side = np.maximum(np.maximum(w_len, h_len), 1.0)
    thresh = np.maximum(
        cfg.fused_rotation_reroute_deg,
        np.degrees(np.arctan2(cfg.fused_reroute_noise_px, long_side)))
    ws = np.asarray(warp_src, np.float32)
    aabb_h = ws[..., 1].max(axis=-1) - ws[..., 1].min(axis=-1)
    tile_h = cfg.pooled_sep_tile_h
    if page_h is not None:  # the warp clamps its row tile to the page
        tile_h = min(tile_h, int(page_h))
    return (tilt <= thresh) & (aabb_h <= tile_h - 4)


class _NullStage:
    def stage(self, name):
        import contextlib
        return contextlib.nullcontext()


def recognize_pooled(engine, gray_dev, page_ids, quads, b_all,
                     beam: bool = False, timer=None, prior_ids=None):
    """Pooled width-bucketed recognition over normalized device pages.

    The shared engine room of C4 (ocr_pages) and C5 (tiling.ocr_tiled):
    quads from MANY pages/tiles are expanded, ink-refine-warped and
    recognized together in per-width-bucket programs, dispatched ahead with
    async fetches.

    gray_dev: (P, S, S) float32 normalized pages/tiles on device.
    page_ids: (N,) int32 row into gray_dev per quad.
    quads: (N, 4, 2) float32 page-frame quads (tight detector boxes).
    b_all: (N, 1, 2) float32 per-quad valid (max_x, max_y) bounds.
    Returns (texts, confs, flipped) aligned with quads; flipped[i] is True
    when cfg.rec_try_flip's orientation classifier rotated that strip 180°
    on device before recognition. Flip decisions come from a page-wide
    two-phase pass (margins for all quads → host page prior over FULL
    prior_ids groups → forced flips in the rec dispatches), so page-mates
    in different width buckets share one consensus. prior_ids groups quads
    sharing a PAGE (tiles of one document should share a group); defaults
    to page_ids.
    """
    from ocrjax.api_det import (_cls_margins_multi_jit,
                                _estimate_strip_widths,
                                _rec_strips_forced_flip_packed_jit,
                                _rec_strips_packed_jit, apply_page_prior,
                                unpack_rec, unpack_rec_flip)

    cfg = engine.config
    T = timer if timer is not None else _NullStage()
    # Canonicalize the pooled page-axis to a power-of-two row count: P is
    # otherwise a FREE shape dimension — every window composition (3 pages,
    # 5 tiles, ...) yields a new P, and each (P, width-bucket, count-bucket)
    # triple is a separate XLA program. Measured on TPU: a 4-page tiled
    # window paid full compiles mid-batch and ran 5.7x slower than serial.
    # Zero-padded rows are never referenced (page_ids only index real rows).
    P = int(gray_dev.shape[0])
    Pb = 1 << max(P - 1, 0).bit_length()
    if Pb != P:
        gray_dev = jnp.concatenate(
            [gray_dev,
             jnp.zeros((Pb - P,) + gray_dev.shape[1:], gray_dev.dtype)])
    warp_src = quads
    # Width estimate from the TIGHT det quads, with refinement headroom: the
    # ink refinement rescales the ink band to full strip height, so final
    # widths can exceed the det-quad aspect by the margin error (~25%).
    # Estimating from the EXPANDED quads instead systematically
    # under-buckets and truncates long lines (measured: whole-line garbage).
    est_w = _estimate_strip_widths(quads, cfg.rec_height)
    if cfg.rec_snap_to_ink:
        est_w = est_w * 1.25
    if cfg.rec_snap_to_ink and cfg.rec_crop_margin > 0:
        warp_src = expand_quads(
            quads, cfg.rec_crop_margin, cfg.rec_crop_margin, bounds=b_all)

    texts = [None] * len(quads)
    confs = [0.0] * len(quads)
    flips = [False] * len(quads)
    try_flip = cfg.rec_try_flip
    if try_flip:
        engine.warn_untrained_cls()
    if prior_ids is None:
        prior_ids = page_ids
    pending = []
    # One dispatch per (width bucket, warp kind, count chunk): a width
    # bucket holding more quads than the largest count bucket is split, not
    # crashed (C5 pages can pool hundreds of same-width lines). Warp kind
    # (cfg.pooled_sep_warp): near-axis-aligned quads take the separable MXU
    # warp — the gather-based homography warp measured ~1.4 ms/strip of
    # device time on the v5e (93% of the bucketed path's dominant stage,
    # scripts/diag_rec_fetch.py) — while tilted/tall quads keep exact
    # homography rectification. On all-straight or all-tilted inputs (the
    # common cases) the split adds no chunks and no padding.
    cap = cfg.line_batch_buckets[-1]
    sep_ok = (sep_warp_mask(quads, warp_src, cfg,
                            page_h=int(gray_dev.shape[1]))
              if cfg.pooled_sep_warp
              else np.zeros(len(quads), bool))
    chunks = []
    for bucket_w, idx_all in assign_width_buckets(
            est_w, cfg.rec_width_buckets).items():
        for sep in (True, False):
            gidx = idx_all[sep_ok[idx_all] == sep]
            for lo in range(0, len(gidx), cap):
                chunks.append((bucket_w, gidx[lo:lo + cap], sep))
    flips_all = None
    if try_flip:
        # PHASE A+B of the page-wide orientation pass: margins for EVERY
        # quad (chunked, all dispatched ahead, plain probe warps), then the
        # page prior on host over the FULL prior_ids groups — page-mates in
        # different width buckets share the consensus, which a per-dispatch
        # prior would fragment exactly for the short ambiguous lines the
        # prior exists for. Costs one extra (tiny) fetch per chunk before
        # the rec dispatches.
        with T.stage("cls_margins"):
            margins = np.zeros(len(quads), np.float32)
            mpend = []
            for bucket_w, idx, _sep in chunks:
                n = len(idx)
                nb = pad_count(n, cfg)
                sel = np.concatenate([idx, np.repeat(idx[-1:], nb - n)])
                out = _cls_margins_multi_jit(
                    engine, engine.cls_variables, gray_dev,
                    jnp.asarray(page_ids[sel]), jnp.asarray(warp_src[sel]),
                    bucket_w)
                mpend.append((idx, out))
            # ONE device concat + ONE fetch: each np.asarray on the remote
            # tunnel pays a full RTT, so K chunk fetches cost K×RTT while
            # the payloads are tiny — coalescing makes the margin pass one
            # round trip total (VERDICT r2 weak #3)
            mcat = (jnp.concatenate([o for _, o in mpend])
                    if len(mpend) > 1 else mpend[0][1])
            mhost = np.asarray(mcat)
            off = 0
            for idx, out in mpend:
                margins[idx] = mhost[off: off + len(idx)]
                off += out.shape[0]
            if cfg.cls_page_prior > 0:
                seg = np.unique(prior_ids, return_inverse=True)[1]
                margins = np.asarray(apply_page_prior(
                    jnp.asarray(margins), jnp.asarray(est_w, jnp.int32),
                    jnp.asarray(seg, jnp.int32), cfg.cls_page_prior))
            flips_all = margins > 0
    with T.stage("rec_dispatch"):
        for bucket_w, idx, sep in chunks:
            n = len(idx)
            nb = pad_count(n, cfg)
            sel = np.concatenate([idx, np.repeat(idx[-1:], nb - n)])
            ws, oq = warp_src[sel], quads[sel]
            if cfg.rec_snap_to_ink:
                refined_warp = (warp_quads_multi_sep_refined if sep
                                else warp_quads_multi_refined)
                kw = ({"tile_h": cfg.pooled_sep_tile_h} if sep else {})
                strips, widths = refined_warp(
                    gray_dev, jnp.asarray(page_ids[sel]),
                    jnp.asarray(ws), jnp.asarray(b_all[sel]),
                    rec_height=cfg.rec_height, bucket_width=bucket_w,
                    ink_thresh=(0.5 - cfg.rec_mean) / cfg.rec_std,
                    margin_fracs=(cfg.rec_crop_margin, cfg.rec_crop_margin),
                    x_margin_keep=cfg.rec_ink_x_margin_keep,
                    pad_value=(0.0 - cfg.rec_mean) / cfg.rec_std,
                    orig_quads=jnp.asarray(oq),
                    flat_frac=cfg.rec_flat_band_frac,
                    case_gate=cfg.rec_flat_case_gate, **kw)
            elif sep:
                strips, widths = warp_quads_multi_separable(
                    gray_dev, jnp.asarray(page_ids[sel]),
                    jnp.asarray(ws),
                    rec_height=cfg.rec_height, bucket_width=bucket_w,
                    tile_h=cfg.pooled_sep_tile_h,
                    pad_value=(0.0 - cfg.rec_mean) / cfg.rec_std)
            else:
                strips, widths = warp_quads_multi(
                    gray_dev, jnp.asarray(page_ids[sel]),
                    jnp.asarray(ws),
                    rec_height=cfg.rec_height, bucket_width=bucket_w,
                    pad_value=(0.0 - cfg.rec_mean) / cfg.rec_std)
            if try_flip:
                out = _rec_strips_forced_flip_packed_jit(
                    engine, strips, widths, jnp.asarray(flips_all[sel]),
                    beam=beam)
            else:
                out = _rec_strips_packed_jit(
                    engine, strips, widths, beam=beam)
            pending.append((idx, out))
        # Coalesce every chunk's packed output into ONE device concat and
        # ONE host fetch. Per-chunk async copies still paid one tunnel RTT
        # per np.asarray (measured 663 ms over a 96-page window's chunks,
        # VERDICT r2 weak #3); the packed payloads are a few KB each, so a
        # single round trip fetches them all. The chunk programs were all
        # dispatched above, so the concat doesn't lengthen the critical
        # path — it just rides after the last chunk's compute.
        pcat = (jnp.concatenate([o for _, o in pending])
                if len(pending) > 1 else pending[0][1])
        # Truncated-first-fetch (cfg.fetch_max_tokens, mirrors the fused
        # path): pull only the first T_f token columns per strip; the full
        # concat stays on device for the rare line longer than T_f chars.
        from ocrjax.ops.bytepack import truncate_tokens_jit
        tokT = cfg.rec_max_tokens
        t_eff = (cfg.fetch_max_tokens
                 if 0 < cfg.fetch_max_tokens < tokT else tokT)
        pfetch = (pcat if t_eff == tokT else
                  truncate_tokens_jit(pcat, 1, tokT, t_eff))
        try:
            pfetch.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
    with T.stage("rec_fetch_decode"):
        phost = np.asarray(pfetch)
        if timer is not None:
            timer.add_bytes("rec_fetch_decode", phost.nbytes)
        if t_eff < tokT and phost[:, t_eff].max(initial=0) > t_eff:
            phost, t_eff = np.asarray(pcat), tokT  # a line overflowed T_f
            if timer is not None:
                timer.add_bytes("rec_fetch_decode", phost.nbytes)
        off = 0
        for idx, out in pending:
            rows = phost[off: off + out.shape[0]]
            off += out.shape[0]
            if try_flip:
                tokens, n_tokens, conf, win = unpack_rec_flip(
                    rows, t_eff)
            else:
                tokens, n_tokens, conf = unpack_rec(
                    rows, t_eff)
            for k, qi in enumerate(idx):
                texts[qi] = engine.charset.decode(tokens[k][: n_tokens[k]])
                confs[qi] = float(conf[k])
                if try_flip:
                    flips[qi] = bool(win[k])
    return texts, confs, flips


def ocr_pages(engine, images: Sequence, beam: bool = False,
              _allow_rot90: bool = True) -> List["OcrResult"]:
    """C4 pooled batched OCR. Returns one OcrResult per input image.

    Detection is CHUNKED and dispatched ahead (mirroring the fused path,
    docs/DESIGN.md §2 "dispatch ahead, fetch late"): each chunk's packed-luma
    upload + DB forward + candidate download is issued before any result is
    read, so chunk k+1's upload rides the link while chunk k computes and
    chunk k-1's candidates download. Host decode/resize of chunk k+1 is
    interleaved between dispatches. The uploaded canvases stay on device and
    are reused by the pooled warp — recognition costs zero extra link bytes.
    """
    from ocrjax.api import DetBox, OcrLine, OcrResult
    from ocrjax.api_det import (_det_state, _estimate_strip_widths,
                                _gray_norm_jit, _rec_strips_packed_jit,
                                fetch_det, unpack_rec)

    cfg = engine.config
    B = len(images)
    if B == 0:
        return []
    timer = getattr(engine, "stage_timer", None)
    T = timer if timer is not None else _NullStage()

    st = _det_state(engine)
    S = cfg.det_max_side
    C = max(1, min(cfg.fused_chunk_pages, B))
    scales = np.ones((B,), np.float64)
    valid_hw = np.zeros((B, 2), np.int64)
    ok = np.ones((B,), bool)

    # ---- pipelined chunked detection --------------------------------------
    # Decode lookahead (mirrors ocr_pages_fused): chunk k+1's host decode
    # runs on the dedicated prefetch thread while chunk k's upload +
    # dispatch are in flight, so only the first chunk's decode is on the
    # critical path.
    from ocrjax.fused import _get_prefetch_pool

    decoded_originals: Dict[int, np.ndarray] = {}

    def _decode(lo, hi):
        return preprocess.decode_chunk_to_gray(
            images, range(lo, hi), cfg, originals_out=decoded_originals)

    bounds = [(lo, min(lo + C, B)) for lo in range(0, B, C)]
    pending_decode = _get_prefetch_pool().submit(_decode, *bounds[0])
    chunk_devs, chunk_packed = [], []
    for ci, (lo, hi) in enumerate(bounds):
        with T.stage("host_decode"):
            grays, scales[lo:hi], valid_hw[lo:hi], ok[lo:hi], _ = \
                pending_decode.result()
        if ci + 1 < len(bounds):
            pending_decode = _get_prefetch_pool().submit(
                _decode, *bounds[ci + 1])
        with T.stage("det_dispatch"):
            dev = jnp.asarray(preprocess.pack_for_upload(grays, cfg))
            _, packed = st.forward(st.variables, dev)
            try:
                packed.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass
        chunk_devs.append(dev)
        chunk_packed.append(packed)

    with T.stage("det_fetch"):
        boxes, scores, valid = fetch_det(chunk_packed, cfg, timer=timer)
    for i in range(B):
        nh, nw = valid_hw[i]
        cx = boxes[i, :, :, 0].mean(axis=1)
        cy = boxes[i, :, :, 1].mean(axis=1)
        valid[i] &= ok[i] & (cx < nw) & (cy < nh)

    # Landscape-scan reroute (mirrors api_det.ocr): pages whose median box
    # tilt is ~90° are excluded from pooling and redone rotated 90° at the
    # end (api_det.rot90_redo — the cls stage resolves the direction).
    rot90_pages = []
    if _allow_rot90 and cfg.rec_try_flip and cfg.rot90_tilt_deg > 0:
        for i in range(B):
            j = np.where(valid[i])[0]
            if len(j) and float(np.median(geometry.quad_tilt_deg(
                    boxes[i, j]))) > cfg.rot90_tilt_deg:
                rot90_pages.append(i)
                valid[i] = False

    # Full-resolution lane for DOWNSCALED pages (scale < 1): the pooled
    # canvas warp below would recognize them from the blurry resized
    # canvas, while the single-page and fused paths crop the full-res
    # ORIGINAL (api_det._ocr_from_original / ocr_fullres_batch) — batch
    # results must not be worse than single-page results for the same
    # image. These pages keep the batch detection's candidates and route
    # recognition through ONE pooled full-res host-crop dispatch.
    down_items = []
    for i in range(B):
        if ok[i] and scales[i] < 0.999 and valid[i].any():
            j = np.where(valid[i])[0]
            # detection's decode pass already kept the canonical full-res
            # original for scale<1 pages (decode_chunk_to_gray
            # originals_out) — no second serial decode (ADVICE r4)
            img = decoded_originals.get(i)
            if img is None:
                img = preprocess.load_image(
                    images[i], auto_invert=cfg.auto_invert)
            down_items.append((i, img, scales[i], boxes[i], scores[i], j))
            valid[i] = False

    # ---- pool quads across pages -------------------------------------------
    page_ids, quads, qscores, per_page_slots = [], [], [], []
    for i in range(B):
        for j in np.where(valid[i])[0]:
            per_page_slots.append((i, len(quads)))
            page_ids.append(i)
            quads.append(boxes[i, j])
            qscores.append(scores[i, j])
    results: List[List[OcrLine]] = [[] for _ in range(B)]

    def _redo_rot90_pages():
        # ONE recursive pooled batch for all landscape pages (not N serial
        # single-page pipelines — same batching rule as the fused path's
        # rotation reroute); _allow_rot90=False guards against a
        # pathological page that still reads ~90° after rotation.
        if not rot90_pages:
            return
        from ocrjax.api import DetBox, OcrLine
        rots, ws = [], []
        for i in rot90_pages:
            img = preprocess.load_image(
                images[i], auto_invert=engine.config.auto_invert)
            ws.append(img.shape[1])
            rots.append(np.ascontiguousarray(np.rot90(img)))
        rres = ocr_pages(engine, rots, beam=beam, _allow_rot90=False)
        for i, rr, w in zip(rot90_pages, rres, ws):
            results[i] = [
                OcrLine(box=DetBox(
                    geometry.rot90_ccw_to_orig(l.box.quad, w), l.box.score),
                    text=l.text, confidence=l.confidence)
                for l in rr.lines]

    def _redo_down_pages():
        from ocrjax.api_det import pooled_fullres_from_boxes
        for i, res in pooled_fullres_from_boxes(
                engine, down_items, beam=beam):
            results[i] = res.lines

    if not quads:  # every valid page was a rot90/full-res reroute (or empty)
        _redo_down_pages()
        _redo_rot90_pages()
        return [OcrResult(lines=r) for r in results]

    page_ids = np.asarray(page_ids, np.int32)
    quads = np.asarray(quads, np.float32)
    # per-quad bounds = that page's valid region (never sample canvas pad)
    b_all = (valid_hw[page_ids][:, ::-1].astype(np.float32) - 1.0)[:, None, :]

    # unpack + normalize the already-uploaded luma canvases on device
    # (per chunk — reuses the chunk-shaped program — then one device concat)
    with T.stage("warp_norm"):
        normed = [_gray_norm_jit(d, cfg.upload_bits,
                                 cfg.rec_mean, cfg.rec_std)
                  for d in chunk_devs]
        gray_dev = (jnp.concatenate(normed, axis=0) if len(normed) > 1
                    else normed[0])

    # ---- per width-bucket pooled warp + recognize --------------------------
    # Dispatch every bucket's warp+rec program before reading ANY result and
    # start the host copies async: bucket k+1 computes while bucket k
    # downloads, and each bucket costs one fetch RTT instead of three.
    texts, confs, flips = recognize_pooled(
        engine, gray_dev, page_ids, quads, b_all, beam=beam, timer=timer)

    # ---- scatter back, reading order per page ------------------------------
    for i in range(B):
        mine = [s for (p, s) in per_page_slots if p == i]
        if not mine:
            continue
        page_quads = [geometry.scale_quads(quads[s], scales[i]) for s in mine]
        # a mostly-flipped page is upside down: read it bottom-right →
        # top-left (= reading order of the 180°-rotated coordinates)
        if sum(flips[s] for s in mine) * 2 > len(mine):
            order = geometry.sort_reading_order([-q for q in page_quads])
        else:
            order = geometry.sort_reading_order(page_quads)
        results[i] = [
            OcrLine(box=DetBox(page_quads[k], float(qscores[mine[k]])),
                    text=texts[mine[k]], confidence=confs[mine[k]])
            for k in order
        ]
    _redo_down_pages()
    _redo_rot90_pages()
    return [OcrResult(lines=r) for r in results]
