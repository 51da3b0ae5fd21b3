"""Detection and end-to-end OCR paths of the public API (SURVEY.md §2.1 R9).

Split out of api.py so the C1-only path doesn't import the detector. All
device work is fused jit programs with static bucket shapes; the host touches
data exactly twice per page batch (SURVEY.md §3.6): downloading the candidate
boxes/mask (to pick buckets + map coords) and downloading decoded token ids.

Call structure for ocr():
  canvas = det_resize_to_canvas(img)            # host resize to fixed S×S
  prob   = jit[det_normalize → DB fwd]          # one compile ever
  cand   = jit[extract_boxes]                   # on-device CCL/boxes
  (host: pick (count, width) buckets from the valid mask)
  strips = jit[warp_quads]                      # batched gather from canvas
  tokens = jit[rec_normalize → CRNN → CTC]      # per-bucket compile
  (host: charset lookup + reading-order sort)
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ocrjax import geometry, preprocess
from ocrjax.models.db import create_db
from ocrjax.ops import ctc
from ocrjax.ops.warp import (expand_quads, warp_quads, warp_quads_refined)
from ocrjax.postprocess import db_boxes


class _DetState:
    """Lazily-built detection stage owned by an OcrEngine."""

    def __init__(self, engine):
        self.engine = engine
        cfg = engine.config
        self.model = create_db(cfg)
        if engine.det_variables is None:
            canvas = jnp.zeros((1, cfg.det_max_side, cfg.det_max_side, 3),
                               jnp.float32)
            engine.det_variables = self.model.init(
                jax.random.PRNGKey(1), canvas)
        self.variables = engine.det_variables

        # Split jits: the heavy DB graph compiles once; the box extractor
        # takes thresholds as traced scalars so config tweaks (CLI flags,
        # calibration sweeps) never trigger a recompile. Input is LUMA
        # (B, S, S) u8 — 3x cheaper uploads than RGB (det_normalize_gray) —
        # or (B, S, S/2) packed nibbles when cfg.upload_bits == 4 (another
        # 2x; see preprocess.pack_nibbles). Callers upload
        # preprocess.pack_for_upload(gray, cfg).
        @jax.jit
        def prob_fn(variables, gray_u8):
            gray_u8 = preprocess.unpack_on_device(gray_u8, cfg)
            x = preprocess.det_normalize_gray(
                gray_u8, cfg.det_mean, cfg.det_std)
            from ocrjax.models import db_int8
            return db_int8.apply_prob(self.model, variables, x, cfg.det_int8)

        @functools.partial(
            jax.jit,
            static_argnames=("max_candidates", "cc_iters", "cc_downsample",
                             "coord_stride"))
        def boxes_fn(prob, thresh, box_thresh, unclip_ratio, min_box_size,
                     **static_kw):
            out = jax.vmap(lambda p: db_boxes.extract_boxes(
                p, thresh=thresh, box_thresh=box_thresh,
                unclip_ratio=unclip_ratio, min_box_size=min_box_size,
                **static_kw))(prob)
            return pack_det(out)

        def forward(variables, gray_u8):
            """→ (prob [device], packed candidates [device]) — fetch the
            packed array with ONE np.asarray; see unpack_det. Candidate
            coordinates are CANVAS pixels even with a strided det head."""
            c = self.engine.config
            prob = prob_fn(variables, gray_u8)
            packed = boxes_fn(prob, c.det_thresh, c.det_box_thresh,
                              c.det_unclip_ratio, float(c.det_min_box_size),
                              **db_boxes.static_kwargs_from_config(c))
            return prob, packed

        self.forward = forward


def pack_det(out) -> jnp.ndarray:
    """boxes/scores/valid dict → one (B, C*10) float32 array. Each fetched
    buffer costs a full link RTT, so candidates travel as a single array."""
    B, C = out["scores"].shape
    return jnp.concatenate([
        out["boxes"].reshape(B, C * 8),
        out["scores"],
        out["valid"].astype(jnp.float32),
    ], axis=1)


def unpack_det(packed: np.ndarray, C: int):
    """Host-side inverse of pack_det → (boxes, scores, valid) ndarrays."""
    B = packed.shape[0]
    boxes = packed[:, :C * 8].reshape(B, C, 4, 2)
    scores = packed[:, C * 8:C * 9]
    valid = packed[:, C * 9:] > 0.5
    return boxes, scores, valid


@functools.partial(jax.jit, static_argnames=("C", "Kf"))
def _truncate_det_jit(packed, C: int, Kf: int):
    """First-Kf-slot slice of a pack_det payload, plus the per-page
    highest-USED-slot scalar. Exact-by-construction truncation:
    extract_boxes assigns candidate slots by ascending raster root id
    (postprocess/db_boxes.py top_k over root_vals with a +inf sentinel), so
    real components occupy a PREFIX of the C slots — every valid slot index
    is < n_need. The host fetches this (B, Kf*10+1) view instead of the
    (B, C*10) buffer and refetches the full payload only for chunks where
    some page's n_need exceeds Kf (see fetch_det)."""
    B = packed.shape[0]
    boxes = packed[:, :C * 8].reshape(B, C, 8)[:, :Kf].reshape(B, Kf * 8)
    scores = packed[:, C * 8:C * 9][:, :Kf]
    valid = packed[:, C * 9:C * 10]
    n_need = jnp.max(
        jnp.where(valid > 0.5,
                  jnp.arange(1.0, C + 1.0, dtype=jnp.float32), 0.0),
        axis=1, keepdims=True)
    return jnp.concatenate([boxes, scores, valid[:, :Kf], n_need], axis=1)


def fetch_det(packed_chunks, cfg, C: int = None, adapt: dict = None,
              timer=None, stage: str = "det_fetch"):
    """Fetch detection payload chunks with the truncated-first-fetch
    protocol (cfg.det_fetch_candidates): pull only the first Kf candidate
    slots per page and refetch a chunk in full ONLY when one of its pages
    actually used a later slot. Bit-exact always (the truncated view is a
    pure prefix slice, padded back to C slots with invalid lanes on host).
    Returns (boxes (B, C, 4, 2), scores (B, C), valid (B, C)).

    adapt: optional mutable dict carrying a saturation latch across calls
    of one stream (the tiled path passes an engine-scoped dict). Dense C5
    pages overflow the slice EVERY page — without the latch each fetch
    pays a wasted sliced RTT before the full one (measured −11% dense
    pages/s). On overflow the latch flips to full-first fetches; it resets
    once a fetch's highest used slot drops back under Kf/2."""
    C = cfg.det_max_candidates if C is None else C
    Kf = cfg.det_fetch_candidates
    if not (0 < Kf < C) or (adapt or {}).get("full"):
        arr = (np.concatenate([np.asarray(p) for p in packed_chunks])
               if len(packed_chunks) > 1 else np.asarray(packed_chunks[0]))
        if timer is not None:
            timer.add_bytes(stage, arr.nbytes)
        out = unpack_det(arr, C)
        if adapt is not None and adapt.get("full") and 0 < Kf < C:
            rows, cols = np.nonzero(out[2])
            if (cols.max(initial=-1) + 1) <= Kf // 2:
                adapt["full"] = False  # stream went sparse again
        return out
    sliced = [_truncate_det_jit(p, C, Kf) for p in packed_chunks]
    for s in sliced:
        try:
            s.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
    bs, ss, vs = [], [], []
    for s, p in zip(sliced, packed_chunks):
        arr = np.asarray(s)
        if timer is not None:
            timer.add_bytes(stage, arr.nbytes)
        if arr[:, Kf * 10].max() > Kf:  # a page used a slot past the slice
            full = np.asarray(p)
            if timer is not None:
                timer.add_bytes(stage, full.nbytes)
            b, sc, v = unpack_det(full, C)
            if adapt is not None:
                adapt["full"] = True
        else:
            n = arr.shape[0]
            b = np.zeros((n, C, 4, 2), np.float32)
            sc = np.zeros((n, C), np.float32)
            v = np.zeros((n, C), bool)
            b[:, :Kf] = arr[:, :Kf * 8].reshape(n, Kf, 4, 2)
            sc[:, :Kf] = arr[:, Kf * 8:Kf * 9]
            v[:, :Kf] = arr[:, Kf * 9:Kf * 10] > 0.5
        bs.append(b)
        ss.append(sc)
        vs.append(v)
    if len(bs) == 1:
        return bs[0], ss[0], vs[0]
    return np.concatenate(bs), np.concatenate(ss), np.concatenate(vs)


def _det_state(engine) -> _DetState:
    if engine._det is None:
        engine._det = _DetState(engine)
    return engine._det


def _detect_canvas(engine, image, gray_fn=None):
    """Runs detection; returns (canvas u8, canvas-on-device [packed], scale,
    candidates-on-host). The device canvas is the SAME buffer detection
    consumed — downstream warps reuse it instead of re-uploading.
    gray_fn: RGB→luma projection (default 601 luma; the color reroute
    passes preprocess.to_gray_minchannel)."""
    img = preprocess.load_image(
        image, auto_invert=engine.config.auto_invert)
    native = (preprocess.decode_canvas_native(img, engine.config)
              if gray_fn is None else None)
    if native is not None:
        # fused C++ canvas decode (img is already polarity-canonicalized,
        # so the native inversion check is an idempotent no-op)
        canvas, scale, (nh, nw) = native[0], native[1], native[2]
    else:
        canvas, scale, (nh, nw) = preprocess.det_resize_to_canvas(
            img, engine.config)
        canvas = (gray_fn or preprocess.to_gray)(canvas)
    st = _det_state(engine)
    canvas_dev = jnp.asarray(
        preprocess.pack_for_upload(canvas[None], engine.config))
    prob, packed = st.forward(st.variables, canvas_dev)
    boxes, scores, valid = fetch_det([packed], engine.config)
    boxes, scores, valid = boxes[0], scores[0], valid[0]
    # drop candidates whose center lies in canvas padding
    cx = boxes[:, :, 0].mean(axis=1)
    cy = boxes[:, :, 1].mean(axis=1)
    valid = valid & (cx < nw) & (cy < nh)
    return img, canvas, canvas_dev, scale, boxes, scores, valid


def detect(engine, image) -> List["DetBox"]:
    """C2: full page → quads + scores in original image coords
    (BASELINE.json:8), reading-ordered."""
    from ocrjax.api import DetBox

    _, _, _, scale, boxes, scores, valid = _detect_canvas(engine, image)
    quads = [geometry.scale_quads(boxes[i], scale) for i in np.where(valid)[0]]
    ss = scores[valid]
    order = geometry.sort_reading_order(quads)
    return [DetBox(quads[i], float(ss[i])) for i in order]


def ocr(engine, image, beam: bool = False,
        force_staged: bool = False, color: bool = False,
        _allow_rot90: bool = True) -> "OcrResult":
    """C3: detect → batched on-device warp → recognize → ordered text
    (BASELINE.json:9). force_staged skips the fused fast path (used by the
    fused path's rotation reroute — see fused.ocr_pages_fused). color=True
    runs the whole staged pipeline over MIN-CHANNEL luma so saturated
    colored ink keeps its contrast (the fused path's color reroute).
    _allow_rot90 guards the landscape-scan reroute against recursing."""
    from ocrjax.api import DetBox, OcrLine, OcrResult

    cfg = engine.config
    gray_fn = preprocess.to_gray_minchannel if color else preprocess.to_gray
    if color:
        force_staged = True
    if cfg.ocr_single_fused and not force_staged:
        img = preprocess.load_image(
            image, auto_invert=cfg.auto_invert)
        if max(img.shape[:2]) <= cfg.det_max_side:
            # Latency path: one XLA program, one upload, one fetch (~2 link
            # RTTs) instead of the ~6 syncs of the staged path below. Only
            # for pages that fit the canvas un-downscaled (downscaled pages
            # recognize from full-res original crops, see below).
            # Saturated line capacity and tilted pages are redone on the
            # unbounded/exact paths INSIDE ocr_pages_fused.
            from ocrjax import fused as F
            return F.ocr_pages_fused(engine, [img], beam=beam)[0]
        image = img

    img, canvas, canvas_dev, scale, boxes, scores, valid = \
        _detect_canvas(engine, image, gray_fn=gray_fn)
    idx = np.where(valid)[0]
    if len(idx) == 0:
        return OcrResult(lines=[])

    # Landscape-scan reroute: a median box tilt near 90° means the whole
    # page is rotated ±90 — redo rotated (tilt is scale-invariant, so the
    # canvas-frame boxes suffice). Gated on rec_try_flip because the cls
    # stage is what resolves the remaining 180° ambiguity after rotation.
    if (_allow_rot90 and cfg.rec_try_flip and cfg.rot90_tilt_deg > 0
            and float(np.median(geometry.quad_tilt_deg(boxes[idx])))
            > cfg.rot90_tilt_deg):
        return rot90_redo(engine, img, beam=beam, color=color)

    if scale < 0.999:
        # The page was downscaled onto the canvas — recognize crops from the
        # ORIGINAL image at full resolution instead of the blurry canvas
        # (axis-aligned hull crops; arbitrary page sizes would otherwise
        # force a warp recompile per page shape).
        return _ocr_from_original(engine, img, scale, boxes, scores, idx,
                                  beam=beam, gray_fn=gray_fn)

    # host decision: bucket count + strip width bucket (SURVEY.md §2.3 N13)
    quads_orig_canvas = boxes[idx]                             # (n, 4, 2)
    quads_canvas = quads_orig_canvas
    # bucket from the TIGHT det-quad aspect + refinement headroom (the ink
    # refinement rescales the band to full height — see bucketing.ocr_pages)
    est_w = _estimate_strip_widths(quads_canvas, cfg.rec_height)
    if cfg.rec_snap_to_ink:
        est_w = est_w * 1.25
    bucket_w = cfg.rec_bucket_for_width(int(est_w.max(initial=1)))
    if cfg.rec_snap_to_ink and cfg.rec_crop_margin > 0:
        h_img, w_img = img.shape[:2]
        quads_canvas = expand_quads(
            quads_canvas, cfg.rec_crop_margin, cfg.rec_crop_margin,
            bounds=np.asarray([w_img - 1.0, h_img - 1.0], np.float32))
    n = len(idx)
    nb = cfg.line_bucket_for_count(n)
    pad = nb - n
    if pad:
        quads_canvas = np.concatenate(
            [quads_canvas, np.tile(quads_canvas[-1:], (pad, 1, 1))], axis=0)
        quads_orig_canvas = np.concatenate(
            [quads_orig_canvas,
             np.tile(quads_orig_canvas[-1:], (pad, 1, 1))], axis=0)

    # normalize the already-uploaded (packed) canvas on device — detection's
    # upload is reused; the warp costs zero additional link bytes
    gray = _gray_norm_jit(canvas_dev, cfg.upload_bits,
                          cfg.rec_mean, cfg.rec_std)[0]
    if cfg.rec_snap_to_ink:
        # two-pass: probe warp → ink-band quad refinement → full-res re-warp
        # (ops.warp.refine_quads_to_ink for why not strip-space snapping)
        h_img, w_img = img.shape[:2]
        strips, widths = warp_quads_refined(
            gray, jnp.asarray(quads_canvas),
            jnp.asarray([w_img - 1.0, h_img - 1.0], jnp.float32),
            rec_height=cfg.rec_height, bucket_width=bucket_w,
            ink_thresh=(0.5 - cfg.rec_mean) / cfg.rec_std,
            margin_fracs=(cfg.rec_crop_margin, cfg.rec_crop_margin),
            x_margin_keep=cfg.rec_ink_x_margin_keep,
            pad_value=(0.0 - cfg.rec_mean) / cfg.rec_std,
            orig_quads=jnp.asarray(quads_orig_canvas),
            flat_frac=cfg.rec_flat_band_frac,
            case_gate=cfg.rec_flat_case_gate)
    else:
        strips, widths = warp_quads(
            gray, jnp.asarray(quads_canvas),
            rec_height=cfg.rec_height, bucket_width=bucket_w,
            pad_value=(0.0 - cfg.rec_mean) / cfg.rec_std)

    quads_orig = [geometry.scale_quads(boxes[i], scale) for i in idx]
    if cfg.rec_try_flip:
        # one page: real rows share the prior group; pad rows (duplicates
        # of the last quad) vote alone so they can't overweight it
        engine.warn_untrained_cls()
        seg = np.concatenate([np.zeros(n, np.int32),
                              np.arange(1, nb - n + 1, dtype=np.int32)])
        packed = np.asarray(_rec_strips_flip_packed_jit(
            engine, engine.cls_variables, strips, widths,
            jnp.asarray(seg), beam=beam))
        tokens, n_tokens, conf, flips = unpack_rec_flip(
            packed, cfg.rec_max_tokens)
        if flips[:n].sum() * 2 > n:  # upside-down page: reversed order
            order = geometry.sort_reading_order([-q for q in quads_orig])
        else:
            order = geometry.sort_reading_order(quads_orig)
    else:
        tokens, n_tokens, conf = map(np.asarray, _rec_strips_jit(
            engine, strips, widths, beam=beam))
        order = geometry.sort_reading_order(quads_orig)
    lines = []
    for k in order:
        text = engine.charset.decode(tokens[k][: n_tokens[k]])
        lines.append(OcrLine(
            box=DetBox(quads_orig[k], float(scores[idx[k]])),
            text=text, confidence=float(conf[k])))
    return OcrResult(lines=lines)


@functools.partial(jax.jit, static_argnames=("bits", "mean", "std"))
def _gray_norm_jit(packed_u8, bits: int, mean: float, std: float):
    """Unpack (if 4-bit) + normalize an uploaded luma canvas batch on
    device: (B, S, S[/2]) u8 → (B, S, S) float32."""
    from ocrjax import preprocess as P
    g = P.unpack_nibbles(packed_u8) if bits == 4 else packed_u8
    return (g.astype(jnp.float32) / 255.0 - mean) / std


@functools.partial(jax.jit, static_argnames=("engine", "beam"))
def _rec_strips_jit(engine, strips, widths, beam: bool = False):
    """Recognition on already-normalized on-device strips (no u8 roundtrip;
    crops should already be ink-refined — see ops.warp two-pass warps)."""
    from ocrjax.ops.warp import maybe_dewarp_curl
    strips = maybe_dewarp_curl(strips, widths, engine.config)
    logits, frame_lengths = engine.rec_model.apply(
        engine.rec_variables, strips[..., None], widths)
    decode = ctc.ctc_beam_decode if beam else ctc.ctc_greedy_decode
    kw = dict(blank=engine.config.ctc_blank,
              max_tokens=engine.config.rec_max_tokens)
    if beam:
        kw["beam_width"] = engine.config.ctc_beam_width
    return decode(logits, frame_lengths, **kw)


@functools.partial(jax.jit, static_argnames=("engine", "beam"))
def _rec_strips_packed_jit(engine, strips, widths, beam: bool = False):
    """_rec_strips_jit with all outputs packed into one array so the host
    fetches a single buffer (one link RTT, not three). With
    cfg.fetch_bytes the buffer is (n, T+5) uint8 — token ids/counts as
    bytes, conf as its four bitcast bytes (ops.bytepack; ~4x fewer link
    bytes, values bit-identical) — else (n, T+2) float32."""
    from ocrjax.ops import bytepack

    tokens, n_tokens, conf = _rec_strips_jit.__wrapped__(
        engine, strips, widths, beam=beam)
    if bytepack.use_byte_fetch(engine):
        return jnp.concatenate([
            tokens.astype(jnp.uint8),
            n_tokens[:, None].astype(jnp.uint8),
            bytepack.f32_to_bytes(conf[:, None]),
        ], axis=1)
    return jnp.concatenate([
        tokens.astype(jnp.float32),
        n_tokens[:, None].astype(jnp.float32),
        conf[:, None],
    ], axis=1)


def unpack_rec(packed: np.ndarray, max_tokens: int):
    """Host-side inverse of _rec_strips_packed_jit (either payload dtype)."""
    from ocrjax.ops import bytepack

    T = max_tokens
    if packed.dtype == np.uint8:
        return (packed[:, :T].astype(np.int32),
                packed[:, T].astype(np.int32),
                bytepack.bytes_to_f32(packed[:, T + 1:T + 5])[:, 0])
    return (packed[:, :T].astype(np.int32),
            packed[:, T].astype(np.int32),
            packed[:, T + 1])


def rot90_redo(engine, img, beam: bool = False, color: bool = False
               ) -> "OcrResult":
    """Redo a landscape-scanned page rotated 90° ccw and map the boxes
    back to the original frame. The rotation direction doesn't need
    guessing: a wrong guess leaves the lines 180°-flipped, which the
    line-level cls stage corrects (including reversed reading order) —
    that's why the reroute requires rec_try_flip. img must be a decoded
    array (the caller already loaded it)."""
    from ocrjax.api import DetBox, OcrLine, OcrResult

    rot = np.ascontiguousarray(np.rot90(img))
    res = ocr(engine, rot, beam=beam, color=color, _allow_rot90=False)
    w = img.shape[1]
    return OcrResult(lines=[
        OcrLine(box=DetBox(geometry.rot90_ccw_to_orig(l.box.quad, w),
                           l.box.score),
                text=l.text, confidence=l.confidence)
        for l in res.lines
    ], truncated=res.truncated)


def _cls_flip_strips(engine, cls_variables, strips, widths, seg_ids=None,
                     prior_weights=None):
    """Orientation stage inside a rec program: classify every strip AND its
    180° rotation (symmetric ensemble — the relative margin
    logit(s) − logit(rot180(s)) is calibration-free and measured more
    accurate than thresholding one logit), rotate the losers in place on
    device. Returns (strips, flipped).

    A trained classifier, not decode-confidence comparison: the CRNN is
    trained on RANDOM glyph strings, so flipped strips decode to other
    glyphs with equally high confidence (no statistic of the frame
    probabilities separated the orientations on the refined-warp path) —
    orientation lives in glyph-shape asymmetry, which models.cls learns
    directly (the PP-OCR "cls" stage, done TPU-style: fused into the
    recognition program, flip as a device gather).

    seg_ids (same length as strips) groups lines that share a PAGE: a
    width-weighted mean of the group's margins is added as a page-level
    orientation prior (cfg.cls_page_prior), because a page is almost never
    mixed-orientation — a short random-glyph line is individually ~180°-
    ambiguous, but its page isn't. Strong per-line evidence still overrides
    (a genuinely rotated stamp among upright lines flips alone). None →
    every line is its own group (pure per-line decision). prior_weights
    overrides the per-line prior weight (defaults to widths; the fused
    program passes width·valid so its padding lanes can't vote).
    """
    rot, margin = _cls_margins(engine, cls_variables, strips, widths)
    cfg = engine.config
    if seg_ids is not None and cfg.cls_page_prior > 0:
        w = widths if prior_weights is None else prior_weights
        margin = apply_page_prior(margin, w, seg_ids,
                                  cfg.cls_page_prior)
    flipped = margin > 0
    return jnp.where(flipped[:, None, None], rot, strips), flipped


def _cls_margins(engine, cls_variables, strips, widths):
    """Orientation margins: (rot180 strips, margin) — positive = flipped.

    Two modes: the symmetric ensemble logit(s) − logit(rot180 s)
    (calibration-free), or — when the loaded cls asset carries the
    antisymmetry certificate (cls_trainer antisym>0) and
    cfg.cls_single_pass is on — ONE classifier pass with margin
    2·logit(s): the penalty makes logit(rot180 s) ≈ −logit(s), so the
    single logit IS half the ensemble margin (VERDICT r4 next #5 — the
    doubled pass was the structural half of try-flip's overhead)."""
    from ocrjax.models import cls as C

    cfg = engine.config
    pad = (0.0 - cfg.rec_mean) / cfg.rec_std
    rot = C.flip_strips_by_width(
        strips, widths, jnp.ones(strips.shape[:1], bool), pad)
    if cfg.cls_single_pass and getattr(engine, "cls_antisym", False):
        logit = engine.cls_model.apply(
            cls_variables, strips[..., None], widths)
        return rot, 2.0 * logit
    both = jnp.concatenate([strips, rot], axis=0)
    w2 = jnp.concatenate([widths, widths], axis=0)
    logit = engine.cls_model.apply(cls_variables, both[..., None], w2)
    n = strips.shape[0]
    return rot, logit[:n] - logit[n:]


def apply_page_prior(margin, widths, seg_ids, alpha: float,
                     clip: float = 8.0):
    """margin_i + α · (width-weighted mean of the group's margins, each
    clipped to ±clip): lines sharing a page borrow its orientation
    consensus; a strongly-evidenced outlier (rotated stamp) still
    overrides. The clip bounds any ONE line's pull on the consensus —
    without it a single very-confident line (margins reach ±20) outweighs
    several moderately-confident page-mates and drags them to its
    orientation (measured: a +12.7 flipped line vs two upright mates at
    −23/−12 un-flipped the flipped line at α=2); within ±clip, magnitude
    still counts as log-odds evidence. Pure function of same-length
    arrays; group ids must be dense in [0, len(margin))."""
    n = margin.shape[0]
    w = widths.astype(jnp.float32)
    num = jnp.zeros((n,), jnp.float32).at[seg_ids].add(
        jnp.clip(margin, -clip, clip) * w)
    den = jnp.zeros((n,), jnp.float32).at[seg_ids].add(w)
    page_mean = num[seg_ids] / jnp.maximum(den[seg_ids], 1.0)
    return margin + alpha * page_mean


@functools.partial(jax.jit, static_argnames=("engine", "beam"))
def _rec_strips_flip_packed_jit(engine, cls_variables, strips, widths,
                                seg_ids, beam: bool = False):
    """rec_try_flip engine room: orientation-classify + conditionally
    rotate each strip (see _cls_flip_strips; seg_ids groups page-mates for
    the orientation prior), then the normal CRNN + CTC decode — one XLA
    program, one fetched buffer.
    Packed columns: T tokens, n_tokens, flip(0/1), conf — as (N, T+6)
    uint8 under cfg.fetch_bytes (conf bitcast to 4 bytes), else (N, T+3)
    float32 with conf before flip (the legacy column order)."""
    strips, flipped = _cls_flip_strips(engine, cls_variables, strips,
                                       widths, seg_ids)
    tokens, n_tokens, conf = _rec_strips_jit.__wrapped__(
        engine, strips, widths, beam=beam)
    return _pack_rec_flip(engine, tokens, n_tokens, conf, flipped)


def _pack_rec_flip(engine, tokens, n_tokens, conf, flip):
    """Shared payload packer for the two flip-rec programs (decided and
    forced flips) — byte layout under cfg.fetch_bytes, float32 otherwise."""
    from ocrjax.ops import bytepack

    if bytepack.use_byte_fetch(engine):
        return jnp.concatenate([
            tokens.astype(jnp.uint8),
            n_tokens[:, None].astype(jnp.uint8),
            flip[:, None].astype(jnp.uint8),
            bytepack.f32_to_bytes(conf[:, None]),
        ], axis=1)
    return jnp.concatenate([
        tokens.astype(jnp.float32),
        n_tokens[:, None].astype(jnp.float32),
        conf[:, None],
        flip[:, None].astype(jnp.float32),
    ], axis=1)


@functools.partial(jax.jit, static_argnames=("engine", "bucket_width"))
def _cls_margins_multi_jit(engine, cls_variables, gray_dev, page_ids,
                           quads, bucket_width: int):
    """Orientation margins for a chunk of quads warped off multi-page
    canvases — the pooled path's PHASE A: margins for every quad come back
    to the host, the page prior runs there over FULL page groups (page-
    mates in different width buckets share the consensus — a per-dispatch
    prior would fragment it), and the resulting flip decisions feed the
    rec dispatches (_rec_strips_forced_flip_packed_jit)."""
    from ocrjax.ops.warp import warp_quads_multi

    cfg = engine.config
    strips, widths = warp_quads_multi(
        gray_dev, page_ids, quads, rec_height=cfg.rec_height,
        bucket_width=bucket_width,
        pad_value=(0.0 - cfg.rec_mean) / cfg.rec_std)
    _, margin = _cls_margins(engine, cls_variables, strips, widths)
    return margin


@functools.partial(jax.jit, static_argnames=("engine", "beam"))
def _rec_strips_forced_flip_packed_jit(engine, strips, widths, flip,
                                       beam: bool = False):
    """_rec_strips_flip_packed_jit with the flip DECISIONS precomputed
    (the pooled path's PHASE B output): rotate the chosen strips on
    device, recognize, pack. Same layout as the deciding variant."""
    from ocrjax.models import cls as C

    cfg = engine.config
    strips = C.flip_strips_by_width(
        strips, widths, flip, (0.0 - cfg.rec_mean) / cfg.rec_std)
    tokens, n_tokens, conf = _rec_strips_jit.__wrapped__(
        engine, strips, widths, beam=beam)
    return _pack_rec_flip(engine, tokens, n_tokens, conf, flip)


def unpack_rec_flip(packed: np.ndarray, max_tokens: int):
    """Host-side inverse of _rec_strips_flip_packed_jit (either dtype)."""
    from ocrjax.ops import bytepack

    T = max_tokens
    if packed.dtype == np.uint8:
        return (packed[:, :T].astype(np.int32),
                packed[:, T].astype(np.int32),
                bytepack.bytes_to_f32(packed[:, T + 2:T + 6])[:, 0],
                packed[:, T + 1] > 0)
    return (packed[:, :T].astype(np.int32),
            packed[:, T].astype(np.int32),
            packed[:, T + 1],
            packed[:, T + 2] > 0.5)


def _ink_crop_host(gray: np.ndarray, x0: int, y0: int, x1: int, y1: int,
                   ink_thresh: int = 128, min_count: int = 2,
                   margin_left_px: float = 0.0, margin_right_px: float = 0.0,
                   x_margin_keep: float = 1.0, flat_frac: float = 0.0,
                   box_h_px: float = 0.0):
    """Host mirror of ops.warp.ink_boxes for full-res original-image crops:
    tighten an (expanded) crop window to the ink band through its vertical
    center, with pads matching the on-device refinement (~2-3 px at the
    32-px strip scale). margin_*_px/x_margin_keep mirror the device refine's
    x-window: columns deeper than keep·margin into the expansion margin
    cannot count as ink (side-neighbor rejection). Margins are per side —
    the ACTUALLY-APPLIED expansion after page-bounds clamping, so edge
    glyphs of lines at the page border are never masked out."""
    crop = gray[y0:y1, x0:x1]
    ink = crop < ink_thresh
    slack_l = int(round(margin_left_px * (1.0 - x_margin_keep)))
    slack_r = int(round(margin_right_px * (1.0 - x_margin_keep)))
    if (slack_l > 0 or slack_r > 0) and crop.shape[1] > slack_l + slack_r:
        ink = ink.copy()
        if slack_l > 0:
            ink[:, :slack_l] = False
        if slack_r > 0:
            ink[:, crop.shape[1] - slack_r:] = False
    rows = ink.sum(axis=1) >= min_count
    if not rows.any():
        return crop
    # gap fill, mirroring ops.warp.ink_boxes: close blank row-runs bounded
    # by ink on both sides and no longer than max(2, 10% of the crop) so
    # underscores/diacritics separated from the glyph body stay in-band.
    ys_ink = np.where(rows)[0]
    if len(ys_ink) > 1:
        G = max(2, int(round(0.10 * crop.shape[0])))
        gaps = np.diff(ys_ink)
        for k in np.where((gaps > 1) & (gaps <= G + 1))[0]:
            rows[ys_ink[k]:ys_ink[k + 1] + 1] = True
    c = crop.shape[0] // 2
    if rows[c]:
        a = b = c
        while a > 0 and rows[a - 1]:
            a -= 1
        while b < len(rows) - 1 and rows[b + 1]:
            b += 1
    else:
        ys = np.where(rows)[0]
        a, b = int(ys.min()), int(ys.max())
    cols = ink[a:b + 1].sum(axis=0) >= 1
    if not cols.any():
        return crop
    xs = np.where(cols)[0]
    band_h = b - a + 1
    pad_y = max(1, round(band_h * 2 / 28))
    pad_x = max(1, round(band_h * 3 / 28))
    if flat_frac > 0.0:
        # host mirror of ops.warp.ink_boxes' flat-band rescale (shared
        # gate: utils/flatband) — render the band at flat_frac of the
        # strip instead of full height, padding with true background
        # (255) so the glyphs stay centered even at image edges.
        # box_h_px: detector-box line height (page px, same scale as the
        # crop) — the case-aware condition (utils.flatband): caps bands
        # near full box height keep the full-band mapping
        from ocrjax.utils.flatband import flat_band_gate
        if flat_band_gate(ink[a:b + 1], line_h=box_h_px):
            half = int(round(band_h / (2.0 * flat_frac)))
            yc = (a + b) // 2
            ca, cb = yc - half, yc + half
            nx0 = int(xs.min()) - pad_x          # nominal x window
            nx1 = int(xs.max()) + 1 + pad_x
            out = np.full((cb - ca + 1, nx1 - nx0), 255, crop.dtype)
            sa, sb = max(0, ca), min(crop.shape[0] - 1, cb)
            sx0, sx1 = max(0, nx0), min(crop.shape[1], nx1)
            # place the copied region at its offset within the nominal
            # window, so edge-clipped crops keep symmetric margins
            out[sa - ca:sa - ca + (sb - sa + 1),
                sx0 - nx0:sx0 - nx0 + (sx1 - sx0)] = \
                crop[sa:sb + 1, sx0:sx1]
            return out
    return crop[max(0, a - pad_y):b + 1 + pad_y,
                max(0, int(xs.min()) - pad_x):int(xs.max()) + 1 + pad_x]


def _fullres_strips(engine, img, scale, boxes, scores, idx, gray_fn=None):
    """Host crop collection for full-resolution recognition of a
    downscaled page → (quads_orig, strips, scores)."""
    cfg = engine.config
    h, w = img.shape[:2]
    gray = (gray_fn or preprocess.to_gray)(img)
    quads_orig, strips, ss = [], [], []
    for i in idx:
        q = geometry.scale_quads(boxes[i], scale)
        margin = 0.0
        if cfg.rec_snap_to_ink:
            margin = cfg.rec_crop_margin * (q[:, 1].max() - q[:, 1].min() + 1)
        x0 = int(max(0, np.floor(q[:, 0].min() - margin)))
        x1 = int(min(w, np.ceil(q[:, 0].max() + margin) + 1))
        y0 = int(max(0, np.floor(q[:, 1].min() - margin)))
        y1 = int(min(h, np.ceil(q[:, 1].max() + margin) + 1))
        if x1 - x0 < 2 or y1 - y0 < 2:
            continue
        quads_orig.append(q)
        strips.append(_ink_crop_host(
            gray, x0, y0, x1, y1,
            margin_left_px=max(0.0, q[:, 0].min() - x0),
            margin_right_px=max(0.0, (x1 - 1) - q[:, 0].max()),
            x_margin_keep=cfg.rec_ink_x_margin_keep,
            flat_frac=cfg.rec_flat_band_frac,
            box_h_px=(float(np.linalg.norm(q[3] - q[0]))
                      if cfg.rec_flat_case_gate else 0.0))
            if cfg.rec_snap_to_ink else gray[y0:y1, x0:x1])
        ss.append(float(scores[i]))
    return quads_orig, strips, ss


def _assemble_fullres_page(quads_orig, ss, rs):
    """(quads, scores, RecResults) → OcrResult in reading order (flipped
    majority reverses it)."""
    from ocrjax.api import DetBox, OcrLine, OcrResult

    if sum(r.flipped for r in rs) * 2 > len(rs):  # upside-down page
        order = geometry.sort_reading_order([-q for q in quads_orig])
    else:
        order = geometry.sort_reading_order(quads_orig)
    return OcrResult(lines=[
        OcrLine(box=DetBox(quads_orig[k], ss[k]), text=rs[k].text,
                confidence=rs[k].confidence)
        for k in order])


def _ocr_from_original(engine, img, scale, boxes, scores, idx, beam=False,
                       gray_fn=None):
    """Full-resolution recognition for downscaled pages: axis-aligned hull
    crops from the original image → recognize_strips (bucketed)."""
    from ocrjax.api import OcrResult

    quads_orig, strips, ss = _fullres_strips(
        engine, img, scale, boxes, scores, idx, gray_fn=gray_fn)
    if not strips:
        return OcrResult(lines=[])
    rs = engine.recognize_strips(strips, beam=beam, same_page=True)
    return _assemble_fullres_page(quads_orig, ss, rs)


def ocr_fullres_batch(engine, images, beam: bool = False):
    """Pooled staged lane for DOWNSCALED pages (VERDICT r3 weak #5: the
    fused redo lane ran one serial api_det.ocr per scale<1 page).

    All pages' canvases share the det canvas shape, so detection runs as
    chunked dispatch-ahead batched forwards (one upload + one fetch per
    chunk), and every page's full-resolution host crops pool into ONE
    recognize_strips dispatch round — per-page orientation priors via
    prior_ids. Per-page isolation: a failed decode yields an empty
    result; a page whose boxes read ±90° falls back to rot90_redo.
    """
    from ocrjax.api import OcrResult

    cfg = engine.config
    B = len(images)
    results = [None] * B
    st = _det_state(engine)

    # ---- host decode + canvas prep (originals kept for full-res crops) ---
    imgs, canvases, scales = [None] * B, [None] * B, np.ones(B)
    valid_hw = np.zeros((B, 2), np.int64)
    for i in range(B):
        try:
            img = preprocess.load_image(
                images[i], auto_invert=cfg.auto_invert)
            canvas, scale, nhw = preprocess.det_resize_to_canvas(img, cfg)
        except (FileNotFoundError, ValueError, OSError):
            results[i] = OcrResult(lines=[])
            continue
        imgs[i], canvases[i], scales[i] = img, canvas, scale
        valid_hw[i] = nhw
    live = [i for i in range(B) if imgs[i] is not None]
    if not live:
        return results

    # ---- chunked batched detection, dispatch-ahead ------------------------
    C = max(1, min(cfg.fused_chunk_pages, len(live)))
    packed_chunks = []
    for lo in range(0, len(live), C):
        grays = np.stack([preprocess.to_gray(canvases[i])
                          for i in live[lo:lo + C]])
        dev = jnp.asarray(preprocess.pack_for_upload(grays, cfg))
        _, packed = st.forward(st.variables, dev)
        try:
            packed.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
        packed_chunks.append(packed)
    boxes, scores, valid = fetch_det(packed_chunks, cfg)

    # ---- pool full-res crops across pages ---------------------------------
    items = []
    for row, i in enumerate(live):
        nh, nw = valid_hw[i]
        cx = boxes[row, :, :, 0].mean(axis=1)
        cy = boxes[row, :, :, 1].mean(axis=1)
        idx = np.where(valid[row] & (cx < nw) & (cy < nh))[0]
        if len(idx) == 0:
            results[i] = OcrResult(lines=[])
            continue
        if (cfg.rec_try_flip and cfg.rot90_tilt_deg > 0
                and float(np.median(geometry.quad_tilt_deg(
                    boxes[row, idx]))) > cfg.rot90_tilt_deg):
            results[i] = rot90_redo(engine, imgs[i], beam=beam)
            continue
        items.append((i, imgs[i], scales[i], boxes[row], scores[row], idx))
    for i, res in pooled_fullres_from_boxes(engine, items, beam=beam):
        results[i] = res
    return results


def pooled_fullres_from_boxes(engine, items, beam: bool = False):
    """ONE pooled recognize_strips round over several downscaled pages'
    full-resolution host crops, from ALREADY-detected boxes.

    items: [(key, img, scale, boxes (C,4,2) canvas coords, scores (C,),
    idx)] — returns (key, OcrResult) pairs. Shared by ocr_fullres_batch
    (which detects first) and bucketing.ocr_pages (which already has the
    batch detection's candidates and only needs the full-res recognition
    lane — without this, the bucketed path recognized scale<1 pages from
    the blurry canvas while the single-page and fused paths used full-res
    original crops)."""
    from ocrjax.api import OcrResult

    all_strips, prior, refs = [], [], []   # refs: (key, quads, ss, lo)
    out = []
    for gi, (key, img, scale, boxes_i, scores_i, idx) in enumerate(items):
        quads_orig, strips, ss = _fullres_strips(
            engine, img, scale, boxes_i, scores_i, idx)
        if not strips:
            out.append((key, OcrResult(lines=[])))
            continue
        refs.append((key, quads_orig, ss, len(all_strips)))
        all_strips.extend(strips)
        prior.extend([gi] * len(strips))

    if all_strips:
        rs = engine.recognize_strips(all_strips, beam=beam,
                                     prior_ids=prior)
        for key, quads_orig, ss, lo in refs:
            out.append((key, _assemble_fullres_page(
                quads_orig, ss, rs[lo:lo + len(quads_orig)])))
    return out


def _estimate_strip_widths(quads: np.ndarray, rec_height: int) -> np.ndarray:
    e_top = np.linalg.norm(quads[:, 1] - quads[:, 0], axis=-1)
    e_left = np.linalg.norm(quads[:, 3] - quads[:, 0], axis=-1)
    return np.round(np.maximum(e_top, 1.0) * rec_height
                    / np.maximum(e_left, 1.0))


def ocr_batch(engine, images: Sequence, beam: bool = False) -> List["OcrResult"]:
    """C4: batched end-to-end over many pages (BASELINE.json:10).

    Pooled path: one batched DB forward over all canvases, then all pages'
    line crops bucketed together (ocrjax.bucketing.ocr_pages). Per-page error
    isolation — a corrupt image yields an empty OcrResult (SURVEY.md §5).
    """
    from ocrjax import bucketing
    return bucketing.ocr_pages(engine, images, beam=beam)


def detect_tiled(engine, image) -> List["DetBox"]:
    """C5: tiled detection for high-res pages (BASELINE.json:11)."""
    from ocrjax import tiling
    return tiling.detect_tiled(engine, image)
