"""Fully-fused end-to-end OCR: one XLA program per page batch.

BASELINE.json:5's north star — "whole pages stay on-TPU". The bucketed path
(ocrjax.bucketing) syncs twice per batch so the host can pick buckets; this
path instead fixes a static per-page line capacity (`lines_per_page`) and
runs detect → extract_boxes → top-K select → batched warp → CRNN → CTC as a
single jit program: one canvas upload, one (tokens, quads, validity)
download, zero intermediate round trips. Padding lanes (pages with fewer
lines) burn MXU cycles, which is the right trade on TPU: the recognizer is
tiny and RPC/dispatch latency dominates multi-call pipelines.

Used by OcrEngine.ocr_batch(fused=True) and the benchmark.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ocrjax import geometry, preprocess
from ocrjax.ops import ctc
from ocrjax.ops import warp as warp_quads_lib
from ocrjax.ops.warp import warp_quads_grouped, warp_quads_separable
from ocrjax.postprocess import db_boxes


def make_fused_ocr_fn(engine, lines_per_page: int = 32,
                      bucket_width: int = 320,
                      separable_warp: bool = True,
                      beam: bool = False):
    """Builds the fused jit program closed over both models' variables.

    separable_warp: crop/resize via MXU matmuls (9x faster than the gather
    warp; exact for axis-aligned text, AABB-crop for rotated — see
    warp_quads_separable). Set False for exact homography rectification.
    beam: decode with the on-device prefix beam search instead of greedy.
    """
    cfg = engine.config
    from ocrjax.api_det import _det_state
    st = _det_state(engine)
    rec_model = engine.rec_model
    K = lines_per_page
    H = cfg.rec_height
    W = bucket_width

    @jax.jit
    def fused(det_vars, rec_vars, cls_vars, gray_u8, thr, valid_wh):
        """gray_u8: (B, S, S) luma canvases — single-channel upload (the
        host↔device link is the e2e bottleneck: 44 MB of RGB canvases cost
        ~530 ms through the tunnel vs ~180 ms for luma), or (B, S, S/2)
        packed 4-bit nibbles when cfg.upload_bits == 4 (halves the bytes
        again; unpacked on device right here). Detection runs on luma
        broadcast to RGB — identical to RGB for monochrome documents;
        color-critical pages can use the bucketed path.

        thr: (4,) float32 [det_thresh, box_thresh, unclip_ratio,
        min_box_size] — traced, so calibration sweeps and CLI flag tweaks
        never recompile the heavy detection graph (same split as api_det).
        valid_wh: (B, 2) float32 per-page valid (width, height) on the
        canvas — crop expansion clips against it so the warp never samples
        canvas padding (replicated border rows: duplicated glyph streaks
        would read as ink to the snap)."""
        B = gray_u8.shape[0]
        gray_u8 = preprocess.unpack_on_device(gray_u8, cfg)
        # ---- detection -----------------------------------------------------
        x = preprocess.det_normalize_gray(
            gray_u8, cfg.det_mean, cfg.det_std)
        from ocrjax.models import db_int8
        prob = db_int8.apply_prob(st.model, det_vars, x,
                                  cfg.det_int8)                # (B, S, S)
        # Zero the prob map outside each page's valid (w, h) BEFORE candidate
        # extraction: replicate padding can contain duplicated glyph streaks
        # when ink touches the page border, and the fused top-K select would
        # let such padding detections evict real lines from the K slots —
        # the host-side padding-center filter below runs only on the K
        # survivors, too late (ADVICE r2). The staged/bucketed paths filter
        # all candidates on host and don't need this.
        Sdim = prob.shape[-1]
        xi = jax.lax.broadcasted_iota(jnp.float32, (1, Sdim, Sdim), 2)
        yi = jax.lax.broadcasted_iota(jnp.float32, (1, Sdim, Sdim), 1)
        in_valid = ((xi < valid_wh[:, 0, None, None])
                    & (yi < valid_wh[:, 1, None, None]))
        prob = jnp.where(in_valid, prob, 0.0)
        cand = jax.vmap(lambda p: db_boxes.extract_boxes(
            p, thresh=thr[0], box_thresh=thr[1],
            unclip_ratio=thr[2],
            min_box_size=thr[3],
            **db_boxes.static_kwargs_from_config(cfg)))(prob)

        # ---- top-K lines per page by score ---------------------------------
        score = jnp.where(cand["valid"], cand["scores"], -1.0)  # (B, C)
        top_s, top_i = jax.lax.top_k(score, K)                  # (B, K)
        quads = jnp.take_along_axis(
            cand["boxes"], top_i[..., None, None], axis=1)      # (B, K, 4, 2)
        line_valid = top_s > 0.0                                # (B, K)

        # ---- grouped batched warp off the normalized gray canvases ---------
        gray = (gray_u8.astype(jnp.float32) / 255.0
                - cfg.rec_mean) / cfg.rec_std                   # (B, S, S)
        # recognition strips pad like the training data: u8 zero = black
        pad_v = (0.0 - cfg.rec_mean) / cfg.rec_std
        warp = warp_quads_separable if separable_warp else warp_quads_grouped
        warp_src = quads
        if cfg.rec_snap_to_ink and cfg.rec_crop_margin > 0:
            warp_src = warp_quads_lib.expand_quads(
                quads, cfg.rec_crop_margin, cfg.rec_crop_margin,
                bounds=(valid_wh - 1.0)[:, None, None, :])
        strips_bk, widths_bk = warp(
            gray, warp_src, rec_height=H, bucket_width=W, pad_value=pad_v)
        if cfg.rec_snap_to_ink:
            # two-pass: the probe strips above locate each line's ink band;
            # re-warp the refined boxes from the full-res canvas (see
            # ops.warp.refine_quads_to_ink). AABB refine matches the
            # separable warp's linear mapping; homography refine the exact
            # grouped warp.
            refine = (warp_quads_lib.refine_aabb_to_ink if separable_warp
                      else warp_quads_lib.refine_quads_to_ink)
            flat_b = jnp.broadcast_to(
                (valid_wh - 1.0)[:, None, None, :], (B, K, 1, 2)
            ).reshape(B * K, 1, 2)
            refined = refine(
                strips_bk.reshape(B * K, H, W), widths_bk.reshape(B * K),
                warp_src.reshape(B * K, 4, 2), rec_height=H, bounds=flat_b,
                ink_thresh=(0.5 - cfg.rec_mean) / cfg.rec_std,
                margin_fracs=(cfg.rec_crop_margin, cfg.rec_crop_margin),
                x_margin_keep=cfg.rec_ink_x_margin_keep,
                orig_quads=quads.reshape(B * K, 4, 2),
                flat_frac=cfg.rec_flat_band_frac,
                case_gate=cfg.rec_flat_case_gate)
            strips_bk, widths_bk = warp(
                gray, refined.reshape(B, K, 4, 2),
                rec_height=H, bucket_width=W, pad_value=pad_v)
        strips = strips_bk.reshape(B * K, H, W)
        widths = widths_bk.reshape(B * K)
        # curved-baseline rectification (identity for flat strips)
        strips = warp_quads_lib.maybe_dewarp_curl(strips, widths, cfg)

        # ---- orientation (rec_try_flip, the PP-OCR "cls" stage) -------------
        if cfg.rec_try_flip:
            # same fused-graph classify+rotate as the staged path
            # (api_det._cls_flip_strips); each page is one prior group and
            # invalid lanes get zero prior weight so they can't vote
            from ocrjax.api_det import _cls_flip_strips
            seg = jnp.repeat(jnp.arange(B, dtype=jnp.int32), K)
            pw = widths * line_valid.reshape(B * K).astype(widths.dtype)
            strips, flip = _cls_flip_strips(
                engine, cls_vars, strips, widths, seg_ids=seg,
                prior_weights=pw)
        else:
            flip = jnp.zeros((B * K,), bool)

        # ---- recognition + decode -------------------------------------------
        logits, frame_lengths = rec_model.apply(
            rec_vars, strips[..., None], widths)
        if beam:
            tokens, n_tokens, conf = ctc.ctc_beam_decode(
                logits, frame_lengths, blank=cfg.ctc_blank,
                max_tokens=cfg.rec_max_tokens,
                beam_width=cfg.ctc_beam_width)
        else:
            tokens, n_tokens, conf = ctc.ctc_greedy_decode(
                logits, frame_lengths, blank=cfg.ctc_blank,
                max_tokens=cfg.rec_max_tokens)
        # Pack every output into ONE array: on the remote-TPU link each
        # fetched buffer costs a full RTT (~33 ms measured), so 6 separate
        # outputs would burn ~165 ms per batch. With cfg.fetch_bytes the
        # row is uint8 — token ids/counts/valid/flip as bytes (small exact
        # ints) and the float columns (conf/quads/scores) BITCAST to raw
        # bytes (ops.bytepack) — K*(T+45) bytes vs K*(T+12) float32, ~3.3x
        # fewer link bytes with bit-identical values. Legacy float32
        # layout kept for fetch_bytes=False.
        T = cfg.rec_max_tokens
        from ocrjax.ops import bytepack
        if bytepack.use_byte_fetch(engine):
            parts = [
                tokens.astype(jnp.uint8).reshape(B, K * T),
                n_tokens.astype(jnp.uint8).reshape(B, K),
                line_valid.astype(jnp.uint8).reshape(B, K),
            ]
            if cfg.rec_try_flip:
                parts.append(flip.astype(jnp.uint8).reshape(B, K))
            parts += [
                bytepack.f32_to_bytes(conf.reshape(B, K)),
                bytepack.f32_to_bytes(quads.reshape(B, K * 8)),
                bytepack.f32_to_bytes(top_s.reshape(B, K)),
            ]
            return jnp.concatenate(parts, axis=1)
        parts = [
            tokens.astype(jnp.float32).reshape(B, K * T),
            n_tokens.astype(jnp.float32).reshape(B, K),
            conf.reshape(B, K),
            quads.reshape(B, K * 8),
            top_s.reshape(B, K),
            line_valid.astype(jnp.float32).reshape(B, K),
        ]
        if cfg.rec_try_flip:
            parts.append(flip.astype(jnp.float32).reshape(B, K))
        return jnp.concatenate(parts, axis=1)

    return fused


def unpack_fused(payload: np.ndarray, K: int, max_tokens: int,
                 try_flip: bool = False):
    """Host-side inverse of the fused program's packed output row layout
    (byte layout when payload is uint8, legacy float32 otherwise).
    try_flip must match the cfg.rec_try_flip the program was built with
    (it appends one more (B, K) column of 180°-flip decisions)."""
    from ocrjax.ops import bytepack

    B = payload.shape[0]
    T = max_tokens
    o = 0

    def take(n):
        nonlocal o
        part = payload[:, o:o + n]
        o += n
        return part

    if payload.dtype == np.uint8:
        out = {
            "tokens": take(K * T).reshape(B, K, T).astype(np.int32),
            "n_tokens": take(K).astype(np.int32),
            "valid": take(K) > 0,
            "flipped": (take(K) > 0 if try_flip
                        else np.zeros((B, K), bool)),
        }
        out["conf"] = bytepack.bytes_to_f32(take(K * 4))
        out["quads"] = bytepack.bytes_to_f32(
            take(K * 32)).reshape(B, K, 4, 2)
        out["scores"] = bytepack.bytes_to_f32(take(K * 4))
        return out

    return {
        "tokens": take(K * T).reshape(B, K, T).astype(np.int32),
        "n_tokens": take(K).astype(np.int32),
        "conf": take(K),
        "quads": take(K * 8).reshape(B, K, 4, 2),
        "scores": take(K),
        "valid": take(K) > 0.5,
        "flipped": (take(K) > 0.5 if try_flip
                    else np.zeros((B, K), bool)),
    }


def should_reroute_rotation(vq: np.ndarray, cfg) -> bool:
    """Decide whether a page's valid quads (N, 4, 2) force a staged redo.

    The fused program's separable warp crops rotated lines by their AABB
    (measured 0.80 vs 0.93 line-exact at ±10°), so tilted pages re-run
    through the staged exact-homography path. ANY sufficiently-elongated
    tilted box triggers: lines rotate independently (a page can hold one
    genuinely tilted line among straight ones), and a missed reroute
    misreads that line while a false trigger only costs the batched staged
    re-run — measured 0.81 vs 0.92 rotated line-exact for a ≥2-box
    majority trigger. Near-square boxes can't vote (fused_reroute_min_
    aspect): their PCA tilt is eigenvalue-gap noise — before that gate 17%
    of STRAIGHT pages tripped the reroute, every offender aspect ≤ 1.5 —
    and the separable warp's AABB crop of a near-square line is benign
    (the ink refinement re-derives its extents).

    A clean ±90° landscape scan folds to ~0 tilt in the mod-90 metric, so
    the unfolded median is checked too (geometry.quad_tilt_deg ∈ [0, 90]);
    the staged redo's own rot90 reroute (api_det.ocr) then rotates the
    page and the cls stage fixes any residual 180°.

    A single box's tilt estimate carries noise that shrinks with box
    length — a few pixels of prob-map extent wobble over long side L reads
    as ~atan(noise_px/L) of spurious tilt. Measured on the rng-0 bench mix
    (all-straight pages): every false trigger was a 54-94 px box at
    3.0-4.05°, while no box over 100 px exceeded 1.5°; on TPU numerics 7 of
    16 straight pages rerouted, costing ~40% of fused-window throughput.
    So a LONE box must clear a per-box noise floor
    max(reroute_deg, atan(noise_px/L)); genuine small PAGE rotation (which
    a fixed floor would miss on short-lined pages) is instead caught by
    coherence — the median tilt of all elongated boxes clearing
    reroute_deg, which single-box noise cannot move.
    """
    e = vq[:, 1] - vq[:, 0]
    a = np.abs(np.degrees(np.arctan2(e[:, 1], e[:, 0]))) % 90.0
    tilt = np.minimum(a, 90.0 - a)
    w_len = np.linalg.norm(vq[:, 1] - vq[:, 0], axis=1)
    h_len = np.linalg.norm(vq[:, 3] - vq[:, 0], axis=1)
    aspect = (np.maximum(w_len, h_len)
              / np.maximum(np.minimum(w_len, h_len), 1.0))
    elong = aspect >= cfg.fused_reroute_min_aspect
    long_side = np.maximum(np.maximum(w_len, h_len), 1.0)
    noise_floor = np.degrees(np.arctan2(cfg.fused_reroute_noise_px,
                                        long_side))
    single_thresh = np.maximum(cfg.fused_rotation_reroute_deg, noise_floor)
    single = bool(np.any(elong & (tilt > single_thresh)))
    coherent = bool(elong.any()) and (
        float(np.median(tilt[elong])) > cfg.fused_rotation_reroute_deg)
    rot90 = (cfg.rec_try_flip and cfg.rot90_tilt_deg > 0
             and float(np.median(geometry.quad_tilt_deg(vq)))
             > cfg.rot90_tilt_deg)
    return rot90 or single or coherent


_prefetch_pool = None


def _get_prefetch_pool():
    """One dedicated lookahead thread for chunk decode prefetch — separate
    from preprocess._get_decode_pool() so the outer chunk task (which
    blocks on that pool's per-page map) never occupies one of its
    workers."""
    global _prefetch_pool
    if _prefetch_pool is None:
        import concurrent.futures
        _prefetch_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ocrjax-chunk-prefetch")
    return _prefetch_pool


class _FakeOom(RuntimeError):
    """Marker for a dispatch-time OOM deferred to the fetch loop."""


def ocr_pages_fused(engine, images, lines_per_page: int = None,
                    bucket_width: int = None, beam: bool = False
                    ) -> List["OcrResult"]:
    """Batched end-to-end through the fused program. Same result contract as
    bucketing.ocr_pages (per-page OcrResult, reading order, original coords).
    """
    from ocrjax.api import DetBox, OcrLine, OcrResult

    cfg = engine.config
    if lines_per_page is None:
        lines_per_page = cfg.fused_lines_per_page
    if bucket_width is None:
        # ~10:1 aspect capacity, snapped to the configured buckets (320 at
        # the default 32-px rec height)
        bucket_width = cfg.rec_bucket_for_width(10 * cfg.rec_height)
    B = len(images)
    if B == 0:
        return []
    if cfg.rec_try_flip:
        engine.warn_untrained_cls()
    # The program closes over every config field EXCEPT the four detection
    # thresholds (those are traced args, see make_fused_ocr_fn), so the
    # cache key is the config with thresholds normalized out — threshold
    # sweeps reuse the compiled program, structural changes rebuild it.
    key = (lines_per_page, bucket_width, beam,
           cfg.replace(det_thresh=0.0, det_box_thresh=0.0,
                       det_unclip_ratio=0.0, det_min_box_size=0))
    cache = getattr(engine, "_fused_cache", None)
    if cache is None:
        cache = engine._fused_cache = {}
    if key not in cache:
        cache[key] = make_fused_ocr_fn(engine, lines_per_page, bucket_width,
                                       beam=beam)
    fused = cache[key]
    thr = np.asarray([cfg.det_thresh, cfg.det_box_thresh,
                      cfg.det_unclip_ratio, float(cfg.det_min_box_size)],
                     np.float32)

    from ocrjax.api_det import _det_state
    st = _det_state(engine)
    # Pipelined chunk dispatch: every chunk's upload + program launch is
    # issued before ANY result is read, and host fetches are started async,
    # so chunk k+1's upload rides the link while chunk k computes and chunk
    # k-1 downloads. Measured on the remote-TPU link: 16 pages one-shot
    # ~70 pages/s, 3x16 dispatched ahead ~98 pages/s. Chunks must share one
    # shape to reuse the compiled program, so B is cut into equal chunks
    # of at most fused_chunk_pages (remainder pages run as one extra call).
    # Host preprocessing is INTERLEAVED per chunk — decode/resize of chunk
    # k+1 runs while chunk k's upload and compute are in flight (measured
    # +20-50% batch throughput; preprocessing all pages up front left the
    # device idle for the whole decode pass).
    import contextlib
    timer = getattr(engine, "stage_timer", None)

    def _stage(name):
        return timer.stage(name) if timer is not None \
            else contextlib.nullcontext()

    C = max(1, min(cfg.fused_chunk_pages, B))
    S = cfg.det_max_side
    scales = np.ones((B,), np.float64)
    valid_hw = np.zeros((B, 2), np.int64)
    ok = np.ones((B,), bool)

    def dispatch(grays_np, wh_np):
        return fused(st.variables, engine.rec_variables,
                     engine.cls_variables,
                     jax.device_put(preprocess.pack_for_upload(
                         grays_np, cfg)), thr, wh_np)

    def fetch_halving(grays_np, wh_np, depth: int = 0) -> np.ndarray:
        """OOM fallback (SURVEY.md §5, mirrors tiling.run_chunked): halve
        the chunk and retry when the device runs out of memory."""
        try:
            return np.asarray(dispatch(grays_np, wh_np))
        except Exception as e:  # jaxlib raises XlaRuntimeError on OOM
            if "RESOURCE_EXHAUSTED" not in str(e) or depth >= 3 \
                    or len(grays_np) <= 1:
                raise
            from ocrjax.utils.logging import get_logger, log_fields
            log_fields(get_logger("ocrjax.fused"), "warning",
                       "device OOM: halving fused chunk",
                       chunk_pages=len(grays_np), depth=depth)
            mid = len(grays_np) // 2
            return np.concatenate([
                fetch_halving(grays_np[:mid], wh_np[:mid], depth + 1),
                fetch_halving(grays_np[mid:], wh_np[mid:], depth + 1)])

    outs = []
    chunk_inputs = []  # kept for the OOM retry path
    colorful: List[int] = []

    # Decode lookahead: chunk k+1's host decode (the largest fused stage,
    # 378 ms/96 pages in the 2026-08-19 run) runs on a prefetch thread
    # while chunk k's upload + dispatch are in flight, so only the FIRST
    # chunk's decode sits on the critical path. decode_chunk_to_gray is
    # internally pooled and its hot work (native canvas decode, cv2)
    # releases the GIL, so the overlap is real. The host_decode stage
    # times only the blocking wait for the prefetched result.
    def _decode(lo, hi):
        # Color-content reroute (mirror of the rotation reroute): the
        # fused path runs on 601 luma, which can wash out saturated
        # colored ink entirely — such pages re-run through the staged
        # min-channel-luma path.
        return preprocess.decode_chunk_to_gray(
            images, range(lo, hi), cfg,
            color_frac=cfg.fused_color_reroute_frac)

    # Truncated-first-fetch (cfg.fetch_max_tokens): pull only the first T_f
    # token columns per line; the full payload stays on device and is
    # refetched per chunk only when some line's n_tokens exceeds T_f
    # (bit-exact either way — sliced columns past n_tokens are CTC padding).
    from ocrjax.ops.bytepack import truncate_tokens_jit
    T = cfg.rec_max_tokens
    T_f = cfg.fetch_max_tokens if 0 < cfg.fetch_max_tokens < T else 0
    sliced = []
    prefetch = _get_prefetch_pool()
    bounds = [(lo, min(lo + C, B)) for lo in range(0, B, C)]
    pending_decode = prefetch.submit(_decode, *bounds[0])
    for ci, (lo, hi) in enumerate(bounds):
        with _stage("host_decode"):
            grays, scales[lo:hi], valid_hw[lo:hi], ok[lo:hi], col = \
                pending_decode.result()
            colorful.extend(lo + j for j, c in enumerate(col) if c)
        if ci + 1 < len(bounds):
            pending_decode = prefetch.submit(_decode, *bounds[ci + 1])
        wh = valid_hw[lo:hi, ::-1].astype(np.float32)
        with _stage("fused_dispatch"):
            try:
                o = dispatch(grays, wh)
            except Exception as e:  # noqa: BLE001 — OOM at dispatch
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                o = None  # retried with halving at fetch time
            outs.append(o)
            # Start THIS chunk's (truncated) device→host copy before the
            # next chunk's decode wait: the download rides the otherwise
            # idle link while later chunks decode and upload, so the
            # fetch phase below only waits on the remainder — window wall
            # approaches max(decode+dispatch, transfer), not their sum
            # (VERDICT r4 next #8: host_decode and fused_fetch were
            # serial phases on the 1-core driver host).
            s = (o if o is None or not T_f
                 else truncate_tokens_jit(o, lines_per_page, T, T_f))
            if s is not None:
                try:
                    s.copy_to_host_async()
                except (AttributeError, NotImplementedError):
                    pass
            sliced.append(s)
        chunk_inputs.append((grays, wh))
    chunks = []
    with _stage("fused_fetch"):
        for o, s, (grays, wh) in zip(outs, sliced, chunk_inputs):
            t_eff = T_f or T
            try:
                if o is None:
                    raise _FakeOom("RESOURCE_EXHAUSTED (deferred)")
                arr = np.asarray(s)
            except Exception as e:  # noqa: BLE001 — OOM at materialization
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                arr, t_eff = fetch_halving(grays, wh), T
            if timer is not None:
                timer.add_bytes("fused_fetch", arr.nbytes)
            c = unpack_fused(arr, lines_per_page, t_eff,
                             try_flip=cfg.rec_try_flip)
            if t_eff < T and c["n_tokens"].max(initial=0) > t_eff:
                full = np.asarray(o)
                if timer is not None:
                    timer.add_bytes("fused_fetch", full.nbytes)
                c = unpack_fused(full, lines_per_page, T,
                                 try_flip=cfg.rec_try_flip)
            chunks.append(c)
    if len(chunks) == 1:
        out = chunks[0]
    else:  # merge chunk dicts; token widths may differ (T_f vs refetched T)
        tw = max(c["tokens"].shape[2] for c in chunks)
        out = {k: np.concatenate([
            np.pad(c[k], ((0, 0), (0, 0), (0, tw - c[k].shape[2])))
            if k == "tokens" and c[k].shape[2] < tw else c[k]
            for c in chunks]) for k in chunks[0]}
    tokens = out["tokens"]
    n_tokens = out["n_tokens"]
    conf = out["conf"]
    quads = out["quads"]
    scores = out["scores"]
    valid = out["valid"]
    flipped = out["flipped"]

    results: List[OcrResult] = []
    reroute: List[int] = []
    color_set = set(colorful)
    for i in range(B):
        if not ok[i]:
            results.append(OcrResult(lines=[]))
            continue
        if i in color_set:
            from ocrjax import api_det
            results.append(api_det.ocr(engine, images[i], beam=beam,
                                       color=True))
            continue
        # Rotation reroute (see should_reroute_rotation): the quads are
        # already on host, so straight pages — the common case — pay
        # nothing. Rerouted pages are collected and re-run as ONE staged
        # batch instead of N serial single-page pipelines (ADVICE r1).
        # Padding-artifact boxes are excluded from the vote with the same
        # center-in-valid predicate as the line loop below (ADVICE r2): an
        # axis-aligned streak box in padding reads as 90° tilt and could
        # force a spurious rot90 redo or dilute the median on a true
        # landscape page.
        nh, nw = valid_hw[i]
        vq = quads[i][valid[i]]
        if len(vq):
            ctr = vq.mean(axis=1)
            vq = vq[(ctr[:, 0] < nw) & (ctr[:, 1] < nh)]
        if (cfg.fused_rotation_reroute_deg > 0
                and len(vq)
                and should_reroute_rotation(vq, cfg)):
            reroute.append(i)
            results.append(None)  # placeholder, filled below
            continue
        lines = []
        qs, metas = [], []
        for k in np.where(valid[i])[0]:
            q = quads[i, k]
            if not (q[:, 0].mean() < nw and q[:, 1].mean() < nh):
                continue  # canvas-padding artifact
            qs.append(geometry.scale_quads(q, scales[i]))
            metas.append(k)
        # an upside-down page (most lines flipped) reads bottom-right →
        # top-left = the reading order of the 180°-rotated coordinates
        if sum(flipped[i, k] for k in metas) * 2 > len(metas):
            order = geometry.sort_reading_order([-q for q in qs])
        else:
            order = geometry.sort_reading_order(qs)
        for j in order:
            k = metas[j]
            text = engine.charset.decode(tokens[i, k][: n_tokens[i, k]])
            lines.append(OcrLine(
                box=DetBox(qs[j], float(scores[i, k])),
                text=text, confidence=float(conf[i, k])))
        # saturation flag from the RAW valid count (pre artifact filter):
        # all K slots valid means the page may hold more lines than K
        results.append(OcrResult(
            lines=lines, truncated=bool(valid[i].sum() >= lines_per_page)))

    # Saturated pages (every one of the K static line slots valid — the
    # page may hold MORE lines than the fused capacity) redo through the
    # unbounded bucketed path alongside the rotation reroutes.
    redo = [i for i in range(B)
            if results[i] is not None and results[i].truncated and ok[i]]
    if reroute or redo:
        from ocrjax.utils.logging import get_logger, log_fields
        log_fields(get_logger("ocrjax.fused"), "info",
                   "fused-path redo through the staged pipeline",
                   rotated=len(reroute), saturated=len(redo),
                   colorful=len(colorful))
        # one pooled staged batch for all rotated + saturated pages:
        # exact-homography rectification / unbounded line count via the
        # bucketed path (same pipeline C4 uses). Downscaled pages pool
        # separately — they recognize from full-res ORIGINAL-image crops
        # (which the canvas-based bucketed path cannot), batched through
        # api_det.ocr_fullres_batch: chunked dispatch-ahead detection +
        # ONE pooled recognize_strips round for the whole lane (VERDICT r3
        # weak #5: this was N serial single-page pipelines).
        from ocrjax import api_det, bucketing
        pooled = [i for i in reroute + redo if scales[i] >= 0.999]
        staged = bucketing.ocr_pages(
            engine, [images[i] for i in pooled], beam=beam)
        for i, res in zip(pooled, staged):
            results[i] = res
        down = [i for i in reroute + redo if scales[i] < 0.999]
        if down:
            for i, res in zip(down, api_det.ocr_fullres_batch(
                    engine, [images[i] for i in down], beam=beam)):
                results[i] = res
    return results
