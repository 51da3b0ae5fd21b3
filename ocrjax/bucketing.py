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

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ocrjax import geometry, preprocess
from ocrjax.ops.warp import (expand_quads, warp_quads_multi,
                             warp_quads_multi_refined)


@jax.jit
def _normalize_gray(gray_u8, mean, std):
    return (gray_u8.astype(jnp.float32) / 255.0 - mean) / std


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


def ocr_pages(engine, images: Sequence, beam: bool = False
              ) -> List["OcrResult"]:
    """C4 pooled batched OCR. Returns one OcrResult per input image."""
    from ocrjax.api import DetBox, OcrLine, OcrResult
    from ocrjax.api_det import (_det_state, _estimate_strip_widths,
                                _rec_strips_packed_jit, unpack_det,
                                unpack_rec)

    cfg = engine.config
    B = len(images)
    if B == 0:
        return []

    # ---- decode + canvas (host) -------------------------------------------
    grays = np.zeros((B, cfg.det_max_side, cfg.det_max_side), np.uint8)
    scales = np.ones((B,), np.float64)
    valid_hw = np.zeros((B, 2), np.int64)
    ok = np.ones((B,), bool)
    for i, image in enumerate(images):
        try:
            img = preprocess.load_image(image)
            canvas, scales[i], valid_hw[i] = \
                preprocess.det_resize_to_canvas(img, cfg)
            grays[i] = preprocess.to_gray(canvas)
        except Exception:  # noqa: BLE001 — per-page isolation (SURVEY.md §5)
            ok[i] = False

    # ---- one batched detection program ------------------------------------
    # single u8 luma upload, reused by detection AND the warp below
    grays_dev = jnp.asarray(grays)
    st = _det_state(engine)
    prob, packed = st.forward(st.variables, grays_dev)
    boxes, scores, valid = unpack_det(
        np.asarray(packed), cfg.det_max_candidates)
    for i in range(B):
        nh, nw = valid_hw[i]
        cx = boxes[i, :, :, 0].mean(axis=1)
        cy = boxes[i, :, :, 1].mean(axis=1)
        valid[i] &= ok[i] & (cx < nw) & (cy < nh)

    # ---- pool quads across pages -------------------------------------------
    page_ids, quads, qscores, per_page_slots = [], [], [], []
    for i in range(B):
        for j in np.where(valid[i])[0]:
            per_page_slots.append((i, len(quads)))
            page_ids.append(i)
            quads.append(boxes[i, j])
            qscores.append(scores[i, j])
    results: List[List[OcrLine]] = [[] for _ in range(B)]
    if not quads:
        return [OcrResult(lines=r) for r in results]

    page_ids = np.asarray(page_ids, np.int32)
    quads = np.asarray(quads, np.float32)
    warp_src = quads  # reported boxes stay the detector's, only crops expand
    # per-quad bounds = that page's valid region (never sample canvas pad)
    b_all = (valid_hw[page_ids][:, ::-1].astype(np.float32) - 1.0)[:, None, :]
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

    # normalize the already-uploaded luma canvases on device
    gray_dev = _normalize_gray(grays_dev, cfg.rec_mean, cfg.rec_std)

    # ---- per width-bucket pooled warp + recognize --------------------------
    # Dispatch every bucket's warp+rec program before reading ANY result and
    # start the host copies async: bucket k+1 computes while bucket k
    # downloads, and each bucket costs one fetch RTT instead of three.
    texts = [None] * len(quads)
    confs = [0.0] * len(quads)
    pending = []
    for bucket_w, idx in assign_width_buckets(
            est_w, cfg.rec_width_buckets).items():
        n = len(idx)
        nb = pad_count(n, cfg)
        sel = np.concatenate([idx, np.repeat(idx[-1:], nb - n)])
        if cfg.rec_snap_to_ink:
            strips, widths = warp_quads_multi_refined(
                gray_dev, jnp.asarray(page_ids[sel]),
                jnp.asarray(warp_src[sel]), jnp.asarray(b_all[sel]),
                rec_height=cfg.rec_height, bucket_width=bucket_w,
                ink_thresh=(0.5 - cfg.rec_mean) / cfg.rec_std,
                margin_fracs=(cfg.rec_crop_margin, cfg.rec_crop_margin),
                x_margin_keep=cfg.rec_ink_x_margin_keep,
                pad_value=(0.0 - cfg.rec_mean) / cfg.rec_std)
        else:
            strips, widths = warp_quads_multi(
                gray_dev, jnp.asarray(page_ids[sel]),
                jnp.asarray(warp_src[sel]),
                rec_height=cfg.rec_height, bucket_width=bucket_w,
                pad_value=(0.0 - cfg.rec_mean) / cfg.rec_std)
        out = _rec_strips_packed_jit(engine, strips, widths, beam=beam)
        pending.append((idx, out))
    for _, out in pending:
        try:
            out.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass
    for idx, out in pending:
        tokens, n_tokens, conf = unpack_rec(
            np.asarray(out), cfg.rec_max_tokens)
        for k, qi in enumerate(idx):
            texts[qi] = engine.charset.decode(tokens[k][: n_tokens[k]])
            confs[qi] = float(conf[k])

    # ---- scatter back, reading order per page ------------------------------
    for i in range(B):
        mine = [s for (p, s) in per_page_slots if p == i]
        if not mine:
            continue
        page_quads = [geometry.scale_quads(quads[s], scales[i]) for s in mine]
        order = geometry.sort_reading_order(page_quads)
        results[i] = [
            OcrLine(box=DetBox(page_quads[k], float(qscores[mine[k]])),
                    text=texts[mine[k]], confidence=confs[mine[k]])
            for k in order
        ]
    return [OcrResult(lines=r) for r in results]
