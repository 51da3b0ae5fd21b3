#!/usr/bin/env python
"""Split the bucketed path's rec_fetch_decode stage (676 ms in the
2026-08-19 bench window — the bucketed path's dominant stage and the
median-window limiter) into its hidden parts:

  A. device compute of all pooled warp+cls+rec chunk programs
     (dispatch → block_until_ready on the concatenated packed output);
  B. the single coalesced host fetch (np.asarray after A);
  C. host token decode to strings.

If A dominates, chunk-level rec pipelining (overlap rec of det-chunk k
with det of chunk k+1) is the right fix; if B dominates, the payload/RTT
needs shrinking instead.

Run on TPU: python scripts/diag_rec_fetch.py [--pages 96]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=96)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp

    from ocrjax import bucketing, preprocess
    from ocrjax.api import OcrEngine
    from ocrjax.api_det import _det_state, _gray_norm_jit, unpack_det
    from ocrjax.train import synth

    engine = OcrEngine.from_pretrained()
    engine.config = engine.config.replace(fused_lines_per_page=16)
    cfg = engine.config
    rng = np.random.RandomState(0)
    imgs = []
    for _ in range(args.pages):
        page, _, _ = synth.render_page(
            rng, engine.charset, size=(cfg.det_max_side, cfg.det_max_side))
        imgs.append(np.repeat(page[..., None], 3, axis=2))

    # detection (not the subject — just produce the pooled inputs)
    st = _det_state(engine)
    B = len(imgs)
    C = max(1, min(cfg.fused_chunk_pages, B))
    scales = np.ones((B,), np.float64)
    valid_hw = np.zeros((B, 2), np.int64)
    ok = np.ones((B,), bool)
    chunk_devs, chunk_packed = [], []
    for lo in range(0, B, C):
        hi = min(lo + C, B)
        grays, scales[lo:hi], valid_hw[lo:hi], ok[lo:hi], _ = \
            preprocess.decode_chunk_to_gray(imgs, range(lo, hi), cfg)
        dev = jnp.asarray(preprocess.pack_for_upload(grays, cfg))
        _, packed = st.forward(st.variables, dev)
        chunk_devs.append(dev)
        chunk_packed.append(packed)
    boxes, scores, valid = unpack_det(
        np.concatenate([np.asarray(p) for p in chunk_packed]),
        cfg.det_max_candidates)
    for i in range(B):
        nh, nw = valid_hw[i]
        cx = boxes[i, :, :, 0].mean(axis=1)
        cy = boxes[i, :, :, 1].mean(axis=1)
        valid[i] &= ok[i] & (cx < nw) & (cy < nh)
    page_ids, quads = [], []
    for i in range(B):
        for j in np.where(valid[i])[0]:
            page_ids.append(i)
            quads.append(boxes[i, j])
    page_ids = np.asarray(page_ids, np.int32)
    quads = np.asarray(quads, np.float32)
    b_all = (valid_hw[page_ids][:, ::-1].astype(np.float32) - 1.0)[:, None, :]
    normed = [_gray_norm_jit(d, cfg.upload_bits, cfg.rec_mean, cfg.rec_std)
              for d in chunk_devs]
    gray_dev = jnp.concatenate(normed, axis=0)
    print(f"pages={B} pooled_lines={len(quads)}", flush=True)

    # instrumented recognize_pooled phases (mirrors bucketing.recognize_pooled
    # without try_flip)
    from ocrjax.api_det import (_estimate_strip_widths,
                                _rec_strips_packed_jit, unpack_rec)
    from ocrjax.ops.warp import expand_quads, warp_quads_multi_refined

    P = int(gray_dev.shape[0])
    Pb = 1 << max(P - 1, 0).bit_length()
    gpad = gray_dev
    if Pb != P:
        gpad = jnp.concatenate(
            [gray_dev,
             jnp.zeros((Pb - P,) + gray_dev.shape[1:], gray_dev.dtype)])
    est_w = _estimate_strip_widths(quads, cfg.rec_height) * 1.25
    warp_src = expand_quads(quads, cfg.rec_crop_margin, cfg.rec_crop_margin,
                            bounds=b_all)
    cap = cfg.line_batch_buckets[-1]
    chunks = []
    for bucket_w, idx_all in bucketing.assign_width_buckets(
            est_w, cfg.rec_width_buckets).items():
        for lo in range(0, len(idx_all), cap):
            chunks.append((bucket_w, idx_all[lo:lo + cap]))

    def dispatch():
        pending = []
        for bucket_w, idx in chunks:
            n = len(idx)
            nb = bucketing.pad_count(n, cfg)
            sel = np.concatenate([idx, np.repeat(idx[-1:], nb - n)])
            strips, widths = warp_quads_multi_refined(
                gpad, jnp.asarray(page_ids[sel]),
                jnp.asarray(warp_src[sel]), jnp.asarray(b_all[sel]),
                rec_height=cfg.rec_height, bucket_width=bucket_w,
                ink_thresh=(0.5 - cfg.rec_mean) / cfg.rec_std,
                margin_fracs=(cfg.rec_crop_margin, cfg.rec_crop_margin),
                x_margin_keep=cfg.rec_ink_x_margin_keep,
                pad_value=(0.0 - cfg.rec_mean) / cfg.rec_std,
                orig_quads=jnp.asarray(quads[sel]))
            out = _rec_strips_packed_jit(engine, strips, widths, beam=False)
            pending.append((idx, out))
        pcat = jnp.concatenate([o for _, o in pending])
        return pending, pcat

    dispatch()  # warm compiles
    for r in range(args.repeats):
        t0 = time.perf_counter()
        pending, pcat = dispatch()
        t_dispatch = time.perf_counter() - t0
        t0 = time.perf_counter()
        pcat.block_until_ready()
        t_compute = time.perf_counter() - t0
        t0 = time.perf_counter()
        phost = np.asarray(pcat)
        t_fetch = time.perf_counter() - t0
        t0 = time.perf_counter()
        off = 0
        texts = []
        for idx, out in pending:
            rows = phost[off: off + out.shape[0]]
            off += out.shape[0]
            tokens, n_tokens, conf = unpack_rec(rows, cfg.rec_max_tokens)
            for k in range(len(idx)):
                texts.append(engine.charset.decode(tokens[k][: n_tokens[k]]))
        t_decode = time.perf_counter() - t0
        print(f"run{r}: dispatch={t_dispatch*1e3:.1f}ms "
              f"device_compute={t_compute*1e3:.1f}ms "
              f"fetch={t_fetch*1e3:.1f}ms payload={phost.nbytes/1e3:.0f}KB "
              f"host_decode={t_decode*1e3:.1f}ms "
              f"n_chunks={len(chunks)}", flush=True)


if __name__ == "__main__":
    main()
