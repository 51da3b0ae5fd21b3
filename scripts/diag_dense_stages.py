#!/usr/bin/env python
"""Per-stage wall-time attribution for the dense C5 tiled path (VERDICT r3
missing #3 / weak #1: the driver's dense number moved -31% between runs and
nothing could attribute it). Runs the exact bench dense workload (3 pages,
3072x2048, 200 lines) through ocr_tiled_batch with a StageTimer and prints
the stage table + the resident-tile det forward time (the device ceiling's
det term).

Run: python scripts/diag_dense_stages.py [--cpu] [--pages 3] [--repeats 2]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pages", type=int, default=3)
    ap.add_argument("--n-lines", type=int, default=200)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ocrjax.api import OcrEngine
    from ocrjax.train import synth
    from ocrjax.utils.profiling import StageTimer
    from ocrjax import tiling, preprocess
    from ocrjax.api_det import _det_state

    eng = OcrEngine.from_pretrained()
    cfg = eng.config
    imgs = []
    for s in range(args.pages):
        rng = np.random.RandomState(1000 + s)
        page, _, texts = synth.render_page_dense(
            rng, eng.charset, size=(3072, 2048), n_lines=args.n_lines)
        imgs.append(np.repeat(page[..., None], 3, axis=2))
        print(f"page {s}: {len(texts)} gt lines", flush=True)

    print("window tile cap:", tiling.max_pool_tiles(cfg), flush=True)
    # warm
    t0 = time.perf_counter()
    eng.ocr_tiled_batch(imgs)
    print(f"warm (compile) run: {time.perf_counter()-t0:.1f}s", flush=True)

    for r in range(args.repeats):
        eng.stage_timer = StageTimer()
        t0 = time.perf_counter()
        res = eng.ocr_tiled_batch(imgs)
        dt = time.perf_counter() - t0
        rep = eng.stage_timer.report()
        eng.stage_timer = None
        nl = sum(len(x.lines) for x in res)
        print(f"\nrun {r}: {dt*1e3:.0f} ms total = "
              f"{args.pages/dt:.2f} pages/s, {nl/dt:.0f} lines/s "
              f"({nl} lines)")
        acc = sum(v["total_ms"] for v in rep.values())
        for k, v in sorted(rep.items(), key=lambda kv: -kv[1]["total_ms"]):
            print(f"  {k:22s} {v['total_ms']:8.1f} ms  x{v['calls']}")
        print(f"  {'(sum of stages)':22s} {acc:8.1f} ms  "
              f"(unattributed {dt*1e3-acc:.1f} ms)")

    # resident-tile det forward (device det term of the dense ceiling)
    img0 = preprocess.load_image(imgs[0], auto_invert=cfg.auto_invert)
    corners, groups = tiling._prep_page(eng, img0)
    fwd, _ = tiling._tile_forward(eng)
    dvars = tiling._tile_det_vars(eng)
    st = _det_state(eng)
    devs = [jnp.asarray(preprocess.pack_for_upload(g, cfg))
            for g in groups]

    def det_once():
        outs = [fwd(dvars, g) for g in devs]
        for o in outs:
            np.asarray(o)  # block (see bench_lib on block_until_ready)

    det_once()
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        det_once()
        ts.append(time.perf_counter() - t0)
    shapes = [tuple(g.shape) for g in groups]
    print(f"\nresident det fwd ({shapes} tiles/page): "
          f"{min(ts)*1e3:.1f} ms/page")


if __name__ == "__main__":
    main()
