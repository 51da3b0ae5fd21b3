#!/usr/bin/env python
"""Hardware probe: C5 dense-page quality + throughput at spec density
(BASELINE.json:11 "hundreds of lines/page"). Reports detection recall,
line-exact, truncation, and pages/s + lines/s for the tiled path.

Run: python scripts/probe_dense.py [--pages 4] [--lines 200] [--cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def match(quads, texts, lines):
    found = exact = 0
    for q, t in zip(quads, texts):
        c = q.mean(axis=0)
        h = q[:, 1].max() - q[:, 1].min() + 1
        best, bd = None, 1e9
        for l in lines:
            dd = np.hypot(*(np.asarray(l.box.quad).mean(axis=0) - c))
            if dd < bd:
                bd, best = dd, l
        if best is not None and bd < max(h, 10):
            found += 1
            exact += best.text == t
    return found, exact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=4)
    ap.add_argument("--lines", type=int, default=200)
    ap.add_argument("--height", type=int, default=3072)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--det-weights", default=None)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ocrjax.api import OcrEngine
    from ocrjax.train import synth

    eng = OcrEngine.from_pretrained()
    if args.det_weights:
        from ocrjax import weights as W
        eng.det_variables = W.load_variables(args.det_weights)
        print("candidate det weights:", args.det_weights, flush=True)
    rng = np.random.RandomState(args.seed)
    pages = []
    for _ in range(args.pages):
        page, quads, texts = synth.render_page_dense(
            rng, eng.charset, size=(args.height, args.width),
            n_lines=args.lines)
        pages.append((np.repeat(page[..., None], 3, axis=2), quads, texts))
        print(f"rendered {len(texts)} lines", flush=True)

    # warm THE BATCH PATH: ocr_tiled_batch compiles pooled P-bucketed
    # shapes ocr_tiled never touches — warming only the single-page path
    # left first-compiles inside the timed region (measured: 0.097
    # "pages/s" vs 10.3 steady-state on identical code)
    t0 = time.time()
    res0 = eng.ocr_tiled_batch([p[0] for p in pages])[0]
    print(f"warm batch: {time.time() - t0:.1f}s, {len(res0.lines)} lines, "
          f"truncated={res0.truncated}", flush=True)

    t0 = time.time()
    results = eng.ocr_tiled_batch([p[0] for p in pages])
    dt = time.time() - t0

    tot = tfound = texact = tlines = 0
    for (img, quads, texts), res in zip(pages, results):
        found, exact = match(quads, texts, res.lines)
        tot += len(texts)
        tfound += found
        texact += exact
        tlines += len(res.lines)
        print(f"page: gt={len(texts)} det={len(res.lines)} found={found} "
              f"exact={exact} truncated={res.truncated}", flush=True)
    print(json.dumps({
        "pages": args.pages, "gt_lines": tot,
        "det_recall": round(tfound / max(tot, 1), 4),
        "line_exact": round(texact / max(tot, 1), 4),
        "pages_per_sec": round(args.pages / dt, 3),
        "lines_per_sec": round(tot / dt, 1),
        "batch_s": round(dt, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
