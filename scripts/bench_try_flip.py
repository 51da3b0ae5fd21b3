#!/usr/bin/env python
"""Decide rec_try_flip's default with data (VERDICT r2 missing #5 / next
#7): measure fused-path throughput AND straight-page quality with the
orientation stage on vs off. Ship rule: default-on if overhead < 5% and
straight quality is unchanged (try-flip already wins on 180/90-degree
pages by construction — the question is what upright pages pay).

Run on TPU: python scripts/bench_try_flip.py [--pages 48] [--repeats 3]
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
    ap.add_argument("--pages", type=int, default=48)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ocrjax.api import OcrEngine
    from ocrjax.train import synth

    eng = OcrEngine.from_pretrained()
    eng.config = eng.config.replace(fused_lines_per_page=16)
    rng = np.random.RandomState(77)
    imgs, gts = [], []
    for _ in range(args.pages):
        page, _, texts = synth.render_page(rng, eng.charset)
        imgs.append(np.repeat(page[..., None], 3, axis=2))
        gts.append(texts)

    out = {}
    for flip in (False, True):
        eng.config = eng.config.replace(rec_try_flip=flip)
        eng.ocr_batch(imgs[:8], fused=True)       # warm this config
        best = 0.0
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            res = eng.ocr_batch(imgs, fused=True)
            dt = time.perf_counter() - t0
            best = max(best, len(imgs) / dt)
        tot = hit = 0
        for r, gt in zip(res, gts):
            got = [l.text for l in r.lines]
            tot += len(gt)
            hit += sum(1 for t in gt if t in got)
        out["flip_on" if flip else "flip_off"] = {
            "pages_per_sec": round(best, 1),
            "line_exact": round(hit / tot, 4),
        }
        print(json.dumps(out["flip_on" if flip else "flip_off"]), flush=True)

    ovh = 1.0 - out["flip_on"]["pages_per_sec"] / max(
        out["flip_off"]["pages_per_sec"], 1e-9)
    dq = out["flip_on"]["line_exact"] - out["flip_off"]["line_exact"]
    print(json.dumps({"overhead_frac": round(ovh, 4),
                      "quality_delta": round(dq, 4),
                      "default_on_ok": bool(ovh < 0.05 and dq >= -0.005)}))


if __name__ == "__main__":
    main()
