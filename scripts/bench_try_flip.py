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

    # INTERLEAVED off/on windows (r5): the two configs used to run as
    # separate sequential phases, so a link-state drift between phases
    # read as flip overhead (or, measured 2026-08-21, as a fictitious
    # −39% overhead when the tunnel cleared mid-run). Alternating windows
    # give pairwise-local comparisons; the reported overhead is the
    # median of per-PAIR ratios, which cancels slow drift.
    res_q = {}
    windows = {False: [], True: []}
    for flip in (False, True):
        eng.config = eng.config.replace(rec_try_flip=flip)
        eng.ocr_batch(imgs[:8], fused=True)       # warm this config
    pair_ratios = []
    for _ in range(args.repeats):
        pps = {}
        for flip in (False, True):
            eng.config = eng.config.replace(rec_try_flip=flip)
            t0 = time.perf_counter()
            res = eng.ocr_batch(imgs, fused=True)
            dt = time.perf_counter() - t0
            pps[flip] = len(imgs) / dt
            windows[flip].append(pps[flip])
            res_q[flip] = res
        pair_ratios.append(pps[True] / pps[False])
    out = {}
    for flip in (False, True):
        tot = hit = 0
        for r, gt in zip(res_q[flip], gts):
            got = [l.text for l in r.lines]
            tot += len(gt)
            hit += sum(1 for t in gt if t in got)
        out["flip_on" if flip else "flip_off"] = {
            "pages_per_sec": round(max(windows[flip]), 1),
            "windows": [round(v, 1) for v in windows[flip]],
            "line_exact": round(hit / tot, 4),
        }
        print(json.dumps(out["flip_on" if flip else "flip_off"]),
              flush=True)

    ovh = 1.0 - float(np.median(pair_ratios))
    dq = out["flip_on"]["line_exact"] - out["flip_off"]["line_exact"]
    print(json.dumps({"overhead_frac": round(ovh, 4),
                      "pair_ratios": [round(r, 3) for r in pair_ratios],
                      "quality_delta": round(dq, 4),
                      "default_on_ok": bool(ovh < 0.05 and dq >= -0.005)}))


if __name__ == "__main__":
    main()
