#!/usr/bin/env python
"""Multi-seed C5 tiled-path quality (VERDICT r2 weak #2: the tiled gate sat
at 0.85 vs 0.92 single-page with no explanation). Runs the 2048px 12-16
line scenario of tests/test_tpu.py::test_c5_tiled_e2e_on_tpu over several
seeds and reports per-seed line-exact, so the TPU gate can be set from a
measured floor instead of a guess.

Run on TPU:  python scripts/eval_tiled_quality.py [--seeds 8]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8)
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--weights", default=None, help="rec weights override")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ocrjax.api import OcrEngine
    from ocrjax.train import synth
    from ocrjax import weights as W

    eng = OcrEngine.from_pretrained()
    if args.weights:
        eng.rec_variables = W.load_variables(args.weights)
        print("candidate rec weights:", args.weights, flush=True)
    per_seed = []
    misses = []
    for seed in range(42, 42 + args.seeds):
        rng = np.random.RandomState(seed)
        page, _, texts = synth.render_page(
            rng, eng.charset, size=(args.size, args.size),
            n_lines=(12, 16), max_len=12)
        img = np.repeat(page[..., None], 3, axis=2)
        res = eng.ocr_tiled(img)
        rem = list(texts)
        exact = 0
        for l in res.lines:
            if l.text in rem:
                rem.remove(l.text)
                exact += 1
        per_seed.append(exact / len(texts))
        misses.extend((seed, m) for m in rem)
    print(json.dumps({
        "per_seed_exact": [round(v, 4) for v in per_seed],
        "mean": round(float(np.mean(per_seed)), 4),
        "min": round(float(np.min(per_seed)), 4),
    }))
    for seed, m in misses[:20]:
        print("  miss seed=%d gt=%r" % (seed, m))


if __name__ == "__main__":
    main()
