#!/usr/bin/env python
"""Beam-vs-greedy decode: measured cost AND measured benefit (VERDICT r3
missing #4: the on-device prefix beam existed with parity tests but no
measured reason to use it).

Reports (a) device crops/s at production shapes (count bucket 256, width
320, V=96, K=cfg.ctc_beam_width, T=80) for greedy vs beam, and (b)
line-exact/CER per quality tier (straight + degraded sweep) for both
decoders through the production e2e path.

Run: python scripts/eval_beam.py [--cpu] [--seeds 4]
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
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ocrjax.api import OcrEngine
    from ocrjax.train import synth
    from ocrjax.train.e2e_eval import evaluate_e2e

    eng = OcrEngine.from_pretrained()
    cfg = eng.config
    rng = np.random.RandomState(0)

    # ---- throughput at production shapes ---------------------------------
    n, W = 256, 320
    strips = np.zeros((n, cfg.rec_height, W), np.uint8)
    widths = np.full((n,), W, np.int32)
    for i in range(n):
        t = synth.random_text(rng, eng.charset, 4, 12)
        s = synth.render_line(t, cfg.rec_height)
        w = min(s.shape[1], W)
        strips[i, :, :w] = s[:, :w]
        widths[i] = w
    sd, wd = jnp.asarray(strips), jnp.asarray(widths)
    rates = {}
    for beam in (False, True):
        np.asarray(eng._rec_step(eng.rec_variables, sd, wd, beam=beam)[0])
        ts = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            np.asarray(eng._rec_step(eng.rec_variables, sd, wd,
                                     beam=beam)[0])
            ts.append(time.perf_counter() - t0)
        rates["beam" if beam else "greedy"] = n / min(ts)
    print(json.dumps({
        "crops_per_sec_greedy": round(rates["greedy"], 0),
        "crops_per_sec_beam": round(rates["beam"], 0),
        "beam_cost_x": round(rates["greedy"] / rates["beam"], 2),
        "beam_width": cfg.ctc_beam_width,
    }), flush=True)

    # ---- accuracy per tier ------------------------------------------------
    out = {}
    tiers = [("straight", dict()), ("degraded_0.5", dict(degrade_level=0.5)),
             ("degraded_0.75", dict(degrade_level=0.75)),
             ("degraded_1.0", dict(degrade_level=1.0))]
    for name, kw in tiers:
        for beam in (False, True):
            runs = [evaluate_e2e(eng, n_pages=4, seed=321 + s, beam=beam,
                                 **kw)
                    for s in range(args.seeds)]
            key = f"{name}/{'beam' if beam else 'greedy'}"
            out[key] = {
                "line_exact": round(float(np.mean(
                    [r["line_exact_match"] for r in runs])), 4),
                "cer": round(float(np.mean(
                    [r["char_error_rate"] for r in runs])), 4),
            }
            print(key, json.dumps(out[key]), flush=True)

    print("\n== beam vs greedy (line-exact / cer) ==")
    for name, _ in tiers:
        g, b = out[f"{name}/greedy"], out[f"{name}/beam"]
        print(f"  {name:14s} greedy {g['line_exact']:.4f}/{g['cer']:.4f}"
              f"   beam {b['line_exact']:.4f}/{b['cer']:.4f}"
              f"   Δexact {b['line_exact'] - g['line_exact']:+.4f}")


if __name__ == "__main__":
    main()
