#!/usr/bin/env python
"""Multi-seed e2e validation: the gate a candidate recognizer must pass
BEFORE its weights ship or goldens regenerate (DESIGN.md §4 — the r2
font-biased fine-tune looked good on one seed and regressed the aggregate).

Tiers:
  straight  — 8 seeds x 8 clean pages (the r2 aggregate baseline: 0.94)
  rotated   — 6 seeds x 4 pages, per-line rotation +-10 deg (baseline 0.93)
  degraded  — optional (--degrade): straight pages pushed through
              synth.degrade_image at levels 0.25/0.5/0.75/1.0 (the offline
              proxy for the ICDAR scans bar, VERDICT r2 missing #2/#3)

Run: python scripts/eval_multiseed.py [--weights CANDIDATE.safetensors]
     [--degrade] [--cpu] [--json OUT.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _mean(dicts, key):
    return float(np.mean([d[key] for d in dicts]))


def _tier(engine, seeds, n_pages, **kw):
    from ocrjax.train.e2e_eval import evaluate_e2e
    runs = [evaluate_e2e(engine, n_pages=n_pages, seed=s, **kw)
            for s in seeds]
    return {
        "line_exact_match": _mean(runs, "line_exact_match"),
        "det_recall": _mean(runs, "det_recall"),
        "char_error_rate": _mean(runs, "char_error_rate"),
        "per_seed_exact": [round(r["line_exact_match"], 4) for r in runs],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=None,
                    help="candidate rec safetensors (default: shipped assets)")
    ap.add_argument("--det-weights", default=None,
                    help="candidate det safetensors (default: shipped assets)")
    ap.add_argument("--straight-seeds", type=int, default=8)
    ap.add_argument("--rotated-seeds", type=int, default=6)
    ap.add_argument("--degrade", action="store_true",
                    help="also sweep page degradation levels")
    ap.add_argument("--degrade-seeds", type=int, default=4)
    ap.add_argument("--projective", action="store_true",
                    help="also sweep projective/keystone + page-curl "
                         "severities (synth.warp_page_projective)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--json", default=None, help="write results as JSON")
    ap.add_argument("--flat-frac", type=float, default=None,
                    help="override cfg.rec_flat_band_frac")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ocrjax import weights as W
    from ocrjax.api import OcrEngine

    eng = OcrEngine.from_pretrained()
    if args.weights:
        eng.rec_variables = W.load_variables(args.weights)
        print("candidate rec weights:", args.weights, flush=True)
    if args.det_weights:
        eng.det_variables = W.load_variables(args.det_weights)
        print("candidate det weights:", args.det_weights, flush=True)
    if args.flat_frac is not None:
        eng.config = eng.config.replace(rec_flat_band_frac=args.flat_frac)
        print("rec_flat_band_frac:", args.flat_frac, flush=True)

    out = {}
    out["straight"] = _tier(
        eng, range(123, 123 + args.straight_seeds), n_pages=8)
    print("straight:", json.dumps(out["straight"]), flush=True)
    out["rotated"] = _tier(
        eng, range(9, 9 + args.rotated_seeds), n_pages=4, max_rotation=10.0)
    print("rotated:", json.dumps(out["rotated"]), flush=True)
    # held-out rasterizer (weak #6): same pages, Lanczos-downsampled 3x
    # supersampled glyphs — a rendering distribution no model trained on
    out["heldout_renderer"] = _tier(
        eng, range(123, 123 + args.straight_seeds), n_pages=8, supersample=3)
    print("heldout_renderer:", json.dumps(out["heldout_renderer"]),
          flush=True)
    if args.degrade:
        for lv in (0.25, 0.5, 0.75, 1.0):
            out[f"degraded_{lv}"] = _tier(
                eng, range(321, 321 + args.degrade_seeds), n_pages=4,
                degrade_level=lv)
            print(f"degraded {lv}:", json.dumps(out[f"degraded_{lv}"]),
                  flush=True)
    if args.projective:
        for lv in (0.3, 0.6, 1.0):
            out[f"projective_{lv}"] = _tier(
                eng, range(555, 555 + args.degrade_seeds), n_pages=4,
                projective=lv, curl=lv)
            print(f"projective {lv}:", json.dumps(out[f"projective_{lv}"]),
                  flush=True)

    print("\n== summary (line-exact) ==")
    for k, v in out.items():
        print(f"  {k:14s} {v['line_exact_match']:.4f} "
              f"(recall {v['det_recall']:.3f}, cer {v['char_error_rate']:.4f})")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
