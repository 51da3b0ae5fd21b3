"""Calibrate det_unclip_ratio end-to-end on synthetic pages.

The unclip ratio couples detection geometry to recognition quality: too
small and strips lose ascenders/descenders (the DB rect-unclip of thin boxes
under-recovers the shrink), too large and strips swallow neighbors. This
sweeps the ratio against line exact-match / CER with the trained weights and
prints the best value (OcrConfig.det_unclip_ratio default is set from this).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratios", default="1.5,2.0,2.5,3.0")
    ap.add_argument("--pages", type=int, default=6)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ocrjax.api import OcrEngine
    from ocrjax.train.e2e_eval import evaluate_e2e

    results = {}
    for ratio in [float(r) for r in args.ratios.split(",")]:
        engine = OcrEngine.from_pretrained()
        engine.config = engine.config.replace(det_unclip_ratio=ratio)
        engine._det = None
        m = evaluate_e2e(engine, n_pages=args.pages)
        results[ratio] = m
        print(f"ratio={ratio}: {json.dumps({k: round(v, 4) for k, v in m.items()})}",
              flush=True)
    best = max(results, key=lambda r: (results[r]["line_exact_match"],
                                       -results[r]["char_error_rate"]))
    print(f"best ratio: {best}")


if __name__ == "__main__":
    main()
