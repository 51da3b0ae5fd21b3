"""Diagnose fused-path rotation reroutes on the bench page mix.

The r3 bench run logged rotated=7 redos per fused window where r2 logged
rotated=4 on the identical rng-seed-0 page mix — this script replays that
mix on CPU against a chosen det checkpoint and prints, per page, the
reroute decision with the tilt statistics behind it, so a det-weights
change that flips the decision can be localized to specific pages/boxes.

Usage: python scripts/diag_reroute.py [--det /path/det.safetensors]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--det", default=None,
                    help="det checkpoint to load in place of assets/det")
    ap.add_argument("--pages", type=int, default=16)
    args = ap.parse_args()

    from ocrjax.api import OcrEngine
    from ocrjax import fused, geometry
    from ocrjax.train import synth
    from ocrjax import weights as W

    engine = OcrEngine.from_pretrained()
    if args.det:
        engine.det_variables = W.load_variables(args.det)
    engine.config = engine.config.replace(fused_lines_per_page=16)
    cfg = engine.config
    charset = engine.charset

    rng = np.random.RandomState(0)
    # Replicate bench_lib.run_bench's rng consumption exactly: the crops/s
    # section draws line_bucket_for_count(256) random texts before the
    # pages are rendered, so the page mix depends on it.
    for _ in range(cfg.line_bucket_for_count(256)):
        synth.random_text(rng, charset, 4, 12)
    imgs = []
    for _ in range(args.pages):
        page, _, _ = synth.render_page(
            rng, charset, size=(cfg.det_max_side, cfg.det_max_side))
        imgs.append(np.repeat(page[..., None], 3, axis=2))

    decisions = []
    saved_quads = []
    orig = fused.should_reroute_rotation

    def spy(vq, cfg_):
        e = vq[:, 1] - vq[:, 0]
        a = np.abs(np.degrees(np.arctan2(e[:, 1], e[:, 0]))) % 90.0
        tilt = np.minimum(a, 90.0 - a)
        w_len = np.linalg.norm(vq[:, 1] - vq[:, 0], axis=1)
        h_len = np.linalg.norm(vq[:, 3] - vq[:, 0], axis=1)
        aspect = (np.maximum(w_len, h_len)
                  / np.maximum(np.minimum(w_len, h_len), 1.0))
        gated = np.where(aspect >= cfg_.fused_reroute_min_aspect, tilt, 0.0)
        med90 = float(np.median(geometry.quad_tilt_deg(vq)))
        out = orig(vq, cfg_)
        saved_quads.append(np.asarray(vq))
        decisions.append(dict(
            n_boxes=len(vq), reroute=bool(out),
            max_gated_tilt=float(gated.max()) if len(vq) else 0.0,
            offender_aspect=float(aspect[np.argmax(gated)]) if len(vq) else 0.0,
            median_tilt90=med90,
            thresh=cfg_.fused_rotation_reroute_deg,
        ))
        return out

    fused.should_reroute_rotation = spy
    try:
        engine.ocr_batch(imgs, fused=True)
    finally:
        fused.should_reroute_rotation = orig

    tag = os.path.basename(args.det or "assets").split(".")[0]
    np.savez(f"/tmp/diag_reroute_quads_{tag}.npz",
             **{f"p{i}": q for i, q in enumerate(saved_quads)})
    n_re = sum(d["reroute"] for d in decisions)
    print(f"det={args.det or 'assets'}  pages={args.pages}  "
          f"reroutes={n_re}")
    for i, d in enumerate(decisions):
        flag = "REROUTE" if d["reroute"] else "       "
        print(f"  page {i:2d} {flag} boxes={d['n_boxes']:2d} "
              f"max_gated_tilt={d['max_gated_tilt']:6.2f} "
              f"(thresh {d['thresh']}) offender_aspect="
              f"{d['offender_aspect']:5.1f} med_tilt90={d['median_tilt90']:6.2f}")


if __name__ == "__main__":
    main()
