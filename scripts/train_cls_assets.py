#!/usr/bin/env python
"""Train the orientation classifier and write assets/cls.safetensors.

Mirrors scripts/train_rec_assets.py: serving-distribution synthetic data
(word-mode + random glyph strings, spaces, 4-bit transport dither, small
residual rotation), config JSON in the safetensors metadata.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[64, 128, 192, 320])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--crop-pages", type=int, default=96,
                    help="rendered pages per width bucket for the REAL "
                         "refined-detector-crop half of training; too few "
                         "and the crop pool is memorized instead of "
                         "teaching the warp domain")
    ap.add_argument("--p-crop", type=float, default=0.5)
    ap.add_argument("--antisym", type=float, default=0.5,
                    help="antisymmetry penalty weight; > 0 certifies the "
                         "asset for single-pass serving (cls_single_pass)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--mesh", default=None, metavar="DP[,TP]",
                    help="run the train step over an N-chip DP[,TP] device mesh (parallel.mesh): '8' = 8-way data parallel, '4,2' = dp=4 x tp=2. On 1 real chip use the CPU-mesh trick (XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu) to validate sharding.")
    args = ap.parse_args()

    from ocrjax import weights as W
    from ocrjax.api import OcrEngine
    from ocrjax.config import OcrConfig
    from ocrjax.train.cls_trainer import train_cls

    # the engine supplies REAL refined detector crops (serving domain) for
    # half the batches — see train_cls's warp-domain-gap note
    engine = OcrEngine.from_pretrained()
    cfg = engine.config
    mesh = None
    if args.mesh:
        from ocrjax.parallel import mesh as M
        parts = [int(v) for v in args.mesh.split(",")]
        n_dp, n_tp = parts[0], (parts[1] if len(parts) > 1 else 1)
        mesh = M.make_mesh(n_dp=n_dp, n_tp=n_tp)
        print(f"mesh: {dict(mesh.shape)}", flush=True)
    res = train_cls(config=cfg, charset=engine.charset, steps=args.steps,
                    batch_size=args.batch, widths=tuple(args.widths),
                    seed=args.seed, verbose=True, eval_batches=30,
                    engine=engine, crop_pages=args.crop_pages,
                    p_crop=args.p_crop, mesh=mesh, antisym=args.antisym)
    print(f"final orientation accuracy (serving distribution): "
          f"{res.accuracy:.4f}")

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "cls.safetensors")
    W.save_variables(out, res.variables, metadata={
        "config": json.dumps({"compute_dtype": cfg.compute_dtype}),
        "accuracy": f"{res.accuracy:.4f}",
        "steps": str(args.steps),
        # antisym-trained assets are certified for single-pass serving
        # (api_det._cls_margins drops the second classifier pass)
        "antisym": "1" if args.antisym > 0 else "0",
    })
    print("wrote", out)


if __name__ == "__main__":
    main()
