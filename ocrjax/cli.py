"""Command-line interface (SURVEY.md §2.1 R10, §2.3 N10).

Mirrors the reference binary's surface: `detect | recognize | ocr` over image
paths, plus `bench`. Config hyperparameters map 1:1 onto flags; `--json`
gives structured output; `--profile` dumps a jax profiler trace
(SURVEY.md §5 tracing).

Usage:
  python -m ocrjax.cli recognize strip.png
  python -m ocrjax.cli detect page.png --json
  python -m ocrjax.cli ocr page1.png page2.png --beam
  python -m ocrjax.cli ocr huge.png --tiled
  python -m ocrjax.cli bench --pages 16
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import List


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ocrjax", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("images", nargs="*", help="image path(s)")
        sp.add_argument("--weights", default=None,
                        help="assets dir (default: repo assets/)")
        sp.add_argument("--json", action="store_true", dest="as_json")
        sp.add_argument("--cpu", action="store_true",
                        help="force local CPU backend")
        sp.add_argument("--profile", default=None, metavar="DIR",
                        help="dump a jax profiler trace to DIR")
        # config flags (1:1 with OcrConfig fields; reference-parity defaults)
        sp.add_argument("--det-thresh", type=float, default=None)
        sp.add_argument("--det-box-thresh", type=float, default=None)
        sp.add_argument("--det-unclip-ratio", type=float, default=None)
        sp.add_argument("--det-max-side", type=int, default=None)
        sp.add_argument("--det-int8", action="store_true",
                        help="int8 conv path for the DB detector "
                             "(MXU int8 ~2x bf16; see models/db_int8.py)")
        sp.add_argument("--charset", default=None,
                        help="charset dict file (one char per line)")
        sp.add_argument("--try-flip", action="store_true",
                        help="180° handling: a tiny orientation classifier "
                             "(assets/cls.safetensors) runs inside the "
                             "recognition program and rotates upside-down "
                             "strips on device before the CRNN; mostly-"
                             "flipped pages also read in reversed order. "
                             "Small extra cost (cls net + one flip gather)")
        sp.add_argument("--no-auto-invert", action="store_true",
                        help="disable polarity canonicalization (by default "
                             "light-ink-on-dark pages are inverted at decode"
                             " — config.auto_invert)")
        sp.add_argument("--flat-band-frac", type=float, default=None,
                        help="flat-band (x-height-aware) ink rescale "
                             "fraction (config.rec_flat_band_frac, default "
                             "0.46; 0 disables — DESIGN.md §4f)")
        sp.add_argument("--tile-pipeline-tiles", type=int, default=None,
                        help="target tiles per C5 window for multi-page "
                             "pipelining (config.tile_pipeline_tiles)")
        sp.add_argument("--no-tile-det", action="store_true",
                        help="tile detection uses the flagship DB instead "
                             "of the dedicated cheap tile detector "
                             "(assets/det_tile.safetensors) — A/B testing")
        sp.add_argument("--no-blank-skip", action="store_true",
                        help="disable the blank-tile prescreen (tiles with "
                             "no stroke contrast skip upload + detection)")
        sp.add_argument("--dewarp-curl", action="store_true",
                        help="curved-baseline rectification of recognition "
                             "strips (measured opt-in, DESIGN.md 4j)")
        sp.add_argument("--tile-window-hbm-mb", type=int, default=None,
                        help="HBM budget per pooled C5 window "
                             "(config.tile_window_hbm_mb)")
        sp.add_argument("--viz", default=None, metavar="PATH",
                        help="write a debug visualization (detected quads +"
                             " text drawn on the page); for multiple inputs"
                             " PATH gets an index suffix")

    sp = sub.add_parser("recognize", help="C1: text-line image → string")
    common(sp)
    sp.add_argument("--beam", action="store_true")

    sp = sub.add_parser("detect", help="C2: page → boxes")
    common(sp)
    sp.add_argument("--tiled", action="store_true",
                    help="C5: tiled high-res detection")

    sp = sub.add_parser("ocr", help="C3/C4: page(s) → ordered text")
    common(sp)
    sp.add_argument("--beam", action="store_true")
    sp.add_argument("--tiled", action="store_true")
    sp.add_argument("--fused", action="store_true",
                    help="C4 via the single-XLA-program fused path (fixed "
                         "per-page line capacity, highest throughput)")

    sp = sub.add_parser("bench", help="throughput/latency benchmarks")
    common(sp)
    sp.add_argument("--pages", type=int, default=16)
    sp.add_argument("--lines", type=int, default=256)
    sp.add_argument("--repeats", type=int, default=3)
    return p


def _make_engine(args):
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ocrjax.api import OcrEngine
    from ocrjax.charset import Charset
    from ocrjax.config import OcrConfig

    engine = OcrEngine.from_pretrained(path=args.weights)
    if args.charset:
        charset = Charset.from_file(args.charset)
        if charset.num_classes != engine.charset.num_classes:
            print(f"error: charset size {charset.num_classes} does not match "
                  f"the loaded recognizer head ({engine.charset.num_classes})",
                  file=sys.stderr)
            raise SystemExit(2)
        engine.charset = charset
    overrides = {}
    for field, flag in [("det_thresh", "det_thresh"),
                        ("det_box_thresh", "det_box_thresh"),
                        ("det_unclip_ratio", "det_unclip_ratio"),
                        ("det_max_side", "det_max_side"),
                        ("rec_flat_band_frac", "flat_band_frac"),
                        ("tile_pipeline_tiles", "tile_pipeline_tiles"),
                        ("tile_window_hbm_mb", "tile_window_hbm_mb")]:
        v = getattr(args, flag)
        if v is not None:
            overrides[field] = v
    if getattr(args, "try_flip", False):
        overrides["rec_try_flip"] = True
    if getattr(args, "det_int8", False):
        overrides["det_int8"] = True
    if getattr(args, "no_auto_invert", False):
        overrides["auto_invert"] = False
    if getattr(args, "no_tile_det", False):
        overrides["tile_det_enable"] = False
    if getattr(args, "no_blank_skip", False):
        overrides["tile_blank_skip"] = False
    if getattr(args, "dewarp_curl", False):
        overrides["rec_dewarp_curl"] = True
    if overrides:
        engine.config = engine.config.replace(**overrides)
        engine._det = None  # force rebuild with new static config
    return engine


def _profiled(args):
    import contextlib
    if not args.profile:
        return contextlib.nullcontext()
    import jax
    return jax.profiler.trace(args.profile)


def _quad_list(quad) -> List[List[float]]:
    return [[round(float(x), 2), round(float(y), 2)] for x, y in quad]


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return _main(args)
    except FileNotFoundError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


def _main(args) -> int:

    if args.cmd == "bench":
        from ocrjax.bench_lib import run_bench
        report = run_bench(pages=args.pages, lines=args.lines,
                           repeats=args.repeats, weights=args.weights,
                           cpu=args.cpu)
        print(json.dumps(report) if args.as_json
              else "\n".join(f"{k}: {v}" for k, v in report.items()))
        return 0

    if not args.images:
        print("error: no input images", file=sys.stderr)
        return 2

    engine = _make_engine(args)
    out = []
    with _profiled(args):
        if args.cmd == "ocr" and len(args.images) > 1 and not args.tiled:
            # C4 pooled path: one batched detection + pooled rec buckets
            # (--fused: the chunk-pipelined single-program path instead)
            t0 = time.perf_counter()
            results = engine.ocr_batch(args.images, beam=args.beam,
                                       fused=args.fused)
            ms = round((time.perf_counter() - t0) * 1e3 / len(results), 1)
            for path, res in zip(args.images, results):
                out.append({"image": path, "text": res.text, "lines": [
                    {"text": l.text, "confidence": round(l.confidence, 4),
                     "quad": _quad_list(l.box.quad),
                     "score": round(l.box.score, 4)} for l in res.lines],
                    "ms": ms})
            if getattr(args, "viz", None):
                for i, item in enumerate(out):
                    dest = (args.viz if len(out) == 1
                            else _viz_indexed(args.viz, i))
                    _write_viz(item["image"], item, dest)
            _emit(args, out)
            return 0
        for path in args.images:
            t0 = time.perf_counter()
            if args.cmd == "recognize":
                r = engine.recognize(path, beam=args.beam)
                out.append({"image": path, "text": r.text,
                            "confidence": round(r.confidence, 4)})
            elif args.cmd == "detect":
                boxes = (engine.detect_tiled(path) if args.tiled
                         else engine.detect(path))
                out.append({"image": path, "boxes": [
                    {"quad": _quad_list(b.quad),
                     "score": round(b.score, 4)} for b in boxes]})
            else:  # ocr
                if args.tiled:
                    res = _ocr_tiled(engine, path, beam=args.beam)
                else:
                    res = engine.ocr(path, beam=args.beam)
                out.append({"image": path, "text": res.text, "lines": [
                    {"text": l.text, "confidence": round(l.confidence, 4),
                     "quad": _quad_list(l.box.quad),
                     "score": round(l.box.score, 4)} for l in res.lines]})
            out[-1]["ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    if getattr(args, "viz", None) and args.cmd in ("detect", "ocr"):
        for i, item in enumerate(out):
            dest = args.viz if len(out) == 1 else _viz_indexed(args.viz, i)
            _write_viz(item["image"], item, dest)

    _emit(args, out)
    return 0


def _viz_indexed(path: str, i: int) -> str:
    import os
    root, ext = os.path.splitext(path)
    return f"{root}.{i}{ext or '.png'}"


def _write_viz(image_path, item, dest) -> None:
    """Debug visualization (reference CLI parity, SURVEY.md §2.1 R10):
    detected quads (green) + decoded text (red) over the page."""
    from PIL import Image, ImageDraw

    from ocrjax import preprocess

    img = Image.fromarray(preprocess.load_image(image_path)).convert("RGB")
    draw = ImageDraw.Draw(img)
    entries = (item.get("boxes") or item.get("lines") or [])
    for e in entries:
        q = [tuple(pt) for pt in e["quad"]]
        draw.polygon(q, outline=(0, 200, 0), width=2)
        if "text" in e:
            x = min(p[0] for p in q)
            y = min(p[1] for p in q)
            draw.text((x, max(0, y - 12)), e["text"], fill=(220, 0, 0))
    img.save(dest)


def _emit(args, out) -> None:
    if args.as_json:
        print(json.dumps(out, indent=2))
        return
    for item in out:
        print(f"== {item['image']} ({item['ms']} ms)")
        if "boxes" in item:
            for b in item["boxes"]:
                print(f"  {b['quad']} score={b['score']}")
        else:
            print(item["text"])


def _ocr_tiled(engine, path, beam=False):
    """C5 end-to-end — thin alias of the API path (tiling.ocr_tiled)."""
    return engine.ocr_tiled(path, beam=beam)


if __name__ == "__main__":
    raise SystemExit(main())
