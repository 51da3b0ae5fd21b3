#!/usr/bin/env python
"""Diagnose dense-page detection recall (test_c5_dense_page_on_tpu fails
157/200 found). Breaks misses down by: y-band (tile seam vs interior),
line width/height, row crowding, and whether the miss is detection
(no box near center) or recognition (box found, wrong text).

Run: python scripts/diag_dense.py [--cpu] [--seed 5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--size", default="3072x2048")
    ap.add_argument("--n-lines", type=int, default=200)
    ap.add_argument("--det-weights", default=None,
                    help="candidate det safetensors (default: shipped)")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ocrjax.api import OcrEngine
    from ocrjax.train import synth

    eng = OcrEngine.from_pretrained()
    if args.det_weights:
        from ocrjax import weights as W
        eng.det_variables = W.load_variables(args.det_weights)
        print("candidate det weights:", args.det_weights, flush=True)
    rng = np.random.RandomState(args.seed)
    H, W = (int(v) for v in args.size.split("x"))
    page, quads, texts = synth.render_page_dense(
        rng, eng.charset, size=(H, W), n_lines=args.n_lines)
    print(f"gt lines: {len(texts)}")
    img = np.repeat(page[..., None], 3, axis=2)
    res = eng.ocr_tiled(img)
    print(f"pred lines: {len(res.lines)} truncated={res.truncated}")

    pred_centers = np.array([np.asarray(l.box.quad).mean(axis=0)
                             for l in res.lines]) \
        if res.lines else np.zeros((0, 2))

    tile = eng.config.tile_size
    ov = eng.config.tile_overlap
    stride = tile - ov

    misses, wrong = [], []
    found = exact = 0
    for q, t in zip(quads, texts):
        c = q.mean(axis=0)
        h = q[:, 1].max() - q[:, 1].min() + 1
        w = q[:, 0].max() - q[:, 0].min() + 1
        if len(pred_centers):
            dd = np.hypot(*(pred_centers - c).T)
            j = int(np.argmin(dd))
            bd = dd[j]
        else:
            bd = 1e9
        rec = {"c": c, "h": h, "w": w, "t": t,
               "y_mod": float(c[1]) % stride}
        if bd < max(h, 10):
            found += 1
            if res.lines[j].text == t:
                exact += 1
            else:
                rec["pred"] = res.lines[j].text
                wrong.append(rec)
        else:
            misses.append(rec)
    n = len(texts)
    print(f"found {found}/{n} = {found/n:.3f}   exact {exact}/{n} = "
          f"{exact/n:.3f}")

    def seam_dist(y):
        # distance from the nearest tile boundary band [k*stride, k*stride+ov]
        m = y % stride
        return min(m, abs(m - ov), stride - m)

    print("\n-- MISSES (no box near gt center):", len(misses))
    for r in sorted(misses, key=lambda r: r["c"][1])[:40]:
        print(f"  y={r['c'][1]:7.1f} x={r['c'][0]:7.1f} h={r['h']:4.0f} "
              f"w={r['w']:5.0f} seam_d={seam_dist(r['c'][1]):6.1f} "
              f"t={r['t']!r}")
    if misses:
        sd = [seam_dist(r["c"][1]) for r in misses]
        print(f"  seam_dist: median {np.median(sd):.0f}, "
              f"<{ov}px: {sum(1 for v in sd if v < ov)}/{len(sd)}")
        hs = [r["h"] for r in misses]
        ws = [r["w"] for r in misses]
        print(f"  miss h: median {np.median(hs):.0f} (all-gt median "
              f"{np.median([q[:,1].max()-q[:,1].min() for q in quads]):.0f})")
        print(f"  miss w: median {np.median(ws):.0f}")
        xs = [r["c"][0] for r in misses]
        print(f"  miss x: median {np.median(xs):.0f}  (page W={W})")
        ys = sorted(r["c"][1] for r in misses)
        print(f"  miss y range: {ys[0]:.0f}..{ys[-1]:.0f} (page H={H})")

    print("\n-- WRONG TEXT (box found):", len(wrong))
    for r in wrong[:20]:
        print(f"  y={r['c'][1]:7.1f} h={r['h']:4.0f} gt={r['t']!r} "
              f"pred={r['pred']!r}")


if __name__ == "__main__":
    main()
