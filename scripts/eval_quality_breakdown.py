#!/usr/bin/env python
"""Per-font / per-confusion breakdown of e2e misses on synthetic pages.

The aggregate multi-seed numbers (0.94 straight / 0.93 rotated, DESIGN.md
§4) hide WHERE the tail lives: which font family, which glyph confusions,
what line lengths. This drives the next fine-tune's targeting. Renders
single-font pages so every miss is attributable, pairs each ground-truth
line with its best Levenshtein match, and prints per-font exact rates plus
a ranked substitution histogram.

Run: python scripts/eval_quality_breakdown.py [--pages-per-font 6] [--cpu]
"""

import argparse
import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _align_subs(gt: str, pred: str):
    """Character substitutions from one Levenshtein backtrace."""
    n, m = len(gt), len(pred)
    d = np.zeros((n + 1, m + 1), np.int32)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (gt[i - 1] != pred[j - 1]))
    subs, i, j = [], n, m
    while i > 0 and j > 0:
        if d[i, j] == d[i - 1, j - 1] + (gt[i - 1] != pred[j - 1]):
            if gt[i - 1] != pred[j - 1]:
                subs.append((gt[i - 1], pred[j - 1]))
            i, j = i - 1, j - 1
        elif d[i, j] == d[i - 1, j] + 1:
            subs.append((gt[i - 1], "∅"))  # deletion
            i -= 1
        else:
            subs.append(("∅", pred[j - 1]))  # insertion
            j -= 1
    subs += [(c, "∅") for c in gt[:i]] + [("∅", c) for c in pred[:j]]
    return subs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-per-font", type=int, default=6)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--seed", type=int, default=123)
    ap.add_argument("--beam", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--weights", default=None,
                    help="candidate rec safetensors (default: shipped)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    from ocrjax.api import OcrEngine
    from ocrjax.train import synth
    from ocrjax.train.e2e_eval import _levenshtein

    eng = OcrEngine.from_pretrained()
    if args.weights:
        from ocrjax import weights as W
        eng.rec_variables = W.load_variables(args.weights)
        print("candidate rec weights:", args.weights, flush=True)
    per_font = {}
    subs_hist = collections.Counter()
    miss_examples = []

    for font in synth.FONTS:
        fname = os.path.basename(font).replace(".ttf", "")
        rng = np.random.RandomState(args.seed)
        total = exact = 0
        for _ in range(args.pages_per_font):
            page, quads, texts = synth.render_page(
                rng, eng.charset, size=(args.size, args.size),
                fonts=[font])
            img = np.repeat(page[..., None], 3, axis=2)
            res = eng.ocr(img, beam=args.beam)
            preds = [ln.text for ln in res.lines]
            total += len(texts)
            for t in texts:
                if t in preds:
                    preds.remove(t)
                    exact += 1
                    continue
                if preds:
                    dists = [_levenshtein(t, p) for p in preds]
                    k = int(np.argmin(dists))
                    p = preds.pop(k)
                    for s in _align_subs(t, p):
                        subs_hist[s] += 1
                    if len(miss_examples) < 24:
                        miss_examples.append((fname, t, p))
                else:
                    if len(miss_examples) < 24:
                        miss_examples.append((fname, t, "<no box>"))
        per_font[fname] = (exact, total)

    print("\n== per-font line-exact ==")
    for f, (e, t) in sorted(per_font.items()):
        print(f"  {f:28s} {e}/{t} = {e / max(t, 1):.3f}")
    g_e = sum(e for e, _ in per_font.values())
    g_t = sum(t for _, t in per_font.values())
    print(f"  {'ALL':28s} {g_e}/{g_t} = {g_e / max(g_t, 1):.3f}")

    print("\n== top substitutions (gt→pred, ∅=ins/del) ==")
    for (a, b), n in subs_hist.most_common(20):
        print(f"  {a!r:6s} → {b!r:6s}  ×{n}")

    print("\n== sample misses ==")
    for f, t, p in miss_examples:
        print(f"  [{f}] {t!r} → {p!r}")


if __name__ == "__main__":
    main()
