#!/usr/bin/env python
"""Freeze golden outputs for the regression suite (SURVEY.md §4.2b).

Renders a FIXED seed set of synthetic pages/strips, runs the production
pipeline (shipped assets, CPU jax, default config at det_max_side=512 for
runtime) and writes per-image boxes + decoded strings to
assets/goldens/goldens.json. tests/test_goldens.py re-runs the same inputs
and diffs the outputs exactly — a silent behavior drift in ANY stage
(detection, postprocess, warp, recognition, decode, routing) fails a test
that names the stage, even when aggregate quality metrics stay high.

Regenerate (deliberately, reviewing the diff) after an intentional
behavior/weights change:
    JAX_PLATFORMS=cpu python scripts/freeze_goldens.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "goldens", "goldens.json")

PAGE_SEEDS = [101, 102, 103, 104, 105, 106]
ROT_SEEDS = [201, 202]          # rotated pages (route through staged path)
STRIP_SEEDS = [301, 302, 303, 304, 305, 306, 307, 308]
BEAM_STRIP_SEEDS = [401, 402]


def build_engine():
    from ocrjax.api import OcrEngine
    engine = OcrEngine.from_pretrained()
    engine.config = engine.config.replace(det_max_side=512)
    return engine


def render_cases(engine):
    """Deterministic inputs: (pages, rotated pages, strips)."""
    import numpy as np

    from ocrjax.train import synth

    charset = engine.charset
    pages = []
    for s in PAGE_SEEDS:
        rng = np.random.RandomState(s)
        page, _, texts = synth.render_page(
            rng, charset, size=(512, 512), n_lines=(3, 6),
            text_height=(20, 40))
        pages.append((s, np.repeat(page[..., None], 3, 2), texts))
    rot = []
    for s in ROT_SEEDS:
        rng = np.random.RandomState(s)
        page, _, texts = synth.render_page(
            rng, charset, size=(512, 512), n_lines=(2, 4),
            text_height=(22, 36), max_rotation=8.0)
        rot.append((s, np.repeat(page[..., None], 3, 2), texts))
    strips = []
    for s in STRIP_SEEDS + BEAM_STRIP_SEEDS:
        rng = np.random.RandomState(s)
        t = synth.random_text(rng, charset, 4, 14)
        strips.append((s, synth.render_line(t, engine.config.rec_height), t))
    return pages, rot, strips


def run_cases(engine):
    pages, rot, strips = render_cases(engine)

    def page_record(seed, img):
        res = engine.ocr(img)
        det = engine.detect(img)
        return {
            "seed": seed,
            "det_boxes": [[[round(float(v), 2) for v in pt]
                           for pt in b.quad] for b in det],
            "det_scores": [round(float(b.score), 3) for b in det],
            "strings": [l.text for l in res.lines],
            "boxes": [[[round(float(v), 2) for v in pt]
                       for pt in l.box.quad] for l in res.lines],
        }

    out = {
        "config": {"det_max_side": 512,
                   "upload_bits": engine.config.upload_bits},
        "pages": [page_record(s, img) for s, img, _ in pages],
        "rotated_pages": [page_record(s, img) for s, img, _ in rot],
        "strips": [],
        "beam_strips": [],
    }
    for s, strip, gt in strips:
        greedy = engine.recognize(strip).text
        rec = {"seed": s, "gt": gt, "greedy": greedy}
        if s in BEAM_STRIP_SEEDS:
            rec["beam"] = engine.recognize(strip, beam=True).text
            out["beam_strips"].append(rec)
        else:
            out["strips"].append(rec)
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    engine = build_engine()
    out = run_cases(engine)
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(out, f, indent=1)
    n = sum(len(p["strings"]) for p in out["pages"] + out["rotated_pages"])
    print(f"wrote {GOLDEN_PATH}: {len(out['pages'])}+"
          f"{len(out['rotated_pages'])} pages ({n} lines), "
          f"{len(out['strips'])} strips, {len(out['beam_strips'])} beam")


if __name__ == "__main__":
    main()
