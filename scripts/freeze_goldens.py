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
# Routing-path goldens (VERDICT r2 missing #4): every reroute lane gets a
# frozen case so silent drift fails a NAMED test, not just an aggregate gate.
TILED_SEED = 501                # C5 seam-merge path (tile_size=512 on 768px)
DENSE_SEED = 601                # dense row/column layout through the tiler
FLIP_SEED = 701                 # 180° page, rec_try_flip engine
ROT90_SEED = 801                # landscape scan, rot90 reroute + cls fix-up
COLOR_SEED = 901                # saturated ink, min-channel-luma reroute
INVERT_SEED = 1001              # light-on-dark, polarity canonicalization


def build_engine():
    from ocrjax.api import OcrEngine
    engine = OcrEngine.from_pretrained()
    engine.config = engine.config.replace(det_max_side=512)
    return engine


def build_tiled_engine():
    """Tiling shrunk so a 768px page exercises real seams on CPU."""
    from ocrjax.api import OcrEngine
    engine = OcrEngine.from_pretrained()
    engine.config = engine.config.replace(
        det_max_side=512, tile_size=512, tile_overlap=64,
        tile_max_candidates=128)
    return engine


def build_flip_engine():
    from ocrjax.api import OcrEngine
    engine = OcrEngine.from_pretrained()
    engine.config = engine.config.replace(
        det_max_side=512, rec_try_flip=True)
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


def render_routed_cases(charset):
    """Deterministic inputs for the reroute-lane goldens, keyed by path."""
    import numpy as np

    from ocrjax.train import synth

    def _rgb(gray):
        return np.repeat(gray[..., None], 3, 2)

    out = {}
    rng = np.random.RandomState(TILED_SEED)
    page, _, _ = synth.render_page(
        rng, charset, size=(768, 768), n_lines=(6, 9), text_height=(24, 40))
    out["tiled"] = _rgb(page)

    rng = np.random.RandomState(DENSE_SEED)
    page, _, texts = synth.render_page_dense(
        rng, charset, size=(768, 768), n_lines=48, text_height=(16, 24))
    out["dense"] = _rgb(page)
    out["dense_n_gt"] = len(texts)

    rng = np.random.RandomState(FLIP_SEED)
    page, _, _ = synth.render_page(
        rng, charset, size=(512, 512), n_lines=(3, 5), text_height=(22, 36))
    out["flip"] = _rgb(np.rot90(page, 2).copy())

    rng = np.random.RandomState(ROT90_SEED)
    page, _, _ = synth.render_page(
        rng, charset, size=(512, 512), n_lines=(3, 5), text_height=(22, 36))
    out["rot90"] = _rgb(np.rot90(page).copy())

    rng = np.random.RandomState(COLOR_SEED)
    page, _, _ = synth.render_page(
        rng, charset, size=(512, 512), n_lines=(3, 5), text_height=(22, 36))
    # saturated yellow ink on white: 601 luma washes it out, so the page
    # must reroute through the min-channel-luma staged path
    out["color"] = np.stack([np.full_like(page, 255),
                             np.full_like(page, 255), page], axis=-1)

    rng = np.random.RandomState(INVERT_SEED)
    page, _, _ = synth.render_page(
        rng, charset, size=(512, 512), n_lines=(3, 5), text_height=(22, 36))
    out["invert"] = _rgb(np.asarray(255 - page, np.uint8))
    return out


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


def run_routed_cases(tiled_engine, flip_engine):
    """Reroute-lane goldens. `tiled_engine` doubles as the base engine for
    the color/invert lanes (identical non-tiling config)."""
    imgs = render_routed_cases(tiled_engine.charset)

    def _lines(res):
        return {
            "strings": [l.text for l in res.lines],
            "boxes": [[[round(float(v), 2) for v in pt]
                       for pt in l.box.quad] for l in res.lines],
        }

    out = {}
    res = tiled_engine.ocr_tiled(imgs["tiled"])
    out["tiled_page"] = {
        "seed": TILED_SEED,
        "det_boxes": [[[round(float(v), 2) for v in pt] for pt in b.quad]
                      for b in tiled_engine.detect_tiled(imgs["tiled"])],
        **_lines(res),
    }
    res = tiled_engine.ocr_tiled(imgs["dense"])
    out["dense_page"] = {"seed": DENSE_SEED, "n_gt": imgs["dense_n_gt"],
                         **_lines(res)}
    out["flip_page"] = {"seed": FLIP_SEED,
                        **_lines(flip_engine.ocr(imgs["flip"]))}
    out["rot90_page"] = {"seed": ROT90_SEED,
                         **_lines(flip_engine.ocr(imgs["rot90"]))}
    out["color_page"] = {"seed": COLOR_SEED,
                         **_lines(tiled_engine.ocr(imgs["color"]))}
    out["inverted_page"] = {"seed": INVERT_SEED,
                            **_lines(tiled_engine.ocr(imgs["invert"]))}
    return out


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    engine = build_engine()
    out = run_cases(engine)
    out["routed"] = run_routed_cases(build_tiled_engine(),
                                     build_flip_engine())
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(out, f, indent=1)
    n = sum(len(p["strings"]) for p in out["pages"] + out["rotated_pages"])
    nr = sum(len(v["strings"]) for v in out["routed"].values())
    print(f"wrote {GOLDEN_PATH}: {len(out['pages'])}+"
          f"{len(out['rotated_pages'])} pages ({n} lines), "
          f"{len(out['strips'])} strips, {len(out['beam_strips'])} beam, "
          f"{len(out['routed'])} routed lanes ({nr} lines)")


if __name__ == "__main__":
    main()
