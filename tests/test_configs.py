"""Acceptance tests: one per driver workload C1–C5 (BASELINE.json:6-11,
SURVEY.md §4.2 "Config acceptance"). Mechanical/pipeline-level on CPU with a
tiny random-init engine; string-level semantics are covered by
test_pretrained.py (trained assets) and the TPU-marked run.
"""

import jax
import numpy as np
import pytest

from ocrjax.api import OcrEngine, OcrResult
from ocrjax.charset import Charset, default_charset
from ocrjax.config import TINY
from ocrjax.train.synth import render_line, render_page


@pytest.fixture(scope="module")
def engine():
    # box_thresh below the untrained DB's ~0.5 output so the full pipeline
    # (boxes -> warp -> rec) executes end-to-end
    cfg = TINY.replace(det_max_side=256, det_box_thresh=0.45,
                       tile_size=256, tile_overlap=32)
    return OcrEngine(config=cfg, charset=Charset("abcdef"), seed=0)


@pytest.fixture(scope="module")
def page():
    rng = np.random.RandomState(3)
    img, quads, texts = render_page(rng, default_charset(), size=(256, 256))
    return np.repeat(img[..., None], 3, axis=2), quads, texts


def test_c1_single_line(engine):
    """C1: pre-cropped text line → CRNN + greedy CTC → one string."""
    r = engine.recognize(render_line("abc", height=32))
    assert isinstance(r.text, str)
    assert 0.0 <= r.confidence <= 1.0


def test_c2_detection_only(engine, page):
    """C2: full page → prob map → boxes, no recognition."""
    img, _, _ = page
    boxes = engine.detect(img)
    for b in boxes:
        assert b.quad.shape == (4, 2)
        assert 0.0 <= b.score <= 1.0
        # coords are in the original image frame
        assert b.quad[:, 0].max() <= img.shape[1]
        assert b.quad[:, 1].max() <= img.shape[0]


def test_c3_end_to_end(engine, page):
    """C3: detect → crop/rectify → recognize → ordered text output."""
    img, _, _ = page
    res = engine.ocr(img)
    assert isinstance(res, OcrResult)
    assert isinstance(res.text, str)
    for line in res.lines:
        assert isinstance(line.text, str)
        assert line.box.quad.shape == (4, 2)
    # reading order: the pipeline's output order must be a fixed point of
    # the geometry-level reading-order sort (rows top→bottom, left→right)
    from ocrjax import geometry
    quads = [l.box.quad for l in res.lines]
    assert geometry.sort_reading_order(quads) == list(range(len(quads)))


def test_c4_batched(engine, page):
    """C4: batched end-to-end with pooled bucketed line crops."""
    img, _, _ = page
    blank = np.full((100, 90, 3), 255, np.uint8)
    batch = [img, blank, img, img]
    results = engine.ocr_batch(batch)
    assert len(results) == 4
    assert len(results[1].lines) == 0
    # identical inputs give identical outputs within the pooled batch
    assert results[0].text == results[2].text == results[3].text
    # and the pooled path agrees with the single-page path
    single = engine.ocr(img)
    assert results[0].text == single.text


def test_c4_error_isolation(engine, page):
    """A corrupt item must not fail the batch (SURVEY.md §5)."""
    img, _, _ = page
    results = engine.ocr_batch([img, "/nonexistent/file.png", img])
    assert len(results) == 3
    assert results[1].lines == []
    assert results[0].text == results[2].text


def test_c5_tiled_detection(engine):
    """C5: high-res page tiled at tile_size with seam merging."""
    rng = np.random.RandomState(7)
    # page larger than tile_size (256) → 4+ overlapping tiles
    img, quads, _ = render_page(rng, default_charset(), size=(400, 400))
    img3 = np.repeat(img[..., None], 3, axis=2)
    boxes = engine.detect_tiled(img3)
    for b in boxes:
        assert b.quad[:, 0].max() < 400 and b.quad[:, 1].max() < 400

    # degenerate: small page = single tile, must not crash (random weights
    # at the lowered box_thresh may "detect" anything — only mechanics here)
    small = np.full((100, 120, 3), 255, np.uint8)
    small_boxes = engine.detect_tiled(small)
    assert isinstance(small_boxes, list)
    for b in small_boxes:
        assert b.quad[:, 0].max() < 120 and b.quad[:, 1].max() < 100


def test_c3_downscaled_page_uses_fullres_crops(engine):
    """Pages larger than the canvas recognize from the original image."""
    rng = np.random.RandomState(11)
    img, quads, _ = render_page(rng, default_charset(), size=(400, 400))
    img3 = np.repeat(img[..., None], 3, axis=2)  # canvas 256 -> scale < 1
    res = engine.ocr(img3)
    assert isinstance(res, OcrResult)
    for l in res.lines:
        assert l.box.quad[:, 0].max() <= 400 and l.box.quad[:, 1].max() <= 400


def test_c4_fused_matches_bucketed(engine, page):
    """The fused single-program path returns the same texts as the bucketed
    path (same models, same geometry; greedy decode)."""
    img, _, _ = page
    bucketed = engine.ocr_batch([img, img])
    fusedr = engine.ocr_batch([img, img], fused=True)
    assert len(fusedr) == 2
    assert [l.text for l in fusedr[0].lines] == \
        [l.text for l in bucketed[0].lines]
    assert fusedr[0].text == fusedr[1].text


@pytest.mark.slow
def test_c4_fused_beam_matches_bucketed_beam(engine, page):
    """Beam decode through the fused program matches the bucketed beam path
    (same on-device prefix beam search, same geometry)."""
    img, _, _ = page
    bucketed = engine.ocr_batch([img], beam=True)
    fusedr = engine.ocr_batch([img], beam=True, fused=True)
    assert [l.text for l in fusedr[0].lines] == \
        [l.text for l in bucketed[0].lines]


def test_c5_ocr_tiled_api(engine):
    """C5 end-to-end as an API citizen: engine.ocr_tiled runs tiled
    detection + pooled tile-based recognition, returns lines with texts,
    confidences and in-page boxes; the multi-page driver isolates errors."""
    rng = np.random.RandomState(9)
    img, quads, _ = render_page(rng, default_charset(), size=(400, 400))
    img3 = np.repeat(img[..., None], 3, axis=2)
    res = engine.ocr_tiled(img3)
    assert isinstance(res, OcrResult)
    for line in res.lines:
        assert isinstance(line.text, str)
        assert 0.0 <= line.confidence <= 1.0
        assert line.box.quad[:, 0].max() < 400
        assert line.box.quad[:, 1].max() < 400

    # multi-page driver: bad page isolated, good pages processed
    out = engine.ocr_tiled_batch([img3, "/nonexistent/page.png", img3])
    assert len(out) == 3
    assert out[1].lines == []
    assert len(out[0].lines) == len(res.lines)


@pytest.mark.slow
def test_c4_fused_truncated_pages_redo_unbounded(page):
    """A page with more lines than the fused program's static capacity must
    NOT return truncated results: ocr_pages_fused redoes saturated pages
    through the unbounded bucketed path (VERDICT r1 #9)."""
    cfg = TINY.replace(det_max_side=256, det_box_thresh=0.45,
                       fused_lines_per_page=1, fused_rotation_reroute_deg=0.0)
    eng = OcrEngine(config=cfg, charset=Charset("abcdef"), seed=0)
    img3, _, _ = page
    res_f = eng.ocr_batch([img3, img3], fused=True)
    res_b = eng.ocr_batch([img3, img3])
    for rf, rb in zip(res_f, res_b):
        assert not rf.truncated
        # redo routed through the bucketed path: same line count
        assert len(rf.lines) == len(rb.lines)


@pytest.mark.slow
def test_c4_fused_oom_chunk_halving(page, monkeypatch):
    """RESOURCE_EXHAUSTED from a fused chunk triggers batch-halving retries
    (mirroring tiling's OOM fallback) instead of failing the batch."""
    from ocrjax import fused as F

    cfg = TINY.replace(det_max_side=256, det_box_thresh=0.45,
                       fused_chunk_pages=4, fused_rotation_reroute_deg=0.0)
    eng = OcrEngine(config=cfg, charset=Charset("abcdef"), seed=0)
    img3, _, _ = page
    imgs = [img3] * 4

    ref = eng.ocr_batch(imgs, fused=True)  # compiles the real program

    real_make = F.make_fused_ocr_fn
    calls = {"n": 0}

    def patched_make(engine, *a, **kw):
        real = real_make(engine, *a, **kw)

        def guard(det_vars, rec_vars, cls_vars, grays, thr, wh):
            calls["n"] += 1
            if grays.shape[0] > 1:
                raise RuntimeError("RESOURCE_EXHAUSTED: fake OOM for test")
            return real(det_vars, rec_vars, cls_vars, grays, thr, wh)
        return guard

    monkeypatch.setattr(F, "make_fused_ocr_fn", patched_make)
    eng2 = OcrEngine(config=cfg, charset=Charset("abcdef"), seed=0)
    out = eng2.ocr_batch(imgs, fused=True)
    assert calls["n"] >= 4  # initial + halving retries reached B=1
    assert [len(r.lines) for r in out] == [len(r.lines) for r in ref]


@pytest.mark.slow
def test_c4_fused_color_reroute(page, monkeypatch):
    """Pages with strong chroma reroute to the staged min-channel-luma
    path: 601 luma can wash out saturated colored ink entirely (yellow on
    white: luma 226/255)."""
    from ocrjax import api_det, preprocess
    from ocrjax.train.synth import render_page

    # yellow text on white: R=G=255, B=0 where ink
    rng = np.random.RandomState(11)
    gray_img, _, _ = render_page(rng, default_charset(), size=(256, 256))
    color_img = np.stack([np.full_like(gray_img, 255),
                          np.full_like(gray_img, 255), gray_img], axis=2)
    assert preprocess.color_fraction(color_img) > 0.02
    assert preprocess.color_fraction(
        np.repeat(gray_img[..., None], 3, 2)) == 0.0
    # min-channel keeps the ink; 601 luma nearly erases it
    assert preprocess.to_gray_minchannel(color_img).min() < 30
    assert preprocess.to_gray(color_img).min() > 180

    cfg = TINY.replace(det_max_side=256, det_box_thresh=0.45,
                       fused_rotation_reroute_deg=0.0)
    eng = OcrEngine(config=cfg, charset=Charset("abcdef"), seed=0)
    calls = []
    real_ocr = api_det.ocr

    def spy(engine, image, beam=False, force_staged=False, color=False):
        calls.append(color)
        return real_ocr(engine, image, beam=beam,
                        force_staged=force_staged, color=color)

    monkeypatch.setattr(api_det, "ocr", spy)
    img3, _, _ = page
    out = eng.ocr_batch([color_img, img3], fused=True)
    assert calls == [True]  # only the colorful page rerouted
    assert len(out) == 2


def _rect_quad(cx, cy, w, h, deg=0.0):
    c, s = np.cos(np.radians(deg)), np.sin(np.radians(deg))
    R = np.array([[c, -s], [s, c]], np.float32)
    base = np.array([[-w / 2, -h / 2], [w / 2, -h / 2],
                     [w / 2, h / 2], [-w / 2, h / 2]], np.float32)
    return base @ R.T + np.array([cx, cy], np.float32)


def test_rotation_reroute_aspect_gate():
    """Near-square boxes can't trigger the fused rotation reroute (their
    PCA tilt is eigenvalue noise — 17% of straight pages falsely rerouted
    before the gate); elongated tilted boxes still do, and a clean ±90°
    landscape page reroutes via the unfolded-median check."""
    from ocrjax.fused import should_reroute_rotation

    cfg = TINY.replace(fused_rotation_reroute_deg=3.0,
                       fused_reroute_min_aspect=1.7,
                       fused_reroute_noise_px=6.0,
                       rec_try_flip=True, rot90_tilt_deg=60.0)

    straight = [_rect_quad(100, 40 + 60 * i, 180, 30) for i in range(3)]
    sq_noise = _rect_quad(300, 60, 34, 30, deg=18.0)  # aspect 1.13
    assert not should_reroute_rotation(
        np.stack(straight + [sq_noise]), cfg)

    tilted = _rect_quad(200, 200, 160, 30, deg=8.0)  # elongated, real tilt
    assert should_reroute_rotation(np.stack(straight + [tilted]), cfg)

    landscape = [_rect_quad(60 + 40 * i, 200, 180, 30, deg=90.0)
                 for i in range(4)]
    assert should_reroute_rotation(np.stack(landscape), cfg)

    # gate off (min_aspect 1.0) restores the old any-box behavior
    cfg_off = cfg.replace(fused_reroute_min_aspect=1.0)
    assert should_reroute_rotation(np.stack(straight + [sq_noise]), cfg_off)


def test_rotation_reroute_noise_floor():
    """A LONE short box must clear a length-scaled noise floor
    max(reroute_deg, atan(noise_px/L)) — the measured false-trigger class
    was 54-94 px boxes reading 3.0-4.05° of pure PCA extent noise on
    straight pages (fused.py should_reroute_rotation docstring). Genuine
    small PAGE rotation is still caught by the coherent-median trigger,
    which single-box noise cannot move."""
    from ocrjax.fused import should_reroute_rotation

    cfg = TINY.replace(fused_rotation_reroute_deg=3.0,
                       fused_reroute_min_aspect=1.7,
                       fused_reroute_noise_px=6.0,
                       rec_try_flip=False)

    straight = [_rect_quad(100, 40 + 60 * i, 180, 30) for i in range(3)]
    # short elongated box (L=80 → floor atan(6/80)=4.3°) at 3.8°: noise
    short_noise = _rect_quad(300, 60, 80, 30, deg=3.8)
    assert not should_reroute_rotation(
        np.stack(straight + [short_noise]), cfg)

    # the same short box at 8° clears its floor — real tilt reroutes
    short_real = _rect_quad(300, 60, 80, 30, deg=8.0)
    assert should_reroute_rotation(np.stack(straight + [short_real]), cfg)

    # coherent small rotation: every short box below its INDIVIDUAL floor,
    # but the elongated median (3.5°) clears reroute_deg → reroute
    coherent = [_rect_quad(100, 40 + 60 * i, 80, 30, deg=3.5)
                for i in range(5)]
    assert should_reroute_rotation(np.stack(coherent), cfg)

    # noise_px=0 disables the floor: 3.8° > 3.0° triggers alone again
    cfg_nofloor = cfg.replace(fused_reroute_noise_px=0.0)
    assert should_reroute_rotation(
        np.stack(straight + [short_noise]), cfg_nofloor)


def test_c4_fused_downscaled_redo_pooled(monkeypatch):
    """Downscaled (scale < 1) reroute/saturation redos pool into ONE
    recognize_strips dispatch round (api_det.ocr_fullres_batch) instead of
    N serial single-page pipelines (VERDICT r3 weak #5), and match the
    serial staged path exactly."""
    from ocrjax import api_det
    from ocrjax import fused as F
    from ocrjax.train.synth import render_page

    cfg = TINY.replace(det_max_side=256, det_box_thresh=0.45,
                       fused_rotation_reroute_deg=1.0)
    eng = OcrEngine(config=cfg, charset=Charset("abcdef"), seed=0)
    rng = np.random.RandomState(7)
    imgs = []
    for _ in range(4):
        img, _, _ = render_page(rng, eng.charset, size=(400, 400),
                                n_lines=(2, 3))
        imgs.append(np.repeat(img[..., None], 3, axis=2))

    # force every page through the rotation-reroute lane; pages are 400px
    # on a 256px canvas, so scale < 1 routes them to the full-res lane
    monkeypatch.setattr(F, "should_reroute_rotation", lambda *a, **k: True)

    serial = [api_det.ocr(eng, im, beam=False, force_staged=True)
              for im in imgs]

    calls = {"n": 0}
    real = eng.recognize_strips

    def counting(strips, **kw):
        calls["n"] += 1
        return real(strips, **kw)

    monkeypatch.setattr(eng, "recognize_strips", counting)
    out = eng.ocr_batch(imgs, fused=True)
    assert calls["n"] <= 2, calls
    for a, b in zip(out, serial):
        assert [l.text for l in a.lines] == [l.text for l in b.lines]
        for la, lb in zip(a.lines, b.lines):
            np.testing.assert_allclose(la.box.quad, lb.box.quad, atol=1e-3)


def test_c4_bucketed_downscaled_matches_single_fullres():
    """Bucketed (fused=False) batches of DOWNSCALED pages must decode like
    the single-page staged path — i.e., from full-resolution original
    crops via the pooled full-res lane, not from the blurry canvas
    (api_det.pooled_fullres_from_boxes)."""
    from ocrjax import api_det
    from ocrjax.train.synth import render_page

    cfg = TINY.replace(det_max_side=256, det_box_thresh=0.45)
    eng = OcrEngine(config=cfg, charset=Charset("abcdef"), seed=0)
    rng = np.random.RandomState(11)
    imgs = []
    for _ in range(3):
        img, _, _ = render_page(rng, eng.charset, size=(400, 400),
                                n_lines=(2, 3))
        imgs.append(np.repeat(img[..., None], 3, axis=2))

    batch = eng.ocr_batch(imgs)  # bucketed path
    serial = [api_det.ocr(eng, im, force_staged=True) for im in imgs]
    for a, b in zip(batch, serial):
        assert [l.text for l in a.lines] == [l.text for l in b.lines]
        for la, lb in zip(a.lines, b.lines):
            np.testing.assert_allclose(la.box.quad, lb.box.quad, atol=1e-3)
