"""String-level acceptance with the checked-in toy weights (assets/).

This is the substitute golden path from SURVEY.md §4.2: no reference outputs
exist (empty mount), so correctness is 'decodes synthetic rendered text
exactly' with frozen weights. C1 semantics: one cropped line in → one string
out (BASELINE.json:7).
"""

import os

import numpy as np
import pytest

from ocrjax.api import OcrEngine
from ocrjax.train.synth import render_line

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ASSETS, "rec.safetensors")),
    reason="no trained assets checked in")


@pytest.fixture(scope="module")
def engine():
    return OcrEngine.from_pretrained()


SAMPLES = ["Hello, World!", "TPU v5e 2026", "ocrjax", "a", "0123456789"]


def test_recognize_exact_strings(engine):
    for text in SAMPLES:
        r = engine.recognize(render_line(text, height=32))
        assert r.text == text, (r.text, text)
        assert r.confidence > 0.5


def _canon(s: str) -> str:
    """'I' and 'l' are both bare vertical strokes in DejaVu Sans — visually
    identical glyphs, irreducibly ambiguous after rescaling. Normalize."""
    return s.replace("I", "l")


def test_recognize_resizes_other_heights(engine):
    for h in (24, 48, 64):
        r = engine.recognize(render_line("Hello, World!", height=h))
        assert _canon(r.text) == _canon("Hello, World!"), (h, r.text)
    # 20px (≈14px font) is genuinely marginal after 1.6x upscale — allow a
    # couple of glyph confusions but require the text to be readable
    from ocrjax.train.e2e_eval import _levenshtein
    r = engine.recognize(render_line("Hello, World!", height=20))
    assert _levenshtein(r.text, "Hello, World!") <= 2, r.text


def test_beam_matches_greedy_on_clean_input(engine):
    for text in SAMPLES[:2]:
        strip = render_line(text, height=32)
        assert engine.recognize(strip, beam=True).text == text


def test_batch_of_mixed_lines(engine):
    strips = [render_line(t, height=32) for t in SAMPLES]
    results = engine.recognize_strips(strips)
    assert [r.text for r in results] == SAMPLES


def test_detects_line_adjacent_to_page_border():
    """A line within ~10 px of the page edge must still be detected when
    the page is smaller than the det canvas. Zero canvas padding put a
    hard white→black step edge at the content boundary — out of the det
    training distribution — and suppressed the prob map on border-adjacent
    text (measured max 0.43 vs thresh; the line vanished). The canvas now
    replicate-pads (preprocess.det_resize_to_canvas), like tiling does.
    """
    from ocrjax.train.synth import render_line as _rl

    eng = OcrEngine.from_pretrained()
    eng.config = eng.config.replace(det_max_side=512)
    # h=16/gap=10 is a measured diverging case (missed zero-padded, found
    # replicate-padded, every DejaVu family at page sizes 340 and 480)
    page = np.full((340, 340), 255, np.uint8)
    strip = 255 - _rl("\\.8Tj7GgN8", height=16)  # black-on-white ink
    sh, sw = strip.shape
    y0 = 340 - sh - 10                       # 10 px from the bottom edge
    page[y0:y0 + sh, 40:40 + sw] = strip
    img = np.repeat(page[..., None], 3, axis=2)
    boxes = eng.detect(img)
    assert boxes, "border-adjacent line not detected"
    b = boxes[0].quad
    cy = b[:, 1].mean()
    assert abs(cy - (y0 + sh / 2)) < sh, (cy, y0)
