"""Inverted-polarity handling (VERDICT r2 missing #4): light-ink-on-dark
input is canonicalized to dark-on-light at decode (preprocess.load_image),
so every pipeline path sees the only polarity the synth-trained models know.
TPU e2e gate: tests/test_tpu.py::test_inverted_page_e2e_on_tpu.
"""

import os

import numpy as np
import pytest

from ocrjax import preprocess
from ocrjax.train.synth import render_line

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")

HAS_ASSETS = os.path.exists(os.path.join(ASSETS, "rec.safetensors"))


def test_is_inverted_signal():
    light = np.full((64, 64, 3), 250, np.uint8)
    light[20:30, 10:50] = 10                      # 'ink'
    dark = 255 - light
    assert not preprocess.is_inverted(light)
    assert preprocess.is_inverted(dark)
    # grayscale 2D input works too
    assert preprocess.is_inverted(dark[..., 0])


def test_load_image_canonicalizes_polarity():
    light = np.full((64, 64, 3), 240, np.uint8)
    light[20:30, 10:50] = 5
    dark = np.asarray(255 - light, np.uint8)
    out = preprocess.load_image(dark)
    np.testing.assert_array_equal(out, 255 - dark)
    # idempotent: re-loading the canonicalized output is a no-op
    np.testing.assert_array_equal(preprocess.load_image(out), out)
    # light pages untouched; opt-out respected
    np.testing.assert_array_equal(preprocess.load_image(light), light)
    np.testing.assert_array_equal(
        preprocess.load_image(dark, auto_invert=False), dark)


def test_inversion_preserves_chroma_signal():
    """Inversion maps (r,g,b) -> (255-r,255-g,255-b): per-pixel chroma
    (max-min) is unchanged, so the color-reroute routing still fires."""
    img = np.full((64, 64, 3), 20, np.uint8)     # dark page
    img[10:40, 10:40] = (250, 240, 30)           # yellow ink
    inv = preprocess.load_image(img)
    assert preprocess.color_fraction(inv) == pytest.approx(
        preprocess.color_fraction(img))


@pytest.mark.skipif(not HAS_ASSETS, reason="no trained assets checked in")
def test_recognize_inverted_strip_matches_upright():
    from ocrjax.api import OcrEngine

    eng = OcrEngine.from_pretrained()
    strip = render_line("Negative 42", height=32)
    up = eng.recognize(strip)
    inv = eng.recognize(np.asarray(255 - strip, np.uint8))
    assert inv.text == up.text == "Negative 42"
