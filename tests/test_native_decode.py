"""Parity tests for the fused native host decode (occ_decode_canvas) —
the host_decode hot-path replacement (VERDICT r2 weak #1). Contract:
bit-exact vs the cv2 chain for canvas-sized pages, ±1 luma on resized
pages, identical routing signals (scale, valid_hw, inversion, chroma).
"""

import numpy as np
import pytest

from ocrjax import preprocess as P
from ocrjax.config import OcrConfig

CFG = OcrConfig(det_max_side=256)

pytestmark = pytest.mark.skipif(
    P.decode_canvas_native(np.full((8, 8, 3), 200, np.uint8), CFG) is None,
    reason="native library unavailable")


def _ref(img, cfg=CFG):
    """The numpy/cv2 fallback chain the native call replaces."""
    img = P.load_image(img, auto_invert=cfg.auto_invert)
    canvas, scale, hw = P.det_resize_to_canvas(img, cfg)
    return P.to_gray(canvas), scale, hw


def test_canvas_sized_page_bit_exact():
    rng = np.random.RandomState(0)
    img = np.full((256, 256, 3), 240, np.uint8)
    img[40:60, 30:200] = rng.randint(0, 256, (20, 170, 3)).astype(np.uint8)
    gray, scale, hw, cfrac = P.decode_canvas_native(img, CFG)
    rgray, rscale, rhw = _ref(img)
    np.testing.assert_array_equal(gray, rgray)
    assert scale == rscale and hw == tuple(rhw)


def test_resized_page_within_one_step():
    rng = np.random.RandomState(1)
    img = np.full((513, 385, 3), 250, np.uint8)
    img[100:140, 50:300] = rng.randint(0, 256, (40, 250, 3)).astype(np.uint8)
    gray, scale, hw, _ = P.decode_canvas_native(img, CFG)
    rgray, rscale, rhw = _ref(img)
    assert abs(scale - rscale) < 1e-9 and hw == tuple(rhw)
    # luma-first vs RGB-first bilinear: both linear, agree to +-1 rounding
    assert np.abs(gray.astype(int) - rgray.astype(int)).max() <= 1


def test_inverted_page_canonicalized():
    img = np.full((256, 256, 3), 20, np.uint8)   # dark page
    img[40:60, 30:200] = 230                     # light ink
    gray, _, _, _ = P.decode_canvas_native(img, CFG)
    rgray, _, _ = _ref(img)                      # load_image inverts
    np.testing.assert_array_equal(gray, rgray)
    # opt-out: auto_invert=False keeps the dark polarity
    cfg_off = CFG.replace(auto_invert=False)
    g2, _, _, _ = P.decode_canvas_native(img, cfg_off)
    assert g2[0, 0] < 64


def test_chroma_fraction_signal():
    img = np.full((256, 256, 3), 240, np.uint8)
    img[:128] = (250, 240, 30)                   # saturated yellow half
    _, _, _, cfrac = P.decode_canvas_native(img, CFG)
    assert 0.45 < cfrac < 0.55
    gray_page = np.full((256, 256, 3), 200, np.uint8)
    _, _, _, cfrac0 = P.decode_canvas_native(gray_page, CFG)
    assert cfrac0 == 0.0


def test_grayscale_2d_input():
    img = np.full((300, 200), 240, np.uint8)
    img[50:70, 20:180] = 10
    gray, scale, hw, cfrac = P.decode_canvas_native(img, CFG)
    rgray, rscale, rhw = _ref(np.stack([img] * 3, axis=-1))
    assert hw == tuple(rhw) and abs(scale - rscale) < 1e-9
    assert np.abs(gray.astype(int) - rgray.astype(int)).max() <= 1
    assert cfrac == 0.0


def test_decode_chunk_routes_native_and_matches_fallback(monkeypatch):
    rng = np.random.RandomState(2)
    pages = []
    for _ in range(3):
        p = np.full((256, 256, 3), 245, np.uint8)
        p[30:60, 20:200] = rng.randint(0, 100, (30, 180, 3)).astype(np.uint8)
        pages.append(p)
    pages.append(np.asarray(255 - pages[0], np.uint8))   # inverted page
    got = P.decode_chunk_to_gray(pages, range(4), CFG, color_frac=0.2)
    monkeypatch.setattr(P, "decode_canvas_native", lambda *a, **k: None)
    want = P.decode_chunk_to_gray(pages, range(4), CFG, color_frac=0.2)
    np.testing.assert_array_equal(got[0], want[0])       # grays
    np.testing.assert_array_equal(got[1], want[1])       # scales
    np.testing.assert_array_equal(got[2], want[2])       # valid_hw
    np.testing.assert_array_equal(got[3], want[3])       # ok
    assert got[4] == want[4]                             # colorful
