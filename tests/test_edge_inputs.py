"""Pathological-input robustness: the public API must degrade to empty
results, never raise, on degenerate images (tiny, 1px, blank, extreme
aspect). Mechanical (TINY random-init engine) — crash/shape coverage, not
string semantics."""

import numpy as np
import pytest

from ocrjax.api import OcrEngine
from ocrjax.charset import Charset
from ocrjax.config import TINY


@pytest.fixture(scope="module")
def engine():
    cfg = TINY.replace(det_max_side=256)
    return OcrEngine(config=cfg, charset=Charset("abcdef"), seed=0)


CASES = [
    ("tiny", np.full((8, 8, 3), 255, np.uint8)),
    ("one_px_wide", np.full((64, 1, 3), 255, np.uint8)),
    ("all_black", np.zeros((100, 200, 3), np.uint8)),
    ("all_white", np.full((100, 200, 3), 255, np.uint8)),
    ("extreme_aspect", np.full((8, 600, 3), 255, np.uint8)),
]


@pytest.mark.parametrize("name,img", CASES, ids=[c[0] for c in CASES])
def test_ocr_degrades_gracefully(engine, name, img):
    r = engine.ocr(img)
    assert isinstance(r.lines, list)  # no raise; empty or junk lines OK


@pytest.mark.parametrize("name,img", CASES, ids=[c[0] for c in CASES])
def test_detect_degrades_gracefully(engine, name, img):
    assert isinstance(engine.detect(img), list)


def test_recognize_blank_strip(engine):
    r = engine.recognize(np.full((32, 64), 255, np.uint8))
    assert isinstance(r.text, str)  # no raise on ink-free input
