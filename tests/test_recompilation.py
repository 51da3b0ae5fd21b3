"""Compilation-cache tests (SURVEY.md §4.2): inputs that map to the same
bucket must hit the SAME compiled program — no recompiles in steady state."""

import numpy as np
import pytest

from ocrjax.api import OcrEngine
from ocrjax.charset import Charset
from ocrjax.config import TINY


@pytest.fixture(scope="module")
def engine():
    return OcrEngine(config=TINY, charset=Charset("abcd"), seed=0)


def test_same_bucket_no_recompile(engine):
    rng = np.random.RandomState(0)
    # widths 40..90 all land in the 128 bucket; counts 1..3 in the 4 bucket
    strips = [rng.randint(0, 255, (32, 40 + 7 * i), np.uint8)
              for i in range(3)]
    engine.recognize_strips(strips[:1])
    size_after_first = engine._rec_step._cache_size()
    engine.recognize_strips(strips[:2])
    engine.recognize_strips(strips)
    engine.recognize_strips([strips[2], strips[0]])
    assert engine._rec_step._cache_size() == size_after_first


def test_new_bucket_compiles_once(engine):
    rng = np.random.RandomState(1)
    wide = [rng.randint(0, 255, (32, 120), np.uint8) for _ in range(5)]
    engine.recognize_strips(wide)          # (8, 128) bucket
    size = engine._rec_step._cache_size()
    engine.recognize_strips(wide[:5])
    engine.recognize_strips(wide[:4])      # count bucket 4 vs 8 — may differ
    # repeated identical-bucket calls never add entries
    engine.recognize_strips(wide)
    assert engine._rec_step._cache_size() <= size + 1
