"""C1 acceptance mechanics: single pre-cropped line image → one string out
(BASELINE.json:7). String *content* correctness is covered by the trained-
weights tests (test_train_synth.py); here we pin pipeline behavior with a
random-init engine."""

import numpy as np
import pytest

from ocrjax.api import OcrEngine, RecResult
from ocrjax.charset import Charset
from ocrjax.config import TINY


@pytest.fixture(scope="module")
def engine():
    return OcrEngine(config=TINY, charset=Charset("abcdef"), seed=0)


def test_recognize_returns_result(engine):
    img = np.random.RandomState(0).randint(0, 255, (48, 200, 3), np.uint8)
    r = engine.recognize(img)
    assert isinstance(r, RecResult)
    assert isinstance(r.text, str)
    assert 0.0 <= r.confidence <= 1.0


def test_recognize_strips_batch_order(engine):
    rng = np.random.RandomState(1)
    strips = [rng.randint(0, 255, (32, 40 + 13 * i), np.uint8)
              for i in range(5)]
    batch_results = engine.recognize_strips(strips)
    assert len(batch_results) == 5
    single_results = [engine.recognize_strips([s])[0] for s in strips]
    # Each strip decodes identically alone vs in a (same-bucket) batch.
    for i, (b, s) in enumerate(zip(batch_results, single_results)):
        # widths 40..92 all land in the 128 bucket; batch counts differ (5->8
        # vs 1->4 padding) but padding items must not affect real items.
        assert b.text == s.text, i


def test_recognize_empty_batch(engine):
    assert engine.recognize_strips([]) == []


def test_recognize_deterministic(engine):
    img = np.random.RandomState(2).randint(0, 255, (32, 64), np.uint8)
    a = engine.recognize(img)
    b = engine.recognize(img)
    assert a.text == b.text and a.confidence == b.confidence


def test_beam_path_runs(engine):
    img = np.random.RandomState(3).randint(0, 255, (32, 64), np.uint8)
    r = engine.recognize(img, beam=True)
    assert isinstance(r.text, str)
