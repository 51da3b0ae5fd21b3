import numpy as np

from ocrjax.train.e2e_eval import _levenshtein, evaluate_e2e


def test_levenshtein():
    assert _levenshtein("abc", "abc") == 0
    assert _levenshtein("abc", "abd") == 1
    assert _levenshtein("", "abc") == 3
    assert _levenshtein("kitten", "sitting") == 3


class _FakeLine:
    def __init__(self, text):
        self.text = text


class _FakeRes:
    def __init__(self, texts):
        self.lines = [_FakeLine(t) for t in texts]


def test_evaluate_e2e_with_fake_engine(monkeypatch):
    """Perfect engine → exact=1, CER=0 (uses a stubbed ocr)."""
    from ocrjax.charset import Charset
    from ocrjax.train import synth

    class FakeEngine:
        charset = Charset("abcdefghijklmnopqrstuvwxyz0123456789")

        def ocr(self, img, beam=False):
            # cheat: re-render is impossible, so return the gt captured below
            return _FakeRes(FakeEngine._texts)

    # capture gt texts by wrapping render_page
    orig = synth.render_page

    def wrapped(rng, charset, **kw):
        page, quads, texts = orig(rng, charset, **kw)
        FakeEngine._texts = texts
        return page, quads, texts

    monkeypatch.setattr(synth, "render_page", wrapped)
    m = evaluate_e2e(FakeEngine(), n_pages=2, size=256)
    assert m["line_exact_match"] == 1.0
    assert m["char_error_rate"] == 0.0
