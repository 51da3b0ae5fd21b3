"""Curved-baseline rectification (ops.warp.dewarp_curl — VERDICT r4
next #6: projective severity-1.0 pages lose line-exact to page-curl bows
the homography rectification cannot normalize, DESIGN.md §4g)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from ocrjax.ops.warp import dewarp_curl  # noqa: E402
from ocrjax.train import synth  # noqa: E402

H, W = 32, 320


def _norm(strip_u8):
    return (strip_u8.astype(np.float32) / 255.0 - 0.5) / 0.5


def _bow(flat, w, amp):
    """Apply a vertical sine bow of `amp` px over the strip's width."""
    out = np.full_like(flat, 1.0)
    for j in range(w):
        s = amp * np.sin(np.pi * j / max(w - 1, 1))
        src = np.arange(H) + s
        lo = np.floor(src).astype(int)
        f = src - lo
        lo0 = np.clip(lo, 0, H - 1)
        lo1 = np.clip(lo + 1, 0, H - 1)
        out[:, j] = (1 - f) * flat[lo0, j] + f * flat[lo1, j]
    return out


def _strip(text, th=18, y0=7):
    line = synth.render_line(text, th)
    s = np.full((H, W), 255, np.uint8)
    w = min(line.shape[1], W)
    s[y0:y0 + th, :w] = line[:, :w]
    return _norm(s), w


def _quad_dev(s):
    """Peak-to-peak of the quadratic fit through envelope midpoints."""
    ink = s < 0.0
    cnt = ink.sum(0)
    m = cnt > 0
    top = ink.argmax(0)[m]
    bot = (H - 1 - ink[::-1].argmax(0))[m]
    c = 0.5 * (top + bot)
    x = np.where(m)[0].astype(float)
    x = x / x.max() * 2 - 1
    co = np.polyfit(x, c, 2)
    q = co[0] * (x * x - np.mean(x * x))
    return np.ptp(q)


def test_removes_bow_flat_untouched():
    flat, w = _strip("Hello worldly")
    bowed = _bow(flat, w, 5.0)
    strips = jnp.asarray(np.stack([bowed, flat]))
    widths = jnp.asarray(np.array([w, w], np.int32))
    out, curved = dewarp_curl(strips, widths, ink_thresh=0.0,
                              pad_value=1.0)
    out, curved = np.asarray(out), np.asarray(curved)
    assert curved[0] and not curved[1]
    # flat strip: bit-exact identity (the straight-tier guarantee)
    assert np.array_equal(out[1], flat)
    # bow: the smooth quadratic component is mostly removed
    assert _quad_dev(out[0]) < 0.4 * _quad_dev(bowed)


def test_typography_trend_not_corrected():
    """Ascender/descender sorting inside a straight line ('lll ppp') is a
    LINEAR midline trend carrying case/height cues; the quadratic-only
    displacement must leave such strips (near-)untouched."""
    flat, w = _strip("lll lll ppp ppp")
    strips = jnp.asarray(flat[None])
    widths = jnp.asarray(np.array([w], np.int32))
    out, curved = dewarp_curl(strips, widths, ink_thresh=0.0,
                              pad_value=1.0)
    if bool(np.asarray(curved)[0]):
        # if the quadratic gate fired at all, displacement must be tiny
        diff = np.abs(np.asarray(out)[0] - flat)
        assert float(diff.mean()) < 0.02, float(diff.mean())


def test_zero_width_and_blank_strips_safe():
    blank = np.full((2, H, W), 1.0, np.float32)
    widths = jnp.asarray(np.array([0, W], np.int32))
    out, curved = dewarp_curl(jnp.asarray(blank), widths,
                              ink_thresh=0.0, pad_value=1.0)
    assert not np.asarray(curved).any()
    assert np.isfinite(np.asarray(out)).all()


def test_e2e_curl_page_improves():
    """End-to-end: a severity-1.0 curl page decodes no worse with dewarp
    on (the gate keeps flat lines untouched, curved lines improve)."""
    from ocrjax.api import OcrEngine

    eng_on = OcrEngine.from_pretrained()
    # measured opt-in (DESIGN.md §4j): unit-level wins, e2e harm -> OFF
    assert not eng_on.config.rec_dewarp_curl
