"""Byte-packed downlink parity (ops.bytepack, DESIGN.md §2).

The uint8 payloads must be BIT-IDENTICAL to the legacy float32 payloads
after unpacking — packing is transport-only (token ids/counts/flags as
bytes, float columns bitcast, never quantized). Each test runs the same
inputs through both `fetch_bytes` settings and diffs the host-side
results exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ocrjax.api import OcrEngine
from ocrjax.charset import Charset
from ocrjax.config import TINY
from ocrjax.ops.bytepack import bytes_to_f32, f32_to_bytes, use_byte_fetch


def test_f32_bytes_roundtrip_exact():
    rng = np.random.RandomState(0)
    x = rng.randn(7, 13).astype(np.float32)
    # splice in every special encoding a confidence/coord could ever hit
    x[0, :6] = [0.0, -0.0, np.inf, -np.inf, np.nan, 1e-42]  # incl. denormal
    b = np.asarray(f32_to_bytes(jnp.asarray(x)))
    assert b.dtype == np.uint8 and b.shape == (7, 52)
    y = bytes_to_f32(b)
    np.testing.assert_array_equal(x.view(np.uint32), y.view(np.uint32))


def test_bytes_to_f32_accepts_noncontiguous_slice():
    buf = np.arange(40, dtype=np.uint8).reshape(2, 20)
    sl = buf[:, 4:12]  # strided rows, as sliced out of a fetched payload
    got = bytes_to_f32(sl)
    want = np.ascontiguousarray(sl).view(np.float32)
    np.testing.assert_array_equal(got.view(np.uint32), want.view(np.uint32))


def _engine(fetch_bytes: bool) -> OcrEngine:
    cfg = TINY.replace(det_max_side=256, det_box_thresh=0.45,
                       fetch_bytes=fetch_bytes)
    return OcrEngine(config=cfg, charset=Charset("abcdef"), seed=0)


@pytest.fixture(scope="module")
def engines():
    return _engine(True), _engine(False)


@pytest.fixture(scope="module")
def page():
    from ocrjax.charset import default_charset
    from ocrjax.train.synth import render_page
    rng = np.random.RandomState(3)
    img, _, _ = render_page(rng, default_charset(), size=(256, 256))
    return np.repeat(img[..., None], 3, axis=2)


def test_rec_packed_payload_parity(engines):
    from ocrjax.api_det import _rec_strips_packed_jit, unpack_rec

    eb, ef = engines
    assert use_byte_fetch(eb) and not use_byte_fetch(ef)
    rng = np.random.RandomState(1)
    strips = jnp.asarray(rng.randn(4, eb.config.rec_height, 64)
                         .astype(np.float32))
    widths = jnp.asarray([64, 40, 17, 64], jnp.int32)
    got = unpack_rec(np.asarray(_rec_strips_packed_jit(eb, strips, widths)),
                     eb.config.rec_max_tokens)
    want = unpack_rec(np.asarray(_rec_strips_packed_jit(ef, strips, widths)),
                      ef.config.rec_max_tokens)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_array_equal(  # bitcast, not quantized: bit-exact
        got[2].view(np.uint32), want[2].astype(np.float32).view(np.uint32))


def test_rec_forced_flip_payload_parity(engines):
    from ocrjax.api_det import (_rec_strips_forced_flip_packed_jit,
                                unpack_rec_flip)

    eb, ef = engines
    rng = np.random.RandomState(2)
    strips = jnp.asarray(rng.randn(4, eb.config.rec_height, 64)
                         .astype(np.float32))
    widths = jnp.asarray([64, 40, 17, 64], jnp.int32)
    flip = jnp.asarray([True, False, True, False])
    got = unpack_rec_flip(
        np.asarray(_rec_strips_forced_flip_packed_jit(
            eb, strips, widths, flip)), eb.config.rec_max_tokens)
    want = unpack_rec_flip(
        np.asarray(_rec_strips_forced_flip_packed_jit(
            ef, strips, widths, flip)), ef.config.rec_max_tokens)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])
    np.testing.assert_array_equal(
        got[2].view(np.uint32), want[2].astype(np.float32).view(np.uint32))
    np.testing.assert_array_equal(got[3], want[3])


@pytest.mark.slow
def test_fused_path_parity_end_to_end(engines, page):
    """Same page through ocr_pages_fused under both transports: identical
    strings, confidences, and box coordinates (the goldens' guarantee that
    fetch packing can never move an output)."""
    from ocrjax.fused import ocr_pages_fused

    eb, ef = engines
    rb = ocr_pages_fused(eb, [page, page])
    rf = ocr_pages_fused(ef, [page, page])
    assert len(rb) == len(rf) == 2
    for b, f in zip(rb, rf):
        assert [l.text for l in b.lines] == [l.text for l in f.lines]
        assert [l.confidence for l in b.lines] == \
            [l.confidence for l in f.lines]
        for lb, lf in zip(b.lines, f.lines):
            np.testing.assert_array_equal(lb.box.quad, lf.box.quad)
            assert lb.box.score == lf.box.score


@pytest.mark.slow
def test_pooled_path_parity_end_to_end(engines, page):
    from ocrjax.bucketing import ocr_pages

    eb, ef = engines
    rb = ocr_pages(eb, [page])
    rf = ocr_pages(ef, [page])
    for b, f in zip(rb, rf):
        assert [l.text for l in b.lines] == [l.text for l in f.lines]
        for lb, lf in zip(b.lines, f.lines):
            np.testing.assert_array_equal(lb.box.quad, lf.box.quad)


def test_use_byte_fetch_guards():
    """Oversized charsets / token lengths silently keep float32 payloads
    (byte ids would alias past 255)."""
    big = Charset("".join(chr(0x100 + i) for i in range(300)))
    eng = OcrEngine(config=TINY, charset=big, seed=0)
    assert not use_byte_fetch(eng)
    eng2 = OcrEngine(config=TINY.replace(rec_max_tokens=256),
                     charset=Charset("abcdef"), seed=0)
    assert not use_byte_fetch(eng2)