"""Truncated-first-fetch parity (cfg.fetch_max_tokens /
cfg.det_fetch_candidates, docs/DESIGN.md §2).

Both truncations are transport-only and EXACT: the token slice drops only
CTC padding (refetching the on-device buffer when a line overflows), and
the det candidate slice is a pure prefix of the raster-ordered slots
(refetching when a page used a later slot). Every test runs the same
inputs truncated and untruncated and diffs the host-side results exactly —
including configs that force the overflow-fallback path on every page.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ocrjax.api import OcrEngine
from ocrjax.charset import Charset, default_charset
from ocrjax.config import TINY
from ocrjax.ops.bytepack import truncate_tokens_jit


def test_truncate_tokens_slice_both_dtypes():
    rng = np.random.RandomState(0)
    K, T, T_f, rest = 3, 16, 5, 7
    for dt in (np.uint8, np.float32):
        payload = rng.randint(0, 200, size=(4, K * T + rest)).astype(dt)
        got = np.asarray(truncate_tokens_jit(jnp.asarray(payload), K, T, T_f))
        tok = payload[:, :K * T].reshape(4, K, T)[:, :, :T_f]
        want = np.concatenate(
            [tok.reshape(4, K * T_f), payload[:, K * T:]], axis=1)
        np.testing.assert_array_equal(got, want)
        assert got.dtype == dt


def test_truncate_det_prefix_and_n_need():
    from ocrjax.api_det import _truncate_det_jit, pack_det

    rng = np.random.RandomState(1)
    B, C, Kf = 2, 8, 3
    out = {"boxes": jnp.asarray(rng.randn(B, C, 4, 2).astype(np.float32)),
           "scores": jnp.asarray(rng.rand(B, C).astype(np.float32)),
           "valid": jnp.asarray([[1, 1, 0, 0, 0, 0, 0, 0],
                                 [1, 0, 1, 0, 1, 0, 0, 0]], bool)}
    packed = pack_det(out)
    arr = np.asarray(_truncate_det_jit(packed, C, Kf))
    assert arr.shape == (B, Kf * 10 + 1)
    np.testing.assert_array_equal(
        arr[:, :Kf * 8],
        np.asarray(out["boxes"])[:, :Kf].reshape(B, Kf * 8))
    np.testing.assert_array_equal(arr[:, Kf * 8:Kf * 9],
                                  np.asarray(out["scores"])[:, :Kf])
    # highest USED slot: page 0 used slots {0,1} → 2; page 1 up to slot 4 → 5
    np.testing.assert_array_equal(arr[:, Kf * 10], [2.0, 5.0])


def test_fetch_det_saturation_latch():
    """Dense streams flip the adapt latch to full-first fetches after one
    overflow; a sparse page under Kf/2 used slots resets it. Outputs stay
    exact in every phase."""
    from ocrjax.api_det import fetch_det, pack_det, unpack_det

    rng = np.random.RandomState(7)
    C, Kf = 8, 4
    cfg = TINY.replace(det_max_candidates=C, det_fetch_candidates=Kf)

    def payload(n_used):
        v = np.zeros((1, C), bool)
        v[0, :n_used] = True
        out = {"boxes": jnp.asarray(rng.randn(1, C, 4, 2)
                                    .astype(np.float32)),
               "scores": jnp.asarray(rng.rand(1, C).astype(np.float32)),
               "valid": jnp.asarray(v)}
        return pack_det(out)

    adapt = {}
    dense = payload(6)  # > Kf → overflow
    got = fetch_det([dense], cfg, adapt=adapt)
    want = unpack_det(np.asarray(dense), C)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert adapt.get("full") is True

    still = payload(5)  # full-first phase; > Kf/2 keeps the latch on
    got = fetch_det([still], cfg, adapt=adapt)
    want = unpack_det(np.asarray(still), C)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert adapt.get("full") is True

    sparse = payload(2)  # ≤ Kf/2 → latch resets
    got = fetch_det([sparse], cfg, adapt=adapt)
    want = unpack_det(np.asarray(sparse), C)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert adapt.get("full") is False


def _engine(**over) -> OcrEngine:
    cfg = TINY.replace(det_max_side=256, det_box_thresh=0.45, **over)
    return OcrEngine(config=cfg, charset=default_charset(), seed=0)


@pytest.fixture(scope="module")
def pages():
    from ocrjax.train.synth import render_page
    rng = np.random.RandomState(5)
    out = []
    for _ in range(3):
        img, _, _ = render_page(rng, default_charset(), size=(256, 256))
        out.append(np.repeat(img[..., None], 3, axis=2))
    return out


def _diff_results(got, want):
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert [l.text for l in a.lines] == [l.text for l in b.lines]
        assert [l.confidence for l in a.lines] == \
            [l.confidence for l in b.lines]
        for la, lb in zip(a.lines, b.lines):
            np.testing.assert_array_equal(la.box.quad, lb.box.quad)
            assert la.box.score == lb.box.score


# Truncation configs to prove exact: the production default, and the
# pathological floors that force the overflow refetch on every page/line.
_TRUNC_CASES = [dict(), dict(fetch_max_tokens=2, det_fetch_candidates=1)]


@pytest.mark.slow
@pytest.mark.parametrize("over", _TRUNC_CASES)
def test_fused_path_parity(pages, over):
    from ocrjax.fused import ocr_pages_fused

    et = _engine(**over)
    assert et.config.fetch_max_tokens and et.config.det_fetch_candidates
    ef = _engine(fetch_max_tokens=0, det_fetch_candidates=0)
    _diff_results(ocr_pages_fused(et, pages), ocr_pages_fused(ef, pages))


@pytest.mark.slow
@pytest.mark.parametrize("over", _TRUNC_CASES)
def test_pooled_path_parity(pages, over):
    from ocrjax.bucketing import ocr_pages

    et = _engine(**over)
    ef = _engine(fetch_max_tokens=0, det_fetch_candidates=0)
    _diff_results(ocr_pages(et, pages), ocr_pages(ef, pages))


@pytest.mark.slow
def test_detect_and_single_page_parity(pages):
    et = _engine(det_fetch_candidates=1, fetch_max_tokens=2)
    ef = _engine(det_fetch_candidates=0, fetch_max_tokens=0)
    bt = et.detect(pages[0])
    bf = ef.detect(pages[0])
    assert len(bt) == len(bf) > 0
    for a, b in zip(bt, bf):
        np.testing.assert_array_equal(a.quad, b.quad)
        assert a.score == b.score
    _diff_results([et.ocr(pages[0])], [ef.ocr(pages[0])])


def test_tiled_path_parity(pages):
    from ocrjax.tiling import ocr_tiled

    et = _engine(det_fetch_candidates=1, fetch_max_tokens=2)
    ef = _engine(det_fetch_candidates=0, fetch_max_tokens=0)
    _diff_results([ocr_tiled(et, pages[0])], [ocr_tiled(ef, pages[0])])
