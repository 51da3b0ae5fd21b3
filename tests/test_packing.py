"""Host pack/unpack layouts and the host-side ink crop (CPU).

Every packed single-fetch layout must round-trip exactly — a silent offset
drift would decode garbage tokens while tests that only check shapes pass.
"""

import numpy as np
import jax.numpy as jnp

from ocrjax.api_det import _ink_crop_host, pack_det, unpack_det, unpack_rec
from ocrjax.fused import unpack_fused


def test_pack_det_roundtrip():
    rng = np.random.RandomState(0)
    B, C = 3, 7
    boxes = rng.rand(B, C, 4, 2).astype(np.float32) * 100
    scores = rng.rand(B, C).astype(np.float32)
    valid = rng.rand(B, C) > 0.5
    packed = np.asarray(pack_det({
        "boxes": jnp.asarray(boxes),
        "scores": jnp.asarray(scores),
        "valid": jnp.asarray(valid),
    }))
    b2, s2, v2 = unpack_det(packed, C)
    np.testing.assert_allclose(b2, boxes, rtol=1e-6)
    np.testing.assert_allclose(s2, scores, rtol=1e-6)
    np.testing.assert_array_equal(v2, valid)


def test_unpack_rec_layout():
    n, T = 5, 11
    tokens = np.arange(n * T).reshape(n, T) % 97
    n_tokens = np.arange(n) + 1
    conf = np.linspace(0, 1, n)
    packed = np.concatenate([
        tokens.astype(np.float32),
        n_tokens[:, None].astype(np.float32),
        conf[:, None].astype(np.float32),
    ], axis=1)
    t2, nt2, c2 = unpack_rec(packed, T)
    np.testing.assert_array_equal(t2, tokens)
    np.testing.assert_array_equal(nt2, n_tokens)
    np.testing.assert_allclose(c2, conf, rtol=1e-6)


def test_unpack_fused_layout():
    rng = np.random.RandomState(1)
    B, K, T = 2, 3, 5
    tokens = rng.randint(0, 90, size=(B, K, T))
    n_tokens = rng.randint(0, T, size=(B, K))
    conf = rng.rand(B, K).astype(np.float32)
    quads = rng.rand(B, K, 4, 2).astype(np.float32) * 50
    scores = rng.rand(B, K).astype(np.float32)
    valid = rng.rand(B, K) > 0.4
    payload = np.concatenate([
        tokens.astype(np.float32).reshape(B, K * T),
        n_tokens.astype(np.float32).reshape(B, K),
        conf.reshape(B, K),
        quads.reshape(B, K * 8),
        scores.reshape(B, K),
        valid.astype(np.float32).reshape(B, K),
    ], axis=1)
    out = unpack_fused(payload, K, T)
    np.testing.assert_array_equal(out["tokens"], tokens)
    np.testing.assert_array_equal(out["n_tokens"], n_tokens)
    np.testing.assert_allclose(out["conf"], conf, rtol=1e-6)
    np.testing.assert_allclose(out["quads"], quads, rtol=1e-6)
    np.testing.assert_array_equal(out["valid"], valid)
    assert not out["flipped"].any()  # absent column → all-upright

    # rec_try_flip appends one more (B, K) column
    flips = rng.rand(B, K) > 0.5
    payload2 = np.concatenate(
        [payload, flips.astype(np.float32).reshape(B, K)], axis=1)
    out2 = unpack_fused(payload2, K, T, try_flip=True)
    np.testing.assert_array_equal(out2["flipped"], flips)
    np.testing.assert_array_equal(out2["valid"], valid)


def test_ink_crop_host_tightens_and_pads():
    gray = np.full((60, 120), 255, np.uint8)
    gray[20:34, 30:90] = 0                       # 14-row ink band
    crop = _ink_crop_host(gray, 0, 0, 120, 60)
    # pads: band_h=14 → pad_y=1, pad_x=max(1, round(14*3/28))=2 (ints)
    assert crop.shape[0] in (15, 16, 17)         # 14 + up to 2*pad_y
    assert (crop < 128).any()
    # all ink retained
    assert (crop < 128).sum() == (gray < 128).sum()


def test_ink_crop_host_center_band_only():
    gray = np.full((60, 120), 255, np.uint8)
    gray[25:35, 10:100] = 0                      # the line (center)
    gray[0:4, 10:100] = 0                        # neighbor fragment at top
    crop = _ink_crop_host(gray, 0, 0, 120, 60)
    # fragment excluded: crop height ~ center band only
    assert crop.shape[0] <= 14
    assert (crop < 128).sum() == (gray[25:35] < 128).sum()


def test_ink_crop_host_blank_passthrough():
    gray = np.full((40, 80), 255, np.uint8)
    crop = _ink_crop_host(gray, 5, 5, 75, 35)
    assert crop.shape == (30, 70)
