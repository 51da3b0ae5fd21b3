import numpy as np
import pytest

from ocrjax import preprocess
from ocrjax.config import TINY, OcrConfig


def test_load_image_array_passthrough():
    img = np.random.RandomState(0).randint(0, 255, (20, 30, 3), np.uint8)
    out = preprocess.load_image(img)
    np.testing.assert_array_equal(out, img)


def test_load_image_gray_broadcast():
    img = np.random.RandomState(0).randint(0, 255, (20, 30), np.uint8)
    out = preprocess.load_image(img)
    assert out.shape == (20, 30, 3)
    np.testing.assert_array_equal(out[..., 0], img)


def test_load_image_file_roundtrip(tmp_path):
    import cv2
    img = np.random.RandomState(0).randint(0, 255, (16, 24, 3), np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    out = preprocess.load_image(p)
    np.testing.assert_array_equal(out, img)


def test_load_image_missing_file():
    with pytest.raises(FileNotFoundError):
        preprocess.load_image("/nonexistent/image.png")


def test_rec_resize_aspect():
    img = np.zeros((64, 200), np.uint8)
    out = preprocess.rec_resize(img, 32)
    assert out.shape == (32, 100)


def test_det_canvas_fixed_shape_and_scale():
    cfg = OcrConfig(det_max_side=256)
    img = np.full((100, 400, 3), 200, np.uint8)
    canvas, scale, (nh, nw) = preprocess.det_resize_to_canvas(img, cfg)
    assert canvas.shape == (256, 256, 3)
    assert nw == 256 and nh == 64
    assert abs(scale - 0.64) < 1e-6
    assert canvas[:nh, :nw].mean() > 190          # content area
    # padding replicates the border row/col (no artificial step edge)
    np.testing.assert_array_equal(canvas[nh:, :nw],
                                  np.broadcast_to(canvas[nh - 1:nh, :nw],
                                                  canvas[nh:, :nw].shape))
    np.testing.assert_array_equal(canvas[:, nw:],
                                  np.broadcast_to(canvas[:, nw - 1:nw],
                                                  canvas[:, nw:].shape))


def test_det_canvas_never_upscales():
    cfg = OcrConfig(det_max_side=256)
    img = np.full((50, 60, 3), 99, np.uint8)
    canvas, scale, (nh, nw) = preprocess.det_resize_to_canvas(img, cfg)
    assert (nh, nw) == (50, 60) and scale == 1.0


def test_pad_strips_to_bucket():
    strips = [np.ones((32, 50), np.uint8), np.ones((32, 120), np.uint8)]
    batch, widths = preprocess.pad_strips_to_bucket(strips, TINY)
    assert batch.shape == (2, 32, 128)   # TINY buckets: (64, 128)
    np.testing.assert_array_equal(widths, [50, 120])
    assert batch[0, :, 50:].sum() == 0


def test_rec_normalize_range():
    batch = np.zeros((1, 32, 64), np.uint8)
    batch[0, :, :32] = 255
    out = np.asarray(preprocess.rec_normalize(batch))
    assert out.shape == (1, 32, 64, 1)
    assert abs(out[0, 0, 0, 0] - 1.0) < 1e-6
    assert abs(out[0, 0, 40, 0] + 1.0) < 1e-6


def test_det_normalize_imagenet():
    canvas = np.full((8, 8, 3), 255, np.uint8)
    out = np.asarray(preprocess.det_normalize(canvas))
    assert out.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(
        out[0, 0, 0], (1.0 - np.array([0.485, 0.456, 0.406])) /
        np.array([0.229, 0.224, 0.225]), rtol=1e-5)


def test_nibble_pack_roundtrip():
    """4-bit link packing: device unpack inverts host pack within one
    dithered quantization step (≤ 17 gray levels per pixel), and the LOCAL
    MEAN over a Bayer tile is preserved to ≤ 2.5 levels (the property the
    DB conv stack depends on — plain rounding banded antialiased edges and
    fragmented detection)."""
    import jax.numpy as jnp

    from ocrjax import preprocess

    rng = np.random.RandomState(0)
    g = rng.randint(0, 256, (2, 8, 16), dtype=np.uint8)
    packed = preprocess.pack_nibbles(g)
    assert packed.shape == (2, 8, 8) and packed.dtype == np.uint8
    back_h = preprocess.unpack_nibbles_host(packed)
    back_d = np.asarray(preprocess.unpack_nibbles(jnp.asarray(packed)))
    np.testing.assert_array_equal(back_h, back_d)
    assert np.abs(back_h.astype(int) - g.astype(int)).max() <= 17

    # flat fields: dithered local mean ≈ original value
    for v in (0, 37, 128, 200, 255):
        flat = np.full((8, 8), v, np.uint8)
        back = preprocess.unpack_nibbles_host(preprocess.pack_nibbles(flat))
        assert abs(float(back.mean()) - v) <= 2.5, v


def test_nibble_pack_integer_matches_float_reference():
    """The production packer (C++ LUT when available, integer numpy
    otherwise) must be BIT-IDENTICAL to the original float dither formula
    q = floor(g/17 + bayer) — goldens and the trained dither-transport
    augmentation were frozen under it. Covers every (gray value, Bayer
    phase) pair plus odd shapes that dodge the native path (H % 4 != 0)."""
    from ocrjax import preprocess

    def pack_float(gray):
        H, W = gray.shape[-2], gray.shape[-1]
        t = np.tile(preprocess._BAYER4, (H // 4 + 1, W // 4 + 1))[:H, :W]
        q = np.clip(np.floor(gray.astype(np.float32) * (1.0 / 17.0) + t),
                    0, 15).astype(np.uint8)
        return (q[..., 0::2] << 4) | q[..., 1::2]

    # exhaustive: all 256 grays x all 16 Bayer phases
    g = np.tile(np.arange(256, dtype=np.uint8), 4)[None].repeat(8, axis=0)
    np.testing.assert_array_equal(preprocess.pack_nibbles(g), pack_float(g))
    rng = np.random.RandomState(3)
    for shape in [(2, 16, 32), (64, 64), (3, 30, 30), (5, 6, 10)]:
        x = rng.randint(0, 256, shape, dtype=np.uint8)
        np.testing.assert_array_equal(
            preprocess.pack_nibbles(x), pack_float(x), err_msg=str(shape))


def test_pack_for_upload_respects_config():
    from ocrjax import preprocess
    from ocrjax.config import OcrConfig

    g = np.zeros((1, 4, 8), np.uint8)
    cfg8 = OcrConfig(upload_bits=8)
    cfg4 = OcrConfig(upload_bits=4)
    assert preprocess.pack_for_upload(g, cfg8).shape == (1, 4, 8)
    assert preprocess.pack_for_upload(g, cfg4).shape == (1, 4, 4)


def test_decode_chunk_isolation_logs(caplog):
    import logging

    from ocrjax.config import OcrConfig

    cfg = OcrConfig(det_max_side=64)
    # get_logger sets propagate=False (it owns its stderr handler); let the
    # records reach caplog's root handler for this test
    from ocrjax.utils.logging import get_logger

    lg = get_logger("ocrjax.preprocess")   # configure handlers first
    old = lg.propagate
    lg.propagate = True
    try:
        with caplog.at_level(logging.WARNING, logger="ocrjax.preprocess"):
            grays, scales, hw, ok, col = preprocess.decode_chunk_to_gray(
                [np.full((32, 32, 3), 255, np.uint8), b"garbage"], [0, 1],
                cfg)
    finally:
        lg.propagate = old
    assert ok.tolist() == [True, False]
    assert any("decode failed" in r.message for r in caplog.records)
