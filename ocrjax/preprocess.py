"""Image loading + preprocessing (SURVEY.md §2.1 R1, §2.3 N1).

Split of labor, TPU-first:

  * Host: file decode (PIL/cv2) and the aspect-preserving resize of
    arbitrary-sized inputs (dynamic shapes stay off the device).
  * Device: everything with a static shape — cast, normalize, layout — as
    fused jit transforms (BASELINE.json:5 "image decode/resize/normalize
    preprocessing becomes a fused JAX transform").

Recompilation control (SURVEY.md §3.6): detection always lands on a fixed
square canvas of `det_max_side` (padded), so the detection graph compiles
exactly once; recognition strips are padded to width buckets
(`rec_width_buckets`), one compile per bucket. In the end-to-end path (C3+)
line crops never touch the host at all — the batched warp (ocrjax.ops.warp)
samples them straight off the on-device page.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ocrjax.config import OcrConfig

ImageLike = Union[str, np.ndarray]


# ---------------------------------------------------------------------------
# Host: decode + resize
# ---------------------------------------------------------------------------

def is_inverted(img: np.ndarray, thresh: int = 128, stride: int = 4) -> bool:
    """True for light-ink-on-dark input (the polarity the models were NOT
    trained on). Signal: median of subsampled luma below `thresh` — text
    documents are overwhelmingly background, so the median tracks the
    background shade regardless of ink density; channel-mean luma is close
    enough for a binary routing decision."""
    sub = img[::stride, ::stride]
    if sub.ndim == 3:
        sub = sub.mean(axis=2)
    return float(np.median(sub)) < thresh


def load_image(image: ImageLike, auto_invert: bool = True) -> np.ndarray:
    """Path or array → uint8 RGB HWC. Grayscale inputs are broadcast to 3ch.

    auto_invert (config.auto_invert): light-on-dark pages are INVERTED here,
    at the single entry point every pipeline path decodes through, so
    detection, warp crops, ink refinement and recognition all see the
    canonical dark-ink-on-light polarity (the only one the synth-trained
    models know). Inversion preserves chroma (max-min per pixel), so the
    color-reroute signal still works, and it is deterministic in the image
    content — re-loading an already-inverted output is a no-op.
    """
    if isinstance(image, str):
        bgr = cv2.imread(image, cv2.IMREAD_COLOR)
        if bgr is None:
            raise FileNotFoundError(f"could not decode image: {image}")
        img = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    else:
        img = np.asarray(image)
        if img.dtype != np.uint8:
            raise ValueError(f"expected uint8 image, got {img.dtype}")
        if img.ndim == 2:
            img = np.stack([img] * 3, axis=-1)
        elif img.ndim == 3 and img.shape[2] == 1:
            img = np.repeat(img, 3, axis=2)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected HWC RGB, got shape {img.shape}")
    if auto_invert and is_inverted(img):
        img = np.asarray(255 - img, np.uint8)
        from ocrjax.utils.logging import get_logger, log_fields
        log_fields(get_logger("ocrjax.preprocess"), "info",
                   "inverted-polarity page: canonicalized to dark-on-light",
                   inverted=True)
    return img


def to_gray(img: np.ndarray) -> np.ndarray:
    """uint8 RGB HWC → uint8 HW (ITU-R 601 luma, matching cv2)."""
    if img.ndim == 2:
        return img
    return cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)


def to_gray_minchannel(img: np.ndarray) -> np.ndarray:
    """uint8 RGB HWC → uint8 HW via per-pixel channel MINIMUM.

    The color-page projection: saturated ink (yellow/cyan/red …) on a light
    background keeps full contrast where 601 luma can wash it out (yellow
    on white: luma 226 vs 255; min-channel 0 vs 255). Used by the color
    reroute (fused.ocr_pages_fused) — scope is colored ink on light
    documents; arbitrary color-on-color needs a custom projection.
    """
    if img.ndim == 2:
        return img
    return img.min(axis=2)


def color_fraction(img: np.ndarray, chroma_thresh: int = 40,
                   stride: int = 4) -> float:
    """Fraction of (subsampled) pixels with strong chroma — the routing
    signal for color-content pages. 0.0 for grayscale input."""
    if img.ndim == 2:
        return 0.0
    sub = img[::stride, ::stride].astype(np.int16)
    chroma = sub.max(axis=2) - sub.min(axis=2)
    return float((chroma > chroma_thresh).mean())


def _imread_rgb(path: str) -> np.ndarray:
    """cv2 file decode → uint8 RGB HWC (no polarity handling — callers
    canonicalize via load_image or the native canvas decode)."""
    bgr = cv2.imread(path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise FileNotFoundError(f"could not decode image: {path}")
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)


def decode_canvas_native(img: np.ndarray, cfg: OcrConfig,
                         chroma_thresh: int = 40, out: np.ndarray = None):
    """Fused native host decode of the detection canvas, or None.

    One C++ call (native/ocr_native.cpp occ_decode_canvas) replaces the
    asarray-copy → is_inverted → cv2.resize → canvas-pad → cvtColor →
    color_fraction chain — the serial host_decode hot path (VERDICT r2
    weak #1: 541.9 ms / 96 pages, the largest fused-path stage). Returns
    (gray (S, S) u8, scale, (nh, nw), chroma_fraction). Luma is bit-exact
    vs cv2 RGB2GRAY; the resize is luma-first bilinear (±1 vs the cv2
    RGB-first order — both are linear maps); the chroma fraction samples
    the SOURCE rather than the canvas (scale-free signal, same routing).
    """
    from ocrjax.postprocess import native_boxes
    lib = native_boxes._load()
    if lib is None or not hasattr(lib, "occ_decode_canvas"):
        return None
    if img.dtype != np.uint8:
        return None
    if img.ndim == 2:
        h, w = img.shape
        c = 1
    elif img.ndim == 3 and img.shape[2] in (1, 3):
        h, w, c = img.shape
    else:
        return None
    import ctypes
    img = np.ascontiguousarray(img)
    S = cfg.det_max_side
    if out is None:
        out = np.empty((S, S), np.uint8)
    else:
        # caller-owned canvas (e.g. a grays[j] chunk row) — saves a full
        # (S, S) copy per page on the serial host_decode hot path
        assert out.shape == (S, S) and out.dtype == np.uint8 \
            and out.flags.c_contiguous
    meta = np.zeros((5,), np.int64)
    lib.occ_decode_canvas(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(h), ctypes.c_int64(w), ctypes.c_int64(c),
        ctypes.c_int64(S), ctypes.c_int32(int(cfg.auto_invert)),
        ctypes.c_int32(chroma_thresh),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    nh, nw = int(meta[0]), int(meta[1])
    return out, nh / h, (nh, nw), float(meta[3]) / max(int(meta[4]), 1)


_decode_pool = None


def _get_decode_pool():
    global _decode_pool
    if _decode_pool is None:
        import concurrent.futures
        import os as _os
        _decode_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=min(8, _os.cpu_count() or 1),
            thread_name_prefix="ocrjax-decode")
    return _decode_pool


def decode_chunk_to_gray(images, idxs, cfg, *, gray_fn=None,
                         color_frac: float = 0.0, originals_out=None):
    """Threaded host decode of a page chunk onto detection canvases.

    cv2 decode/resize/cvtColor release the GIL, so a thread pool cuts the
    serial host_decode stage ~4-8x (it was 74 ms per 16-page chunk — the
    largest serial cost on the upload path after the native nibble pack).

    images: full sequence; idxs: which entries this chunk covers. Returns
    (grays (n, S, S) u8, scales (n,), valid_hw (n, 2) int, ok (n,) bool,
    colorful bool list) — per-page isolation: a page that fails to decode
    gets ok=False and a zero canvas. colorful[j] is True when color_frac>0
    and the page's strong-chroma fraction exceeds it (the fused path's
    color reroute signal).

    originals_out: optional dict; DOWNSCALED pages (scale < 1) store their
    canonical full-res RGB original under their `idxs` key, so the
    full-resolution recognition lane reuses this decode instead of paying
    a second serial one on the batch critical path (ADVICE r4).
    """
    n = len(idxs)
    S = cfg.det_max_side
    grays = np.zeros((n, S, S), np.uint8)
    scales = np.ones((n,), np.float64)
    valid_hw = np.zeros((n, 2), np.int64)
    ok = np.ones((n,), bool)
    colorful = [False] * n
    gf = gray_fn or to_gray

    def _keep_original(j, arr):
        if originals_out is None or scales[j] >= 0.999:
            return
        # canonicalize exactly as load_image does for arrays: 3-channel
        # RGB, dark-ink-on-light polarity
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        elif arr.ndim == 3 and arr.shape[2] == 1:
            arr = np.repeat(arr, 3, axis=2)
        if cfg.auto_invert and is_inverted(arr):
            arr = np.asarray(255 - arr, np.uint8)
        originals_out[idxs[j]] = arr

    def work(j):
        try:
            im = images[idxs[j]]
            native = None
            if gf is to_gray:  # default-luma pages take the fused C++ path
                arr = im if isinstance(im, np.ndarray) else _imread_rgb(im)
                if isinstance(arr, np.ndarray):
                    native = decode_canvas_native(arr, cfg, out=grays[j])
            if native is not None:
                _, scales[j], valid_hw[j], cfrac = native
                if color_frac > 0 and cfrac > color_frac:
                    colorful[j] = True
                _keep_original(j, arr)
                return
            img = load_image(im, auto_invert=cfg.auto_invert)
            canvas, scales[j], valid_hw[j] = det_resize_to_canvas(img, cfg)
            grays[j] = gf(canvas)
            if color_frac > 0 and color_fraction(canvas) > color_frac:
                colorful[j] = True
            _keep_original(j, img)
        except Exception as e:  # noqa: BLE001 — per-page isolation
            ok[j] = False
            from ocrjax.utils.logging import get_logger, log_fields
            log_fields(get_logger("ocrjax.preprocess"), "warning",
                       "page decode failed (isolated)",
                       page=int(idxs[j]), error=f"{type(e).__name__}: {e}")

    if n == 1:
        work(0)
    else:
        list(_get_decode_pool().map(work, range(n)))
    return grays, scales, valid_hw, ok, colorful


def rec_resize(img: np.ndarray, height: int = 32) -> np.ndarray:
    """Aspect-preserving resize of a grayscale strip to the fixed rec height."""
    h, w = img.shape[:2]
    new_w = max(1, int(round(w * height / h)))
    return cv2.resize(img, (new_w, height), interpolation=cv2.INTER_LINEAR)


def det_resize_to_canvas(
    img: np.ndarray, cfg: OcrConfig
) -> Tuple[np.ndarray, float, Tuple[int, int]]:
    """Resize a page onto the fixed (S, S, 3) detection canvas.

    Long side is scaled to exactly `det_max_side` when larger (never
    upscaled), short side keeps aspect; the rest of the canvas REPLICATES
    the page's border row/column (same rationale as tiling._run_tiles:
    zero padding puts a hard white→black step edge at the content
    boundary, which is out of the det training distribution — measured,
    it suppresses the prob map on text within ~10 px of the page edge,
    max 0.43 vs 0.999 replicate-padded, dropping the line entirely).
    Returns (canvas uint8, scale, (valid_h, valid_w)); original coords =
    canvas coords / scale.
    """
    S = cfg.det_max_side
    h, w = img.shape[:2]
    if (h, w) == (S, S):  # already canvas-sized: no resize, no copy
        return np.ascontiguousarray(img), 1.0, (h, w)
    scale = min(S / max(h, w), 1.0)
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    if scale < 1.0:
        resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)
    else:
        resized = img
    canvas = np.empty((S, S, 3), np.uint8)
    canvas[:nh, :nw] = resized
    canvas[nh:, :nw] = resized[-1:]
    canvas[:, nw:] = canvas[:, nw - 1:nw]
    return canvas, nh / h, (nh, nw)


def pad_strips_to_bucket(
    strips: Sequence[np.ndarray], cfg: OcrConfig, bucket_width: int = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack variable-width (32, w) uint8 strips into (N, 32, Wb) + widths."""
    widths = np.array([s.shape[1] for s in strips], np.int32)
    if bucket_width is None:
        bucket_width = cfg.rec_bucket_for_width(int(widths.max(initial=1)))
    out = np.zeros((len(strips), cfg.rec_height, bucket_width), np.uint8)
    for i, s in enumerate(strips):
        w = min(s.shape[1], bucket_width)
        out[i, :, :w] = s[:, :w]
    return out, np.minimum(widths, bucket_width)


# ---------------------------------------------------------------------------
# Link transport packing (uint8 luma ↔ packed 4-bit nibbles)
# ---------------------------------------------------------------------------
# The host↔device tunnel in this environment has multi-minute congestion
# episodes where bandwidth drops ~50x (docs/DESIGN.md §2); upload bytes are
# then the end-to-end bottleneck. 4-bit luma halves them: text documents are
# high-contrast, and 16 gray levels preserve both DB prob maps and CRNN
# decodes (parity asserted in tests/test_preprocess.py; e2e gates in
# tests/test_tpu.py run the packed path). Pack on host, unpack on device.

# Bayer 4x4 ordered-dither thresholds in (0, 1) — index (y, x) order.
_BAYER4 = (np.array([[0, 8, 2, 10], [12, 4, 14, 6],
                     [3, 11, 1, 9], [15, 7, 13, 5]],
                    np.float32) + 0.5) / 16.0
# integer form of the dither offset: 34*b + 17 (see pack_nibbles)
_BAYER4_I = (np.array([[0, 8, 2, 10], [12, 4, 14, 6],
                       [3, 11, 1, 9], [15, 7, 13, 5]],
                      np.uint16) * 34 + 17)


def _pack_nibbles_native(flat: np.ndarray):
    """C++ fast path for pack_nibbles: (R, W) u8 -> (R, W/2) u8, or None.

    The numpy dither costs ~190 ms per 16-page 960px chunk of pure serial
    host time on the upload path (measured: it alone capped the fused e2e
    path near 80 pages/s); the native LUT+threads version is ~5 ms.
    """
    from ocrjax.postprocess import native_boxes
    lib = native_boxes._load()
    if lib is None or not hasattr(lib, "occ_pack_nibbles"):
        return None
    import ctypes
    R, W = flat.shape
    out = np.empty((R, W // 2), np.uint8)
    lib.occ_pack_nibbles(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(R), ctypes.c_int64(W),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def pack_nibbles(gray: np.ndarray) -> np.ndarray:
    """uint8 luma (..., H, W) → packed (..., H, W/2): two 4-bit pixels/byte.

    Quantization is Bayer-4x4 ORDERED-DITHERED, not rounded: plain rounding
    bands the antialiased glyph edges and the DB detector fragments lines
    at thin strokes (measured on the TPU gates: 5458/10160 bitmap flips at
    det_thresh, 7→12 boxes on one page; dithering cuts that to 616 flips
    and box-exact parity — the conv stack averages the dither noise back
    to the local mean). Per-pixel round-trip error ≤ one 17-level step.
    """
    if gray.shape[-1] % 2:
        raise ValueError(f"width must be even to pack, got {gray.shape}")
    shape = gray.shape
    H, W = shape[-2], shape[-1]
    if H % 4 == 0:  # stacked images keep the row phase aligned
        out = _pack_nibbles_native(
            np.ascontiguousarray(gray).reshape(-1, W))
        if out is not None:
            return out.reshape(shape[:-1] + (W // 2,))
    # Integer-exact numpy fallback: q = floor(g/17 + (2b+1)/32)
    #                                 = (32g + 34b + 17) // 544
    # (numerator odd => never an exact integer => identical to the float
    # form for every (g, b); ~3x cheaper than the float32 floor it replaced)
    bay = np.tile(_BAYER4_I, (H // 4 + 1, W // 4 + 1))[:H, :W]
    q = (((gray.astype(np.uint16) << 5) + bay) // 544).astype(np.uint8)
    return (q[..., 0::2] << 4) | q[..., 1::2]


def unpack_nibbles_host(packed: np.ndarray) -> np.ndarray:
    """Host inverse of pack_nibbles (test/parity use)."""
    hi = (packed >> 4) * np.uint8(17)
    lo = (packed & 0xF) * np.uint8(17)
    return np.stack([hi, lo], axis=-1).reshape(
        packed.shape[:-1] + (packed.shape[-1] * 2,))


def unpack_nibbles(packed: jnp.ndarray) -> jnp.ndarray:
    """Device inverse of pack_nibbles: (..., W/2) u8 → (..., W) u8.

    Runs inside the consuming jit program (fused/bucketed/detect paths), so
    the only link cost is the halved packed payload.
    """
    hi = (packed >> 4) * jnp.uint8(17)
    lo = (packed & 0xF) * jnp.uint8(17)
    return jnp.stack([hi, lo], axis=-1).reshape(
        packed.shape[:-1] + (packed.shape[-1] * 2,))


def pack_for_upload(gray: np.ndarray, cfg: OcrConfig) -> np.ndarray:
    """Apply the configured link transport packing to uint8 luma."""
    return pack_nibbles(gray) if cfg.upload_bits == 4 else gray


def unpack_on_device(arr: jnp.ndarray, cfg: OcrConfig) -> jnp.ndarray:
    """Device-side inverse of pack_for_upload."""
    return unpack_nibbles(arr) if cfg.upload_bits == 4 else arr


# ---------------------------------------------------------------------------
# Device: fused normalize/layout (jit, static shapes)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("mean", "std"))
def rec_normalize(batch_u8: jnp.ndarray, mean: float = 0.5, std: float = 0.5
                  ) -> jnp.ndarray:
    """(N, 32, W) uint8 → (N, 32, W, 1) float32 normalized to ~[-1, 1]."""
    x = batch_u8.astype(jnp.float32) * (1.0 / 255.0)
    x = (x - mean) / std
    return x[..., None]


@functools.partial(jax.jit, static_argnames=("mean", "std"))
def det_normalize_gray(
    gray_u8: jnp.ndarray,
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406),
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225),
) -> jnp.ndarray:
    """(B, S, S) uint8 luma → float32 NHWC RGB-normalized (broadcast).

    Single-channel uploads are 3x cheaper over the host↔device link; for
    monochrome documents the result is identical to det_normalize on the
    replicated-RGB canvas.
    """
    if gray_u8.ndim == 2:
        gray_u8 = gray_u8[None]
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    x = gray_u8.astype(jnp.float32)[..., None] * (1.0 / 255.0)
    return (x - m) / s


@functools.partial(jax.jit, static_argnames=("mean", "std"))
def det_normalize(
    canvas_u8: jnp.ndarray,
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406),
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225),
) -> jnp.ndarray:
    """(..., S, S, 3) uint8 → float32 NHWC, ImageNet-normalized.

    Accepts a single canvas or a batch; always returns a batch dim.
    """
    if canvas_u8.ndim == 3:
        canvas_u8 = canvas_u8[None]
    m = jnp.asarray(mean, jnp.float32)
    s = jnp.asarray(std, jnp.float32)
    x = canvas_u8.astype(jnp.float32) * (1.0 / 255.0)
    return (x - m) / s
