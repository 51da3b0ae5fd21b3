"""Byte-packed device→host payloads — the downlink mirror of the 4-bit
upload packing (preprocess.pack_for_upload, DESIGN.md §2).

Every fetched buffer on the remote-TPU tunnel pays for its bytes. The
recognition/fused payloads were all-float32, but ~90% of their width is
CTC token ids (`rec_max_tokens` = 128 columns of small ints < 256 — the
charset has <100 classes), plus a handful of genuinely-float columns
(confidences, quad coords). Packing the exact-int columns as uint8 and
BITCASTING the float32 columns to their four raw bytes on device shrinks
the fetch ~3-4x with bit-identical values — no quantization anywhere, so
frozen goldens and torch-twin parity are unaffected.

Byte order: `lax.bitcast_convert_type(f32 → u8)` puts the LOW-order byte
at minor index 0 (XLA BitcastConvert semantics, platform-independent);
`np.ndarray.view(np.float32)` on the x86 host reads little-endian. The
round-trip is exact for every float32 bit pattern (covered by
tests/test_bytepack.py, including NaN/inf/denormals).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("K", "T", "T_f"))
def truncate_tokens_jit(payload, K: int, T: int, T_f: int):
    """Truncated-first-fetch slice (cfg.fetch_max_tokens): shrink a packed
    payload's token block from T to T_f columns per line. Works on every
    payload layout — fused (K lines/page) and pooled-rec (K=1), uint8 and
    float32 — because they all put the (K*T)-wide token block FIRST and
    parse the remaining columns independently of T. Tokens past a line's
    n_tokens are CTC padding, so the slice is lossless whenever every
    n_tokens ≤ T_f; the n_tokens column rides in the untouched remainder,
    letting the host detect the rare overflow and refetch the full buffer
    (which stays on device)."""
    B = payload.shape[0]
    tok = payload[:, :K * T].reshape(B, K, T)[:, :, :T_f]
    return jnp.concatenate(
        [tok.reshape(B, K * T_f), payload[:, K * T:]], axis=1)


def f32_to_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """Device side: (..., N) float32 → (..., 4N) uint8, bit-exact."""
    x = x.astype(jnp.float32)
    b = jax.lax.bitcast_convert_type(x, jnp.uint8)
    return b.reshape(x.shape[:-1] + (x.shape[-1] * 4,))


def bytes_to_f32(buf: np.ndarray) -> np.ndarray:
    """Host side: (..., 4N) uint8 → (..., N) float32 (inverse of
    f32_to_bytes)."""
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    return buf.view(np.float32)


def use_byte_fetch(engine) -> bool:
    """Byte packing is exact only while token ids fit a byte: charset ids
    are < num_classes ≤ 255 and token counts ≤ rec_max_tokens ≤ 255.
    Oversized configs silently keep the float32 payloads."""
    cfg = engine.config
    return bool(cfg.fetch_bytes) and engine.charset.num_classes <= 255 \
        and cfg.rec_max_tokens <= 255
