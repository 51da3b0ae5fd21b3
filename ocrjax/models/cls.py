"""Orientation classifier (the PP-OCR "cls" stage, TPU-native).

Decides whether a rectified text strip is upside down (rotated 180°). The
reference lineage (PP-OCR, SURVEY.md §0 [K]) runs this as a separate tiny
CNN between crop and recognition; here it runs INSIDE the recognition XLA
program (models applied back to back, one fused graph), and the flip itself
is a device-side gather — no extra host round trip, no doubled recognition
batch.

Why a classifier and not decode-confidence comparison: the CRNN is trained
on random glyph strings (no language prior), so a 180°-rotated strip
decodes to OTHER glyphs with equally high confidence — measured on the
refined warp path, neither mean, min, geometric-mean nor low-quantile
frame probability separates upright from flipped readings reliably.
Orientation is a property of glyph-shape asymmetry (baselines, ascenders,
descenders), which a small conv net learns directly.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class OrientationClassifier(nn.Module):
    """(B, H, W, 1) normalized strips + widths → (B,) logit of "flipped".

    Three stride-2 conv blocks then a width-masked global average pool, so
    padded lanes can't vote. Channels are tiny — the decision is local
    stroke asymmetry, not semantics.
    """
    channels: tuple = (32, 64, 128)
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x: jnp.ndarray, widths: jnp.ndarray) -> jnp.ndarray:
        dt = jnp.dtype(self.compute_dtype)
        x = x.astype(dt)
        stride = 1
        for ch in self.channels:
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=dt)(x)
            x = nn.relu(x)
            stride *= 2
        # masked mean over WIDTH only — the orientation cue is the vertical
        # ink distribution (baseline vs x-height band, ascender/descender
        # asymmetry), so the row axis must survive into the head
        w_cols = (widths.astype(jnp.float32) + stride - 1) // stride
        cols = jnp.arange(x.shape[2], dtype=jnp.float32)
        m = (cols[None, :] < w_cols[:, None]).astype(jnp.float32)
        m = m[:, None, :, None]                                # (B,1,W',1)
        x = x.astype(jnp.float32)
        mean = (x * m).sum(axis=2) / jnp.maximum(m.sum(axis=2), 1.0)
        # max alongside mean: a sparse cue (one descender glyph in a long
        # word) survives max-pooling where the mean dilutes it with the
        # word's many orientation-neutral columns
        mx = jnp.where(m > 0, x, -jnp.inf).max(axis=2)
        mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        pooled = jnp.concatenate([mean, mx], axis=-1)          # (B,H',2C)
        pooled = pooled.reshape(pooled.shape[0], -1)
        h = nn.relu(nn.Dense(64, dtype=jnp.float32)(pooled))
        return nn.Dense(1, dtype=jnp.float32)(h)[:, 0]


def create_cls(config) -> OrientationClassifier:
    return OrientationClassifier(compute_dtype=config.compute_dtype)


def flip_strips_by_width(strips: jnp.ndarray, widths: jnp.ndarray,
                         flip: jnp.ndarray, pad_value: float) -> jnp.ndarray:
    """Rotate selected strips 180° on device, keeping content left-aligned.

    strips: (N, H, W); widths: (N,) valid columns; flip: (N,) bool.
    Row j of a flipped strip samples column (w-1-j); columns ≥ w stay at
    pad_value so the CRNN's width masking sees the same frame count.

    Implementation: pure axis reverses + a per-strip one-hot SHIFT matmul
    (out[:, :, j] = rev[:, :, j + (W−w)]) instead of an (N, H, W)
    take_along_axis — elementwise dynamic gathers serialize on TPU while
    the one-hot contraction rides the MXU (the same trick as the CTC
    compaction, ops/ctc.py). Exact: every output element is one x·1
    product, and the f32 contraction reproduces it bit-for-bit.
    """
    N, H, W = strips.shape
    cols = jnp.arange(W)
    rev = strips[:, ::-1, ::-1]                                # (N, H, W)
    # shift[n]: v == j + (W - w_n)  → out[n, h, j] = rev[n, h, j + W - w_n]
    shift = (cols[None, None, :] + (W - widths[:, None, None])
             == cols[None, :, None]).astype(strips.dtype)      # (N, V, J)
    flipped = jnp.einsum("nhv,nvj->nhj", rev, shift,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32
                         ).astype(strips.dtype)
    flipped = jnp.where(cols[None, None, :] < widths[:, None, None],
                        flipped, pad_value)
    return jnp.where(flip[:, None, None], flipped, strips)
