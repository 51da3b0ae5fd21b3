"""CRNN text-line recognizer, TPU-first.

Capability parity with the reference's recognition stage (SURVEY.md §2.1 R5 /
BASELINE.json:5): conv feature extractor collapsing height to 1, stacked
bidirectional LSTM over width-as-time, linear projection to charset+blank
logits. Design departures from the torch/tch original, on purpose:

  * NHWC layout + bfloat16 compute — native to the TPU MXU/VPU; params stay
    float32 (SURVEY.md §1.3).
  * BiLSTM is `flax.linen.RNN` over `lax.scan` — compiler-friendly static
    control flow; no Pallas LSTM unless profiles demand it (SURVEY.md §7
    "BiLSTM on TPU").
  * Variable widths are handled by bucketing + masking (SURVEY.md §2.3 N13):
    the model takes pixel `widths` and returns per-sequence frame counts so
    the CTC stage can mask pad frames. No dynamic shapes reach XLA.

Geometry: input (B, 32, W, 1) → features (B, 1, W/4, C) → time axis T = W/4.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# Downsampling of the width axis by the conv stack (two 2x2 pools).
WIDTH_STRIDE = 4
# Default input height (collapsed to 1 by pools + final valid conv).
INPUT_HEIGHT = 32


class ConvBNRelu(nn.Module):
    """conv+BN+ReLU — the stack unit the reference builds from (R2/R5)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bn: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.strides,
            padding=self.padding,
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x)
        return nn.relu(x)


class BiLSTM(nn.Module):
    """Bidirectional LSTM over the time axis with length-aware reversal."""

    hidden: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, seq_lengths):
        # x: (B, T, F). flax RNN scans time with lax.scan (static shape);
        # seq_lengths makes the reverse pass start at each sequence's end.
        fwd = nn.RNN(
            nn.OptimizedLSTMCell(
                self.hidden, dtype=self.dtype, param_dtype=self.param_dtype
            )
        )
        bwd = nn.RNN(
            nn.OptimizedLSTMCell(
                self.hidden, dtype=self.dtype, param_dtype=self.param_dtype
            ),
            reverse=True,
            keep_order=True,
        )
        yf = fwd(x, seq_lengths=seq_lengths)
        yb = bwd(x, seq_lengths=seq_lengths)
        return jnp.concatenate([yf, yb], axis=-1)


class CRNN(nn.Module):
    """Conv stack → BiLSTM ×2 → projection to (B, T, num_classes) logits."""

    num_classes: int
    hidden: int = 256
    channels: Sequence[int] = (64, 128, 256, 512)
    input_height: int = INPUT_HEIGHT  # must be a multiple of 16: the four
                                      # height pools leave H/16 rows for the
                                      # final VALID collapse conv
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        widths: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """images: (B, input_height, W, 1) normalized grayscale; widths:
        (B,) valid pixel widths (defaults to W). Returns (logits (B, T, C),
        frame_lengths (B,)) with T = W // 4."""
        B, H, W, _ = images.shape
        if H != self.input_height:
            raise ValueError(
                f"CRNN expects height {self.input_height}, got {H}")
        if H % 16 != 0:
            raise ValueError(f"input_height {H} must be a multiple of 16")
        if W % WIDTH_STRIDE != 0:
            raise ValueError(f"width {W} must be a multiple of {WIDTH_STRIDE}")
        if widths is None:
            widths = jnp.full((B,), W, jnp.int32)

        c1, c2, c3, c4 = self.channels
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = images.astype(self.dtype)

        x = ConvBNRelu(c1, use_bn=False, **kw)(x, train)          # 32 x W
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                # 16 x W/2
        x = ConvBNRelu(c2, use_bn=False, **kw)(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))                # 8 x W/4
        x = ConvBNRelu(c3, **kw)(x, train)
        x = ConvBNRelu(c3, use_bn=False, **kw)(x, train)
        x = nn.max_pool(x, (2, 1), strides=(2, 1))                # 4 x W/4
        x = ConvBNRelu(c4, **kw)(x, train)
        x = ConvBNRelu(c4, use_bn=False, **kw)(x, train)
        x = nn.max_pool(x, (2, 1), strides=(2, 1))                # H/16 x W/4
        # Collapse the remaining height with a VALID-in-H conv: H/16 -> 1.
        x = ConvBNRelu(c4, kernel=(self.input_height // 16, 3),
                       padding=((0, 0), (1, 1)), **kw)(x, train)  # 1 x W/4

        feats = jnp.squeeze(x, axis=1)                            # (B, T, C)
        frame_lengths = jnp.clip(
            -(-widths // WIDTH_STRIDE), 0, feats.shape[1]
        ).astype(jnp.int32)

        feats = BiLSTM(self.hidden, **kw)(feats, frame_lengths)
        feats = BiLSTM(self.hidden, **kw)(feats, frame_lengths)

        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=self.param_dtype)(feats)
        return logits, frame_lengths


def create_crnn(config, num_classes: int) -> CRNN:
    """Build a CRNN from an OcrConfig (SURVEY.md §2.3 N5)."""
    return CRNN(
        num_classes=num_classes,
        hidden=config.rec_hidden,
        channels=tuple(config.rec_conv_channels),
        input_height=config.rec_height,
        dtype=jnp.dtype(config.compute_dtype),
        param_dtype=jnp.dtype(config.param_dtype),
    )
