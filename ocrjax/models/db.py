"""DB-style (Differentiable Binarization) text detector, TPU-first.

Capability parity with the reference's detection stage (SURVEY.md §2.1 R2 /
BASELINE.json:5): conv+BN+ReLU backbone stacks, an FPN neck fusing 4 scales,
and a head producing a 1-channel probability map at input resolution. Design
choices for TPU rather than a torch translation:

  * NHWC + bfloat16 everywhere on the conv path (MXU-native); the prob map
    is returned in float32.
  * Input is always the fixed square canvas from
    ocrjax.preprocess.det_resize_to_canvas, so this graph compiles once
    (SURVEY.md §3.6).
  * FPN top-down upsampling uses nearest resize (cheap, bandwidth-bound);
    the head upsamples 4x with learned ConvTranspose like DB.
  * Training mode additionally produces the threshold map and the
    differentiable binarization b = sigmoid(k (p - t)), k=50 (DB paper
    formulation), for ocrjax.train.det_trainer.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ocrjax.models.crnn import ConvBNRelu

DB_K = 50.0  # steepness of the differentiable binarization


class ResBlock(nn.Module):
    """Two 3x3 conv+BN(+ReLU) with identity/projection shortcut."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        y = ConvBNRelu(self.features, strides=self.strides, **kw)(x, train)
        y = nn.Conv(self.features, (3, 3), use_bias=False, **kw)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         **kw)(y)
        if residual.shape[-1] != self.features or self.strides != (1, 1):
            residual = nn.Conv(self.features, (1, 1), strides=self.strides,
                               use_bias=False, **kw)(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, **kw)(residual)
        return nn.relu(y + residual)


class Backbone(nn.Module):
    """ResNet-style 4-stage backbone; returns stride 4/8/16/32 features."""

    channels: Sequence[int] = (64, 128, 256, 512)
    blocks_per_stage: int = 2
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c1, c2, c3, c4 = self.channels
        # Stem: stride 4 (two stride-2 convs — keeps the MXU busy without
        # the memory blowup of full-res stride-1 stages).
        x = ConvBNRelu(c1 // 2, strides=(2, 2), **kw)(x, train)
        x = ConvBNRelu(c1, strides=(2, 2), **kw)(x, train)
        feats = []
        for i, ch in enumerate(self.channels):
            stride = (1, 1) if i == 0 else (2, 2)
            x = ResBlock(ch, strides=stride, **kw)(x, train)
            for _ in range(self.blocks_per_stage - 1):
                x = ResBlock(ch, **kw)(x, train)
            feats.append(x)
        return feats  # strides 4, 8, 16, 32


class FPN(nn.Module):
    """Top-down feature pyramid fused to a single stride-4 map."""

    inner: int = 96
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # lateral 1x1 to a common width
        laterals = [nn.Conv(self.inner, (1, 1), use_bias=False, **kw)(f)
                    for f in feats]

        def up2(t, like):
            return jax.image.resize(
                t, like.shape[:1] + like.shape[1:3] + t.shape[3:], "nearest")

        # top-down pathway
        p = [None] * len(laterals)
        p[-1] = laterals[-1]
        for i in range(len(laterals) - 2, -1, -1):
            p[i] = laterals[i] + up2(p[i + 1], laterals[i])
        # smooth + reduce + bring everything to stride 4 and concat
        outs = []
        for i, t in enumerate(p):
            t = nn.Conv(self.inner // 4, (3, 3), use_bias=False, **kw)(t)
            if i > 0:
                t = jax.image.resize(
                    t, (t.shape[0],) + p[0].shape[1:3] + (t.shape[3],),
                    "nearest")
            outs.append(t)
        return jnp.concatenate(outs, axis=-1)  # (B, S/4, S/4, inner)


class DBHead(nn.Module):
    """conv (+ learned ConvTranspose upsampling) → 1-channel logit map.

    out_stride selects the output resolution relative to the input canvas:
      1 — DB-classic full resolution (two ×2 ConvTransposes);
      2 — one ConvTranspose, map at S/2;
      4 — no upsampling, map at the FPN's native S/4.
    Profiling the fused pipeline put ~11 ms of a 31 ms detection forward in
    the two transposed convs + the layout copies XLA inserts around them —
    upsampling a map that extract_boxes immediately coarsens again. The
    stride-4 head detects on the native grid; box coordinates scale back to
    canvas pixels in extract_boxes (coord_stride) and the two-pass ink
    refinement (ops.warp) re-derives exact geometry from the FULL-res
    canvas, so end-to-end quality is insensitive to the map stride.
    """

    inner: int = 96
    out_stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = ConvBNRelu(self.inner // 4, **kw)(x, train)
        if self.out_stride == 4:
            x = nn.Conv(1, (1, 1), dtype=jnp.float32,
                        param_dtype=self.param_dtype)(x)
            return x[..., 0]  # (B, S/4, S/4) logits, float32
        x = nn.ConvTranspose(self.inner // 4, (2, 2), strides=(2, 2), **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        if self.out_stride == 2:
            x = nn.Conv(1, (1, 1), dtype=jnp.float32,
                        param_dtype=self.param_dtype)(x)
            return x[..., 0]  # (B, S/2, S/2)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2),
                             dtype=jnp.float32,
                             param_dtype=self.param_dtype)(x)
        return x[..., 0]  # (B, S, S) logits, float32


class DBDetector(nn.Module):
    """Backbone → FPN → prob head (+ thresh head in train mode)."""

    channels: Sequence[int] = (64, 128, 256, 512)
    inner: int = 96
    blocks_per_stage: int = 2
    head_stride: int = 1
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        """images: (B, S, S, 3) normalized. Returns dict with 'prob'
        (B, S, S) in [0,1]; in train mode also 'thresh' and 'binary'."""
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        feats = Backbone(self.channels, self.blocks_per_stage, **kw)(
            images.astype(self.dtype), train)
        fused = FPN(self.inner, **kw)(feats)
        p_logits = DBHead(self.inner, self.head_stride, **kw)(fused, train)
        out = {"prob": jax.nn.sigmoid(p_logits)}
        # The thresh head must also run during init (else its params are
        # never created and a later train-mode apply fails); inference-mode
        # apply (train=False, initialized) skips its compute entirely.
        if train or self.is_initializing():
            t_logits = DBHead(self.inner, self.head_stride, **kw)(fused, train)
            thresh = jax.nn.sigmoid(t_logits)
            if train:
                out["thresh"] = thresh
                out["binary"] = jax.nn.sigmoid(
                    DB_K * (out["prob"] - thresh))
        return out


def create_db(config, channels: Sequence[int] = None) -> DBDetector:
    """Build a DBDetector from an OcrConfig (SURVEY.md §2.3 N2)."""
    return DBDetector(
        channels=tuple(channels) if channels else (64, 128, 256, 512),
        head_stride=getattr(config, "det_head_stride", 1),
        dtype=jnp.dtype(config.compute_dtype),
        param_dtype=jnp.dtype(config.param_dtype),
    )


# Architecture presets addressable from asset metadata / trainer flags.
# "tile": the cheap tile-scale detector (VERDICT r4 next #1) — the dense C5
# roofline put 540 GF/page in the flagship backbone's residual stages
# (DESIGN.md §6c), which halved channels + single blocks cut ~5x while the
# stride-1 head keeps full-resolution geometry (the stride-2/4 heads
# under-recalled at the 14-30 px dense glyph sizes, DESIGN.md §5b).
DB_ARCHS = {
    "flagship": dict(channels=(64, 128, 256, 512), blocks_per_stage=2,
                     inner=96, head_stride=1),
    "tile": dict(channels=(32, 64, 128, 256), blocks_per_stage=1,
                 inner=64, head_stride=1),
}


def create_db_arch(config, arch: Dict) -> DBDetector:
    """Build a DBDetector from an explicit architecture dict (a DB_ARCHS
    preset or the `arch` JSON persisted in a det asset's metadata)."""
    return DBDetector(
        channels=tuple(arch.get("channels", (64, 128, 256, 512))),
        inner=int(arch.get("inner", 96)),
        blocks_per_stage=int(arch.get("blocks_per_stage", 2)),
        head_stride=int(arch.get("head_stride", 1)),
        dtype=jnp.dtype(config.compute_dtype),
        param_dtype=jnp.dtype(config.param_dtype),
    )
