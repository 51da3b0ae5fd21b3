"""Pallas TPU kernel: fused 3x3 conv + folded BatchNorm + ReLU (NHWC).

BASELINE.json:5 names "Pallas kernels for fused conv-BN-act" as part of the
TPU-native design. XLA already fuses BN+ReLU into its conv epilogues, so this
kernel must earn its keep: it keeps the halo-extended input tile resident in
VMEM via explicit async DMA and drives the MXU with nine shifted
(TILE_H·W, Cin)x(Cin, Cout) matmuls, fusing the scale/bias/ReLU epilogue in
registers — one HBM read of x, one HBM write of y, zero intermediate traffic.

Scope (asserted): stride 1, SAME padding, Cin/Cout multiples of the lane
width is NOT required (Mosaic pads), but VMEM capacity is checked and the
wrapper falls back to the XLA path (`conv_bn_relu_xla`) when the tile budget
doesn't fit or shapes are hostile. Use `fuse_bn` to fold BatchNorm
(gamma, beta, mean, var) into (scale, bias).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the ~16 MB/core VMEM


def fuse_bn(gamma, beta, mean, var, eps: float = 1e-5
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """BatchNorm(inference) → per-channel (scale, bias)."""
    scale = gamma * jax.lax.rsqrt(var + eps)
    return scale, beta - mean * scale


def _kernel(x_hbm, w_ref, sb_ref, y_ref, xs, sem, *, tile_h, W, Cin, Cout):
    i = pl.program_id(1)
    # halo DMA: rows [i*tile_h, i*tile_h + tile_h + 2) of the padded image
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.program_id(0), pl.ds(i * tile_h, tile_h + 2)], xs, sem)
    dma.start()
    dma.wait()

    acc = jnp.zeros((tile_h * W, Cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            patch = xs[dy:dy + tile_h, dx:dx + W, :]       # (tile_h, W, Cin)
            acc += jnp.dot(
                patch.reshape(tile_h * W, Cin),
                w_ref[3 * dy + dx],
                preferred_element_type=jnp.float32,
            )
    scale = sb_ref[0]                                       # (Cout,)
    bias = sb_ref[1]
    out = jnp.maximum(acc * scale[None, :] + bias[None, :], 0.0)
    y_ref[0] = out.reshape(tile_h, W, Cout).astype(y_ref.dtype)


def _round_up(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def _pick_tile_h(H: int, W: int, Cin: int, Cout: int) -> int:
    """Largest divisor tile that fits the VMEM budget; 0 if none."""
    for tile_h in (32, 16, 8, 4, 2, 1):
        if H % tile_h:
            continue
        x_bytes = (tile_h + 2) * _round_up(W + 2, 8) * Cin * 2
        acc_bytes = tile_h * W * Cout * 4
        w_bytes = 9 * Cin * Cout * 2
        y_bytes = tile_h * W * Cout * 2
        if x_bytes + acc_bytes + w_bytes + y_bytes <= VMEM_BUDGET:
            return tile_h
    return 0


def conv_bn_relu_xla(x, w, scale, bias):
    """Reference/fallback path: XLA conv + epilogue (it will fuse these)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jnp.maximum(y * scale + bias, 0.0).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "force_pallas"))
def conv3x3_bn_relu(x: jnp.ndarray, w: jnp.ndarray, scale: jnp.ndarray,
                    bias: jnp.ndarray, interpret: bool = False,
                    force_pallas: bool = False) -> jnp.ndarray:
    """Fused 3x3/stride-1/SAME conv + scale/bias + ReLU.

    x: (B, H, W, Cin); w: (3, 3, Cin, Cout); scale/bias: (Cout,).
    Returns (B, H, W, Cout) in x.dtype. Falls back to the XLA path when the
    pallas tile budget doesn't fit (unless force_pallas).
    """
    B, H, W, Cin = x.shape
    kh, kw, wcin, Cout = w.shape
    assert (kh, kw) == (3, 3) and wcin == Cin, (w.shape, x.shape)

    tile_h = _pick_tile_h(H, W, Cin, Cout)
    if tile_h == 0 and not force_pallas:
        return conv_bn_relu_xla(x, w, scale, bias)
    if tile_h == 0:
        raise ValueError(f"no pallas tile fits for {x.shape}→{Cout}")

    # right-pad the width so the halo DMA's sublane extent (dim 2 of the
    # copied block) is 8-aligned — Mosaic rejects a 66-wide VMEM tile
    Wp = _round_up(W + 2, 8)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0))
                 ).astype(jnp.bfloat16)
    wf = w.reshape(9, Cin, Cout).astype(jnp.bfloat16)
    sb = jnp.stack([scale, bias]).astype(jnp.float32)        # (2, Cout)

    kernel = functools.partial(
        _kernel, tile_h=tile_h, W=W, Cin=Cin, Cout=Cout)
    y = pl.pallas_call(
        kernel,
        grid=(B, H // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # padded x (HBM)
            pl.BlockSpec((9, Cin, Cout), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Cout), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, W, Cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, Wp, Cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * 9 * Cin * Cout,
            bytes_accessed=(B * H * W * (Cin + Cout) * 2
                            + 9 * Cin * Cout * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wf, sb)
    return y
