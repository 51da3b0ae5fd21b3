"""Pallas TPU kernel: connected-component labeling, VMEM-resident.

The binarization/box-extraction postprocess kernel mandated by
BASELINE.json:5. The XLA formulation (ocrjax/postprocess/db_boxes.py
label_components) round-trips the (H, W) label image through HBM for every
scan pass (~60 ms per sweep over a 16-page batch); this kernel keeps one
page's labels in VMEM (960² i32 = 3.7 MB) for the whole iteration loop:

  per iteration:
    1. segmented run-min along rows  (Hillis-Steele doubling via pltpu.roll)
    2. segmented run-min along cols
    3. 3x3 neighborhood min (8 rolls) for diagonal-only connections

Same output contract as label_components: labels = component min linear
index, BIG for background, 8-connectivity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 2 ** 30


def _seg_scan_dir(lab, fg, axis: int, size: int, reverse: bool):
    """Inclusive segmented min-scan along `axis` (Hillis-Steele doubling).

    combine((v_prev, f_prev), (v, f)) = (v if f else min(v_prev, v),
                                         f_prev | f); background = boundary.
    """
    idx = jax.lax.broadcasted_iota(jnp.int32, lab.shape, axis)
    v = lab
    # flags as int32 (Mosaic cannot rotate 1-bit vectors)
    f = (~fg).astype(jnp.int32)
    k = 1
    while k < size:
        # pltpu.roll requires non-negative shifts: -k ≡ size-k (circular)
        shift = k if not reverse else size - k
        v_n = pltpu.roll(v, shift, axis=axis)
        f_n = pltpu.roll(f, shift, axis=axis)
        # wrap guard: elements whose neighbor wrapped around keep their value
        if not reverse:
            in_range = idx >= k
        else:
            in_range = idx < size - k
        take = in_range & (f == 0)
        v = jnp.where(take, jnp.minimum(v, v_n), v)
        f = jnp.where(in_range, jnp.maximum(f, f_n), f)
        k *= 2
    return v


def _run_min(lab, fg, axis: int, size: int):
    fwd = _seg_scan_dir(lab, fg, axis, size, reverse=False)
    bwd = _seg_scan_dir(lab, fg, axis, size, reverse=True)
    return jnp.where(fg, jnp.minimum(fwd, bwd), _BIG)


def _neighbor_min(lab, H: int, W: int):
    """3x3 window min via 8 rolls with edge guards."""
    row = jax.lax.broadcasted_iota(jnp.int32, lab.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, lab.shape, 1)
    out = lab
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            sh = pltpu.roll(lab, dy % H, axis=0) if dy else lab
            if dx:
                sh = pltpu.roll(sh, dx % W, axis=1)
            ok = jnp.ones_like(lab, jnp.bool_)
            if dy == 1:
                ok &= row >= 1
            elif dy == -1:
                ok &= row < H - 1
            if dx == 1:
                ok &= col >= 1
            elif dx == -1:
                ok &= col < W - 1
            out = jnp.minimum(out, jnp.where(ok, sh, _BIG))
    return out


def _ccl_kernel(fg_ref, out_ref, *, iters: int, H: int, W: int):
    fg = fg_ref[0] != 0
    lin = (jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) * W
           + jax.lax.broadcasted_iota(jnp.int32, (H, W), 1))
    lab = jnp.where(fg, lin, _BIG)
    for _ in range(iters):
        lab = _run_min(lab, fg, axis=1, size=W)
        lab = _run_min(lab, fg, axis=0, size=H)
        lab = jnp.where(fg, jnp.minimum(lab, _neighbor_min(lab, H, W)), _BIG)
    out_ref[0] = lab


@functools.partial(jax.jit, static_argnames=("n_iters", "interpret"))
def label_components_pallas(bitmap: jnp.ndarray, n_iters: int = 4,
                            interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) bool → (B, H, W) int32 labels. Batch-gridded pallas call."""
    if bitmap.ndim == 2:
        return label_components_pallas(
            bitmap[None], n_iters=n_iters, interpret=interpret)[0]
    B, H, W = bitmap.shape
    kernel = functools.partial(_ccl_kernel, iters=n_iters, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        interpret=interpret,
    )(bitmap.astype(jnp.uint8))
