"""Int8 inference path for the DB detector (beyond-parity perf experiment).

The v5e MXU runs s8×s8→s32 at ~2× its bf16 rate, and the DB backbone is
where the detection FLOPs live (SURVEY.md §2.1 R2; docs/DESIGN.md §5b puts
the conv forward at ~2/3 of the fused chunk after the postprocess work).
This module quantizes the backbone + FPN convolutions IN-GRAPH:

  * BN folding: conv kernel and the following BatchNorm collapse into one
    (w', b') pair — same inference identity the float path computes, so
    the only approximation is the quantization itself.
  * Weights: per-OUTPUT-channel symmetric int8 (abs-max / 127) — the
    standard production recipe; per-channel costs nothing at inference
    because the scale folds into the dequant multiply.
  * Activations: per-IMAGE dynamic symmetric scales (abs-max over H, W, C)
    — data-dependent VALUES, not shapes, so the jit program stays static;
    one cheap fused reduce per layer.
  * Accumulation: int32 via lax.conv preferred_element_type (exact on MXU
    and on the CPU backend — parity-tested), dequant + bias + ReLU in the
    model compute dtype.
  * The probability HEAD stays on the float path via a flax sub-apply of
    the DBHead_0 subtree: the prob map's fine values gate thresholding and
    box scores, and the head is a tiny fraction of the FLOPs.

Everything runs inside the caller's jit (the fold/quant subgraph is O(param
count) — noise next to 960² convs), so the interface is unchanged: the same
float `variables` flow through api_det/fused/tiling/mesh, and sharding
annotations keep applying to the float tree.

Config-gated (`det_int8`, CLI `--det-int8`), DEFAULT OFF until the TPU
benchmark (`scripts/bench_int8_det.py`) records the measured speed/quality
trade at real shapes — the same settle-it-with-data discipline as the
retired Pallas fused conv (docs/DESIGN.md §6). CPU tests pin quantized
box/e2e parity on synthetic pages regardless of the gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_BN_EPS = 1e-5  # flax nn.BatchNorm default, matching the float path
_QMAX = 127.0


def _fold_bn(kernel, bn_p, bn_s):
    """conv kernel (kh,kw,ci,co) + BatchNorm params/stats → (w', bias)."""
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + _BN_EPS)
    return kernel * g[None, None, None, :], bn_p["bias"] - bn_s["mean"] * g


def _qconv(x, w, bias, strides, relu, out_dtype):
    """Quantized conv: per-INPUT-channel dynamic act scales folded into the
    weights, per-OUTPUT-channel weight scales, int32 accumulate.

    Per-tensor act quantization loses the small-magnitude channels of a
    trained network (channel abs-max spread is >100x here — measured 26%
    mean stage-0 error, which destroyed the prob map). Because weights are
    (re)quantized in-graph anyway, the per-channel act scale sx[ci] can be
    folded into the kernel before ITS quantization:

        conv(w, x) = conv(w * sx, x / sx)

    so both tensors are quantized per-channel and the conv stays exact
    int8×int8→int32. sx is shared across the batch (a (ci,) reduce), so
    kernels stay batch-independent.

    x: (B,H,W,ci) float; w: f32 BN-folded kernel (kh,kw,ci,co);
    bias: (co,) f32 or None; → (B,H',W',co) out_dtype.
    """
    xf = x.astype(jnp.float32)  # quantize in f32: bf16 ulp at 127 is 0.5
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=(0, 1, 2)), 1e-8) / _QMAX
    xq = jnp.clip(jnp.round(xf / sx), -_QMAX, _QMAX).astype(jnp.int8)
    w_eff = w * sx[None, None, :, None]
    ws = jnp.maximum(jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)), 1e-8) / _QMAX
    wq = jnp.clip(jnp.round(w_eff / ws), -_QMAX, _QMAX).astype(jnp.int8)
    y = lax.conv_general_dilated(
        xq, wq, strides, "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * ws
    if bias is not None:
        y = y + bias
    y = y.astype(out_dtype)
    return jax.nn.relu(y) if relu else y


def prob_int8(model, variables, x):
    """Drop-in for `model.apply(variables, x)["prob"]`, int8 conv path.

    model: the DBDetector the variables were created for (architecture
    constants — channels, blocks_per_stage, inner, head_stride — drive the
    mirror forward; the param tree names are flax's deterministic
    creation-order names, pinned by tests/test_db_int8.py)."""
    p = variables["params"]
    bs = variables["batch_stats"]
    dt = model.dtype

    def cbr(pp, ss, xx, strides=(1, 1)):
        w, b = _fold_bn(pp["Conv_0"]["kernel"], pp["BatchNorm_0"],
                        ss["BatchNorm_0"])
        return _qconv(xx, w, b, strides, True, dt)

    def conv_bn(pp, ss, conv, bn, xx, strides=(1, 1)):
        w, b = _fold_bn(pp[conv]["kernel"], pp[bn], ss[bn])
        return _qconv(xx, w, b, strides, False, dt)

    def resblock(name, xx, strides):
        pp, ss = p["Backbone_0"][name], bs["Backbone_0"][name]
        y = cbr(pp["ConvBNRelu_0"], ss["ConvBNRelu_0"], xx, strides)
        y = conv_bn(pp, ss, "Conv_0", "BatchNorm_0", y)
        if "Conv_1" in pp:  # projection shortcut (channel/stride change)
            r = conv_bn(pp, ss, "Conv_1", "BatchNorm_1", xx, strides)
        else:
            r = xx
        return jax.nn.relu(y + r)

    # ---- backbone (mirrors models.db.Backbone.__call__) --------------------
    x = x.astype(dt)
    x = cbr(p["Backbone_0"]["ConvBNRelu_0"], bs["Backbone_0"]["ConvBNRelu_0"],
            x, (2, 2))
    x = cbr(p["Backbone_0"]["ConvBNRelu_1"], bs["Backbone_0"]["ConvBNRelu_1"],
            x, (2, 2))
    feats = []
    idx = 0
    for i in range(len(model.channels)):
        stride = (1, 1) if i == 0 else (2, 2)
        x = resblock(f"ResBlock_{idx}", x, stride)
        idx += 1
        for _ in range(model.blocks_per_stage - 1):
            x = resblock(f"ResBlock_{idx}", x, (1, 1))
            idx += 1
        feats.append(x)

    # ---- FPN (mirrors models.db.FPN.__call__; convs have no BN/bias) -------
    fp = p["FPN_0"]
    laterals = [
        _qconv(f, fp[f"Conv_{i}"]["kernel"], None, (1, 1), False, dt)
        for i, f in enumerate(feats)
    ]

    def up2(t, like):
        return jax.image.resize(
            t, like.shape[:1] + like.shape[1:3] + t.shape[3:], "nearest")

    pyr = [None] * len(laterals)
    pyr[-1] = laterals[-1]
    for i in range(len(laterals) - 2, -1, -1):
        pyr[i] = laterals[i] + up2(pyr[i + 1], laterals[i])
    outs = []
    for i, t in enumerate(pyr):
        t = _qconv(t, fp[f"Conv_{4 + i}"]["kernel"], None, (1, 1), False, dt)
        if i > 0:
            t = jax.image.resize(
                t, (t.shape[0],) + pyr[0].shape[1:3] + (t.shape[3],),
                "nearest")
        outs.append(t)
    fused = jnp.concatenate(outs, axis=-1)

    # ---- head: float path via flax sub-apply (exact head parity) -----------
    from ocrjax.models.db import DBHead
    head = DBHead(model.inner, model.head_stride, dtype=model.dtype,
                  param_dtype=model.param_dtype)
    logits = head.apply(
        {"params": p["DBHead_0"], "batch_stats": bs["DBHead_0"]}, fused,
        False)
    return jax.nn.sigmoid(logits)


def apply_prob(model, variables, x, int8: bool):
    """Route the detection forward: float flax apply or the int8 mirror."""
    if int8:
        return prob_int8(model, variables, x)
    return model.apply(variables, x)["prob"]
