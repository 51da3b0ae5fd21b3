#!/usr/bin/env python
"""Settle the Pallas fused-conv question with data (VERDICT r1 #5).

Times ops.pallas.conv_fused.conv3x3_bn_relu (force_pallas) against the XLA
conv+epilogue path at the REAL layer shapes of the production models —
DB backbone/FPN stages at the 960px canvas and CRNN conv stages at a
320px-wide strip batch — on the actual TPU. Records a markdown table for
docs/DESIGN.md §6 and prints a wire/retire recommendation per shape.

Run:  python scripts/bench_pallas_conv.py   (needs the real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


# (label, B, H, W, Cin, Cout) — stride-1 3x3 SAME convs in the serving path.
# DB backbone ResBlock bodies run at S/4..S/32 of the 960 canvas with a
# 16-page fused chunk; CRNN convs at the (N, 32, 320) strip bucket. Stride-2
# convs (stem/downsample) are out of the kernel's scope (asserted stride 1).
SHAPES = [
    ("db.res1 960/4",  16, 240, 240, 64, 64),
    ("db.res2 960/8",  16, 120, 120, 128, 128),
    ("db.res3 960/16", 16, 60, 60, 256, 256),
    ("db.res4 960/32", 16, 30, 30, 512, 512),
    ("db.fpn.smooth",  16, 240, 240, 96, 24),
    ("db.head.conv",   16, 240, 240, 96, 24),
    ("crnn.conv0", 256, 32, 320, 1, 64),
    ("crnn.conv1", 256, 16, 160, 64, 128),
    ("crnn.conv2", 256, 8, 80, 128, 256),
    ("crnn.conv3", 256, 8, 80, 256, 256),
    ("crnn.conv4", 256, 4, 80, 256, 512),
    ("crnn.conv5", 256, 4, 80, 512, 512),
]


def main():
    import jax
    import jax.numpy as jnp

    from ocrjax.ops.pallas.conv_fused import conv3x3_bn_relu, conv_bn_relu_xla

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    xla_jit = jax.jit(conv_bn_relu_xla)

    rows = []
    for label, B, H, W, Cin, Cout in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(B, H, W, Cin).astype(np.float32),
                        jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.05)
        scale = jnp.asarray(np.ones(Cout, np.float32))
        bias = jnp.asarray(np.zeros(Cout, np.float32))

        def timeit(fn, reps=20):
            fn(x, w, scale, bias).block_until_ready()
            t0 = time.perf_counter()
            for _ in range(reps):
                y = fn(x, w, scale, bias)
            y.block_until_ready()
            return (time.perf_counter() - t0) / reps * 1e3

        t_xla = timeit(xla_jit)
        try:
            t_pal = timeit(lambda *a: conv3x3_bn_relu(*a, force_pallas=True))
            note = ""
        except Exception as e:  # noqa: BLE001 — tile doesn't fit etc.
            t_pal = float("nan")
            note = str(e).splitlines()[0][:60]
        flops = 2 * B * H * W * 9 * Cin * Cout
        rows.append((label, B, H, W, Cin, Cout, t_xla, t_pal, note))
        speed = t_xla / t_pal if t_pal == t_pal else float("nan")
        print(f"{label:16s} B{B:<4d}{H:>4d}x{W:<4d}{Cin:>4d}->{Cout:<4d} "
              f"xla {t_xla:7.3f} ms  pallas {t_pal:7.3f} ms  "
              f"pallas/xla speedup {speed:5.2f}x  "
              f"(xla {flops / t_xla / 1e9:6.1f} GFLOP/ms) {note}",
              flush=True)

    print("\n| shape | B | HxW | Cin→Cout | XLA ms | Pallas ms | speedup |")
    print("|---|---|---|---|---|---|---|")
    for label, B, H, W, Cin, Cout, t_xla, t_pal, note in rows:
        sp = f"{t_xla / t_pal:.2f}x" if t_pal == t_pal else f"n/a ({note})"
        print(f"| {label} | {B} | {H}x{W} | {Cin}->{Cout} "
              f"| {t_xla:.3f} | {t_pal:.3f} | {sp} |")


if __name__ == "__main__":
    main()
