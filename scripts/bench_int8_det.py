#!/usr/bin/env python
"""Settle the int8 detection question with data (models/db_int8).

Times the full DB detection forward — float bf16 flax apply vs the int8
in-graph-quantized mirror (per-channel weight + activation scales, int32
MXU accumulate) — at the REAL serving shape (fused 16-page chunk on the
960px canvas), on the actual TPU. Also reports prob-map bitmap agreement
at det_thresh with the trained weights, so the speed number comes with its
quality cost attached. Records the numbers for docs/DESIGN.md §6 and
prints a wire/retire recommendation (flip `det_int8` default only on a
measured win).

Run:  python scripts/bench_int8_det.py   (needs the real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from ocrjax.api import OcrEngine
    from ocrjax.models import db_int8
    from ocrjax import preprocess
    from ocrjax.train import synth
    from ocrjax.charset import default_charset
    from ocrjax.api_det import _det_state

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    eng = OcrEngine.from_pretrained()
    cfg = eng.config
    st = _det_state(eng)
    S, B = cfg.det_max_side, 16

    rng = np.random.RandomState(0)
    grays = np.zeros((B, S, S), np.uint8)
    for i in range(B):
        page, _, _ = synth.render_page(rng, default_charset(), size=(S, S))
        grays[i] = page
    x = preprocess.det_normalize_gray(jnp.asarray(grays),
                                      cfg.det_mean, cfg.det_std)

    f_fn = jax.jit(lambda v, xx: st.model.apply(v, xx)["prob"])
    q_fn = jax.jit(lambda v, xx: db_int8.prob_int8(st.model, v, xx))
    # Timing fetches a scalar reduction, not the (B,S,S) map: the full map is
    # ~59 MB and the remote-TPU tunnel transfer dominates compute by >10x,
    # compressing any real compute ratio toward 1.0 (observed: 1127 vs
    # 1253 ms with full download). The mean depends on every element, so the
    # whole forward still runs; the download is 4 bytes.
    f_s = jax.jit(lambda v, xx: st.model.apply(v, xx)["prob"].mean())
    q_s = jax.jit(lambda v, xx: db_int8.prob_int8(st.model, v, xx).mean())

    def bench(fn, scalar_fn, label):
        out = fn(st.variables, x)
        np.asarray(out)  # full materialize — block_until_ready can lie here
        np.asarray(scalar_fn(st.variables, x))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(scalar_fn(st.variables, x))
            times.append(time.perf_counter() - t0)
        ms = min(times) * 1e3
        print(f"{label}: {ms:.1f} ms / {B} pages "
              f"({B / (ms / 1e3):.0f} pages/s det-forward)", flush=True)
        return out, ms

    pf, ms_f = bench(f_fn, f_s, "float bf16")
    pq, ms_q = bench(q_fn, q_s, "int8      ")

    pf, pq = np.asarray(pf), np.asarray(pq)
    agree = ((pf > cfg.det_thresh) == (pq > cfg.det_thresh)).mean()
    print(f"bitmap agreement @ det_thresh: {agree:.6f}")
    print(f"mean |prob diff|: {np.abs(pf - pq).mean():.6f}  "
          f"max: {np.abs(pf - pq).max():.4f}")
    speedup = ms_f / ms_q
    print(f"speedup: {speedup:.2f}x → "
          + ("WIRE (flip det_int8 default after e2e quality gates)"
             if speedup > 1.1 and agree > 0.999 else
             "RETIRE/HOLD (keep det_int8 opt-in; record numbers in "
             "DESIGN.md §6)"))


if __name__ == "__main__":
    main()
