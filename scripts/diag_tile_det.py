#!/usr/bin/env python
"""Break down the dense C5 tile detection program on hardware: prob forward
vs on-device box extraction, per head stride. Informs the dense-throughput
work (VERDICT r3 next #1) — the tile det forward is ~195 of the 482 ms
steady dense window (scripts/diag_dense_stages.py).

Run: python scripts/diag_tile_det.py [--tiles 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


import jax.numpy as _jnp
import jax as _jax


@_jax.jit
def _sum1(x):
    return _jnp.sum(x, dtype=_jnp.float32)


def bench(fn, *args):
    """min wall ms over 5; materializes a device-side scalar reduction to
    host (block_until_ready has been observed returning early under the
    remote-TPU backend, bench_lib.py; fetching the full output would time
    the tunnel, not the compute)."""
    import numpy as np
    np.asarray(_sum1(fn(*args)))  # compile + sync
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(_sum1(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ocrjax.config import OcrConfig
    from ocrjax.models.db import create_db
    from ocrjax.postprocess import db_boxes
    from ocrjax import preprocess

    T = 2048
    n = args.tiles
    rng = np.random.RandomState(0)
    gray = (rng.rand(n, T, T) * 255).astype(np.uint8)

    for hs in (1, 2, 4):
        cfg = OcrConfig(det_head_stride=hs)
        model = create_db(cfg)
        variables = model.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, T, T, 3), jnp.float32))
        tcfg = cfg.replace(det_max_candidates=cfg.tile_max_candidates)

        @jax.jit
        def prob_fn(v, g):
            x = preprocess.det_normalize_gray(g, cfg.det_mean, cfg.det_std)
            return model.apply(v, x)["prob"]

        @jax.jit
        def full_fn(v, g):
            x = preprocess.det_normalize_gray(g, cfg.det_mean, cfg.det_std)
            prob = model.apply(v, x)["prob"]
            from ocrjax.api_det import pack_det
            return pack_det(jax.vmap(
                lambda p: db_boxes.extract_boxes_from_config(p, tcfg))(prob))

        g_dev = jnp.asarray(gray)
        t_prob = bench(prob_fn, variables, g_dev)
        t_full = bench(full_fn, variables, g_dev)
        print(f"head_stride={hs}: prob {t_prob:7.1f} ms  "
              f"prob+boxes {t_full:7.1f} ms  "
              f"(boxes {t_full - t_prob:6.1f} ms)  [{n} tiles]",
              flush=True)


if __name__ == "__main__":
    main()
