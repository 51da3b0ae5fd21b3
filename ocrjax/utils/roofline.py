"""MFU / roofline accounting (SURVEY.md §6 metrics; VERDICT r3 missing #5:
"is it actually fast" was only answered relative to the ≥50 pages/s target,
not relative to the hardware).

FLOP counts come from XLA's own cost model on the LOWERED production
programs (`jax.stages.Lowered.cost_analysis()` — no second compile), so
they reflect what the compiler actually emits (fusions included) rather
than a hand napkin. Peak is the public TPU v5e spec: 197 bf16 TFLOP/s per
chip (394 int8 TOPS). The BiLSTM share is computed analytically (the scan
is one HLO while-loop; its matmul FLOPs are derived from the cell sizes)
so the bench can name the top compute sink inside the recognizer.
"""

from __future__ import annotations

import jax

V5E_BF16_PEAK_TFLOPS = 197.0


def xla_flops(fn, *args) -> float:
    """XLA cost-model FLOPs of `fn` at the given example args. Prefers the
    lowered (pre-compile) analysis; the axon/TPU backend returns None
    there (measured), so it falls back to compiling — the programs asked
    about are the bench's own already-compiled programs, so the extra
    compile hits the persistent cache when one is configured. Returns nan
    if neither path offers a count."""
    try:
        lo = jax.jit(fn).lower(*args)
        ca = lo.cost_analysis()
        if ca is None:
            ca = lo.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca is None:
            return float("nan")
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def crnn_bilstm_flops(cfg, n: int, width: int) -> float:
    """Analytic matmul FLOPs of the 2-layer BiLSTM over one batch.

    The conv stack collapses H and downsamples W by 4 (models/crnn.py), so
    the scan runs T = width/4 steps. Per direction and step, a flax
    OptimizedLSTMCell computes 8 gate matmuls: 4x (in → H) + 4x (H → H),
    2 FLOPs per MAC. Layer 1 input = last conv width; layer 2 input = 2H
    (the concatenated bidirectional output of layer 1)."""
    T = max(width // 4, 1)
    H = cfg.rec_hidden
    in1 = cfg.rec_conv_channels[-1]
    in2 = 2 * H
    # per direction, per step, both layers; inner 2 = FLOPs per MAC
    per_step = 4 * 2 * (in1 * H + H * H) + 4 * 2 * (in2 * H + H * H)
    return float(2 * T * n * per_step)  # leading 2 = directions


def stage_entry(name: str, flops: float, seconds: float) -> dict:
    """One roofline row: achieved TFLOP/s + % of the v5e bf16 peak."""
    tf = flops / max(seconds, 1e-9) / 1e12
    return {
        "stage": name,
        "gflops": round(flops / 1e9, 2),
        "ms": round(seconds * 1e3, 2),
        "achieved_tflops": round(tf, 2),
        "pct_of_bf16_peak": round(100.0 * tf / V5E_BF16_PEAK_TFLOPS, 2),
    }
