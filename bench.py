#!/usr/bin/env python
"""Driver benchmark entry: ONE JSON line with the headline metric.

Headline = end-to-end pages/sec/chip (BASELINE.json target: ≥50 on v5e);
the full report (crops/sec, p50 latency, ...) goes to BENCH_DETAIL.json.
Runs on the default jax platform (the real TPU under the driver env).
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_PAGES_PER_SEC = 50.0

# Live progress shared with the watchdog: run_bench appends each measured
# e2e window here and stashes partial metrics, so a link death mid-run
# still records every real measurement taken before it.
_progress = {"windows": [], "partial": {}, "done": False}


def _prior_hardware_run():
    """Compact summary of the most recent completed hardware run, if any
    (BENCH_DETAIL.json from this checkout, else the newest committed
    snapshot under docs/bench_runs/). Attached to degraded-link records so
    a dead tunnel at bench time doesn't erase what the hardware measured
    when the link was alive. Context only — never the headline value."""
    import glob
    here = os.path.dirname(os.path.abspath(__file__))
    cands = [os.path.join(here, "BENCH_DETAIL.json")] + sorted(
        glob.glob(os.path.join(here, "docs", "bench_runs", "*.json")),
        reverse=True)
    for p in cands:
        try:
            with open(p) as f:
                d = json.load(f)
            return {
                "file": os.path.relpath(p, here),
                "mtime": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime(os.path.getmtime(p))),
                "device": d.get("device"),
                "pages_per_sec": round(d.get("pages_per_sec", 0.0), 1),
                "pages_per_sec_median": round(
                    d.get("pages_per_sec_median", 0.0), 1),
                "pages_per_sec_device": round(
                    d.get("pages_per_sec_device", 0.0), 1),
                "crops_per_sec": round(d.get("crops_per_sec", 0.0), 0),
            }
        except Exception:
            continue
    return None


def _watchdog(deadline_s: float):
    """The axon TPU tunnel can die outright, blocking jax backend init (and
    any device sync) FOREVER — observed 2026-08-17: jax.devices() never
    returns. Under the driver that turns the round's bench into an
    indefinite hang with no artifact. Past the deadline this prints the
    honest best-of-partial JSON (real windows only) or an explicit error
    record, then hard-exits — a dead link becomes data, not a hang."""
    deadline = time.time() + deadline_s
    while time.time() < deadline:
        time.sleep(5)
        if _progress["done"]:
            return
    if _progress["windows"]:
        value = max(_progress["windows"])
        rec = {
            "metric": "pages_per_sec_per_chip_e2e_peak_sustained",
            "value": round(value, 2),
            "unit": "pages/s",
            "vs_baseline": round(value / BASELINE_PAGES_PER_SEC, 3),
            "windows": [round(v, 1) for v in _progress["windows"]],
            "error": "bench deadline hit (TPU link degraded mid-run); "
                     "value = best completed window",
        }
        rec.update(_progress["partial"])
        prior = _prior_hardware_run()
        if prior:
            rec["prior_hardware_run"] = prior
        print(json.dumps(rec), flush=True)
        os._exit(0)
    rec = {
        "metric": "pages_per_sec_per_chip_e2e_peak_sustained",
        "value": 0.0, "unit": "pages/s", "vs_baseline": 0.0,
        "error": "TPU tunnel unreachable: jax backend init / first window "
                 "did not complete within the deadline",
    }
    prior = _prior_hardware_run()
    if prior:
        rec["prior_hardware_run"] = prior
    print(json.dumps(rec), flush=True)
    os._exit(3)


def main():
    threading.Thread(
        target=_watchdog,
        args=(float(os.environ.get("OCRJAX_BENCH_DEADLINE_S", 1800.0)),),
        daemon=True).start()
    import jax
    # persistent compile cache: repeated driver runs skip the (minutes-long)
    # remote XLA compiles of the detection graph
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ocrjax.bench_lib import run_bench

    # 96 pages = 6 pipelined fused chunks: sustained-throughput regime where
    # chunk k+1's upload overlaps chunk k's compute (see fused.ocr_pages_fused;
    # measured 89/85/98 pages/s at 48/64/96 — deeper pipelines amortize the
    # fixed per-batch link costs better)
    report = run_bench(pages=96, lines=256, repeats=3, progress=_progress)
    _progress["done"] = True
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json")
    with open(detail_path, "w") as f:
        json.dump(report, f, indent=2)

    value = report["pages_per_sec_median"]
    print(json.dumps({
        # headline = MEDIAN full-batch window (VERDICT r2 #9: the number a
        # reader compares against the ≥50 target should be the typical
        # window, not the best one). Peak-sustained and the raw windows are
        # recorded alongside; protocol note: the host<->TPU tunnel here has
        # multi-minute congestion episodes swinging link-bound throughput
        # ~10-50x for identical code, and pages_per_sec_device is the
        # congestion-free compute ceiling of the same program.
        "metric": "pages_per_sec_per_chip_e2e_median",
        "value": round(value, 2),
        "unit": "pages/s",
        "vs_baseline": round(value / BASELINE_PAGES_PER_SEC, 3),
        "peak_pages_per_sec": round(report["pages_per_sec"], 1),
        "device_pages_per_sec": round(report["pages_per_sec_device"], 1),
        "fused_windows": report["pages_per_sec_fused_windows"],
        "bucketed_windows": report["pages_per_sec_bucketed_windows"],
        "p50_page_latency_ms": round(report["p50_page_latency_ms"], 1),
        "crops_per_sec": round(report["crops_per_sec"], 0),
        "dense_pages_per_sec": round(report.get("dense_pages_per_sec", 0.0),
                                     2),
        "dense_lines_per_sec": round(report.get("dense_lines_per_sec", 0.0),
                                     0),
        "dense_pages_per_sec_device": round(
            report.get("dense_pages_per_sec_device", 0.0), 2),
        # measured tunnel state at run start — read every link-bound
        # number above against it (healthy ≈ 25 ms RTT / 50+ MB/s;
        # congested episodes reach 40+ ms / <20 MB/s)
        "link_probe": report.get("link_probe", {}),
    }))


if __name__ == "__main__":
    main()
