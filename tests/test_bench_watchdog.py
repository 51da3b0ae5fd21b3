"""bench.py watchdog: a dead/degraded TPU link must become a recorded
artifact, not an indefinite driver hang (observed 2026-08-17: a dead axon
tunnel blocks jax backend init forever)."""

import json
import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> subprocess.CompletedProcess:
    return subprocess.run([sys.executable, "-c", textwrap.dedent(code)],
                          capture_output=True, text=True, cwd=REPO,
                          timeout=60)


def test_watchdog_partial_windows_records_best():
    p = _run("""
        import threading, time
        import bench
        bench._progress["windows"] = [31.2, 44.8]
        bench._progress["partial"] = {"crops_per_sec": 6100.0}
        threading.Thread(target=bench._watchdog, args=(3.0,),
                         daemon=True).start()
        time.sleep(30)  # simulated hang; watchdog must os._exit first
    """)
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    assert p.returncode == 0
    assert rec["value"] == 44.8
    assert rec["windows"] == [31.2, 44.8]
    assert rec["crops_per_sec"] == 6100.0
    assert "error" in rec


def test_watchdog_dead_link_records_error():
    p = _run("""
        import threading, time
        import bench
        threading.Thread(target=bench._watchdog, args=(3.0,),
                         daemon=True).start()
        time.sleep(30)
    """)
    rec = json.loads(p.stdout.strip().splitlines()[-1])
    assert p.returncode == 3
    assert rec["value"] == 0.0
    assert "unreachable" in rec["error"]
    # degraded-link records carry the last healthy hardware run as context
    # (docs/bench_runs/ snapshots are committed) — never as the headline
    assert rec["prior_hardware_run"]["pages_per_sec"] > 0
    assert rec["prior_hardware_run"]["device"]


def test_watchdog_exits_quietly_when_done():
    p = _run("""
        import threading, time
        import bench
        bench._progress["done"] = True
        t = threading.Thread(target=bench._watchdog, args=(3.0,),
                             daemon=True)
        t.start(); t.join(timeout=30)
        assert not t.is_alive()
        print("clean")
    """)
    assert p.returncode == 0
    assert p.stdout.strip().splitlines()[-1] == "clean"
