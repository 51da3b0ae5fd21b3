"""Frozen-golden regression suite (SURVEY.md §4.2 "Golden parity (b)").

assets/goldens/goldens.json pins the production pipeline's EXACT outputs
(boxes + strings) for a fixed seed set; this suite re-runs the same inputs
and diffs. Unlike the aggregate quality gates (test_tpu, e2e_eval), any
silent behavior drift — a changed box by 1px, one character, a reordered
line — fails here with a message naming the stage. Regenerate deliberately
with scripts/freeze_goldens.py after intentional changes.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # module-scoped full-pipeline golden fixtures

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "assets", "goldens", "goldens.json")


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def engine(goldens):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.freeze_goldens import build_engine
    eng = build_engine()
    assert eng.config.upload_bits == goldens["config"]["upload_bits"], \
        "config drift: upload_bits differs from the frozen goldens'"
    return eng


@pytest.fixture(scope="module")
def current(engine):
    from scripts.freeze_goldens import run_cases
    return run_cases(engine)


def _diff_boxes(kind, seed, got, want):
    got = np.asarray(got, np.float64).reshape(-1, 4, 2) \
        if len(got) else np.zeros((0, 4, 2))
    want = np.asarray(want, np.float64).reshape(-1, 4, 2) \
        if len(want) else np.zeros((0, 4, 2))
    assert got.shape == want.shape, (
        f"{kind} drift (page seed {seed}): box COUNT "
        f"{got.shape[0]} != golden {want.shape[0]}")
    if len(got):
        d = np.abs(got - want).max()
        assert d <= 0.011, (
            f"{kind} drift (page seed {seed}): box coords moved "
            f"{d:.3f}px vs golden")


def _check_pages(kind, got_pages, want_pages):
    for got, want in zip(got_pages, want_pages):
        seed = want["seed"]
        assert got["seed"] == seed
        _diff_boxes(f"detection[{kind}]", seed,
                    got["det_boxes"], want["det_boxes"])
        assert got["det_scores"] == pytest.approx(
            want["det_scores"], abs=2e-3), (
            f"detection[{kind}] drift (seed {seed}): scores changed")
        assert got["strings"] == want["strings"], (
            f"recognition/decode[{kind}] drift (seed {seed}): strings or "
            f"reading order changed")
        _diff_boxes(f"e2e-boxes[{kind}]", seed, got["boxes"], want["boxes"])


def test_golden_pages(goldens, current):
    _check_pages("straight", current["pages"], goldens["pages"])


def test_golden_rotated_pages(goldens, current):
    """Rotated pages additionally pin the rotation-routing behavior."""
    _check_pages("rotated", current["rotated_pages"],
                 goldens["rotated_pages"])


def test_golden_strips(goldens, current):
    for got, want in zip(current["strips"], goldens["strips"]):
        assert got["greedy"] == want["greedy"], (
            f"recognition drift (strip seed {want['seed']}): "
            f"{got['greedy']!r} != golden {want['greedy']!r} "
            f"(gt {want['gt']!r})")


def test_golden_beam_strips(goldens, current):
    for got, want in zip(current["beam_strips"], goldens["beam_strips"]):
        assert got["greedy"] == want["greedy"], (
            f"recognition drift (beam strip seed {want['seed']})")
        assert got["beam"] == want["beam"], (
            f"beam-decode drift (strip seed {want['seed']}): "
            f"{got['beam']!r} != golden {want['beam']!r}")


# ---- Reroute-lane goldens (VERDICT r2 missing #4): one frozen case per
# routing path, so drift in any lane fails a test that NAMES the lane. ----

@pytest.fixture(scope="module")
def routed(goldens):
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.freeze_goldens import (build_flip_engine,
                                        build_tiled_engine,
                                        run_routed_cases)
    return run_routed_cases(build_tiled_engine(), build_flip_engine())


def _check_lane(lane, got, want):
    assert got["strings"] == want["strings"], (
        f"{lane} lane drift (seed {want['seed']}): strings or reading "
        f"order changed")
    _diff_boxes(lane, want["seed"], got["boxes"], want["boxes"])


def test_golden_tiled_page(goldens, routed):
    want = goldens["routed"]["tiled_page"]
    got = routed["tiled_page"]
    _diff_boxes("tiled-detection", want["seed"],
                got["det_boxes"], want["det_boxes"])
    _check_lane("tiled (C5 seam merge)", got, want)


def test_golden_dense_page(goldens, routed):
    want = goldens["routed"]["dense_page"]
    assert routed["dense_page"]["n_gt"] == want["n_gt"]
    _check_lane("dense tiled", routed["dense_page"], want)


def test_golden_flip_page(goldens, routed):
    _check_lane("try-flip 180°", routed["flip_page"],
                goldens["routed"]["flip_page"])


def test_golden_rot90_page(goldens, routed):
    _check_lane("rot90 landscape reroute", routed["rot90_page"],
                goldens["routed"]["rot90_page"])


def test_golden_color_page(goldens, routed):
    _check_lane("color (min-channel-luma) reroute", routed["color_page"],
                goldens["routed"]["color_page"])


def test_golden_inverted_page(goldens, routed):
    _check_lane("inverted-polarity canonicalization",
                routed["inverted_page"], goldens["routed"]["inverted_page"])
