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
