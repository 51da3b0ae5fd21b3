"""Bucketing unit tests (C4 plumbing; end-to-end C4 lives in test_configs)."""

import numpy as np

from ocrjax.bucketing import assign_width_buckets, pad_count
from ocrjax.config import TINY


def test_assign_width_buckets():
    widths = np.array([30, 64, 65, 300])
    groups = assign_width_buckets(widths, (64, 128))
    assert set(groups) == {64, 128}
    assert list(groups[64]) == [0, 1]
    assert list(groups[128]) == [2, 3]  # 300 clipped into last bucket


def test_pad_count():
    assert pad_count(1, TINY) == 4
    assert pad_count(5, TINY) == 8
    assert pad_count(99, TINY) == 8  # clipped to largest bucket
