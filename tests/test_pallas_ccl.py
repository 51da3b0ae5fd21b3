"""Pallas CCL kernel: interpret-mode parity vs the XLA implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from ocrjax.ops.pallas.cc_label import label_components_pallas
from ocrjax.postprocess.db_boxes import label_components


def _partition_equal(a, b, fg):
    """Same partition of fg pixels (label ids may differ)."""
    pa = a[fg]
    pb = b[fg]
    return len(set(zip(pa.tolist(), pb.tolist()))) == len(set(pa.tolist())) \
        == len(set(pb.tolist()))


@pytest.mark.parametrize("seed", range(3))
def test_interpret_matches_xla_random(seed):
    rng = np.random.RandomState(seed)
    bm = rng.rand(48, 64) > 0.72
    got = np.asarray(label_components_pallas(
        jnp.asarray(bm), n_iters=6, interpret=True))
    want = np.asarray(label_components(jnp.asarray(bm), 6))
    np.testing.assert_array_equal(got, want)


def test_interpret_rects_and_snake():
    bm = np.zeros((64, 64), bool)
    bm[2, 2:60] = True
    bm[2:40, 59] = True
    bm[39, 4:60] = True          # S-snake: one component
    bm[50:60, 5:25] = True       # separate rect
    bm[10, 10] = False           # hole in nothing
    got = np.asarray(label_components_pallas(
        jnp.asarray(bm), n_iters=4, interpret=True))
    assert len(np.unique(got[bm])) == 2
    assert (got[~bm] >= 2 ** 30).all()


def test_batched(seed=7):
    rng = np.random.RandomState(seed)
    bm = rng.rand(2, 32, 32) > 0.7
    got = np.asarray(label_components_pallas(
        jnp.asarray(bm), n_iters=6, interpret=True))
    for b in range(2):
        want = np.asarray(label_components(jnp.asarray(bm[b]), 6))
        np.testing.assert_array_equal(got[b], want, err_msg=str(b))
