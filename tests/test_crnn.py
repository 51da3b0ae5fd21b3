"""CRNN model shape/masking tests (tiny config, CPU jax)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrjax.config import TINY
from ocrjax.models.crnn import CRNN, create_crnn, WIDTH_STRIDE


@pytest.fixture(scope="module")
def model_and_vars():
    model = create_crnn(TINY, num_classes=12)
    x = jnp.zeros((2, 32, 64, 1), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_output_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((3, 32, 128, 1), jnp.float32)
    logits, frame_lengths = model.apply(variables, x)
    assert logits.shape == (3, 128 // WIDTH_STRIDE, 12)
    assert logits.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(frame_lengths), [32, 32, 32])


def test_frame_lengths_from_widths(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((3, 32, 64, 1), jnp.float32)
    widths = jnp.array([64, 30, 1])
    _, fl = model.apply(variables, x, widths)
    # ceil(w / 4), clipped to T=16
    np.testing.assert_array_equal(np.asarray(fl), [16, 8, 1])


def test_wrong_height_raises(model_and_vars):
    model, variables = model_and_vars
    with pytest.raises(ValueError):
        model.apply(variables, jnp.zeros((1, 48, 64, 1)))


def test_batch_stats_exist_and_train_mode_runs(model_and_vars):
    model, variables = model_and_vars
    assert "batch_stats" in variables
    x = jnp.ones((2, 32, 64, 1), jnp.float32)
    (logits, _), updates = model.apply(
        variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in updates
    assert np.all(np.isfinite(np.asarray(logits)))


def test_deterministic(model_and_vars):
    model, variables = model_and_vars
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 64, 1), jnp.float32)
    a = model.apply(variables, x)[0]
    b = model.apply(variables, x)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_padding_doesnt_change_valid_frame_count(model_and_vars):
    """Same strip in a wider bucket keeps its frame_lengths; logits on early
    valid frames (outside conv bleed of the pad boundary) stay close."""
    model, variables = model_and_vars
    rng = np.random.RandomState(1)
    strip = rng.rand(1, 32, 64, 1).astype(np.float32)
    pad = np.zeros((1, 32, 64, 1), np.float32)
    wide = np.concatenate([strip, pad], axis=2)
    l64, fl64 = model.apply(variables, jnp.asarray(strip), jnp.array([64]))
    l128, fl128 = model.apply(variables, jnp.asarray(wide), jnp.array([64]))
    assert int(fl64[0]) == int(fl128[0]) == 16
    # frames 0..11 have receptive fields fully inside the valid region
    np.testing.assert_allclose(
        np.asarray(l64)[0, :12], np.asarray(l128)[0, :12], atol=2e-2)
