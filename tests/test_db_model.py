"""DB detector model tests (tiny dims, CPU jax)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrjax.models.db import DBDetector


@pytest.fixture(scope="module")
def tiny_db():
    model = DBDetector(channels=(8, 16, 24, 32), inner=16,
                       blocks_per_stage=1, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_prob_map_shape_and_range(tiny_db):
    model, variables = tiny_db
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
    out = model.apply(variables, x)
    assert set(out) == {"prob"}
    assert out["prob"].shape == (2, 64, 64)
    p = np.asarray(out["prob"])
    assert p.min() >= 0.0 and p.max() <= 1.0
    assert out["prob"].dtype == jnp.float32


def test_train_mode_heads(tiny_db):
    model, variables = tiny_db
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    out, updates = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    assert set(out) == {"prob", "thresh", "binary"}
    for k in out:
        assert out[k].shape == (1, 64, 64), k
    b = np.asarray(out["binary"])
    assert np.all((b >= 0) & (b <= 1))


def test_input_size_flexible(tiny_db):
    # the canvas is fixed in the pipeline, but the model itself must accept
    # any multiple-of-32 square (tiling path uses a different size)
    model, variables = tiny_db
    out = model.apply(variables, jnp.zeros((1, 96, 96, 3)))
    assert out["prob"].shape == (1, 96, 96)


def test_deterministic(tiny_db):
    model, variables = tiny_db
    x = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    a = np.asarray(model.apply(variables, x)["prob"])
    b = np.asarray(model.apply(variables, x)["prob"])
    np.testing.assert_array_equal(a, b)
