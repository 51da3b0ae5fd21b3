"""Pallas fused conv kernel: interpret-mode vs pure-jax reference
(SURVEY.md §4.2 'Pallas kernels ... interpret=True test')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ocrjax.ops.pallas.conv_fused import (conv3x3_bn_relu, conv_bn_relu_xla,
                                          fuse_bn, _pick_tile_h)


@pytest.mark.parametrize("shape", [
    (1, 16, 16, 8, 16),    # B, H, W, Cin, Cout
    (2, 8, 24, 16, 8),
])
def test_interpret_matches_xla(shape):
    B, H, W, Cin, Cout = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, Cin, Cout).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.rand(Cout).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1)

    want = np.asarray(conv_bn_relu_xla(x, w, scale, bias))
    got = np.asarray(conv3x3_bn_relu(x, w, scale, bias, interpret=True,
                                     force_pallas=True))
    # kernel computes in bf16 inputs/f32 acc — tolerance accordingly
    np.testing.assert_allclose(got, want, atol=0.15, rtol=0.05)
    # ReLU actually applied
    assert got.min() >= 0.0


def test_fuse_bn_matches_batchnorm():
    rng = np.random.RandomState(1)
    C = 8
    gamma = rng.rand(C).astype(np.float32) + 0.5
    beta = rng.randn(C).astype(np.float32)
    mean = rng.randn(C).astype(np.float32)
    var = rng.rand(C).astype(np.float32) + 0.1
    x = rng.randn(4, C).astype(np.float32)
    scale, bias = fuse_bn(jnp.asarray(gamma), jnp.asarray(beta),
                          jnp.asarray(mean), jnp.asarray(var))
    got = x * np.asarray(scale) + np.asarray(bias)
    want = gamma * (x - mean) / np.sqrt(var + 1e-5) + beta
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tile_picker():
    assert _pick_tile_h(64, 64, 64, 64) in (32, 16, 8, 4, 2, 1)
    # giant channels at giant width must not claim to fit
    assert _pick_tile_h(7, 4096, 1024, 1024) == 0


def test_fallback_path_runs():
    # shapes that don't fit (or odd H) silently use the XLA path
    x = jnp.zeros((1, 7, 4096, 1024), jnp.float32)
    # don't actually run the huge conv — just check routing logic via tile
    assert _pick_tile_h(7, 4096, 1024, 1024) == 0
