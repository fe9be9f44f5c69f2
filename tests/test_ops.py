"""Parity tests for the L1 ops against independent numpy oracles.

The reference encodes op semantics in its CPU fallbacks
(reference: op/upfirdn2d.py:159-200, op/fused_act.py:87-94); here the oracle is
an independent numpy implementation of the same textbook definition."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.ops import fused_leaky_relu, setup_filter, upfirdn2d, upfirdn2d_native

MODES = [
    # (up, down, pad, kernel_size) — the six specialized CUDA modes
    # (reference: op/upfirdn2d_kernel.cu:250-290) plus generic odd cases.
    (1, 1, (0, 0), 4),
    (1, 1, (1, 1), 4),
    (2, 1, (1, 1), 4),
    (2, 1, (2, 1), 4),
    (1, 2, (1, 1), 4),
    (1, 2, (0, 0), 4),
    (2, 1, (2, 2), 3),
    (1, 2, (2, 2), 3),
    (1, 1, (2, 2), 5),
    (2, 2, (1, 1), 4),
    (1, 1, (-1, 1), 4),  # negative pad = crop
    (3, 1, (2, 2), 6),
    (1, 3, (2, 2), 6),
]


@pytest.mark.parametrize("up,down,pad,ks", MODES)
def test_upfirdn2d_matches_oracle(up, down, pad, ks):
    rng = np.random.RandomState(hash((up, down, pad, ks)) % 2**31)
    x = rng.randn(2, 3, 13, 11).astype(np.float32)
    k = rng.randn(ks, ks).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad))
    want = upfirdn2d_native(x, k, up=up, down=down, pad=pad)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_output_size_formula():
    x = jnp.ones((1, 1, 16, 16))
    k = jnp.ones((4, 4)) / 16.0
    out = upfirdn2d(x, k, up=2, down=1, pad=(2, 1))
    # (16*2 + 2 + 1 - 4)//1 + 1 = 32
    assert out.shape == (1, 1, 32, 32)
    out = upfirdn2d(x, k, up=1, down=2, pad=(1, 1))
    # (16 + 2 - 4)//2 + 1 = 8
    assert out.shape == (1, 1, 8, 8)


def test_upfirdn2d_first_and_second_order_grads():
    """R1 / path-length need double-backward through the resampler
    (reference: train.py:71-102); XLA autodiff must deliver it."""
    k = setup_filter([1, 3, 3, 1])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8))

    def f(x):
        return jnp.sum(upfirdn2d(x, k, up=2, down=1, pad=(2, 1)) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape and bool(jnp.all(jnp.isfinite(g)))

    # second order: grad of grad-norm (the R1 pattern)
    def gn(x):
        return jnp.sum(jax.grad(f)(x) ** 2)

    g2 = jax.grad(gn)(x)
    assert g2.shape == x.shape and bool(jnp.all(jnp.isfinite(g2)))

    # finite-difference check of the first-order grad
    eps = 1e-3
    d = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    fd = (f(x + eps * d) - f(x - eps * d)) / (2 * eps)
    # fp32 central differences carry ~1e-3 relative noise at these magnitudes
    np.testing.assert_allclose(float(jnp.vdot(g, d)), float(fd), rtol=1e-2, atol=1e-2)


def test_setup_filter_separable_and_normalized():
    k = setup_filter([1, 3, 3, 1])
    assert k.shape == (4, 4)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-6)
    k4 = setup_filter([1, 3, 3, 1], gain=4.0)
    np.testing.assert_allclose(float(jnp.sum(k4)), 4.0, rtol=1e-6)


def test_fused_leaky_relu_formula_and_broadcast():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 4, 4).astype(np.float32))
    b = jnp.asarray(np.arange(5, dtype=np.float32))
    got = fused_leaky_relu(x, b)
    xb = np.asarray(x) + np.arange(5, dtype=np.float32).reshape(1, 5, 1, 1)
    want = np.where(xb >= 0, xb, 0.2 * xb) * math.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)

    # 2-D (linear) layout broadcasts along the last axis (op/fused_act.py:82-86)
    x2 = jnp.asarray(np.random.RandomState(1).randn(3, 5).astype(np.float32))
    got2 = fused_leaky_relu(x2, b)
    xb2 = np.asarray(x2) + np.arange(5, dtype=np.float32)
    want2 = np.where(xb2 >= 0, xb2, 0.2 * xb2) * math.sqrt(2.0)
    np.testing.assert_allclose(np.asarray(got2), want2, rtol=1e-6, atol=1e-6)


def test_fused_leaky_relu_second_order_grad():
    b = jnp.zeros((3,))

    def f(x):
        return jnp.sum(fused_leaky_relu(x, b) ** 2)

    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3))
    g2 = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(g2)))
