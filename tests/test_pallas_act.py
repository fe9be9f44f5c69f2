"""Pallas fused bias-act kernel parity tests (interpret mode on CPU;
compiled on TPU). Oracle: the XLA composition in ops/fused_act.py."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.ops.fused_act import fused_leaky_relu
from maua_tpu.ops.pallas_act import fused_leaky_relu_pallas


@pytest.mark.parametrize("shape", [(2, 8, 4, 4), (2, 16, 16, 16), (3, 130)])
def test_pallas_forward_parity(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    nc = shape[1] if len(shape) >= 3 else shape[-1]
    b = jnp.asarray(rng.randn(nc).astype(np.float32))
    got = fused_leaky_relu_pallas(x, b, interpret=True)
    want = fused_leaky_relu(x, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_pallas_first_order_grad_parity():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(8).astype(np.float32))

    def f_pallas(x, b):
        return jnp.sum(fused_leaky_relu_pallas(x, b, 0.2, math.sqrt(2.0), True) ** 2)

    def f_xla(x, b):
        return jnp.sum(fused_leaky_relu(x, b) ** 2)

    gx_p, gb_p = jax.grad(f_pallas, argnums=(0, 1))(x, b)
    gx_x, gb_x = jax.grad(f_xla, argnums=(0, 1))(x, b)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_x), rtol=1e-5, atol=1e-5)


def test_pallas_second_order_grad_parity():
    """The R1 pattern: grad of grad-norm must match the XLA composition
    (reference opcode grad=2 semantics, op/fused_bias_act_kernel.cu:42-44)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 4, 4).astype(np.float32))
    b = jnp.zeros(8)

    def gn(impl):
        def f(x):
            y = impl(x)
            return jnp.sum(y**2)

        return lambda x: jnp.sum(jax.grad(f)(x) ** 2)

    p = jax.grad(gn(lambda x: fused_leaky_relu_pallas(x, b, 0.2, math.sqrt(2.0), True)))(x)
    w = jax.grad(gn(lambda x: fused_leaky_relu(x, b)))(x)
    np.testing.assert_allclose(np.asarray(p), np.asarray(w), rtol=1e-5, atol=1e-5)
