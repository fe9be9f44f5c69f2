"""Fused bias-add + scaled LeakyReLU.

The reference implements this as a CUDA kernel with an `act*10+grad` opcode
table so that first- and second-order gradients reuse the same kernel
(reference: op/fused_bias_act_kernel.cu:36-45, wrapper op/fused_act.py:20-97).
On TPU the same fusion is an XLA epilogue: expressing the op as plain jnp lets
the compiler fuse it into the producing convolution / matmul, and JAX
differentiates it to arbitrary order for free — which is exactly what the R1
and path-length double-backward passes need (reference: train.py:71-102).

A Pallas variant that fuses bias + noise-injection + leaky-relu in one VMEM
pass lives in ops/pallas/; this module is the canonical, everywhere-correct
definition the Pallas kernel is parity-tested against.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["fused_leaky_relu", "leaky_relu_gain"]


def leaky_relu_gain() -> float:
    """The sqrt(2) variance-preserving gain applied after leaky-relu
    (reference: op/fused_act.py:74, scale=2**0.5)."""
    return math.sqrt(2.0)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jnp.ndarray:
    """scale * leaky_relu(x + bias).

    Bias is broadcast over the channel axis: axis 1 for >=3-D activations
    (NCHW convs), last axis for 2-D (linear layers) — matching the reference's
    reshape rule (op/fused_act.py:82-86).
    """
    if bias is not None:
        if x.ndim >= 3:
            shape = (1, -1) + (1,) * (x.ndim - 2)
        else:
            shape = (1,) * (x.ndim - 1) + (-1,)
        x = x + bias.reshape(shape).astype(x.dtype)
    return jnp.where(x >= 0, x, x * negative_slope) * jnp.asarray(scale, x.dtype)
