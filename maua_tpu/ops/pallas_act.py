"""Pallas TPU kernel: fused bias-add + scaled leaky-relu with a
double-differentiable custom VJP.

This is the TPU-native counterpart of the reference's CUDA kernel
(reference: op/fused_bias_act_kernel.cu:36-45, op/fused_act.py:20-71): one
VMEM pass computes y = scale·lrelu(x + b); the backward kernel recomputes the
gate from the SAVED OUTPUT's sign (y ≥ 0 ⇔ x + b ≥ 0, the same trick the
reference encodes as opcode grad=1), and the second-order rule is the gate
applied to the incoming tangent with zero curvature (opcode grad=2 → 0).

The plain-XLA composition in ops/fused_act.py remains the canonical
definition (XLA fuses it into the producing conv anyway); this kernel is the
explicit-kernel path — parity-tested against the XLA form, selectable via
`fused_leaky_relu(..., impl="pallas")` and usable as a template for further
Pallas work. Layout: inputs flatten to [rows, cols]; rows pad to the 8-sublane
tile, cols to 128 lanes (fp32 tiling).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _pallas_modules():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def _act_kernel(x_ref, b_ref, y_ref, *, negative_slope, scale):
    xb = x_ref[:] + b_ref[:]
    y_ref[:] = jnp.where(xb >= 0, xb, xb * negative_slope) * scale


def _grad_kernel(dy_ref, y_ref, dx_ref, *, negative_slope, scale):
    # gate from the sign of the saved output (op/fused_bias_act_kernel.cu:42)
    gate = jnp.where(y_ref[:] >= 0, 1.0, negative_slope) * scale
    dx_ref[:] = dy_ref[:] * gate


def _pad2d(a: Array, rows: int, cols: int) -> Array:
    return jnp.pad(a, ((0, rows - a.shape[0]), (0, cols - a.shape[1])))


def _run_ew_kernel(kernel, out_dtype, *inputs, interpret=False, **kw):
    """Run an elementwise 2-D kernel over aligned row/col blocks."""
    pl, pltpu = _pallas_modules()
    r, c = inputs[0].shape
    rp = -(-r // 8) * 8
    cp = -(-c // 128) * 128
    padded = [_pad2d(a, rp, cp) for a in inputs]
    blk_r = min(rp, 256)
    blk_c = min(cp, 1024)
    grid = (rp // blk_r, cp // blk_c)
    out = pl.pallas_call(
        partial(kernel, **kw),
        out_shape=jax.ShapeDtypeStruct((rp, cp), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((blk_r, blk_c), lambda i, j: (i, j), memory_space=pltpu.VMEM)
            for _ in padded
        ],
        out_specs=pl.BlockSpec((blk_r, blk_c), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*padded)
    return out[:r, :c]


def _to_2d_with_bias(x: Array, bias: Array | None):
    """Flatten to [rows, cols] with a matching broadcast bias plane."""
    if x.ndim >= 3:  # NCHW...: channel axis 1
        n, c = x.shape[0], x.shape[1]
        spatial = int(np.prod(x.shape[2:]))
        x2 = x.reshape(n * c, spatial)
        b_row = jnp.tile(bias, n) if bias is not None else jnp.zeros(n * c, x.dtype)
        b2 = jnp.broadcast_to(b_row[:, None], x2.shape).astype(x.dtype)
    else:
        lead = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
        x2 = x.reshape(lead, x.shape[-1])
        b_vec = bias if bias is not None else jnp.zeros(x.shape[-1], x.dtype)
        b2 = jnp.broadcast_to(b_vec[None, :], x2.shape).astype(x.dtype)
    return x2, b2


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_leaky_relu_pallas(
    x: Array,
    bias: Array | None = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    interpret: bool = False,
) -> Array:
    """scale * leaky_relu(x + bias) as an explicit Pallas kernel."""
    x2, b2 = _to_2d_with_bias(x, bias)
    y = _run_ew_kernel(
        _act_kernel, x2.dtype, x2, b2,
        negative_slope=negative_slope, scale=scale, interpret=interpret,
    )
    return y.reshape(x.shape)


def _flr_fwd(x, bias, negative_slope, scale, interpret):
    y = fused_leaky_relu_pallas(x, bias, negative_slope, scale, interpret)
    return y, (y, None if bias is None else bias.shape, x.shape)


def _grad_from_y(dy: Array, y: Array, negative_slope, scale, interpret) -> Array:
    dy2 = dy.reshape(-1, dy.shape[-1]) if dy.ndim <= 2 else dy.reshape(dy.shape[0] * dy.shape[1], -1)
    y2 = y.reshape(dy2.shape)
    dx = _run_ew_kernel(
        _grad_kernel, dy2.dtype, dy2, y2,
        negative_slope=negative_slope, scale=scale, interpret=interpret,
    )
    return dx.reshape(dy.shape)


def _flr_bwd(negative_slope, scale, interpret, res, dy):
    y, bias_shape, x_shape = res
    dx = _second_order_grad(dy, y, negative_slope, scale, interpret)
    if bias_shape is None:
        db = None
    else:
        # bias gradient: sum dx over all axes except the channel axis
        if len(x_shape) >= 3:
            axes = (0,) + tuple(range(2, len(x_shape)))
        else:
            axes = tuple(range(len(x_shape) - 1))
        db = jnp.sum(dx, axis=axes)
    return (dx, db)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _second_order_grad(dy, y, negative_slope, scale, interpret):
    """dx = dy * gate(y) — itself differentiable: d(dx)/d(dy) = gate(y),
    d(dx)/dy = 0 a.e. (the reference's grad=2 → opcode 0 rule,
    op/fused_bias_act_kernel.cu:43-44)."""
    return _grad_from_y(dy, y, negative_slope, scale, interpret)


def _so_fwd(dy, y, negative_slope, scale, interpret):
    return _grad_from_y(dy, y, negative_slope, scale, interpret), y


def _so_bwd(negative_slope, scale, interpret, y, ddx):
    d_dy = _grad_from_y(ddx, y, negative_slope, scale, interpret)
    return (d_dy, jnp.zeros_like(y))


_second_order_grad.defvjp(_so_fwd, _so_bwd)
fused_leaky_relu_pallas.defvjp(_flr_fwd, _flr_bwd)
