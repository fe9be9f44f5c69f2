"""upfirdn2d — fused upsample → FIR filter → downsample, TPU-native.

This is the resampling primitive behind every blur / upsample / downsample in
StyleGAN2 and in ADA augmentation. The reference implements it as a CUDA kernel
(reference: op/upfirdn2d_kernel.cu, Python wrapper op/upfirdn2d.py:145) with a
hand-written double-differentiable autograd Function. Here it is expressed as a
single `lax.conv_general_dilated` with input dilation (zero-stuffed upsample),
asymmetric — possibly negative — padding, and output stride (downsample). XLA
lowers this directly onto the TPU convolution units, fuses neighbouring
element-wise work into it, and differentiates it to arbitrary order, so no
custom VJP is needed for R1 / path-length double-backward (reference needed
opcode-switched kernels for that, op/fused_bias_act_kernel.cu:36-45).

Semantics match the reference's CPU oracle `upfirdn2d_native`
(reference: op/upfirdn2d.py:159-200):

  1. zero-stuff:  insert (up-1) zeros between samples along H and W
  2. pad:         pad0 before / pad1 after on each spatial dim (negative crops)
  3. convolve:    2-D FIR convolution (true convolution, i.e. flipped kernel
                  correlation) with a kernel shared across N and C
  4. downsample:  keep every `down`-th sample

  out_size = (in_size * up + pad0 + pad1 - kernel_size) // down + 1
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["upfirdn2d", "upfirdn2d_native", "setup_filter"]



def _fir_precision(x):
    """Same fp32 precision policy as models/blocks.py:_conv_precision —
    HIGHEST by default, deferring to jax.default_matmul_precision when set."""
    if x.dtype == jnp.bfloat16:
        return None
    return lax.Precision.HIGHEST if jax.config.jax_default_matmul_precision is None else None

def setup_filter(f, normalize: bool = True, gain: float = 1.0) -> jnp.ndarray:
    """Build a 2-D FIR filter from a 1-D tap list (outer product) or 2-D array.

    Mirrors the `make_kernel` helper pattern (reference: models/stylegan2.py:94-103):
    1-D inputs are outer-producted into a separable 2-D kernel, then normalized
    to unit sum and scaled by `gain`.
    """
    f = jnp.asarray(f, dtype=jnp.float32)
    if f.ndim == 1:
        f = jnp.outer(f, f)
    if f.ndim != 2:
        raise ValueError(f"filter must be 1-D or 2-D, got ndim={f.ndim}")
    if normalize:
        f = f / jnp.sum(f)
    return f * gain


def _as_pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        if len(v) == 1:
            return (int(v[0]), int(v[0]))
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _as_pad(pad) -> tuple[int, int, int, int]:
    """Normalize pad to (pad_x0, pad_x1, pad_y0, pad_y1) — reference arg order
    is (pad0, pad1) applied to both axes (reference: op/upfirdn2d.py:145-156)."""
    if isinstance(pad, (tuple, list)):
        if len(pad) == 2:
            return (int(pad[0]), int(pad[1]), int(pad[0]), int(pad[1]))
        if len(pad) == 4:
            return tuple(int(p) for p in pad)  # type: ignore[return-value]
        raise ValueError(f"pad must have 2 or 4 elements, got {len(pad)}")
    return (int(pad),) * 4


@partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up=1, down=1, pad=(0, 0)) -> jnp.ndarray:
    """Upsample, FIR-filter, downsample a batch of 2-D maps.

    Args:
      x:      [N, C, H, W] input.
      kernel: [kh, kw] FIR filter, shared over N and C.
      up:     int or (up_y, up_x) integer upsampling factor.
      down:   int or (down_y, down_x) integer downsampling factor.
      pad:    (pad0, pad1) applied to both spatial dims, or
              (pad_x0, pad_x1, pad_y0, pad_y1). Negative values crop.

    Returns:
      [N, C, H_out, W_out] with
      H_out = (H*up_y + pad_y0 + pad_y1 - kh) // down_y + 1.
    """
    if x.ndim != 4:
        raise ValueError(f"expected [N, C, H, W] input, got shape {x.shape}")
    up_y, up_x = _as_pair(up)
    down_y, down_x = _as_pair(down)
    pad_x0, pad_x1, pad_y0, pad_y1 = _as_pad(pad)

    n, c, h, w = x.shape
    kh, kw = kernel.shape

    # True convolution == correlation with the flipped kernel. conv_general_dilated
    # performs correlation, so flip here once.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)[None, None]  # [1, 1, kh, kw]

    # Layout dispatch (measured, see CLAUDE.md):
    # * CPU: fold channels into the batch axis (the reference CUDA kernel's
    #   (N*C, 1, H, W) flattening, op/upfirdn2d.py:174) — XLA:CPU grouped
    #   convs (and especially their gradients) lower 6-10x slower.
    # * TPU: keep the channel axis and use feature_group_count — XLA:TPU
    #   handles depthwise natively, and the reshape otherwise materializes a
    #   lane-padded copy of the whole activation (4x HBM at low channel
    #   counts, seen in 1024² OOM traces).
    grouped = jax.default_backend() not in ("cpu",)
    if grouped:
        xr = x
        k = jnp.broadcast_to(k, (c, 1, kh, kw))
        fgc = c
    else:
        xr = x.reshape(n * c, 1, h, w)
        fgc = 1

    if pad_x0 >= 0 and pad_x1 >= 0 and pad_y0 >= 0 and pad_y1 >= 0:
        # Fast path: fold zero-stuffing into lhs_dilation so XLA lowers one
        # fused dilated conv. Padding is applied *after* lhs dilation, matching
        # the reference's pad-after-zero-stuff order (op/upfirdn2d.py:169-178).
        # lhs_dilation only inserts zeros *between* samples; zero-stuffing
        # appends up-1 trailing zeros too, so fold those into high-side pad.
        out = lax.conv_general_dilated(
            xr,
            k,
            window_strides=(down_y, down_x),
            padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
            lhs_dilation=(up_y, up_x),
            rhs_dilation=(1, 1),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=fgc,
            precision=_fir_precision(x),
        )
        return out if grouped else out.reshape(n, c, out.shape[2], out.shape[3])

    # Negative pads crop the zero-stuffed tensor BEFORE convolution; XLA's
    # negative conv padding has different semantics, so materialize the
    # stuff+pad step with lax.pad (interior dilation + negative edge pads in
    # one op, fused by XLA) and run a plain strided VALID conv.
    z = lax.pad(
        xr,
        jnp.asarray(0.0, x.dtype),
        (
            (0, 0, 0),
            (0, 0, 0),
            (pad_y0, pad_y1 + up_y - 1, up_y - 1),
            (pad_x0, pad_x1 + up_x - 1, up_x - 1),
        ),
    )
    out = lax.conv_general_dilated(
        z,
        k,
        window_strides=(down_y, down_x),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=fgc,
        precision=_fir_precision(x),
    )
    return out if grouped else out.reshape(n, c, out.shape[2], out.shape[3])


def upfirdn2d_native(x, kernel, up=1, down=1, pad=(0, 0)):
    """Pure-numpy oracle used by the parity tests; implements the textbook
    zero-stuff → pad → convolve → decimate definition independently of XLA."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    kernel = np.asarray(kernel, dtype=np.float64)
    up_y, up_x = _as_pair(up)
    down_y, down_x = _as_pair(down)
    pad_x0, pad_x1, pad_y0, pad_y1 = _as_pad(pad)

    n, c, h, w = x.shape
    kh, kw = kernel.shape

    # 1. zero-stuff
    z = np.zeros((n, c, h * up_y, w * up_x), dtype=x.dtype)
    z[:, :, ::up_y, ::up_x] = x

    # 2. pad (negative crops)
    def axis_pad(a, axis, before, after):
        if before > 0 or after > 0:
            widths = [(0, 0)] * a.ndim
            widths[axis] = (max(before, 0), max(after, 0))
            a = np.pad(a, widths)
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(max(-before, 0), a.shape[axis] - max(-after, 0))
        return a[tuple(sl)]

    z = axis_pad(z, 2, pad_y0, pad_y1)
    z = axis_pad(z, 3, pad_x0, pad_x1)

    # 3. true 2-D convolution, valid mode
    hh, ww = z.shape[2], z.shape[3]
    oh, ow = hh - kh + 1, ww - kw + 1
    out = np.zeros((n, c, oh, ow), dtype=x.dtype)
    kf = kernel[::-1, ::-1]
    for i in range(kh):
        for j in range(kw):
            out += kf[i, j] * z[:, :, i : i + oh, j : j + ow]

    # 4. decimate
    return out[:, :, ::down_y, ::down_x]
