"""ADA (adaptive discriminator augmentation), TPU-native.

Behavior parity with the reference pipeline (reference: augment.py:151-368):
per-sample composed random affine matrices (flip, 90° rotations, integer
translate, isotropic/anisotropic log-normal scale, pre/post rotation,
fractional translate — same distributions and probabilities, including the
p_rot = 1 - sqrt(1-p) rotation probability) and color matrices (brightness,
contrast, luma flip, hue rotation, saturation in 4-D homogeneous color space),
applied with 2× SYM6-wavelet oversampled resampling.

TPU-first redesign of the geometry (reference: augment.py:268-341 uses
*data-dependent* padding computed from the sampled matrices plus a Python
retry loop — not jittable, SURVEY.md §7 "ADA's data-dependent control flow"):
here the image is reflection-padded by a *static* margin (pad_frac of the
image, default 1/4, covering translations up to ±0.25 and scales up to 2×),
upsampled 2× through the SYM6 filter, sampled with a per-pixel bilinear
gather at affine-transformed coordinates, and downsampled 2× — all static
shapes, one fused XLA program, grad-friendly (D augmentation must be
differentiable for the G pass, reference: train.py:231-236).

Adaptive-p bookkeeping (`ada_adjust_p`) follows reference train.py:207-224:
accumulate sign(real_pred) counts, all-reduce across the mesh, and step p by
(target/length)*n toward r_t = target.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.upfirdn2d import upfirdn2d

Array = jnp.ndarray

# 12-tap SYM6 wavelet — the antialiasing filter (reference: augment.py:9-22)
SYM6 = (
    0.015404109327027373,
    0.0034907120842174702,
    -0.11799011114819057,
    -0.048311742585633,
    0.4910559419267466,
    0.787641141030194,
    0.3379294217276218,
    -0.07263752278646252,
    -0.021060292512300564,
    0.04472490177066578,
    0.0017677118642428036,
    -0.007800708325034148,
)


# ---------------------------------------------------------------------------
# matrix builders (reference: augment.py:25-117)
# ---------------------------------------------------------------------------


def _translate_mat(t_x: Array, t_y: Array) -> Array:
    b = t_x.shape[0]
    m = jnp.tile(jnp.eye(3)[None], (b, 1, 1))
    return m.at[:, 0, 2].set(t_x).at[:, 1, 2].set(t_y)


def _rotate_mat(theta: Array) -> Array:
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = jnp.tile(jnp.eye(3)[None], (b, 1, 1))
    return m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s).at[:, 1, 0].set(s).at[:, 1, 1].set(c)


def _scale_mat(s_x: Array, s_y: Array) -> Array:
    b = s_x.shape[0]
    m = jnp.tile(jnp.eye(3)[None], (b, 1, 1))
    return m.at[:, 0, 0].set(s_x).at[:, 1, 1].set(s_y)


def _translate3d_mat(t: Array) -> Array:
    b = t.shape[0]
    m = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    return m.at[:, 0, 3].set(t).at[:, 1, 3].set(t).at[:, 2, 3].set(t)


def _scale3d_mat(s: Array) -> Array:
    b = s.shape[0]
    m = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    return m.at[:, 0, 0].set(s).at[:, 1, 1].set(s).at[:, 2, 2].set(s)


# numpy, NOT jnp: a module-level device array would initialize the XLA
# backend at import time, which breaks jax.distributed.initialize() (must run
# before any backend init — parallel/mesh.py:maybe_initialize_distributed)
import numpy as _np

_LUMA_AXIS = _np.array([1.0, 1.0, 1.0, 0.0]) / math.sqrt(3.0)


def _luma_flip_mat(i: Array) -> Array:
    b = i.shape[0]
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    flip = 2.0 * jnp.outer(_LUMA_AXIS, _LUMA_AXIS)[None] * i[:, None, None]
    return eye - flip


def _saturation_mat(i: Array) -> Array:
    b = i.shape[0]
    eye = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    axis = jnp.outer(_LUMA_AXIS, _LUMA_AXIS)[None]
    return axis + (eye - axis) * i[:, None, None]


def _rotate3d_mat(theta: Array) -> Array:
    """Rodrigues rotation about the luma axis (reference: augment.py:66-85)."""
    b = theta.shape[0]
    u = _LUMA_AXIS[:3]
    eye3 = jnp.eye(3)
    cross = jnp.array([[0, -u[2], u[1]], [u[2], 0, -u[0]], [-u[1], u[0], 0]])
    outer = jnp.outer(u, u)
    s = jnp.sin(theta)[:, None, None]
    c = jnp.cos(theta)[:, None, None]
    rot = c * eye3[None] + s * cross[None] + (1 - c) * outer[None]
    m = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    return m.at[:, :3, :3].set(rot)


def _random_apply(rng: jax.Array, p: Array, mat: Array, prev: Array) -> Array:
    """With prob p left-multiply `mat`, else identity
    (reference: augment.py:144-149)."""
    b = mat.shape[0]
    eye = jnp.eye(mat.shape[-1])[None]
    select = (jax.random.uniform(rng, (b, 1, 1)) < p).astype(mat.dtype)
    return (select * mat + (1 - select) * eye) @ prev


# ---------------------------------------------------------------------------
# sampling (reference: augment.py:151-241)
# ---------------------------------------------------------------------------


def sample_affine(rng: jax.Array, p: Array, batch: int, height: int, width: int) -> Array:
    """Per-sample composed random affine [B,3,3] in normalized [-1,1] coords."""
    p = jnp.asarray(p, jnp.float32)
    keys = jax.random.split(rng, 16)
    G = jnp.tile(jnp.eye(3)[None], (batch, 1, 1))

    # flip (x-scale ±1)
    flip = 1.0 - 2.0 * jax.random.bernoulli(keys[0], 0.5, (batch,)).astype(jnp.float32)
    G = _random_apply(keys[1], p, _scale_mat(flip, jnp.ones(batch)), G)

    # 90° rotation: k ∈ {0, 3} quarter turns (reference: augment.py:161-163)
    quarter = jax.random.choice(keys[2], jnp.array([0.0, 3.0]), (batch,))
    G = _random_apply(keys[3], p, _rotate_mat(-math.pi / 2 * quarter), G)

    # integer translate ±0.125, rounded to the pixel grid
    t = jax.random.uniform(keys[4], (batch,), minval=-0.125, maxval=0.125)
    t_h = jnp.round(t * height) / height
    t_w = jnp.round(t * width) / width
    G = _random_apply(keys[5], p, _translate_mat(t_w, t_h), G)

    # isotropic log-normal scale, std = 0.2*log2
    s = jnp.exp(jax.random.normal(keys[6], (batch,)) * (0.2 * math.log(2.0)))
    G = _random_apply(keys[7], p, _scale_mat(s, s), G)

    p_rot = 1.0 - jnp.sqrt(jnp.clip(1.0 - p, 0.0, 1.0))

    # pre-rotation
    th_pre = jax.random.uniform(keys[8], (batch,), minval=-math.pi, maxval=math.pi)
    G = _random_apply(keys[9], p_rot, _rotate_mat(-th_pre), G)

    # anisotropic scale (s, 1/s)
    s2 = jnp.exp(jax.random.normal(keys[10], (batch,)) * (0.2 * math.log(2.0)))
    G = _random_apply(keys[11], p, _scale_mat(s2, 1.0 / s2), G)

    # post-rotation
    th_post = jax.random.uniform(keys[12], (batch,), minval=-math.pi, maxval=math.pi)
    G = _random_apply(keys[13], p_rot, _rotate_mat(-th_post), G)

    # fractional translate N(0, 0.125)
    tf = jax.random.normal(keys[14], (batch,)) * 0.125
    G = _random_apply(keys[15], p, _translate_mat(tf, tf), G)

    return G


def sample_color(rng: jax.Array, p: Array, batch: int) -> Array:
    """Per-sample composed color matrix [B,4,4] (reference: augment.py:210-241)."""
    p = jnp.asarray(p, jnp.float32)
    keys = jax.random.split(rng, 10)
    C = jnp.tile(jnp.eye(4)[None], (batch, 1, 1))

    b = jax.random.normal(keys[0], (batch,)) * 0.2
    C = _random_apply(keys[1], p, _translate3d_mat(b), C)

    c = jnp.exp(jax.random.normal(keys[2], (batch,)) * (0.5 * math.log(2.0)))
    C = _random_apply(keys[3], p, _scale3d_mat(c), C)

    lf = jax.random.bernoulli(keys[4], 0.5, (batch,)).astype(jnp.float32)
    C = _random_apply(keys[5], p, _luma_flip_mat(lf), C)

    hue = jax.random.uniform(keys[6], (batch,), minval=-math.pi, maxval=math.pi)
    C = _random_apply(keys[7], p, _rotate3d_mat(hue), C)

    sat = jnp.exp(jax.random.normal(keys[8], (batch,)) * math.log(2.0))
    C = _random_apply(keys[9], p, _saturation_mat(sat), C)

    return C


# ---------------------------------------------------------------------------
# application
# ---------------------------------------------------------------------------


def _packed_gather(img: Array, coords: Array):
    """Shared core of the packed sampler: ONE windowed gather of pre-packed
    2×2-neighborhood 4-vectors instead of four scalar gathers.

    The 2×2 neighborhoods are packed with three cheap shifted copies
    (streaming, not gathers), so each output position costs a single gather of
    a 4-slice; the packed axis sits in the SUBLANE dim ([C, 4, HW], HW stays
    the lane dim) so the TPU tiler pads 4→8, not 4→128. A 1-pixel zero frame
    gives zeros-outside semantics for in-band edge reads; far out-of-range
    coords (clamped by mode="clip") are zeroed by one validity mask.

    Returns (win [B,C,4,N], wx [B,1,N], wy [B,1,N], idx [B,N,1],
    valid [B,1,N]) — everything the custom VJP needs."""
    b, c, h, w = img.shape
    x = coords[:, 0]
    y = coords[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).reshape(b, 1, -1).astype(img.dtype)
    wy = (y - y0).reshape(b, 1, -1).astype(img.dtype)

    imgp = jnp.pad(img, ((0, 0), (0, 0), (1, 1), (1, 1)))
    hp, wp = h + 2, w + 2
    flat = imgp.reshape(b, c, hp * wp)
    right = jnp.pad(flat[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    down = jnp.pad(flat[:, :, wp:], ((0, 0), (0, 0), (0, wp)))
    downright = jnp.pad(flat[:, :, wp + 1 :], ((0, 0), (0, 0), (0, wp + 1)))
    packed = jnp.stack([flat, right, down, downright], axis=2)  # [B,C,4,HW]

    y0i = jnp.clip((y0 + 1).astype(jnp.int32), 0, hp - 2)
    x0i = jnp.clip((x0 + 1).astype(jnp.int32), 0, wp - 2)
    idx = (y0i * wp + x0i).reshape(b, -1)[..., None]  # [B,N,1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(0, 1), collapsed_slice_dims=(2,), start_index_map=(2,)
    )

    def g(pk, ix):  # pk [C,4,HW], ix [N,1] -> [C,4,N]  (N stays the lane dim)
        return jax.lax.gather(pk, ix, dn, slice_sizes=(c, 4, 1), mode="clip")

    win = jax.vmap(g)(packed, idx)  # [B,C,4,N]
    valid = (
        ((x0 >= -1) & (x0 <= w - 1) & (y0 >= -1) & (y0 <= h - 1))
        .reshape(b, 1, -1)
        .astype(img.dtype)
    )
    return win, wx, wy, idx, valid


def _packed_lerp(win, wx, wy, valid):
    out = (
        win[:, :, 0] * (1 - wx) * (1 - wy)
        + win[:, :, 1] * wx * (1 - wy)
        + win[:, :, 2] * (1 - wx) * wy
        + win[:, :, 3] * wx * wy
    )
    return out * valid


@jax.custom_vjp
def _bilinear_sample_packed(img: Array, coords: Array) -> Array:
    """TPU bilinear gather via one packed windowed gather (see _packed_gather).

    Measured on a v5e chip inside apply_affine (256², batch 8, fp32): forward
    107 ms vs 153 ms and forward+backward 275 ms vs 497 ms for the 4-gather
    form, at 1.50 GiB vs 3.02 GiB temp HBM. The custom VJP is essential: the
    autodiff transpose of the packed gather is a scatter whose buffers XLA
    lays out as [..., C, 4]-minor — tile-padded (8,128)/(3,4) ≈ 85×, 13.6 GiB
    temp — so the backward below re-expresses it as a 2-D [C*4, HWpad]
    scatter-add where every operand keeps a big lane dim."""
    b, c = img.shape[0], img.shape[1]
    win, wx, wy, idx, valid = _packed_gather(img, coords)
    return _packed_lerp(win, wx, wy, valid).reshape(b, c, *coords.shape[2:])


def _packed_fwd(img, coords):
    b, c = img.shape[0], img.shape[1]
    win, wx, wy, idx, valid = _packed_gather(img, coords)
    out = _packed_lerp(win, wx, wy, valid).reshape(b, c, *coords.shape[2:])
    # zero-size dtype token: residual leaves must be JAX types, not dtypes
    return out, (win, wx, wy, idx, valid, img.shape, coords.shape, jnp.zeros((0,), coords.dtype))


def _packed_bwd(res, gout):
    win, wx, wy, idx, valid, ishape, cshape, ctoken = res
    b, c, h, w = ishape
    hp, wp = h + 2, w + 2
    g = gout.reshape(b, c, -1) * valid  # [B,C,N]
    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    # updates channel-major [B, C*4, N] to match the [C,4,HW] packed layout
    upd = jnp.stack([g * w00, g * w01, g * w10, g * w11], axis=2).reshape(b, c * 4, -1)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(0,), inserted_window_dims=(1,), scatter_dims_to_operand_dims=(1,)
    )

    def sc(u, ix):  # u [C4,N], ix [N,1] -> [C4, HWp]; N stays the lane dim
        z = jnp.zeros((c * 4, hp * wp), u.dtype)
        return jax.lax.scatter_add(z, ix, u, dn, mode="drop")

    acc = jax.vmap(sc)(upd, idx).reshape(b, c, 4, hp * wp)
    # adjoint of the three shifted packing copies
    flat_g = acc[:, :, 0]
    flat_g = flat_g + jnp.pad(acc[:, :, 1, :-1], ((0, 0), (0, 0), (1, 0)))
    flat_g = flat_g + jnp.pad(acc[:, :, 2, :-wp], ((0, 0), (0, 0), (wp, 0)))
    flat_g = flat_g + jnp.pad(acc[:, :, 3, : -(wp + 1)], ((0, 0), (0, 0), (wp + 1, 0)))
    gimg = flat_g.reshape(b, c, hp, wp)[:, :, 1:-1, 1:-1]
    # coord grads from the saved window values (elementwise, no re-gather)
    gx = (win[:, :, 1] - win[:, :, 0]) * (1 - wy) + (win[:, :, 3] - win[:, :, 2]) * wy
    gy = (win[:, :, 2] - win[:, :, 0]) * (1 - wx) + (win[:, :, 3] - win[:, :, 1]) * wx
    gcx = jnp.sum(g * gx, axis=1).reshape(b, *cshape[2:])
    gcy = jnp.sum(g * gy, axis=1).reshape(b, *cshape[2:])
    gcoords = jnp.stack([gcx, gcy], axis=1).astype(ctoken.dtype)
    return gimg, gcoords


_bilinear_sample_packed.defvjp(_packed_fwd, _packed_bwd)


def _bilinear_sample_nchw(img: Array, coords: Array) -> Array:
    """Bilinear gather: img [B,C,H,W], coords [B,2,Ho,Wo] (x,y in pixel units,
    pixel-center convention — align_corners=False), zeros outside.

    Platform-dispatched like ops/upfirdn2d.py: on accelerator backends the
    packed single-gather form wins (gathers are the warp's bottleneck there);
    XLA:CPU prefers the plain 4-gather + lerp form (packing overhead
    dominates). Replaces torch F.grid_sample (reference: augment.py:330)."""
    if jax.default_backend() not in ("cpu",):
        return _bilinear_sample_packed(img, coords)
    return _bilinear_sample_plain(img, coords)


def _bilinear_sample_plain(img: Array, coords: Array) -> Array:
    """The textbook 4-gather + lerp form — the CPU lowering and the oracle the
    packed form is tested against (backend-independent, unlike the dispatch
    above)."""
    b, c, h, w = img.shape
    x = coords[:, 0]
    y = coords[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, c, h * w)
        idx = (yi_c * w + xi_c).reshape(b, -1)  # [B, Ho*Wo]
        g = jnp.take_along_axis(flat, idx[:, None, :], axis=2)
        g = g.reshape(b, c, *xi.shape[1:])
        return g * valid[:, None].astype(img.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[:, None].astype(img.dtype)
    wy = wy[:, None].astype(img.dtype)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _upfirdn1d_matrix(n_in: int, taps, up: int, down: int, pad0: int, pad1: int) -> Array:
    """1-D upfirdn as a banded [n_out, n_in] matrix (same contract as
    ops/upfirdn2d.py's native oracle: zero-stuff → pad → true-convolve →
    decimate). From that definition, output o receives input j through tap
    t = pad0 + up·j − down·o when 0 ≤ t < K, with true-convolution tap
    reversal: M[o, j] = k[K−1−t]."""
    k = jnp.asarray(taps, jnp.float32)
    K = k.shape[0]
    n_out = (n_in * up + pad0 + pad1 - K) // down + 1
    o = jnp.arange(n_out)[:, None]
    j = jnp.arange(n_in)[None, :]
    t = pad0 + up * j - down * o
    valid = (t >= 0) & (t < K)
    return jnp.where(valid, k[jnp.clip(K - 1 - t, 0, K - 1)], 0.0)


def _resample_sep(img3: Array, M_h: Array, M_w: Array) -> Array:
    """Separable resample of [R, H, W] maps as two dense matmuls:
    out = M_h @ img @ M_wᵀ.

    This is the high-resolution TPU form of the SYM6 up/down cascade: a
    grouped conv over a C=3 image puts channels in the 128-wide lane dim
    (42× tile padding at 1024² — the measured OOM), while [R, H, W] matmuls
    keep H/W in the tiled dims and run on the MXU. The band matrices are
    ~H× redundant in FLOPs, but the MXU has those to spare and the HBM
    traffic is the unpadded tensor."""
    prec = None if img3.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    tmp = jnp.einsum("oh,rhw->row", M_h.astype(img3.dtype), img3, precision=prec)
    return jnp.einsum("row,pw->rop", tmp, M_w.astype(img3.dtype), precision=prec)


def _bilinear_sample_folded_plain(img3: Array, coords: Array, c: int) -> Array:
    """Reference form of the folded gather (4 scalar gathers + lerp); the
    oracle for _bilinear_sample_folded and the cheaper lowering on XLA:CPU.
    Measured on-chip at 1024² batch 4: 3228 ms vs 797 ms for the windowed
    single-gather below — TPU gathers amortize 4-contiguous-element slices."""
    r, hh, ww = img3.shape
    b = coords.shape[0]
    x = coords[:, 0].reshape(b, -1)
    y = coords[:, 1].reshape(b, -1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0).astype(img3.dtype)
    wy = (y - y0).astype(img3.dtype)
    flat = img3.reshape(r, hh * ww)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < ww) & (yi >= 0) & (yi < hh)
        idx = jnp.clip(yi, 0, hh - 1).astype(jnp.int32) * ww + jnp.clip(xi, 0, ww - 1).astype(jnp.int32)
        idx_r = jnp.broadcast_to(idx[:, None, :], (b, c, idx.shape[-1])).reshape(r, -1)
        g = jnp.take_along_axis(flat, idx_r, axis=1)
        vmask = jnp.broadcast_to(valid[:, None, :], (b, c, valid.shape[-1])).reshape(r, -1)
        return g * vmask.astype(img3.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = jnp.broadcast_to(wx[:, None, :], (b, c, wx.shape[-1])).reshape(r, -1)
    wy = jnp.broadcast_to(wy[:, None, :], (b, c, wy.shape[-1])).reshape(r, -1)
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out.reshape(r, *coords.shape[2:])


def _folded_gather(img3: Array, coords: Array, c: int):
    """Shared core of the folded sampler: pack the 2×2 neighborhood into a
    [R, 4, HW] window axis with three shifted copies, fetch 4-element slices
    with ONE batched gather (4× faster than 4 scalar gathers, measured
    3228→797 ms fwd at 1024² batch 4). Channels never appear as a gather
    offset dim (a [C, …] slice makes C the lane dim → 3→128 operand padding);
    the window axis costs only a 4→8 sublane pad. A 1-px zero frame gives
    zeros-outside semantics for in-band edge reads.

    Returns (win [R,4,N], wx/wy/valid [R,N], idx [R,N,1])."""
    r, hh, ww = img3.shape
    b = coords.shape[0]
    n = coords.shape[2] * coords.shape[3] if coords.ndim == 4 else coords.shape[-1]
    x = coords[:, 0].reshape(b, -1)
    y = coords[:, 1].reshape(b, -1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)

    imgp = jnp.pad(img3, ((0, 0), (1, 1), (1, 1)))
    hp, wp = hh + 2, ww + 2
    flat = imgp.reshape(r, hp * wp)
    right = jnp.pad(flat[:, 1:], ((0, 0), (0, 1)))
    down = jnp.pad(flat[:, wp:], ((0, 0), (0, wp)))
    downright = jnp.pad(flat[:, wp + 1 :], ((0, 0), (0, wp + 1)))
    packed = jnp.stack([flat, right, down, downright], axis=1)  # [R,4,HW]

    y0i = jnp.clip((y0 + 1).astype(jnp.int32), 0, hp - 2)
    x0i = jnp.clip((x0 + 1).astype(jnp.int32), 0, wp - 2)

    def rep(v):
        return jnp.broadcast_to(v[:, None, :], (b, c, n)).reshape(r, n)

    idx_r = rep(y0i * wp + x0i)[..., None]  # [R,N,1]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(2,),
        start_index_map=(2,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    win = jax.lax.gather(packed, idx_r, dn, slice_sizes=(1, 4, 1), mode="clip")  # [R,4,N]
    wx = rep((x - x0)).astype(img3.dtype)
    wy = rep((y - y0)).astype(img3.dtype)
    valid = rep(
        ((x0 >= -1) & (x0 <= ww - 1) & (y0 >= -1) & (y0 <= hh - 1))
    ).astype(img3.dtype)
    return win, wx, wy, valid, idx_r


def _folded_lerp(win, wx, wy, valid):
    return (
        win[:, 0] * (1 - wx) * (1 - wy)
        + win[:, 1] * wx * (1 - wy)
        + win[:, 2] * (1 - wx) * wy
        + win[:, 3] * wx * wy
    ) * valid


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bilinear_sample_folded(img3: Array, coords: Array, c: int) -> Array:
    """Bilinear gather with channels folded into the row axis: img3 [B·C, H, W],
    coords [B, 2, Ho, Wo] (shared across the C channels of each sample),
    zeros outside; returns [B·C, Ho, Wo].

    The custom VJP mirrors _bilinear_sample_packed's: XLA's autodiff transpose
    of the batched windowed gather lays the scatter out pathologically
    (measured ~4.2 s of a 5.0 s bf16 fwd+bwd at 1024² batch 4); the backward
    below re-expresses it as a per-row [4, HWp] scatter-add where N stays the
    lane dim."""
    win, wx, wy, valid, _ = _folded_gather(img3, coords, c)
    return _folded_lerp(win, wx, wy, valid).reshape(img3.shape[0], *coords.shape[2:])


def _folded_fwd(img3, coords, c):
    win, wx, wy, valid, idx = _folded_gather(img3, coords, c)
    out = _folded_lerp(win, wx, wy, valid).reshape(img3.shape[0], *coords.shape[2:])
    return out, (win, wx, wy, valid, idx, img3.shape, coords.shape,
                 jnp.zeros((0,), coords.dtype))


def _folded_bwd(c, res, gout):
    win, wx, wy, valid, idx, ishape, cshape, ctoken = res
    r, hh, ww = ishape
    b = cshape[0]
    hp, wp = hh + 2, ww + 2
    g = gout.reshape(r, -1) * valid  # [R,N]
    w00 = (1 - wx) * (1 - wy)
    w01 = wx * (1 - wy)
    w10 = (1 - wx) * wy
    w11 = wx * wy
    upd = jnp.stack([g * w00, g * w01, g * w10, g * w11], axis=1)  # [R,4,N]
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(0,), inserted_window_dims=(1,), scatter_dims_to_operand_dims=(1,)
    )

    def sc(u, ix):  # u [4,N], ix [N,1] -> [4, HWp]; N stays the lane dim
        z = jnp.zeros((4, hp * wp), u.dtype)
        return jax.lax.scatter_add(z, ix, u, dn, mode="drop")

    acc = jax.vmap(sc)(upd, idx)  # [R,4,HWp]
    # adjoint of the three shifted packing copies
    flat_g = acc[:, 0]
    flat_g = flat_g + jnp.pad(acc[:, 1, :-1], ((0, 0), (1, 0)))
    flat_g = flat_g + jnp.pad(acc[:, 2, :-wp], ((0, 0), (wp, 0)))
    flat_g = flat_g + jnp.pad(acc[:, 3, : -(wp + 1)], ((0, 0), (wp + 1, 0)))
    gimg = flat_g.reshape(r, hp, wp)[:, 1:-1, 1:-1]
    # coord grads from the saved window values; coords are shared across the
    # C channels folded into R, so sum the per-channel contributions
    gx = (win[:, 1] - win[:, 0]) * (1 - wy) + (win[:, 3] - win[:, 2]) * wy
    gy = (win[:, 2] - win[:, 0]) * (1 - wx) + (win[:, 3] - win[:, 1]) * wx
    gcx = jnp.sum((g * gx).reshape(b, r // b, -1), axis=1).reshape(b, *cshape[2:])
    gcy = jnp.sum((g * gy).reshape(b, r // b, -1), axis=1).reshape(b, *cshape[2:])
    gcoords = jnp.stack([gcx, gcy], axis=1).astype(ctoken.dtype)
    return gimg, gcoords


_bilinear_sample_folded.defvjp(_folded_fwd, _folded_bwd)


def apply_affine(
    img: Array,
    G: Array,
    pad_frac: float = 0.25,
    method: str | None = None,
    oversample_grid: bool = True,
    fft_taper: float | None = 0.85,
    fft_taper_conditional: bool = True,
) -> Array:
    """Resample `img` through per-sample affine G with 2× SYM6 oversampling.

    Static-shape equivalent of reference augment.py:292-341: reflect-pad by a
    fixed margin, upsample 2×, bilinear-gather at G⁻¹-mapped coordinates,
    downsample 2×, crop back to the original size.

    method: "conv" (upfirdn convs + packed NCHW gather — the CPU default),
    "matmul" (separable band-matrix matmuls on [B·C, H, W] + folded gather —
    the accelerator default; see _resample_sep for why), "fft" (gather-free
    FFT-shear decomposition, square images only — see fft_warp.py; implies the
    1×-grid fast semantics, `oversample_grid` is ignored), or None =
    per-platform auto. conv and matmul produce identical values (pinned by
    tests) — that dispatch is purely a layout/perf decision; fft changes the
    interpolant (periodic-sinc shears + widened-tri scales) and is the fastest
    training mode on TPU.

    oversample_grid=False (matmul method only) samples the 2×-presmoothed
    source directly at the 1× output grid and skips the decimation filter —
    4× fewer gather windows AND 4× fewer backward scatter updates (the
    measured bottleneck at 1024²: ~4 s of a ~5 s fwd+bwd). Source-side
    antialiasing is retained; output-side post-filtering is skipped, so
    strong minification aliases slightly. This is the recommended mode for
    high-resolution TRAINING; the default keeps the reference's exact
    dual-side geometry.
    """
    if method is None:
        method = "conv" if jax.default_backend() in ("cpu",) else "matmul"
    if method == "fft":
        from .fft_warp import affine_warp_fft

        return affine_warp_fft(
            img, G, pad_frac=pad_frac,
            taper_from=fft_taper, taper_conditional=fft_taper_conditional,
        )
    b, c, h, w = img.shape
    k = jnp.asarray(SYM6, jnp.float32)
    len_k = len(SYM6)
    pad = int(math.ceil(max(h, w) * pad_frac)) + (len_k + 1) // 2
    p_up = len_k - 2
    p_dn = len_k - 2
    up_pad = ((p_up + 1) // 2 + 1, p_up // 2)
    dn_pad = ((p_dn + 1) // 2, p_dn // 2)

    # output pixel grid (2× density by default) in normalized [-1,1] coords of
    # the *unpadded* image (pixel-center convention, align_corners=False);
    # source coords = G⁻¹ @ grid; sampling at 2× keeps the reference's
    # antialiased oversample→transform→decimate geometry (augment.py:292-341).
    s_grid = 2 if oversample_grid else 1
    Ginv = jnp.linalg.inv(G)  # [B,3,3]
    ys2 = (jnp.arange(s_grid * h) + 0.5) / (s_grid * h) * 2.0 - 1.0
    xs2 = (jnp.arange(s_grid * w) + 0.5) / (s_grid * w) * 2.0 - 1.0
    gx2, gy2 = jnp.meshgrid(xs2, ys2)
    grid2 = jnp.stack([gx2, gy2, jnp.ones_like(gx2)], axis=0).reshape(3, -1)
    src2 = jnp.einsum("bij,jk->bik", Ginv[:, :2, :], grid2)
    sx2 = src2[:, 0].reshape(b, s_grid * h, s_grid * w)
    sy2 = src2[:, 1].reshape(b, s_grid * h, s_grid * w)
    px2 = (sx2 + 1.0) * w + 2.0 * pad - 0.5
    py2 = (sy2 + 1.0) * h + 2.0 * pad - 0.5
    coords = jnp.stack([px2, py2], axis=1)  # [B,2,sH,sW]

    if method == "matmul":
        imgf = jnp.pad(
            img.reshape(b * c, h, w), ((0, 0), (pad, pad), (pad, pad)), mode="reflect"
        )
        kr = k[::-1]  # k2_flip = outer(kr, kr): separable taps are the flipped 1-D
        hp = h + 2 * pad
        wp = w + 2 * pad
        M_up_h = _upfirdn1d_matrix(hp, kr, 2, 1, *up_pad)
        M_up_w = _upfirdn1d_matrix(wp, kr, 2, 1, *up_pad)
        img2x = _resample_sep(imgf, M_up_h, M_up_w)
        sampled = _bilinear_sample_folded(img2x, coords, c)
        if not oversample_grid:
            # the up cascade's DC gain is (√2/2)² = 1/2 (zero-stuff halves the
            # mean, raw taps sum √2 per axis); the skipped decimation filter
            # would have restored it with its √2-per-axis gain
            return (2.0 * sampled).reshape(b, c, *sampled.shape[1:])[:, :, :h, :w]
        M_dn_h = _upfirdn1d_matrix(sampled.shape[1], k, 1, 2, *dn_pad)
        M_dn_w = _upfirdn1d_matrix(sampled.shape[2], k, 1, 2, *dn_pad)
        out = _resample_sep(sampled, M_dn_h, M_dn_w)
        return out.reshape(b, c, *out.shape[1:])[:, :, :h, :w]
    if not oversample_grid:
        raise NotImplementedError("oversample_grid=False requires method='matmul'")

    k2 = jnp.outer(k, k)
    k2_flip = jnp.flip(k2, (0, 1))
    img_pad = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")

    # 2× oversample through the wavelet synthesis filter. The raw SYM6 taps
    # sum to √2 per axis, so the up(√2/2-gain) → down(√2-gain) cascade is
    # amplitude-preserving without extra normalization (as in the reference's
    # use of the raw kernel for both passes, augment.py:297-301,335).
    img2x = upfirdn2d(img_pad, k2_flip, up=2, pad=up_pad)
    sampled = _bilinear_sample_nchw(img2x, coords)

    # antialiased 2× decimation through the analysis filter
    out = upfirdn2d(sampled, k2, down=2, pad=dn_pad)
    return out[:, :, :h, :w]


def apply_color(img: Array, C: Array) -> Array:
    """Apply homogeneous color matrix per sample (reference: augment.py:344-352)."""
    rgb = jnp.einsum("bij,bjhw->bihw", C[:, :3, :3].astype(img.dtype), img)
    return rgb + C[:, :3, 3][:, :, None, None].astype(img.dtype)


class AugmentParams(NamedTuple):
    """Sampled per-batch transform matrices, reusable across D/G passes the
    way the reference returns (G, C) for reuse (reference: augment.py:364-368)."""

    affine: Array  # [B, 3, 3]
    color: Array  # [B, 4, 4]


def sample_augment_params(rng: jax.Array, p: Array, batch: int, height: int, width: int) -> AugmentParams:
    r1, r2 = jax.random.split(rng)
    return AugmentParams(
        affine=sample_affine(r1, p, batch, height, width),
        color=sample_color(r2, p, batch),
    )


def augment(
    img: Array,
    p: Array,
    rng: jax.Array | None = None,
    params: AugmentParams | None = None,
    fast_warp: bool = False,
    warp_method: str | None = None,
    fft_taper: float | None = 0.85,
    fft_taper_conditional: bool = True,
) -> tuple[Array, AugmentParams]:
    """ADA entry point (reference: augment.py:364-368): affine then color.
    Pass `params` to reuse previously-sampled matrices, else `rng` to sample.
    fast_warp=True uses the 1×-output-grid warp (see apply_affine) — the
    high-resolution training mode. warp_method overrides the geometry path
    outright ("fft" = the gather-free FFT-shear warp, the fastest TPU mode);
    the fft_taper options only apply to that path (see fft_warp.py)."""
    if params is None:
        if rng is None:
            raise ValueError("augment() needs rng or params")
        params = sample_augment_params(rng, p, img.shape[0], img.shape[2], img.shape[3])
    method = warp_method if warp_method else ("matmul" if fast_warp else None)
    out = apply_affine(
        img, params.affine, method=method, oversample_grid=not fast_warp,
        fft_taper=fft_taper, fft_taper_conditional=fft_taper_conditional,
    )
    out = apply_color(out, params.color)
    return out, params


def ada_adjust_p(
    ada_p: Array,
    signs_sum: Array,
    n_pred: Array,
    target: float = 0.6,
    length: float = 15_000.0,
    threshold: float = 256.0,
) -> tuple[Array, Array, Array, Array]:
    """Adaptive-p update (reference: train.py:207-224).

    Accumulated sign(real_pred) sums and counts (already all-reduced across
    the mesh by the caller's pmean/psum) adjust p by ±(target/length)·n once
    n exceeds `threshold` predictions; counters reset on update.

    Returns (new_p, new_signs_sum, new_n_pred, r_t_stat).
    """
    r_t = jnp.where(n_pred > 0, signs_sum / jnp.maximum(n_pred, 1.0), 0.0)
    do_update = n_pred > threshold
    step = jnp.asarray(target / length, jnp.float32)
    sign = jnp.where(r_t > target, 1.0, -1.0)
    new_p = jnp.clip(ada_p + sign * step * n_pred, 0.0, 1.0)
    return (
        jnp.where(do_update, new_p, ada_p),
        jnp.where(do_update, 0.0, signs_sum),
        jnp.where(do_update, 0.0, n_pred),
        r_t,
    )
