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


_LUMA_AXIS = jnp.array([1.0, 1.0, 1.0, 0.0]) / math.sqrt(3.0)


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
    XLA:CPU prefers the plain 4-gather + lerp form below (packing overhead
    dominates). Replaces torch F.grid_sample (reference: augment.py:330)."""
    if jax.default_backend() not in ("cpu",):
        return _bilinear_sample_packed(img, coords)
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


def apply_affine(img: Array, G: Array, pad_frac: float = 0.25) -> Array:
    """Resample `img` through per-sample affine G with 2× SYM6 oversampling.

    Static-shape equivalent of reference augment.py:292-341: reflect-pad by a
    fixed margin, upsample 2×, bilinear-gather at G⁻¹-mapped coordinates,
    downsample 2×, crop back to the original size.
    """
    b, c, h, w = img.shape
    k = jnp.asarray(SYM6, jnp.float32)
    k2 = jnp.outer(k, k)
    k2_flip = jnp.flip(k2, (0, 1))
    len_k = len(SYM6)

    pad = int(math.ceil(max(h, w) * pad_frac)) + (len_k + 1) // 2
    img_pad = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")

    # 2× oversample through the wavelet synthesis filter. The raw SYM6 taps
    # sum to √2 per axis, so the up(√2/2-gain) → down(√2-gain) cascade is
    # amplitude-preserving without extra normalization (as in the reference's
    # use of the raw kernel for both passes, augment.py:297-301,335).
    p_up = len_k - 2
    img2x = upfirdn2d(img_pad, k2_flip, up=2, pad=((p_up + 1) // 2 + 1, p_up // 2))

    # output pixel grid at 2× density in normalized [-1,1] coords of the
    # *unpadded* image (pixel-center convention, align_corners=False); source
    # coords = G⁻¹ @ grid; sampling at 2× keeps the reference's antialiased
    # oversample→transform→decimate geometry (augment.py:292-341).
    Ginv = jnp.linalg.inv(G)  # [B,3,3]
    ys2 = (jnp.arange(2 * h) + 0.5) / (2 * h) * 2.0 - 1.0
    xs2 = (jnp.arange(2 * w) + 0.5) / (2 * w) * 2.0 - 1.0
    gx2, gy2 = jnp.meshgrid(xs2, ys2)
    grid2 = jnp.stack([gx2, gy2, jnp.ones_like(gx2)], axis=0).reshape(3, -1)
    src2 = jnp.einsum("bij,jk->bik", Ginv[:, :2, :], grid2)
    sx2 = src2[:, 0].reshape(b, 2 * h, 2 * w)
    sy2 = src2[:, 1].reshape(b, 2 * h, 2 * w)
    px2 = (sx2 + 1.0) * w + 2.0 * pad - 0.5
    py2 = (sy2 + 1.0) * h + 2.0 * pad - 0.5

    coords = jnp.stack([px2, py2], axis=1)  # [B,2,2H,2W]
    sampled = _bilinear_sample_nchw(img2x, coords)

    # antialiased 2× decimation through the analysis filter
    p_dn = len_k - 2
    out = upfirdn2d(sampled, k2, down=2, pad=((p_dn + 1) // 2, p_dn // 2))
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
) -> tuple[Array, AugmentParams]:
    """ADA entry point (reference: augment.py:364-368): affine then color.
    Pass `params` to reuse previously-sampled matrices, else `rng` to sample."""
    if params is None:
        if rng is None:
            raise ValueError("augment() needs rng or params")
        params = sample_augment_params(rng, p, img.shape[0], img.shape[2], img.shape[3])
    out = apply_affine(img, params.affine)
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
