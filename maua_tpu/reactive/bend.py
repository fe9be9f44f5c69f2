"""Network bending as pure functions over activations.

The reference implements bends as torch Modules instantiated per batch and
mutated into the generator via ManipulationLayer (reference:
audioreactive/bend.py:12-102, render.py:151-158). TPU-first redesign: a bend
is a `Bend(layer, transform, modulation)` record where `transform(x, mod)` is
a pure jittable function of the activation batch [B,C,H,W] and the per-frame
modulation slice [B]. `bends_for_batch` closes over the batch's modulation
slice and yields the (layer, fn) pairs the Generator's apply_bends hook
consumes — no module mutation, no kornia, fully inside jit.

Geometric bends reproduce the reference geometry: Translate uses the 5×-width
reflection-pad scroll trick (bend.py:51-70), Zoom/Rotate reflection-pad then
affine-sample then center-crop (bend.py:73-102).
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class Bend(NamedTuple):
    layer: int
    transform: Callable[[Array, Optional[Array]], Array]  # (x, mod[B]) -> x
    modulation: Optional[Array] = None  # [n_frames] timeline (None = static)


def _reflect_pad(x: Array, left: int, right: int, top: int = 0, bottom: int = 0) -> Array:
    return jnp.pad(x, ((0, 0), (0, 0), (top, bottom), (left, right)), mode="reflect")


def _bilinear_gather(img: Array, px: Array, py: Array) -> Array:
    """img [B,C,H,W], px/py [B,Ho,Wo] pixel coords; zeros outside."""
    b, c, h, w = img.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0)[:, None]
    wy = (py - y0)[:, None]

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, c, h * w)
        idx = (yi_c * w + xi_c).reshape(b, -1)
        out = jnp.take_along_axis(flat, idx[:, None, :], axis=2).reshape(b, c, *xi.shape[1:])
        return out * valid[:, None].astype(img.dtype)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    return v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) + v10 * (1 - wx) * wy + v11 * wx * wy


def _affine_crop(x_pad: Array, h: int, w: int, mats: Array) -> Array:
    """Sample the center h×w crop of x_pad through per-sample inverse-affine
    `mats` [B,2,3] given in output-pixel coordinates (origin at crop center)."""
    b = x_pad.shape[0]
    hp, wp = x_pad.shape[2], x_pad.shape[3]
    cy, cx = (hp - 1) / 2.0, (wp - 1) / 2.0
    ys = jnp.arange(h) - (h - 1) / 2.0
    xs = jnp.arange(w) - (w - 1) / 2.0
    gx, gy = jnp.meshgrid(xs, ys)
    ones = jnp.ones_like(gx)
    grid = jnp.stack([gx, gy, ones], 0).reshape(3, -1)  # [3, h*w]
    src = jnp.einsum("bij,jk->bik", mats, grid)  # [B,2,h*w]
    px = src[:, 0].reshape(b, h, w) + cx
    py = src[:, 1].reshape(b, h, w) + cy
    return _bilinear_gather(x_pad, px, py)


def add_noise_bend(layer: int, noise: Array, modulation: Optional[Array] = None) -> Bend:
    """x + (mod·) noise (reference: bend.py:28-40)."""

    def transform(x: Array, mod: Optional[Array] = None) -> Array:
        n = noise.astype(x.dtype)
        if mod is not None:
            n = n * mod[:, None, None, None].astype(x.dtype)
        return x + n

    return Bend(layer, transform, modulation)


def print_bend(layer: int) -> Bend:
    """Debug bend printing feature statistics (reference: bend.py:43-48)."""

    def transform(x: Array, mod: Optional[Array] = None) -> Array:
        jax.debug.print(
            "bend[{}] shape={} min={} mean={} max={} std={}",
            layer, x.shape, jnp.min(x), jnp.mean(x), jnp.max(x), jnp.std(x),
        )
        return x

    return Bend(layer, transform, None)


def translate_bend(layer: int, modulation: Array, noise: Optional[Array] = None) -> Bend:
    """Seamless horizontal scroll: reflection-pad to 5× width (w/2+w+w | w/2+w),
    add optional noise, translate by mod·w pixels, center-crop
    (reference: bend.py:51-70; example use examples/tauceti.py:94-159 where the
    saw-tooth modulation in [0,1] scrolls exactly one reflected period)."""

    def transform(x: Array, mod: Optional[Array] = None) -> Array:
        b, c, h, w = x.shape
        xp = _reflect_pad(x, w // 2 + w + w, w // 2 + w)
        if noise is not None:
            xp = xp + noise.astype(xp.dtype)
        t = (mod if mod is not None else jnp.zeros(b)) * w  # pixels
        mats = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])[None], (b, 1, 1))
        mats = mats.at[:, 0, 2].set(-t)  # inverse map: out(x) = pad(x - t)... sign: src = x - t
        return _affine_crop(xp, h, w, mats)

    return Bend(layer, transform, modulation)


def zoom_bend(layer: int, modulation: Array) -> Bend:
    """Zoom by factor mod about the center (reference: bend.py:73-85)."""

    def transform(x: Array, mod: Optional[Array] = None) -> Array:
        b, c, h, w = x.shape
        pad = int(max(h, w)) - 1
        xp = _reflect_pad(x, pad, pad, pad, pad)
        s = mod if mod is not None else jnp.ones(b)
        inv = 1.0 / jnp.maximum(s, 1e-4)
        mats = jnp.zeros((b, 2, 3))
        mats = mats.at[:, 0, 0].set(inv).at[:, 1, 1].set(inv)
        return _affine_crop(xp, h, w, mats)

    return Bend(layer, transform, modulation)


def rotate_bend(layer: int, modulation: Array) -> Bend:
    """Rotate by mod degrees about the center (reference: bend.py:88-102)."""

    def transform(x: Array, mod: Optional[Array] = None) -> Array:
        b, c, h, w = x.shape
        pad = int(max(h, w) * (1 - math.sqrt(2) / 2)) + 1
        xp = _reflect_pad(x, pad, pad, pad, pad)
        th = jnp.deg2rad(mod if mod is not None else jnp.zeros(b))
        cos, sin = jnp.cos(th), jnp.sin(th)
        mats = jnp.zeros((b, 2, 3))
        mats = mats.at[:, 0, 0].set(cos).at[:, 0, 1].set(sin)
        mats = mats.at[:, 1, 0].set(-sin).at[:, 1, 1].set(cos)
        return _affine_crop(xp, h, w, mats)

    return Bend(layer, transform, modulation)


def pad_bend(layer: int, pad: tuple[int, int, int, int] = (2, 2, 0, 0), mode: str = "edge") -> Bend:
    """Replication/reflection-pad bend — widens intermediate features, e.g.
    the layer-0 (left,right,top,bottom)=(2,2,0,0) pad that turns the 4×4
    constant into 4×8 for 2:1 widescreen synthesis (reference:
    examples/tauceti.py:94-100 ReplicationPad2d)."""
    left, right, top, bottom = pad

    def transform(x: Array, mod: Optional[Array] = None) -> Array:
        return jnp.pad(x, ((0, 0), (0, 0), (top, bottom), (left, right)), mode=mode)

    return Bend(layer, transform, None)


def bends_for_batch(bends: Sequence[Bend], start: int, end: int):
    """Close each bend over its modulation slice [start:end] and return
    (layer, fn(x)) pairs for Generator(bends=...) — the functional
    replacement for per-batch module instantiation (reference:
    render.py:151-158)."""
    out = []
    for b in bends or ():
        mod = None if b.modulation is None else jnp.asarray(b.modulation[start:end])
        transform = b.transform

        def fn(x, _mod=mod, _t=transform):
            return _t(x, _mod)

        out.append((b.layer, fn))
    return out
