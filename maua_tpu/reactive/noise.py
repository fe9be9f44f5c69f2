"""Noise timeline generation: 3-D tileable perlin noise + reactive blends.

Reference: audioreactive/latent.py:184-246 (perlin_noise on GPU) and the
example noise recipes (gaussian_filter'd randn timelines modulated by onset
envelopes, reference: audioreactive/examples/default.py).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _perlinterpolant(t):
    return t * t * t * (t * (t * 6 - 15) + 10)


@partial(jax.jit, static_argnames=("shape", "res", "tileable"))
def perlin_noise(
    rng: jax.Array,
    shape: tuple[int, int, int],
    res: tuple[int, int, int],
    tileable: tuple[bool, bool, bool] = (True, False, False),
) -> Array:
    """3-D perlin noise [T, H, W] in [-1, 1]; shape must be a multiple of res
    per axis (reference: latent.py:184-246). Fully on-device."""
    for s, r in zip(shape, res):
        if s % r != 0:
            raise ValueError(f"shape {shape} must be a multiple of res {res}")
    d = tuple(s // r for s, r in zip(shape, res))

    # fractional offset of every voxel inside its lattice cell
    axes = [jnp.arange(s) / dd % 1.0 for s, dd in zip(shape, d)]
    t0, t1, t2 = jnp.meshgrid(*axes, indexing="ij")
    grid = jnp.stack([t0, t1, t2], axis=-1)  # [T,H,W,3]

    k1, k2 = jax.random.split(rng)
    theta = 2 * math.pi * jax.random.uniform(k1, (res[0] + 1, res[1] + 1, res[2] + 1))
    phi = 2 * math.pi * jax.random.uniform(k2, (res[0] + 1, res[1] + 1, res[2] + 1))
    gradients = jnp.stack(
        (jnp.sin(phi) * jnp.cos(theta), jnp.sin(phi) * jnp.sin(theta), jnp.cos(phi)),
        axis=3,
    )
    if tileable[0]:
        gradients = gradients.at[-1, :, :].set(gradients[0, :, :])
    if tileable[1]:
        gradients = gradients.at[:, -1, :].set(gradients[:, 0, :])
    if tileable[2]:
        gradients = gradients.at[:, :, -1].set(gradients[:, :, 0])

    g = jnp.repeat(jnp.repeat(jnp.repeat(gradients, d[0], 0), d[1], 1), d[2], 2)

    def corner(dx, dy, dz):
        gx = g[
            d[0] * dx : g.shape[0] - d[0] * (1 - dx),
            d[1] * dy : g.shape[1] - d[1] * (1 - dy),
            d[2] * dz : g.shape[2] - d[2] * (1 - dz),
        ]
        offs = jnp.stack([grid[..., 0] - dx, grid[..., 1] - dy, grid[..., 2] - dz], axis=-1)
        return jnp.sum(offs * gx, axis=-1)

    n000, n100 = corner(0, 0, 0), corner(1, 0, 0)
    n010, n110 = corner(0, 1, 0), corner(1, 1, 0)
    n001, n101 = corner(0, 0, 1), corner(1, 0, 1)
    n011, n111 = corner(0, 1, 1), corner(1, 1, 1)

    t = _perlinterpolant(grid)
    n00 = n000 * (1 - t[..., 0]) + t[..., 0] * n100
    n10 = n010 * (1 - t[..., 0]) + t[..., 0] * n110
    n01 = n001 * (1 - t[..., 0]) + t[..., 0] * n101
    n11 = n011 * (1 - t[..., 0]) + t[..., 0] * n111
    n0 = (1 - t[..., 1]) * n00 + t[..., 1] * n10
    n1 = (1 - t[..., 1]) * n01 + t[..., 1] * n11
    perlin = (1 - t[..., 2]) * n0 + t[..., 2] * n1
    return perlin * 2.0 - 1.0


def looping_perlin(rng: jax.Array, n_frames: int, h: int, w: int, periods: int = 4) -> Array:
    """Time-tileable perlin noise timeline [n_frames, 1, h, w] — loops
    seamlessly over the frame axis (the kelp.py looping-noise recipe,
    reference: examples/kelp.py:73-91)."""
    # round n_frames up to a multiple of periods for the lattice, then resample
    t = -(-n_frames // periods) * periods
    res_hw = max(1, min(4, h // 4, w // 4))
    p = perlin_noise(rng, (t, h, w), (periods, res_hw, res_hw), tileable=(True, False, False))
    return p[:n_frames, None]


def reactive_noise(
    rng: jax.Array,
    envelope: Array,
    h: int,
    w: int,
    base_sigma: float = 20.0,
    react_sigma: float = 1.0,
) -> Array:
    """Standard onset-reactive noise recipe: slowly-varying base noise blended
    toward fast noise by an envelope (reference: examples/default.py get_noise
    behavior). envelope: [n_frames] in [0,1]. Returns [n_frames, 1, h, w]."""
    from ..audio.postprocess import gaussian_filter

    n_frames = envelope.shape[0]
    k1, k2 = jax.random.split(rng)
    base = gaussian_filter(jax.random.normal(k1, (n_frames, 1, h, w)), base_sigma)
    react = gaussian_filter(jax.random.normal(k2, (n_frames, 1, h, w)), react_sigma)
    env = envelope[:, None, None, None]
    noise = base * (1 - env) + react * env
    # renormalize to unit std like the reference examples do
    std = jnp.std(noise)
    return noise / jnp.maximum(std, 1e-8)
