"""Latent timeline construction (reference: audioreactive/latent.py:15-181)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy import interpolate

from ..audio.postprocess import gaussian_filter

Array = jnp.ndarray


def chroma_weight_latents(chroma: Array, latents: Array) -> Array:
    """Chroma-weighted latent mix: chroma [T, N] × latents [N, n_latent, D]
    → [T, n_latent, D] (reference: latent.py:15-26)."""
    chroma = jnp.asarray(chroma)
    latents = jnp.asarray(latents)
    return jnp.einsum("tn,nld->tld", chroma, latents)


def slerp(val: float, low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Spherical interpolation along the unit-sphere geodesic
    (reference: latent.py:29-45)."""
    low = np.asarray(low, np.float64)
    high = np.asarray(high, np.float64)
    omega = np.arccos(
        np.clip(np.dot(low / np.linalg.norm(low), high / np.linalg.norm(high)), -1, 1)
    )
    so = np.sin(omega)
    if so == 0:
        return (1.0 - val) * low + val * high
    return np.sin((1.0 - val) * omega) / so * low + np.sin(val * omega) / so * high


def slerp_loops(
    latent_selection,
    n_frames: int,
    n_loops: int,
    smoothing: float = 1,
    loop: bool = True,
    n_latent: int = 18,
) -> Array:
    """Looping latent timeline via geodesic interpolation between selected
    latents' first row, broadcast over W+ (reference: latent.py:48-82)."""
    sel = np.asarray(latent_selection)
    if loop:
        sel = np.concatenate([sel, sel[[0]]])

    steps = max(1, int(n_frames // max(1, n_loops) // len(sel)))
    base = []
    for n in range(len(sel)):
        for val in np.linspace(0.0, 1.0, steps):
            base.append(slerp(val, sel[n % len(sel)][0], sel[(n + 1) % len(sel)][0]))
    base = jnp.asarray(np.stack(base), jnp.float32)
    base = gaussian_filter(base, smoothing)
    reps = max(1, int(n_frames / len(base)))
    base = jnp.concatenate([base] * reps, axis=0)
    base = jnp.repeat(base[:, None, :], n_latent, axis=1)
    if n_frames - len(base) > 0:
        base = jnp.concatenate([base, base[: n_frames - len(base)]])
    return base[:n_frames]


def spline_loops(latent_selection, n_frames: int, n_loops: int, loop: bool = True) -> Array:
    """Looping latent timeline via cubic-spline interpolation per latent dim
    (reference: latent.py:85-110). Spline fitting is a one-shot host op; the
    evaluated timeline is returned as a device array."""
    sel = np.asarray(latent_selection, np.float64)
    if loop:
        sel = np.concatenate([sel, sel[[0]]])

    x = np.linspace(0, 1, max(4, int(n_frames // max(1, n_loops))))
    xs = np.linspace(0, 1, sel.shape[0])
    flat = sel.reshape(sel.shape[0], -1)  # [K, L*D]
    out = np.empty((len(x), flat.shape[1]))
    for i in range(flat.shape[1]):
        tck = interpolate.splrep(xs, flat[:, i], k=min(3, len(xs) - 1))
        out[:, i] = interpolate.splev(x, tck)
    base = out.reshape(len(x), *sel.shape[1:])

    reps = max(1, int(n_frames / len(base)))
    base = np.concatenate([base] * reps, axis=0)
    if n_frames - len(base) > 0:
        base = np.concatenate([base, base[: n_frames - len(base)]])
    return jnp.asarray(base[:n_frames], jnp.float32)


def wrapping_slice(tensor, start: int, length: int, return_indices: bool = False):
    """Length-`length` slice starting at `start`, wrapping around dim 0
    (reference: latent.py:113-133)."""
    tensor = jnp.asarray(tensor)
    n = tensor.shape[0]
    if n == 1:
        indices = jnp.zeros(1, jnp.int32)
    else:
        indices = (jnp.arange(start, start + length) % n).astype(jnp.int32)
    if return_indices:
        return indices
    return tensor[indices]


def generate_latents(
    n_latents: int,
    ckpt: str,
    G_res: int = 1024,
    noconst: bool = False,
    latent_dim: int = 512,
    n_mlp: int = 8,
    channel_multiplier: int = 2,
    seed: int = 0,
) -> Array:
    """Random mapped W+ latents from a checkpointed generator
    (reference: latent.py:136-159)."""
    from ..io.torch_ckpt import load_generator

    gen, variables = load_generator(
        ckpt,
        size=G_res,
        style_dim=latent_dim,
        n_mlp=n_mlp,
        channel_multiplier=channel_multiplier,
        constant_input=not noconst,
    )
    zs = jax.random.normal(jax.random.PRNGKey(seed), (n_latents, latent_dim))
    return jax.jit(lambda z: gen.apply(variables, z, map_latents=True))(zs)


def save_latents(latents, filename: str) -> None:
    np.save(filename, np.asarray(latents))


def load_latents(filename: str) -> Array:
    return jnp.asarray(np.load(filename))
