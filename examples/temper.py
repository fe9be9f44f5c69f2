"""Spatial noise control with a circular mask (reference:
audioreactive/examples/temper.py) — chroma-weighted latents modulated by drum
onsets; noise inside/outside a soft circle reacts to low/high onsets.

Run:  python -m maua_tpu.pipeline.cli --ckpt g.pt --audio_file track.wav \
          --audioreactive_file examples/temper.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.ndimage as ndi

import maua_tpu.audio as ar
from maua_tpu.reactive import chroma_weight_latents

OVERRIDE = dict(out_size=1024)


def initialize(args):
    args.lo_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmax=150, smooth=5, clip=97, power=2)
    args.hi_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmin=500, smooth=5, clip=99, power=2)
    return args


def get_latents(selection, args):
    chroma = ar.chroma(args.audio, args.sr, args.n_frames)
    latents = ar.gaussian_filter(chroma_weight_latents(chroma, jnp.asarray(selection)[: chroma.shape[1]]), 4)

    lo = args.lo_onsets[:, None, None]
    hi = args.hi_onsets[:, None, None]
    sel = jnp.asarray(selection)
    latents = hi * sel[-4][None] + (1 - hi) * latents
    latents = lo * sel[-7][None] + (1 - lo) * latents
    return ar.gaussian_filter(latents, 2, causal=0.2)


def circular_mask(h, w, center=None, radius=None, soft=0):
    """(reference: temper.py:41-56)."""
    if center is None:
        center = (int(w / 2), int(h / 2))
    if radius is None:
        radius = min(center[0], center[1], w - center[0], h - center[1])
    Y, X = np.ogrid[:h, :w]
    dist = np.sqrt((X - center[0]) ** 2 + (Y - center[1]) ** 2)
    mask = (dist <= radius).astype(np.float32)
    if soft > 0:
        mask = ndi.gaussian_filter(mask, sigma=int(round(soft)))
    return jnp.asarray(mask)


def get_noise(height, width, scale, num_scales, args):
    if width > 256:
        return None

    lo = args.lo_onsets[:, None, None, None]
    hi = args.hi_onsets[:, None, None, None]
    mask = circular_mask(height, width, radius=int(width / 2), soft=2)[None, None]

    key = jax.random.PRNGKey(hash((height, width)) % 2**31)
    k1, k2 = jax.random.split(key)
    noise_noisy = ar.gaussian_filter(jax.random.normal(k1, (args.n_frames, 1, height, width)), 5)
    noise = ar.gaussian_filter(jax.random.normal(k2, (args.n_frames, 1, height, width)), 128)

    if width < 128:
        noise = 2 * mask * lo * noise_noisy + (1 - mask) * (1 - lo) * noise
    if width > 32:
        noise = 0.75 * (1 - mask) * hi * noise_noisy + mask * (1 - 0.75 * hi) * noise

    return noise / (jnp.std(noise) * 2)
