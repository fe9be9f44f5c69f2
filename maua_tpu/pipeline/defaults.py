"""Default audio-reactivity plugin (reference: audioreactive/default.py):
onset-modulated chroma-weighted latents + two-band reactive noise."""

from __future__ import annotations

import jax
import jax.numpy as jnp

import maua_tpu.audio as ar
from ..reactive import chroma_weight_latents


def initialize(args):
    args.lo_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmax=150, smooth=5, clip=97, power=2)
    args.hi_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmin=500, smooth=5, clip=99, power=2)
    return args


def get_latents(selection, args):
    # chroma needs one latent per note (reference latent.py:15-26 docstring);
    # subset the scale when fewer latents were selected
    n_notes = min(12, len(selection))
    chroma = ar.chroma(args.audio, args.sr, args.n_frames, notes=n_notes)
    chroma_latents = chroma_weight_latents(chroma, jnp.asarray(selection)[:n_notes])
    latents = ar.gaussian_filter(chroma_latents, 4)

    lo = args.lo_onsets[:, None, None]
    hi = args.hi_onsets[:, None, None]

    sel = jnp.asarray(selection)
    latents = hi * sel[-4][None] + (1 - hi) * latents
    latents = lo * sel[-7][None] + (1 - lo) * latents

    return ar.gaussian_filter(latents, 2, causal=0.2)


def get_noise(height, width, scale, num_scales, args):
    if width > 256:
        return None

    lo = args.lo_onsets[:, None, None, None]
    hi = args.hi_onsets[:, None, None, None]

    seed = jax.random.PRNGKey(hash((height, width, scale)) % 2**31)
    k1, k2 = jax.random.split(seed)
    noise_noisy = ar.gaussian_filter(jax.random.normal(k1, (args.n_frames, 1, height, width)), 5)
    noise = ar.gaussian_filter(jax.random.normal(k2, (args.n_frames, 1, height, width)), 128)

    if width < 128:
        noise = lo * noise_noisy + (1 - lo) * noise
    if width > 32:
        noise = hi * noise_noisy + (1 - hi) * noise

    return noise / (jnp.std(noise) * 2.5)
