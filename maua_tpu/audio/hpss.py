"""Harmonic/percussive source separation (HPSS).

The reference calls rosa.effects.percussive / .harmonic with a margin
(reference: audioreactive/signal.py:49,148) in front of onset and chroma
analysis. Implemented here as the standard median-filtering method
(Fitzgerald 2010 / Driedger 2014, as in librosa): median-smooth the magnitude
spectrogram along time (harmonic enhancement) and along frequency (percussive
enhancement), build margin-thresholded masks, apply to the complex STFT, and
invert. The median filters are rank reductions over static windows — jittable,
TPU-friendly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .dsp import istft, stft

Array = jnp.ndarray


def _median_filter_axis(x: Array, size: int, axis: int) -> Array:
    """Running median along `axis` with edge replication, static window."""
    half = size // 2
    x_m = jnp.moveaxis(x, axis, -1)
    pad = [(0, 0)] * (x_m.ndim - 1) + [(half, half)]
    x_p = jnp.pad(x_m, pad, mode="edge")
    # gather sliding windows: [..., n, size]
    n = x_m.shape[-1]
    idx = jnp.arange(n)[:, None] + jnp.arange(size)[None, :]
    win = x_p[..., idx]
    med = jnp.median(win, axis=-1)
    return jnp.moveaxis(med, -1, axis)


@partial(jax.jit, static_argnames=("kernel_size", "power", "margin"))
def hpss_masks(S_mag: Array, kernel_size: int = 31, power: float = 2.0, margin: float = 1.0):
    """Soft/hard masks from a magnitude spectrogram [freq, time]."""
    harm = _median_filter_axis(S_mag, kernel_size, axis=1)  # smooth over time
    perc = _median_filter_axis(S_mag, kernel_size, axis=0)  # smooth over freq

    if margin == 1.0:
        # soft Wiener masks
        h_p = harm**power
        p_p = perc**power
        tot = h_p + p_p
        tiny = jnp.finfo(S_mag.dtype).tiny
        mask_h = jnp.where(tot > tiny, h_p / jnp.maximum(tot, tiny), 0.5)
        mask_p = jnp.where(tot > tiny, p_p / jnp.maximum(tot, tiny), 0.5)
    else:
        mask_h = (harm > margin * perc).astype(S_mag.dtype)
        mask_p = (perc > margin * harm).astype(S_mag.dtype)
    return mask_h, mask_p


def hpss(y: Array, margin: float = 1.0, n_fft: int = 2048, hop_length: int = 512, kernel_size: int = 31):
    """Return (harmonic, percussive) components of waveform y."""
    y = jnp.asarray(y, jnp.float32)
    S = stft(y, n_fft=n_fft, hop_length=hop_length)
    mask_h, mask_p = hpss_masks(jnp.abs(S), kernel_size=kernel_size, margin=margin)
    y_h = istft(S * mask_h.astype(S.dtype), n_fft=n_fft, hop_length=hop_length, length=y.shape[0])
    y_p = istft(S * mask_p.astype(S.dtype), n_fft=n_fft, hop_length=hop_length, length=y.shape[0])
    return y_h, y_p


def harmonic(y: Array, margin: float = 16.0, **kw) -> Array:
    """rosa.effects.harmonic equivalent (reference: signal.py:148)."""
    return hpss(y, margin=margin, **kw)[0]


def percussive(y: Array, margin: float = 8.0, **kw) -> Array:
    """rosa.effects.percussive equivalent (reference: signal.py:49)."""
    return hpss(y, margin=margin, **kw)[1]
