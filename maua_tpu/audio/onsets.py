"""Onset envelopes: librosa-style spectral flux and the madmom 5-function
ensemble, re-derived from their published definitions (no madmom dependency —
SURVEY.md §7 "madmom-equivalent onsets").

Reference behavior (reference: audioreactive/signal.py:31-73): percussive
separation → onset function → FFT-resample to n_frames → gaussian smooth →
peak-percentile clip → power.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dsp import log_filterbank, melspectrogram, power_to_db, resample_signal, stft
from .hpss import percussive
from .postprocess import gaussian_filter, percentile_clip

Array = jnp.ndarray


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "n_mels", "lag", "fmin", "fmax"))
def onset_strength(
    y: Array,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    fmin: float = 20.0,
    fmax: float = 8000.0,
    lag: int = 1,
) -> Array:
    """librosa.onset.onset_strength equivalent: mean over mel bands of the
    half-wave-rectified dB-spectrogram first difference
    (used by reference signal.py:51 for type='rosa')."""
    S = power_to_db(melspectrogram(y, sr=sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels, fmin=fmin, fmax=fmax))
    diff = jnp.maximum(0.0, S[:, lag:] - S[:, :-lag])
    env = jnp.mean(diff, axis=0)
    # librosa zero-pads at the start to keep frame alignment
    return jnp.concatenate([jnp.zeros(lag, env.dtype), env])


def _max_filter_freq(x: Array, size: int = 3) -> Array:
    """Max filter along the frequency axis (superflux vibrato suppression)."""
    half = size // 2
    xp = jnp.pad(x, ((half, half), (0, 0)), mode="edge")
    idx = jnp.arange(x.shape[0])[:, None] + jnp.arange(size)[None, :]
    return jnp.max(xp[idx, :], axis=1)


@partial(jax.jit, static_argnames=("sr", "frame_size", "hop_size", "num_bands", "fmin", "fmax"))
def madmom_onset_ensemble(
    y: Array,
    sr: int = 22050,
    frame_size: int = 2048,
    hop_size: int = 441,
    num_bands: int = 24,
    fmin: float = 20.0,
    fmax: float = 8000.0,
) -> Array:
    """Sum of 5 onset functions on a 24-band log-filtered spectrogram —
    spectral_diff + spectral_flux + superflux + complex_flux +
    modified_kullback_leibler (reference: signal.py:53-67), each implemented
    from its definition (Böck & Widmer / Dixon onset literature):

      spectral_diff   Σ (HWR(ΔS))²
      spectral_flux   Σ  HWR(ΔS)
      superflux       Σ  HWR(S - maxfilter_freq(S_prev)) on log-magnitudes
      complex_flux    Σ |X - X_prev·e^{iΔφ_prev}| with a local-group-delay
                      magnitude weighting approximated by the superflux mask
      mkl             Σ log(1 + S/(S_prev+ε))
    """
    X = stft(y, n_fft=frame_size, hop_length=hop_size, circular_shift=True)  # [F, T]
    mag = jnp.abs(X)
    fb = jnp.asarray(log_filterbank(sr, frame_size, num_bands, fmin, fmax), mag.dtype)
    S = fb @ mag  # [bands, T]
    eps = jnp.asarray(np.spacing(1.0), S.dtype)

    dS = S[:, 1:] - S[:, :-1]
    hwr = jnp.maximum(0.0, dS)

    spectral_diff = jnp.sum(hwr**2, axis=0)
    spectral_flux = jnp.sum(hwr, axis=0)

    # superflux: log-magnitude, max-filtered previous frame, lag 1
    logS = jnp.log10(5.0 * S + 1.0)
    prev_max = _max_filter_freq(logS, 3)[:, :-1]
    superflux = jnp.sum(jnp.maximum(0.0, logS[:, 1:] - prev_max), axis=0)

    # complex flux: deviation from constant-phase prediction, band-filtered
    phase = jnp.angle(X)
    # predicted phase: 2φ[t-1] - φ[t-2]
    pred = 2.0 * phase[:, 1:-1] - phase[:, :-2]
    target = X[:, 2:]
    predicted = jnp.abs(target) * jnp.exp(1j * pred)
    cdev = jnp.abs(target - predicted)  # phase-deviation-weighted magnitude
    cflux = fb @ cdev
    complex_flux = jnp.concatenate([jnp.zeros(1, S.dtype), jnp.sum(cflux, axis=0)])

    # modified Kullback-Leibler divergence
    mkl = jnp.sum(jnp.log(1.0 + S[:, 1:] / (S[:, :-1] + eps)), axis=0)

    total = spectral_diff + spectral_flux + superflux + complex_flux + mkl
    return jnp.concatenate([jnp.zeros(1, S.dtype), total])


def onsets(
    audio: Array,
    sr: int,
    n_frames: int,
    margin: float = 8.0,
    fmin: float = 20.0,
    fmax: float = 8000.0,
    smooth: float = 1.0,
    clip: float = 100.0,
    power: float = 1.0,
    type: str = "mm",
) -> Array:
    """Full onset envelope pipeline (reference: signal.py:31-73):
    percussive separation → onset function → resample(n_frames) → smooth →
    percentile-clip → **power. Returns [n_frames] in [0, 1]."""
    y_perc = percussive(jnp.asarray(audio, jnp.float32), margin=margin)
    if type == "rosa":
        env = onset_strength(y_perc, sr=sr, fmin=fmin, fmax=fmax)
    else:
        env = madmom_onset_ensemble(y_perc, sr=sr, fmin=fmin, fmax=fmax)
    lo, hi = jnp.min(env), jnp.max(env)
    env = jnp.clip(resample_signal(env, n_frames), lo, hi)
    env = gaussian_filter(env, smooth, causal=0.0)
    env = percentile_clip(env, clip)
    return env**power
