"""RMS envelopes, MFCCs, and derived reactive signals.

Reference: audioreactive/signal.py:76-99 (rms) and the mfcc used inside
laplacian segmentation (signal.py:191).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.signal

from .dsp import melspectrogram, power_to_db, resample_signal, stft
from .postprocess import gaussian_filter, percentile_clip

Array = jnp.ndarray


def bandpass(y: np.ndarray, sr: int, fmin: float, fmax: float, order: int = 12) -> np.ndarray:
    """Butterworth band-pass (reference: signal.py:93 sosfilt butter 12)."""
    nyq = sr / 2
    fmax = min(fmax, nyq * 0.999)
    sos = scipy.signal.butter(order, [fmin, fmax], "bp", fs=sr, output="sos")
    return scipy.signal.sosfilt(sos, np.asarray(y)).astype(np.float32)


@partial(jax.jit, static_argnames=("hop_length", "n_fft"))
def frame_rms(y: Array, n_fft: int = 2048, hop_length: int = 512) -> Array:
    """Per-frame RMS from the magnitude STFT (rosa.feature.rms(S=|stft|),
    reference: signal.py:94)."""
    S = jnp.abs(stft(y, n_fft=n_fft, hop_length=hop_length))
    # Parseval: rms over spectrum — librosa divides by n_fft and accounts for
    # the one-sided spectrum doubling (all bins but DC/Nyquist appear twice)
    power = jnp.square(S)
    power = power.at[0].multiply(0.5)
    if n_fft % 2 == 0:
        power = power.at[-1].multiply(0.5)
    return jnp.sqrt(2.0 * jnp.sum(power, axis=0) / n_fft**2)


def rms(
    y: Array,
    sr: int,
    n_frames: int,
    fmin: float = 20.0,
    fmax: float = 8000.0,
    smooth: float = 180.0,
    clip: float = 50.0,
    power: float = 6.0,
) -> Array:
    """RMS envelope pipeline (reference: signal.py:76-99): bandpass → framewise
    rms → resample → smooth (slightly causal) → percentile-clip → **power."""
    y_filt = jnp.asarray(bandpass(np.asarray(y), sr, fmin, fmax))
    env = frame_rms(y_filt)
    lo, hi = jnp.min(env), jnp.max(env)
    env = jnp.clip(resample_signal(env, n_frames), lo, hi)
    env = gaussian_filter(env, smooth, causal=0.05)
    env = percentile_clip(env, clip)
    return env**power


def _dct_ii(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II basis [n_out, n_in] (librosa mfcc convention)."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    basis = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in))
    basis *= np.sqrt(2.0 / n_in)
    basis[0] *= 1.0 / np.sqrt(2.0)
    return basis


@partial(jax.jit, static_argnames=("sr", "n_mfcc", "n_mels", "n_fft", "hop_length"))
def mfcc(y: Array, sr: int = 22050, n_mfcc: int = 20, n_mels: int = 128, n_fft: int = 2048, hop_length: int = 512) -> Array:
    """MFCCs [n_mfcc, T] — DCT-II of the dB mel spectrogram."""
    S = power_to_db(melspectrogram(y, sr=sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels))
    basis = jnp.asarray(_dct_ii(n_mfcc, n_mels), S.dtype)
    return basis @ S


def drop_strength(y: Array, sr: int, n_frames: int, smooth: float = 20.0) -> Array:
    """Low-frequency energy envelope ("drops"): rms restricted to the bass
    band — a convenience reactive signal beyond the reference's inventory."""
    return rms(y, sr, n_frames, fmin=20, fmax=160, smooth=smooth, clip=60, power=2)
