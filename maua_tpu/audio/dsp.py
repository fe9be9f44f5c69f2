"""Core DSP in JAX: framing, STFT/ISTFT, filterbanks, dB scaling, resampling.

These are the primitives the reference delegated to librosa/madmom
(reference: audioreactive/signal.py:31-156). Everything here is jittable with
static frame geometry; batched FFTs map well onto TPU.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def hann_window(n: int, periodic: bool = True) -> jnp.ndarray:
    m = n if periodic else n - 1
    return 0.5 - 0.5 * jnp.cos(2.0 * math.pi * jnp.arange(n) / m)


def frame_signal(y: Array, frame_length: int, hop_length: int, center: bool = True, pad_mode: str = "reflect") -> Array:
    """Slice y [T] into overlapping frames [n_frames, frame_length]."""
    if center:
        y = jnp.pad(y, (frame_length // 2, frame_length // 2), mode=pad_mode)
    n_frames = 1 + (y.shape[0] - frame_length) // hop_length
    starts = jnp.arange(n_frames) * hop_length
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return y[idx]


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "center", "circular_shift"))
def stft(
    y: Array,
    n_fft: int = 2048,
    hop_length: int = 512,
    center: bool = True,
    circular_shift: bool = False,
) -> Array:
    """STFT -> complex [1 + n_fft//2, n_frames] (librosa layout).

    circular_shift rotates each windowed frame by n_fft//2 before the FFT —
    madmom's phase convention (reference: signal.py:55-57 uses
    madmom ShortTimeFourierTransform(circular_shift=True)); magnitudes are
    unaffected, complex-domain onset functions (complex_flux) need it.
    """
    w = hann_window(n_fft)
    frames = frame_signal(y, n_fft, hop_length, center=center) * w[None, :]
    if circular_shift:
        frames = jnp.roll(frames, n_fft // 2, axis=1)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=1)
    return spec.T


@partial(jax.jit, static_argnames=("n_fft", "hop_length", "length"))
def istft(spec: Array, n_fft: int = 2048, hop_length: int = 512, length: int | None = None) -> Array:
    """Inverse STFT with Hann overlap-add and COLA normalization.

    spec: complex [1 + n_fft//2, n_frames] (centered analysis assumed).
    """
    w = hann_window(n_fft)
    frames = jnp.fft.irfft(spec.T, n=n_fft, axis=1) * w[None, :]
    n_frames = frames.shape[0]
    out_len = n_fft + hop_length * (n_frames - 1)

    # overlap-add via scatter-add
    idx = (jnp.arange(n_frames) * hop_length)[:, None] + jnp.arange(n_fft)[None, :]
    y = jnp.zeros(out_len).at[idx.reshape(-1)].add(frames.reshape(-1))
    wsum = jnp.zeros(out_len).at[idx.reshape(-1)].add(jnp.tile(w**2, n_frames))
    y = y / jnp.maximum(wsum, 1e-8)

    y = y[n_fft // 2 :]
    if length is not None:
        y = y[:length]
    return y


def hz_to_mel(f):
    """Slaney mel scale (librosa default)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(sr: int, n_fft: int, n_mels: int = 128, fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, 1+n_fft//2]."""
    if fmax is None:
        fmax = sr / 2
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fb = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lo, ctr, hi = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0, np.minimum(up, down))
        enorm = 2.0 / (hi - lo)
        fb[i] *= enorm
    return fb


def log_filterbank(sr: int, n_fft: int, bands_per_octave: int = 24, fmin: float = 20.0, fmax: float = 8000.0) -> np.ndarray:
    """madmom-style logarithmically-spaced triangular filterbank
    [n_bands, 1+n_fft//2] with unit-area triangles — the FilteredSpectrogram
    basis of the onset ensemble (reference: signal.py:58)."""
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    n_oct = np.log2(fmax / fmin)
    n_bands = int(np.floor(n_oct * bands_per_octave)) + 1
    centers = fmin * 2.0 ** (np.arange(-1, n_bands + 1) / bands_per_octave)
    # snap centers to fft bins, dedup (madmom behavior at low freqs)
    bins = np.unique(np.round(centers / (sr / 2) * (n_fft // 2)).astype(int))
    bins = bins[(bins > 0) & (bins < len(fft_freqs))]
    filters = []
    for lo, ctr, hi in zip(bins[:-2], bins[1:-1], bins[2:]):
        f = np.zeros(len(fft_freqs))
        if ctr > lo:
            f[lo:ctr] = np.linspace(0, 1, ctr - lo, endpoint=False)
        f[ctr] = 1.0
        if hi > ctr:
            f[ctr:hi] = np.linspace(1, 0, hi - ctr, endpoint=False)
        s = f.sum()
        if s > 0:
            filters.append(f / s * (hi - lo) / 2)  # ~unit response
    return np.stack(filters) if filters else np.zeros((0, len(fft_freqs)))


@partial(jax.jit, static_argnames=("sr", "n_fft", "hop_length", "n_mels", "power", "fmin", "fmax"))
def melspectrogram(
    y: Array,
    sr: int = 22050,
    n_fft: int = 2048,
    hop_length: int = 512,
    n_mels: int = 128,
    power: float = 2.0,
    fmin: float = 0.0,
    fmax: float | None = None,
) -> Array:
    """Mel power spectrogram [n_mels, n_frames]."""
    S = jnp.abs(stft(y, n_fft=n_fft, hop_length=hop_length)) ** power
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax), dtype=S.dtype)
    return fb @ S


def power_to_db(S: Array, ref: float | Array = 1.0, amin: float = 1e-10, top_db: float | None = 80.0) -> Array:
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, S))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def amplitude_to_db(S: Array, ref: float | Array = 1.0, amin: float = 1e-5, top_db: float | None = 80.0) -> Array:
    return power_to_db(jnp.square(S), ref=ref**2, amin=amin**2, top_db=top_db)


def resample_signal(x, n_out: int):
    """FFT-domain resampling of the time (first) axis to n_out samples —
    the scipy.signal.resample the reference uses to map feature frames onto
    video frames (reference: signal.py:68,96,151). Implemented in JAX so it
    can stay on-device inside feature pipelines."""
    x = jnp.asarray(x)
    n_in = x.shape[0]
    if n_in == n_out:
        return x
    X = jnp.fft.rfft(x, axis=0)
    n_keep = min(n_in, n_out) // 2 + 1
    Y = jnp.zeros((n_out // 2 + 1,) + X.shape[1:], dtype=X.dtype)
    Y = Y.at[:n_keep].set(X[:n_keep])
    # halve the (shared) Nyquist bin when truncating/padding an even length
    if n_out < n_in and n_out % 2 == 0:
        Y = Y.at[n_keep - 1].set(Y[n_keep - 1].real)
    y = jnp.fft.irfft(Y, n=n_out, axis=0) * (n_out / n_in)
    return y
