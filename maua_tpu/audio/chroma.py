"""Chromagrams: stft / cqt / cens variants + nearest-neighbor smoothing.

Reference behavior (reference: audioreactive/signal.py:102-156): harmonic
separation → chromagram (cens default) → optional cosine nn_filter → resample
to n_frames → keep the `notes` most salient pitch classes → row-normalize.

The CQT here is a pseudo-CQT: a log-spaced triangular filterbank over a long
(8192) STFT — one batched matmul on TPU instead of librosa's recursive
multi-rate CQT. Chroma outputs are numerically close and functionally
equivalent for latent weighting (the downstream use, reference:
audioreactive/latent.py:15-26).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dsp import resample_signal, stft
from .hpss import harmonic

Array = jnp.ndarray


def cqt_filterbank(sr: int, n_fft: int, n_bins: int = 84, bins_per_octave: int = 12, fmin: float = 32.703) -> np.ndarray:
    """Triangular log-frequency filterbank [n_bins, 1+n_fft//2]; fmin defaults
    to C1 (librosa convention)."""
    freqs = fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    fb = np.zeros((n_bins, len(fft_freqs)))
    for i, f in enumerate(freqs):
        lo = f * 2.0 ** (-1.0 / bins_per_octave)
        hi = f * 2.0 ** (1.0 / bins_per_octave)
        up = (fft_freqs - lo) / max(f - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - f, 1e-10)
        fb[i] = np.maximum(0, np.minimum(up, down))
        s = fb[i].sum()
        if s > 0:
            fb[i] /= s
    return fb


@partial(jax.jit, static_argnames=("sr", "n_bins", "bins_per_octave", "n_fft", "hop_length", "fmin"))
def pseudo_cqt(
    y: Array,
    sr: int = 22050,
    n_bins: int = 84,
    bins_per_octave: int = 12,
    n_fft: int = 8192,
    hop_length: int = 512,
    fmin: float = 32.703,
) -> Array:
    """Pseudo constant-Q magnitude [n_bins, T]."""
    S = jnp.abs(stft(y, n_fft=n_fft, hop_length=hop_length))
    fb = jnp.asarray(cqt_filterbank(sr, n_fft, n_bins, bins_per_octave, fmin), S.dtype)
    return fb @ S


def _fold_chroma(C: Array, bins_per_octave: int = 12, n_chroma: int = 12) -> Array:
    """Fold CQT bins into pitch classes. fmin=C1 puts bin 0 on pitch class C."""
    n_bins = C.shape[0]
    idx = (jnp.arange(n_bins) * n_chroma // bins_per_octave) % n_chroma
    out = jnp.zeros((n_chroma, C.shape[1]), C.dtype)
    return out.at[idx].add(C)


def _normalize_cols(C: Array, ord_: float = jnp.inf) -> Array:
    if ord_ == jnp.inf:
        denom = jnp.max(jnp.abs(C), axis=0, keepdims=True)
    else:
        denom = jnp.sum(jnp.abs(C) ** ord_, axis=0, keepdims=True) ** (1.0 / ord_)
    return C / jnp.maximum(denom, 1e-12)


def chroma_cqt(y: Array, sr: int = 22050, hop_length: int = 512) -> Array:
    """Energy-normalized chroma from pseudo-CQT [12, T]."""
    C = pseudo_cqt(y, sr=sr, hop_length=hop_length)
    return _normalize_cols(_fold_chroma(C))


def chroma_stft(y: Array, sr: int = 22050, n_fft: int = 2048, hop_length: int = 512) -> Array:
    """STFT-based chroma [12, T]: power spectrogram through a gaussian-windowed
    pitch-class projection (librosa chroma_stft behavior)."""
    S = jnp.abs(stft(y, n_fft=n_fft, hop_length=hop_length)) ** 2
    # chroma filterbank: wrap fft frequencies to fractional pitch class,
    # gaussian bump around each class center
    fft_freqs = np.linspace(0, sr / 2, 1 + n_fft // 2)[1:]
    frac_bin = 12 * np.log2(fft_freqs / 440.0) + 69  # midi note number
    fb = np.zeros((12, 1 + n_fft // 2))
    for c in range(12):
        d = np.mod(frac_bin - c + 6, 12) - 6  # distance in semitones, wrapped
        fb[c, 1:] = np.exp(-0.5 * (d / 1.0) ** 2)
    fb /= np.maximum(fb.sum(axis=0, keepdims=True), 1e-12)
    C = jnp.asarray(fb, S.dtype) @ S
    return _normalize_cols(C)


def chroma_cens(y: Array, sr: int = 22050, hop_length: int = 512, win_len: int = 41) -> Array:
    """CENS chroma [12, T] (librosa chroma_cens): l1-normalize, amplitude
    quantization (0.4/0.2/0.1/0.05 steps), temporal smoothing, l2 normalize."""
    C = chroma_cqt(y, sr=sr, hop_length=hop_length)
    C = C / jnp.maximum(jnp.sum(jnp.abs(C), axis=0, keepdims=True), 1e-12)
    Q = jnp.zeros_like(C)
    for step in (0.4, 0.2, 0.1, 0.05):
        Q = Q + 0.25 * (C > step).astype(C.dtype)
    # boxcar-ish smoothing with a hann window over time
    w = jnp.hanning(win_len).astype(C.dtype)
    w = w / jnp.sum(w)
    pad = win_len // 2
    Qp = jnp.pad(Q, ((0, 0), (pad, pad)), mode="constant")
    sm = jax.lax.conv_general_dilated(
        Qp[:, None, :], jnp.flip(w)[None, None, :], (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    denom = jnp.sqrt(jnp.sum(sm**2, axis=0, keepdims=True))
    return sm / jnp.maximum(denom, 1e-12)


def chroma_clp(y: Array, sr: int = 22050, hop_length: int = 512, eta: float = 100.0) -> Array:
    """CLP chroma [12, T]: Chroma from Log-compressed Pitch (Müller & Ewert's
    chroma toolbox — the same family madmom's CLPChroma implements): semitone
    -band energies → log(1 + η·e) compression (η=100, 'CLP100') → pitch-class
    fold → per-frame l2 normalization. The reference exposes this via
    chroma(type='clp') (reference: signal.py:119-128)."""
    P = pseudo_cqt(y, sr=sr, hop_length=hop_length) ** 2  # semitone energies
    L = jnp.log1p(eta * P)
    C = _fold_chroma(L)
    denom = jnp.sqrt(jnp.sum(C**2, axis=0, keepdims=True))
    return C / jnp.maximum(denom, 1e-12)


def nn_filter_cosine(C: np.ndarray, k: int | None = None) -> np.ndarray:
    """Nearest-neighbor median smoothing over time using cosine similarity
    (librosa.decompose.nn_filter equivalent; reference: signal.py:130)."""
    C = np.asarray(C)
    T = C.shape[1]
    if T < 3:
        return C
    if k is None:
        k = min(T - 1, max(2, int(np.ceil(np.sqrt(T)))))
    norm = np.linalg.norm(C, axis=0, keepdims=True)
    Cn = C / np.maximum(norm, 1e-12)
    sim = Cn.T @ Cn  # [T, T]
    np.fill_diagonal(sim, -np.inf)
    nn_idx = np.argpartition(-sim, k, axis=1)[:, :k]  # [T, k]
    return np.median(C[:, nn_idx], axis=2)  # [12, T]


def raw_chroma(audio: Array, sr: int, type: str = "cens", nearest_neighbor: bool = True) -> np.ndarray:
    """Chromagram [12, T] (reference: signal.py:102-134). Unknown types fall
    back to cens like the reference. 'clp' is a real log-compressed-pitch
    chroma; 'deep' (madmom's trained DeepChroma network) has no TPU-native
    equivalent and substitutes CLP with a loud warning."""
    y = jnp.asarray(audio, jnp.float32)
    if type == "cqt":
        ch = chroma_cqt(y, sr=sr)
    elif type == "stft":
        ch = chroma_stft(y, sr=sr)
    elif type == "clp":
        ch = chroma_clp(y, sr=sr)
    elif type == "deep":
        import warnings

        warnings.warn(
            "chroma type 'deep' (madmom DeepChromaProcessor, a trained neural "
            "net; reference signal.py:119-123) has no TPU-native equivalent — "
            "substituting CLP chroma (log-compressed pitch), the closest "
            "deterministic log-frequency mapping.",
            stacklevel=2,
        )
        ch = chroma_clp(y, sr=sr)
    else:  # cens, unknown
        ch = chroma_cens(y, sr=sr)
    ch = np.asarray(ch)
    if nearest_neighbor:
        ch = np.minimum(ch, nn_filter_cosine(ch))
    return ch


def chroma(audio: Array, sr: int, n_frames: int, margin: float = 16.0, type: str = "cens", notes: int = 12) -> Array:
    """Harmonic chromagram resampled to frames [n_frames, notes]
    (reference: signal.py:137-156)."""
    y_harm = harmonic(jnp.asarray(audio, jnp.float32), margin=margin)
    ch = raw_chroma(y_harm, sr, type=type).T  # [T, 12]
    ch = np.asarray(resample_signal(jnp.asarray(ch), n_frames))
    notes_indices = np.argsort(np.median(ch, axis=0))[:notes]
    ch = ch[:, notes_indices]
    ch = ch / np.maximum(ch.sum(1)[:, None], 1e-12)
    return jnp.asarray(ch, jnp.float32)
