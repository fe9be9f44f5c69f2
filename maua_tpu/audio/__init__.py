"""Audio feature extraction, TPU-native.

Rebuilds the reference's librosa/madmom-based analysis layer
(reference: audioreactive/signal.py) from first principles: STFT, mel / log /
chroma filterbanks, HPSS source separation, onset ensembles, RMS envelopes,
beat tracking and laplacian segmentation — the hot transforms (STFT, filters,
smoothing) are jittable JAX that runs on TPU; one-shot combinatorial stages
(beat DP, clustering) run on host numpy/scipy/sklearn.

API mirrors `audioreactive` star-exports (reference: audioreactive/__init__.py)
so reference plugin files port line-for-line.
"""

from .postprocess import (
    SMF,
    set_SMF,
    get_SMF,
    normalize,
    percentile,
    percentile_clip,
    compress,
    expand,
    gaussian_filter,
)
from .io import load_audio
from .dsp import stft, istft, mel_filterbank, melspectrogram, amplitude_to_db, power_to_db, resample_signal
from .hpss import hpss, harmonic, percussive
from .onsets import onsets, onset_strength, madmom_onset_ensemble
from .features import rms, mfcc, drop_strength
from .chroma import chroma, raw_chroma, chroma_stft, chroma_cqt, chroma_cens, chroma_clp, pseudo_cqt
from .segmentation import beat_track, laplacian_segmentation
from .util import info, plot_signals, plot_spectra, plot_audio, plot_chroma_comparison

__all__ = [
    "SMF",
    "set_SMF",
    "get_SMF",
    "normalize",
    "percentile",
    "percentile_clip",
    "compress",
    "expand",
    "gaussian_filter",
    "load_audio",
    "stft",
    "istft",
    "mel_filterbank",
    "melspectrogram",
    "amplitude_to_db",
    "power_to_db",
    "resample_signal",
    "hpss",
    "harmonic",
    "percussive",
    "onsets",
    "onset_strength",
    "madmom_onset_ensemble",
    "rms",
    "mfcc",
    "drop_strength",
    "chroma",
    "raw_chroma",
    "chroma_stft",
    "chroma_cqt",
    "chroma_cens",
    "chroma_clp",
    "pseudo_cqt",
    "beat_track",
    "laplacian_segmentation",
    "info",
    "plot_signals",
    "plot_spectra",
    "plot_audio",
    "plot_chroma_comparison",
]
