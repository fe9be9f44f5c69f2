"""Plot / debug utilities (reference: audioreactive/util.py:11-94)."""

from __future__ import annotations

import numpy as np

__all__ = ["info", "plot_signals", "plot_spectra", "plot_audio", "plot_chroma_comparison"]


def info(arr, label: str = "") -> str:
    """Tensor statistics one-liner (reference: util.py:11-20)."""
    a = np.asarray(arr)
    msg = (
        f"{label + ' ' if label else ''}shape={tuple(a.shape)} "
        f"min={a.min():.4f} mean={a.mean():.4f} max={a.max():.4f} std={a.std():.4f}"
    )
    print(msg)
    return msg


def _save_or_show(fig, out_file):
    import matplotlib.pyplot as plt

    if out_file:
        fig.savefig(out_file, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return out_file
    plt.show()
    return None


def plot_signals(signals, labels=None, out_file: str | None = None):
    """Stacked envelope plots (reference: util.py:23-38)."""
    import matplotlib

    matplotlib.use("Agg") if out_file else None
    import matplotlib.pyplot as plt

    signals = [np.asarray(s) for s in signals]
    fig, axes = plt.subplots(len(signals), 1, figsize=(12, 2 * len(signals)), squeeze=False)
    for i, sig in enumerate(signals):
        axes[i, 0].plot(sig.squeeze())
        if labels:
            axes[i, 0].set_ylabel(labels[i])
    return _save_or_show(fig, out_file)


def plot_spectra(spectra, chroma: bool = False, labels=None, out_file: str | None = None):
    """Stacked spectrogram images (reference: util.py:41-58)."""
    import matplotlib

    matplotlib.use("Agg") if out_file else None
    import matplotlib.pyplot as plt

    spectra = [np.asarray(s) for s in spectra]
    fig, axes = plt.subplots(len(spectra), 1, figsize=(12, 3 * len(spectra)), squeeze=False)
    for i, spec in enumerate(spectra):
        axes[i, 0].imshow(spec, aspect="auto", origin="lower", cmap="magma")
        if labels:
            axes[i, 0].set_ylabel(labels[i])
    return _save_or_show(fig, out_file)


def plot_audio(audio, sr: int, n_fft: int = 2048, hop_length: int = 512, out_file: str | None = None):
    """Log-magnitude spectrogram of a waveform (reference: util.py:61-74)."""
    import matplotlib

    matplotlib.use("Agg") if out_file else None
    import matplotlib.pyplot as plt

    from .dsp import amplitude_to_db, stft

    S = np.asarray(amplitude_to_db(abs(np.asarray(stft(np.asarray(audio, np.float32), n_fft, hop_length)))))
    fig, ax = plt.subplots(figsize=(12, 4))
    im = ax.imshow(S, aspect="auto", origin="lower", cmap="magma",
                   extent=[0, len(np.asarray(audio)) / sr, 0, sr / 2])
    ax.set_xlabel("time [s]")
    ax.set_ylabel("freq [Hz]")
    fig.colorbar(im, ax=ax)
    return _save_or_show(fig, out_file)


def plot_chroma_comparison(audio, sr: int, out_file: str | None = None):
    """All chroma variants side by side (reference: util.py:77-94)."""
    import matplotlib

    matplotlib.use("Agg") if out_file else None
    import matplotlib.pyplot as plt

    from .chroma import raw_chroma

    types = ["cens", "cqt", "stft"]
    fig, axes = plt.subplots(len(types), 1, figsize=(12, 3 * len(types)), squeeze=False)
    for i, t in enumerate(types):
        ch = raw_chroma(np.asarray(audio, np.float32), sr, type=t, nearest_neighbor=False)
        axes[i, 0].imshow(np.asarray(ch), aspect="auto", origin="lower", cmap="magma")
        axes[i, 0].set_ylabel(t)
    return _save_or_show(fig, out_file)
