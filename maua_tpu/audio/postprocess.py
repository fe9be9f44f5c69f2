"""Envelope post-processing: normalize / percentile-clip / compress / smooth.

Matches reference audioreactive/signal.py:243-368, including the global SMF
fps factor (set by the generate() pipeline, reference:
generate_audiovisual.py:101), causal-weighted gaussian smoothing with
circular padding, and the peak-aware percentile clip.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jnp.ndarray

SMF = 1.0  # smoothing fps factor; set_SMF(fps/30) (reference: signal.py:18-23)


def set_SMF(smf: float) -> None:
    global SMF
    SMF = float(smf)


def get_SMF() -> float:
    return SMF


def normalize(signal: Array) -> Array:
    """Min-max normalize to [0, 1] (reference: signal.py:243-254)."""
    signal = jnp.asarray(signal)
    signal = signal - jnp.min(signal)
    return signal / jnp.maximum(jnp.max(signal), 1e-12)


def percentile(signal: Array, p: float) -> Array:
    """kthvalue-style percentile (reference: signal.py:257-268)."""
    signal = jnp.asarray(signal).reshape(-1)
    k = 1 + round(0.01 * float(p) * (signal.size - 1))
    return jnp.sort(signal)[k - 1]


def percentile_clip(signal: Array, p: float) -> Array:
    """Normalize to [0,1], clipping above the p-th percentile of *local peaks*
    (reference: signal.py:271-292).

    Fully jittable: the data-dependent peak count becomes a traced index into
    a full sort with non-peaks pushed to +inf (peaks occupy the first n_peaks
    slots), so users may jit their reactive pipelines."""
    signal = jnp.asarray(signal)
    locs = jnp.arange(signal.shape[0])
    plus = signal[jnp.clip(locs + 1, 0, signal.shape[0] - 1)]
    minus = signal[jnp.clip(locs - 1, 0, signal.shape[0] - 1)]
    peak_mask = ((signal > plus) & (signal > minus)).reshape(-1)
    flat = signal.reshape(-1)
    sorted_peaks = jnp.sort(jnp.where(peak_mask, flat, jnp.inf))
    n_peaks = jnp.sum(peak_mask)
    # k-th value among peaks; no peaks -> percentile over the whole signal
    k_peaks = jnp.round(0.01 * p * (jnp.maximum(n_peaks, 1) - 1)).astype(jnp.int32)
    k_all = jnp.round(0.01 * p * (flat.size - 1)).astype(jnp.int32)
    thresh = jnp.where(
        n_peaks > 0,
        jnp.take(sorted_peaks, k_peaks),
        jnp.take(jnp.sort(flat), k_all),
    )
    signal = jnp.clip(signal, 0, thresh)
    return signal / jnp.maximum(jnp.max(signal), 1e-12)


def compress(signal: Array, threshold: float, ratio: float, invert: bool = False) -> Array:
    """Multiply values above (or below when invert) threshold by ratio, then
    renormalize (reference: signal.py:295-316)."""
    signal = jnp.asarray(signal)
    if invert:
        signal = jnp.where(signal < threshold, signal * ratio, signal)
    else:
        signal = jnp.where(signal > threshold, signal * ratio, signal)
    return normalize(signal)


def expand(signal: Array, threshold: float, ratio: float, invert: bool = False) -> Array:
    return compress(signal, threshold, ratio, invert)


def gaussian_filter(x: Array, sigma: float, causal: float | None = None) -> Array:
    """Gaussian smoothing along the time (first) axis with circular padding
    and optional causal weighting (reference: signal.py:319-368).

    Works for [T], [T,C], and [T,C,H,W] timelines; radius scales with the
    global SMF fps factor and is capped at 3*T; short sequences get the
    reference's circular-then-zero pad fallback.
    """
    x = jnp.asarray(x, jnp.float32)
    dim = x.ndim
    n_frames = x.shape[0]
    orig_shape = x.shape
    x2 = x.reshape(n_frames, -1)  # [T, F]

    radius = min(int(sigma * 4 * SMF), 3 * n_frames)
    if radius <= 0:
        return x

    t = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kernel = jnp.exp(-0.5 / max(sigma, 1e-6) ** 2 * t**2)
    if causal is not None:
        cf = causal if isinstance(causal, float) else 0.0
        kernel = kernel.at[radius + 1 :].multiply(cf)
    kernel = kernel / jnp.sum(kernel)

    if radius > n_frames:
        # circular pad by n_frames then zero pad the rest (signal.py:349-356)
        x2 = jnp.concatenate([x2[-n_frames:], x2, x2[:n_frames]], axis=0)
        pad = radius - n_frames
        x2 = jnp.pad(x2, ((pad, pad), (0, 0)))
    else:
        x2 = jnp.concatenate([x2[-radius:], x2, x2[:radius]], axis=0)

    # shared 1-D convolution over time, channels folded into batch
    # ([F, 1, Tpad] with a single shared kernel — XLA grouped convs lower
    # poorly, see ops/upfirdn2d.py)
    seq = x2.T[:, None, :]  # [F, 1, Tpad]
    k = jnp.flip(kernel)[None, None, :]
    out = jax.lax.conv_general_dilated(
        seq,
        k,
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :].T  # [T, F]

    out = out.reshape((out.shape[0],) + orig_shape[1:])
    if dim == 1:
        out = out.reshape(-1)
    return out
