"""Loop-based interpolation with structure analysis (reference:
audioreactive/examples/kelp.py): laplacian segmentation picks sections,
looping spline latents run per section, RMS blends intro/drop latent sets,
and noise is time-looping perlin.

Run:  python -m maua_tpu.pipeline.cli --ckpt g.pt --audio_file track.wav \
          --audioreactive_file examples/kelp.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import maua_tpu.audio as ar
from maua_tpu.reactive import looping_perlin, spline_loops, wrapping_slice

OVERRIDE = dict(out_size=1024)
BPM = 130


def initialize(args):
    # RMS distinguishes drops from intros/outros (reference: kelp.py:19-25)
    rms = ar.rms(args.audio, args.sr, args.n_frames, smooth=10, clip=60, power=1)
    rms = ar.expand(rms, threshold=0.8, ratio=10)
    rms = ar.gaussian_filter(rms, 4)
    args.rms = ar.normalize(rms)

    args.kick_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmax=150, smooth=4)
    args.snare_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmin=500, smooth=4)
    return args


def get_latents(selection, args):
    rms = args.rms[:, None, None]
    lo = args.kick_onsets[:, None, None]
    hi = args.snare_onsets[:, None, None]

    # sections via laplacian segmentation (reference: kelp.py:44-47)
    timestamps, labels = ar.laplacian_segmentation(np.asarray(args.audio), args.sr, k=min(7, 5))
    sel = np.asarray(selection)
    intro_sel = sel[: len(sel) // 2]
    drop_sel = sel[len(sel) // 2 :]

    # per-section looping latents, one bar per loop (reference: kelp.py:55-90)
    latents = np.zeros((args.n_frames,) + sel.shape[1:], np.float32)
    for (start, stop), label in zip(zip(timestamps, list(timestamps[1:]) + [args.duration]), labels):
        start_f = int(round(start / args.duration * args.n_frames))
        stop_f = int(round(stop / args.duration * args.n_frames))
        if stop_f <= start_f:
            continue
        section_frames = stop_f - start_f
        bars = max(1.0, (stop - start) * (BPM / 60) / 4)
        source = intro_sel if label % 2 == 0 else drop_sel
        section_sel = np.asarray(wrapping_slice(source, label, 4))
        loops = np.asarray(spline_loops(section_sel, section_frames, max(1, int(bars // 4))))
        latents[start_f:stop_f] = loops[:section_frames]

    latents = jnp.asarray(latents)
    # RMS blends toward the drop set (reference: kelp.py:93-103)
    drop_mean = jnp.asarray(drop_sel).mean(0, keepdims=True)
    latents = rms * drop_mean + (1 - rms) * latents
    latents = hi * jnp.asarray(sel)[-4][None] + (1 - hi) * latents
    latents = lo * jnp.asarray(sel)[-7][None] + (1 - lo) * latents
    return ar.gaussian_filter(latents, 3)


def get_noise(height, width, scale, num_scales, args):
    if width > 512:
        return None
    # looping perlin modulated by RMS (reference: kelp.py:106-121)
    perlin = looping_perlin(jax.random.PRNGKey(width), args.n_frames, height, width, periods=4)
    key = jax.random.PRNGKey(hash((height, width, "k")) % 2**31)
    noisy = ar.gaussian_filter(jax.random.normal(key, (args.n_frames, 1, height, width)), 5)
    rms = args.rms[:, None, None, None]
    noise = rms * noisy + (1 - rms) * perlin
    return noise / (jnp.std(noise) * 2)
