"""Network bending example (reference: audioreactive/examples/tauceti.py):
a replication-pad + noise bend on the constant layer and a saw-tooth
scrolling Translate bend on layer 4 during the drop.

The reference had to instantiate kornia modules per batch
(tauceti.py:136-159); here bends are (layer, fn, modulation-timeline) records
that run inside jit (maua_tpu/reactive/bend.py).

Run:  python -m maua_tpu.pipeline.cli --ckpt g.pt --audio_file track.wav \
          --audioreactive_file examples/tauceti.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import maua_tpu.audio as ar
from maua_tpu.reactive import Bend, add_noise_bend, chroma_weight_latents, pad_bend, translate_bend

OVERRIDE = dict(out_size=1920)


def initialize(args):
    args.low_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmax=150, smooth=5, clip=97, power=2)
    args.high_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmin=500, smooth=5, clip=99, power=2)
    return args


def get_latents(selection, args):
    chroma = ar.chroma(args.audio, args.sr, args.n_frames)
    latents = ar.gaussian_filter(chroma_weight_latents(chroma, jnp.asarray(selection)[: chroma.shape[1]]), 4)
    lo = args.low_onsets[:, None, None]
    hi = args.high_onsets[:, None, None]
    sel = jnp.asarray(selection)
    latents = hi * sel[-4][None] + (1 - hi) * latents
    latents = lo * sel[-7][None] + (1 - lo) * latents
    return ar.gaussian_filter(latents, 2, causal=0.2)


def get_noise(height, width, scale, num_scales, args):
    if width > 256:
        return None
    lo = 1.25 * args.low_onsets[:, None, None, None]
    hi = 1.25 * args.high_onsets[:, None, None, None]
    key = jax.random.PRNGKey(hash((height, width)) % 2**31)
    k1, k2 = jax.random.split(key)
    noise_noisy = ar.gaussian_filter(jax.random.normal(k1, (args.n_frames, 1, height, width)), 5)
    noise = ar.gaussian_filter(jax.random.normal(k2, (args.n_frames, 1, height, width)), 128)
    if width > 8:
        noise = lo * noise_noisy + (1 - lo) * noise
        noise = hi * noise_noisy + (1 - hi) * noise
    return noise / (jnp.std(noise) * 2.5)


def get_bends(args):
    # widen the constant layer to 2:1 + variation noise (reference:
    # tauceti.py:94-100 ReplicationPad2d((2,2,0,0)) + AddNoise)
    bends = [
        pad_bend(0, (2, 2, 0, 0)),
        add_noise_bend(0, 0.025 * jax.random.normal(jax.random.PRNGKey(0), (1, 1, 4, 8))),
    ]

    # scrolling drop: saw-tooth translation in [0, 1] scroll fractions
    # (reference: tauceti.py:102-159; our translate_bend scales by layer width)
    fps = args.fps
    drop_start = int(args.n_frames * (45 / max(args.duration, 1)))
    drop_end = int(args.n_frames * (135 / max(args.duration, 1)))
    drop_end = min(drop_end, args.n_frames)

    loop_len = max(2, int(6 * fps))
    n_loops = max(0, (drop_end - drop_start) // loop_len)
    trunc = (drop_end - drop_start) - n_loops * loop_len

    ramp = np.linspace(0, 1, loop_len)
    x = np.concatenate(
        [
            np.zeros(drop_start),
            np.concatenate([ramp] * n_loops) if n_loops else np.zeros(0),
            ramp[:trunc],
            np.full(args.n_frames - drop_end, ramp[min(trunc, loop_len - 1)]),
        ]
    )[: args.n_frames]
    x = np.asarray(ar.gaussian_filter(jnp.asarray(x), 1))

    tl = 4  # lower-layer bends give more fluid outcomes (tauceti.py:112-113)
    bends.append(translate_bend(tl, modulation=jnp.asarray(x)))
    return bends
