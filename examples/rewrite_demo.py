"""Model-rewriting demo: audio-modulated weight perturbation on the first
StyledConv.

The reference supports per-batch weight rewrites via `get_rewrites`
(generate_audiovisual.py:173-177, applied by setattr in render.py:160-167)
but ships no example recipe; this plugin is the missing demonstration. A
kick-onset envelope scales a fixed random direction added to conv1's 3x3
weight — transforms always act on the ORIGINAL weight (render.py:122-127),
so silence means an unmodified model, and the perturbation never accumulates.

Here a rewrite is a pure `(weight, modulation[B]) -> weight` function applied
inside the jitted render step (reactive/rewrite.py) — the weights just become
another batch input XLA pipelines, instead of a host-side setattr per batch.

Run:  python -m maua_tpu.pipeline.cli --ckpt g.pt --audio_file track.wav \
          --audioreactive_file examples/rewrite_demo.py
"""

import jax
import jax.numpy as jnp

import maua_tpu.audio as ar
from maua_tpu.reactive import Rewrite, slerp_loops


def initialize(args):
    args.kick_onsets = ar.onsets(args.audio, args.sr, args.n_frames, fmax=150, smooth=5, clip=95, power=2)
    return args


def get_latents(selection, args):
    latents = slerp_loops(jnp.asarray(selection), args.n_frames, n_loops=max(1, args.duration // 8))
    return ar.gaussian_filter(latents, 2)


def get_rewrites(args):
    # fixed random direction in weight space; the onset envelope sets how far
    # along it the batch's weights sit. Mean over the batch keeps one weight
    # tensor per batch (the generator weight has no frame axis) — visually the
    # texture "shudders" on kicks and relaxes to the trained model between them.
    def perturb(weight, mod):
        direction = jax.random.normal(jax.random.PRNGKey(42), weight.shape, weight.dtype)
        strength = jnp.mean(mod) * 0.4 * jnp.std(weight)
        return weight + strength * direction

    return [Rewrite("conv1/conv/weight", perturb, modulation=args.kick_onsets)]
