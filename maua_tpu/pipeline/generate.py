"""generate() — the audio-reactive music-video API.

Mirrors the reference entry point (reference: generate_audiovisual.py:59-231):
load audio → run user plugin functions (initialize / get_latents / get_noise /
get_bends / get_rewrites / get_truncation) → assemble timelines → load the
generator from a torch checkpoint → stream-render to video. `args` is the
same mutable context namespace the reference threads through plugin functions
(generate_audiovisual.py:108-113).
"""

from __future__ import annotations

import argparse
import os
import time
import uuid
from typing import Callable, Optional

import jax
import numpy as np

import maua_tpu.audio as ar
from ..io.torch_ckpt import load_generator
from ..models import Generator
from ..reactive import generate_latents, load_latents, save_latents
from ..render import render


def get_noise_range(out_size: int, generator_resolution: int, is_stylegan1: bool = False):
    """Noise-scale geometry for SG1 vs SG2 layer indexing
    (reference: generate_audiovisual.py:22-34)."""
    log_max_res = int(np.log2(out_size))
    log_min_res = 2 + (log_max_res - int(np.log2(generator_resolution)))
    if is_stylegan1:
        range_min = log_min_res
        range_max = log_max_res + 1
        side_fn = lambda x: x
    else:
        range_min = 2 * log_min_res + 1
        range_max = 2 * (log_max_res + 1)
        side_fn = lambda x: int(x / 2)
    return range_min, range_max, side_fn


def load_generator_for_render(
    ckpt: str,
    G_res: int = 1024,
    out_size: int = 1024,
    noconst: bool = False,
    latent_dim: int = 512,
    n_mlp: int = 8,
    channel_multiplier: int = 2,
    base_res_factor: float = 1,
    stylegan1: bool = False,
):
    """Generator + variables from a checkpoint (reference:
    generate_audiovisual.py:37-56). StyleGAN1 checkpoints route to the G_style
    port in models/stylegan1."""
    if stylegan1:
        from ..models.stylegan1 import load_stylegan1

        return load_stylegan1(ckpt, output_size=out_size)
    import jax

    # polyphase (s2d) evaluation for the low-channel high-res layers: exact,
    # 1.27x measured end-to-end on TPU @1024² (ops/s2d.py); no-op on CPU
    # whose conv layouts don't lane-pad
    s2d = 0 if jax.default_backend() == "cpu" else "auto"
    return load_generator(
        ckpt,
        output_size=out_size if out_size != G_res else None,
        base_res_factor=base_res_factor,
        size=G_res,
        style_dim=latent_dim,
        n_mlp=n_mlp,
        channel_multiplier=channel_multiplier,
        constant_input=not noconst,
        s2d_min_res=s2d,
    )


def generate(
    ckpt: str,
    audio_file: str,
    initialize: Optional[Callable] = None,
    get_latents: Optional[Callable] = None,
    get_noise: Optional[Callable] = None,
    get_bends: Optional[Callable] = None,
    get_rewrites: Optional[Callable] = None,
    get_truncation: Optional[Callable] = None,
    output_dir: str = "./output",
    offset: float = 0,
    duration: float = -1,
    latent_file: Optional[str] = None,
    shuffle_latents: bool = False,
    G_res: int = 1024,
    out_size: int = 1024,
    fps: float = 30,
    latent_count: int = 12,
    batch: int = 8,
    truncation: float = 1.0,
    stylegan1: bool = False,
    noconst: bool = False,
    latent_dim: int = 512,
    n_mlp: int = 8,
    channel_multiplier: int = 2,
    randomize_noise: bool = False,
    ffmpeg_preset: str = "slow",
    base_res_factor: float = 1,
    output_file: Optional[str] = None,
    seed: int = 0,
    mesh=None,
    args: Optional[argparse.Namespace] = None,
) -> str:
    """Render an audio-reactive video; returns the output file path."""
    if args is None:
        kwargs = {k: v for k, v in locals().items() if k != "args"}
        args = argparse.Namespace(**kwargs)

    # smoothing independent of frame rate (reference: generate_audiovisual.py:101)
    ar.set_SMF(fps / 30)
    t0 = time.time()

    # Plugin/DSP phase runs on the host CPU backend: user reactivity code is
    # eager jnp (smoothing, percentile clips, perlin), and eager dispatch on a
    # TPU runtime is pure per-op latency — or outright unsupported on tunneled
    # backends. Synthesis below still compiles for the default (TPU) device.
    import contextlib

    try:
        cpu_dev = jax.devices("cpu")[0] if jax.default_backend() != "cpu" else None
    except RuntimeError:
        cpu_dev = None
    host_ctx = jax.default_device(cpu_dev) if cpu_dev is not None else contextlib.nullcontext()

    audio, sr, duration = ar.load_audio(audio_file, offset, duration)
    args.audio, args.sr = audio, sr
    n_frames = int(round(duration * fps))
    args.duration, args.n_frames = duration, n_frames

    # Reconcile G_res with the checkpoint's actual resolution: the config is
    # auto-inferred at load time but a stale --G_res flag would override it
    # (and silently break the noise-scale geometry, e.g. fractional sizes).
    if not stylegan1:
        from ..io import infer_generator_config, load_torch_checkpoint

        _sd = load_torch_checkpoint(ckpt)
        true_size = infer_generator_config(_sd.get("g_ema", _sd))["size"]
        del _sd
        if true_size != G_res:
            print(f"G_res={G_res} does not match checkpoint resolution {true_size}; using {true_size}")
            # A square out_size that tracked the stale G_res default is stale
            # too — leaving it would build the noise-scale geometry for the
            # wrong pyramid (first noise map lands on the wrong layer).
            # Explicit widescreen targets (1920/1080) are left alone.
            if out_size == G_res:
                print(f"out_size={out_size} tracked the stale G_res; using {true_size}")
                out_size = args.out_size = true_size
            G_res = args.G_res = true_size

    # the reference's CLI loads initialize from the default plugin file when
    # unset (generate_audiovisual.py:266-283); match that here so the default
    # get_latents/get_noise always see their lo/hi onset envelopes
    if initialize is None and get_latents is None and get_noise is None:
        from .defaults import initialize as initialize_default

        initialize = initialize_default
    with host_ctx:
        if initialize is not None:
            args = initialize(args)

        # ---- latents (generate_audiovisual.py:120-138) ----
        if get_latents is None:
            from .defaults import get_latents

        if latent_file is not None:
            latent_selection = load_latents(latent_file)
        elif stylegan1:
            # the reference requires --latent_file for SG1 (its generate_latents
            # always builds an SG2 generator, latent.py:136-159); map latents
            # through the SG1 mapping network instead
            from ..models.stylegan1 import load_stylegan1

            sg1, sg1_vars = load_stylegan1(ckpt)
            zs = jax.random.normal(jax.random.PRNGKey(seed), (latent_count, 512))
            latent_selection = jax.jit(
                lambda z: sg1.apply(sg1_vars, z, map_latents=True)
            )(zs)
        else:
            latent_selection = generate_latents(
                latent_count, ckpt, G_res, noconst, latent_dim, n_mlp, channel_multiplier, seed=seed
            )
        if shuffle_latents:
            perm = np.random.default_rng(seed).permutation(len(latent_selection))
            latent_selection = latent_selection[np.asarray(perm)]
        os.makedirs("workspace", exist_ok=True)
        save_latents(latent_selection, "workspace/last-latents.npy")

        latents = np.asarray(get_latents(selection=latent_selection, args=args), np.float32)
        print(f"{list(latents.shape)} amplitude={latents.std():.4f}")

        # ---- noise (generate_audiovisual.py:143-159) ----
        if get_noise is None:
            from .defaults import get_noise

        noise = []
        range_min, range_max, exponent = get_noise_range(out_size, G_res, stylegan1)
        for scale in range(range_min, range_max):
            h = (2 if out_size == 1080 else 1) * 2 ** exponent(scale)
            w = (2 if out_size == 1920 else 1) * 2 ** exponent(scale)
            n = get_noise(height=h, width=w, scale=scale - range_min, num_scales=range_max - range_min, args=args)
            noise.append(None if n is None else np.asarray(n, np.float32))
            if noise[-1] is not None:
                print(list(noise[-1].shape), f"amplitude={noise[-1].std():.4f}")

        # ---- bends / rewrites / truncation (generate_audiovisual.py:164-187) ----
        bends = get_bends(args=args) if get_bends is not None else []
        rewrites = get_rewrites(args=args) if get_rewrites is not None else []
        if get_truncation is not None:
            truncation_timeline = np.asarray(get_truncation(args=args), np.float32)
        else:
            truncation_timeline = float(truncation)

    # ---- generator ----
    gen, variables = load_generator_for_render(
        ckpt, G_res, out_size, noconst, latent_dim, n_mlp, channel_multiplier, base_res_factor, stylegan1
    )
    truncation_latent = None
    needs_trunc = (not isinstance(truncation_timeline, float)) or truncation_timeline != 1.0
    if needs_trunc:
        if stylegan1:
            truncation_latent = jax.jit(
                lambda k: gen.mean_latent(variables, k)
            )(jax.random.PRNGKey(seed))
        else:
            truncation_latent = jax.jit(
                lambda k: gen.apply(variables, k, method=Generator.mean_latent)
            )(jax.random.PRNGKey(seed))

    print(f"preprocessing took {time.time() - t0:.2f}s; rendering {n_frames} frames...")

    if output_file is None:
        ckpt_title = os.path.splitext(os.path.basename(ckpt))[0].lower()
        track_title = os.path.splitext(os.path.basename(audio_file))[0].lower()
        os.makedirs(output_dir, exist_ok=True)
        output_file = f"{output_dir}/{track_title}_{ckpt_title}_{uuid.uuid4().hex[:8]}.mp4"

    render(
        generator=gen,
        variables=variables,
        latents=latents,
        noise=noise,
        output_file=output_file,
        batch_size=batch,
        duration=duration,
        fps=fps,
        truncation=truncation_timeline,
        truncation_latent=truncation_latent,
        bends=bends,
        rewrites=rewrites,
        randomize_noise=randomize_noise,
        out_size=out_size,
        audio_file=audio_file,
        offset=offset,
        ffmpeg_preset=ffmpeg_preset,
        mesh=mesh,
    )
    print(f"total time taken: {(time.time() - t0) / 60:.2f} minutes")
    return output_file
