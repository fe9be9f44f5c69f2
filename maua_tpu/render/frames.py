"""The streaming frame renderer — the inference hot loop.

Reference design (render.py:14-193): batch the latent/noise timelines through
the generator, convert to uint8 on device, stream frames to an encoder thread.
TPU-first redesign:

* ONE jitted program per batch does synthesis + bend application + widescreen
  crop/resize + [-1,1]→uint8 HWC packing. Transferring uint8 instead of fp32
  cuts device→host traffic 4× — the reference calls itself "severely
  memory-transfer bound" (render.py:120-121), and on a tunneled TPU the
  transfer is the bottleneck by far.
* Fixed batch shapes: the tail batch is padded, never shrunk, so the jit
  cache holds exactly one executable (SURVEY.md §7 many-shape risk).
* Double buffering: batch k+1's device compute is dispatched before batch k's
  host transfer is awaited, so DMA and compute overlap; the encoder runs on a
  writer thread fed by a bounded queue (two-thread structure mirroring
  render.py:30-44,94-118).
* Multi-chip: when a mesh is passed, the batch axis is sharded over it —
  the pjit analogue of DataParallel inference (generate_audiovisual.py:54-55).
"""

from __future__ import annotations

import queue
from threading import Thread
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..reactive.bend import Bend, bends_for_batch
from ..reactive.rewrite import Rewrite, rewrites_for_batch
from .video import VideoWriter

Array = jnp.ndarray


def _pack_frames(img: Array, out_size: Optional[int]) -> Array:
    """Device-side postprocess: widescreen center-crop + resize
    (reference: render.py:98-105), then [-1,1]→uint8 HWC."""
    if out_size in (1920, 1080) and (img.shape[-1] == 2048 or img.shape[-2] == 2048):
        if out_size == 1920:  # 2048x1024-ish wide gen -> 1920x1080
            img = img[:, :, :, 112:-112] if img.shape[-1] == 2048 else img
            img = jax.image.resize(img, (img.shape[0], img.shape[1], 1080, 1920), "bilinear")
        else:  # 1080x1920 portrait
            img = img[:, :, 112:-112, :] if img.shape[-2] == 2048 else img
            img = jax.image.resize(img, (img.shape[0], img.shape[1], 1920, 1080), "bilinear")
    img = jnp.clip(img, -1.0, 1.0)
    img = (img + 1.0) * 127.5
    img = jnp.transpose(img, (0, 2, 3, 1))  # NCHW -> NHWC
    return img.astype(jnp.uint8)


def render(
    generator,
    variables: dict[str, Any],
    latents,
    noise: Sequence[Optional[Any]],
    output_file: str,
    batch_size: int = 8,
    duration: Optional[float] = None,
    fps: Optional[float] = None,
    truncation: Any = 1.0,
    truncation_latent: Optional[Array] = None,
    bends: Sequence[Bend] = (),
    rewrites: Sequence[Rewrite] = (),
    randomize_noise: bool = False,
    out_size: Optional[int] = None,
    audio_file: Optional[str] = None,
    offset: float = 0.0,
    ffmpeg_preset: str = "slow",
    mesh=None,
    progress: bool = True,
) -> str:
    """Render a full timeline to a video file. latents: [n_frames, n_latent, D];
    noise: list of per-scale [n_frames, 1, h, w] or None; truncation: float or
    [n_frames]."""
    latents = np.asarray(latents, np.float32)
    n_frames = len(latents)
    if fps is None:
        fps = n_frames / duration if duration else 30.0

    tensor_trunc = not isinstance(truncation, float)
    if tensor_trunc:
        truncation = np.asarray(truncation, np.float32).reshape(n_frames)

    noise = [None if n is None else np.asarray(n, np.float32) for n in noise or []]
    n_layers = generator.num_layers
    while len(noise) < n_layers:
        noise.append(None)

    sharding = None
    if mesh is not None:
        from ..parallel import batch_sharding

        sharding = batch_sharding(mesh)

    params = variables["params"]
    buffers = variables.get("buffers", {})

    def step(g_params, latent_b, noise_b, trunc_b, bend_pairs):
        img, _ = generator.apply(
            {"params": g_params, "buffers": buffers},
            latent_b,
            input_is_latent=True,
            noise=noise_b,
            randomize_noise=randomize_noise,
            truncation=trunc_b if tensor_trunc or truncation_latent is not None else 1.0,
            truncation_latent=truncation_latent,
            bends=bend_pairs,
        )
        return _pack_frames(img, out_size)

    jit_step = jax.jit(step, static_argnames=("bend_pairs",)) if not bends else None
    # bends close over per-batch modulation arrays -> retrace per call would
    # blow the cache; instead jit a wrapper taking modulations as arguments.
    if bends:
        bend_defs = list(bends)

        def step_with_bends(g_params, latent_b, noise_b, trunc_b, mods):
            pairs = []
            for b, m in zip(bend_defs, mods):
                pairs.append((b.layer, (lambda x, _t=b.transform, _m=m: _t(x, _m))))
            return step(g_params, latent_b, noise_b, trunc_b, pairs)

        jit_bend_step = jax.jit(step_with_bends)

    # writer thread fed by a bounded queue (backpressure keeps memory flat)
    frame_q: "queue.Queue" = queue.Queue(maxsize=4)
    wh = {1920: (1920, 1080), 1080: (1080, 1920)}.get(out_size)
    if wh is None:
        size_hw = generator.size if out_size is None else out_size
        wh = (size_hw, size_hw)
    writer = VideoWriter(
        output_file, wh[0], wh[1], fps,
        audio_file=audio_file, offset=offset, duration=duration, ffmpeg_preset=ffmpeg_preset,
    )

    def write_loop():
        remaining = n_frames
        while remaining > 0:
            batch = frame_q.get()
            take = min(remaining, len(batch))
            for i in range(take):
                writer.write(batch[i])
            remaining -= take
            frame_q.task_done()

    wt = Thread(target=write_loop, daemon=True)
    wt.start()

    pending = None  # (device_array,) double buffer
    for start in range(0, n_frames, batch_size):
        end = min(start + batch_size, n_frames)
        pad = batch_size - (end - start)

        def pad_batch(x):
            return np.concatenate([x, x[-1:].repeat(pad, axis=0)]) if pad else x

        latent_b = jnp.asarray(pad_batch(latents[start:end]))
        noise_b = [None if n is None else jnp.asarray(pad_batch(n[start:end])) for n in noise]
        trunc_b = jnp.asarray(pad_batch(truncation[start:end])) if tensor_trunc else jnp.asarray(1.0 if truncation_latent is None else truncation)

        if sharding is not None:
            latent_b = jax.device_put(latent_b, sharding)
            noise_b = [None if n is None else jax.device_put(n, sharding) for n in noise_b]

        g_params = rewrites_for_batch(params, rewrites, start, end) if rewrites else params

        if bends:
            mods = tuple(
                None if b.modulation is None else jnp.asarray(pad_batch(np.asarray(b.modulation[start:end], np.float32)))
                for b in bend_defs
            )
            out = jit_bend_step(g_params, latent_b, noise_b, trunc_b, mods)
        else:
            out = jit_step(g_params, latent_b, noise_b, trunc_b, ())

        # double buffer: fetch previous batch while this one computes
        if pending is not None:
            frame_q.put(np.asarray(jax.device_get(pending)))
        pending = out

    if pending is not None:
        frame_q.put(np.asarray(jax.device_get(pending)))

    wt.join()
    writer.close()
    return output_file
