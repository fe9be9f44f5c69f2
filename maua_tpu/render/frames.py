"""The streaming frame renderer — the inference hot loop.

Reference design (render.py:14-193): batch the latent/noise timelines through
the generator, convert to uint8 on device, stream frames to an encoder thread.
TPU-first redesign:

* The WHOLE timeline (latents, per-scale noise, truncation, bend/rewrite
  modulations) is uploaded to device HBM once; batches are eager on-device
  slices fed into a jitted step whose shapes depend only on batch_size (one
  executable serves any video length). The reference stages timelines in
  pinned host memory and pays a host→device copy per batch
  (render.py:120-148) — on TPU that cadence of small transfers is pure
  latency, so the timeline lives device-side. Timelines larger than
  `max_device_timeline_bytes` fall back to per-batch feeding.
* ONE jitted program per batch does synthesis + bends + widescreen
  crop/resize + [-1,1]→uint8 HWC packing. Transferring uint8 instead of fp32
  cuts device→host traffic 4× — the reference calls itself "severely
  memory-transfer bound" (render.py:120-121).
* Fixed batch shapes: the tail batch is padded once before upload, so the jit
  cache holds exactly one executable (SURVEY.md §7 many-shape risk).
* Double buffering: batch k+1 is dispatched before batch k's device→host
  fetch, overlapping compute with DMA; a writer thread drains a bounded queue
  into the encoder (two-thread structure mirroring render.py:30-44,94-118).
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

from ..reactive.bend import Bend
from ..reactive.rewrite import Rewrite, apply_rewrites
from .video import VideoWriter

Array = jnp.ndarray


def _pack_frames(img: Array, out_size: Optional[int]) -> Array:
    """Device-side postprocess: widescreen center-crop + resize
    (reference: render.py:98-105), then [-1,1]→uint8 HWC."""
    if out_size in (1920, 1080) and (img.shape[-1] == 2048 or img.shape[-2] == 2048):
        if out_size == 1920:  # 2048-wide gen -> 1920x1080
            img = img[:, :, :, 112:-112] if img.shape[-1] == 2048 else img
            img = jax.image.resize(img, (img.shape[0], img.shape[1], 1080, 1920), "bilinear")
        else:  # portrait
            img = img[:, :, 112:-112, :] if img.shape[-2] == 2048 else img
            img = jax.image.resize(img, (img.shape[0], img.shape[1], 1920, 1080), "bilinear")
    img = jnp.clip(img, -1.0, 1.0)
    img = (img + 1.0) * 127.5 + 0.5  # round-to-nearest like the native host converter
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
    max_device_timeline_bytes: int = 8 << 30,
) -> str:
    """Render a full timeline to a video file. latents: [n_frames, n_latent, D];
    noise: list of per-scale [n_frames, 1, h, w] or None; truncation: float or
    [n_frames]."""
    latents = np.asarray(latents, np.float32)
    n_frames = len(latents)
    if fps is None:
        fps = n_frames / duration if duration else 30.0

    tensor_trunc = not isinstance(truncation, float)
    if truncation_latent is None and (tensor_trunc or truncation != 1.0):
        # never silently drop truncation: the generator's lerp needs the mean
        # latent (generate() precomputes it; direct callers must too)
        raise ValueError(
            "truncation != 1 requires truncation_latent — precompute it with "
            "Generator.mean_latent (generate() does this automatically)"
        )
    apply_trunc = truncation_latent is not None and (tensor_trunc or truncation != 1.0)

    noise = [None if n is None else np.asarray(n, np.float32) for n in noise or []]
    n_layers = generator.num_layers
    while len(noise) < n_layers:
        noise.append(None)

    # ---- pad timelines once so every batch has identical shape ----
    n_padded = -(-n_frames // batch_size) * batch_size

    def pad_t(x):
        x = np.asarray(x)
        if len(x) == n_padded:
            return x
        reps = np.concatenate([x, np.repeat(x[-1:], n_padded - len(x), axis=0)])
        return reps

    latents = pad_t(latents)
    noise = [None if n is None else pad_t(n) for n in noise]
    trunc_t = pad_t(np.asarray(truncation, np.float32).reshape(-1)) if tensor_trunc else None
    bend_mods = [None if b.modulation is None else pad_t(np.asarray(b.modulation, np.float32)) for b in bends]
    rw_mods = [None if r.modulation is None else pad_t(np.asarray(r.modulation, np.float32)) for r in rewrites]

    sharding = None
    if mesh is not None:
        from ..parallel import batch_sharding

        sharding = batch_sharding(mesh)

    # ---- stage timelines on device (HBM) when they fit ----
    # under a mesh the whole timeline is staged SHARDED: reshaped to
    # [n_batches, batch_size, ...] with the batch axis split over the data
    # axis (P(None, "data")), so indexing batch b eagerly yields an
    # already-distributed batch with zero data movement — mesh rendering
    # keeps the same no-per-batch-h2d property as the single-chip path
    total_bytes = latents.nbytes + sum(0 if n is None else n.nbytes for n in noise)
    mesh_ok = sharding is None or batch_size % mesh.devices.size == 0
    device_timeline = total_bytes <= max_device_timeline_bytes and mesh_ok

    def stage(x):
        if x is None:
            return None
        if sharding is None:
            return jax.device_put(x)
        from ..parallel import train_batch_sharding

        xr = np.asarray(x).reshape(n_padded // batch_size, batch_size, *x.shape[1:])
        return jax.device_put(xr, train_batch_sharding(mesh))

    if device_timeline:
        latents_dev = stage(latents)
        noise_dev = [stage(n) for n in noise]
        trunc_dev = stage(trunc_t)
        bmods_dev = [stage(m) for m in bend_mods]
        rmods_dev = [stage(m) for m in rw_mods]

    params = variables["params"]
    buffers = variables.get("buffers", {})
    bend_defs = list(bends)
    rw_defs = list(rewrites)

    def synth_batch(g_params, latent_b, noise_b, trunc_b, bmods_b):
        pairs = []
        for b, m in zip(bend_defs, bmods_b):
            pairs.append((b.layer, (lambda x, _t=b.transform, _m=m: _t(x, _m))))
        img, _ = generator.apply(
            {"params": g_params, "buffers": buffers},
            latent_b,
            input_is_latent=True,
            noise=noise_b,
            randomize_noise=randomize_noise,
            truncation=trunc_b if apply_trunc else 1.0,
            truncation_latent=truncation_latent,
            bends=pairs,
        )
        return _pack_frames(img, out_size)

    def step_fed(g_params, latent_b, noise_b, trunc_b, bmods_b, rmods_b):
        if rw_defs:
            g_params = apply_rewrites(g_params, rw_defs, list(rmods_b))
        return synth_batch(g_params, latent_b, noise_b, trunc_b, bmods_b)

    # the executable depends only on [batch, ...] shapes — one compile per
    # (model, batch_size), reused across any video length
    jit_step = jax.jit(step_fed)

    # ---- writer thread fed by a bounded queue (backpressure bounds memory) ----
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

    trunc_scalar = jnp.asarray(truncation if isinstance(truncation, float) else 1.0)

    pending = None  # double buffer
    for start in range(0, n_padded, batch_size):
        sl = slice(start, start + batch_size)
        if device_timeline and sharding is not None:
            # eager leading-axis index of the [n_batches, batch, ...] staged
            # form: the result is already P("data")-sharded, no movement
            bi = start // batch_size
            latent_b = latents_dev[bi]
            noise_b = [None if n is None else n[bi] for n in noise_dev]
            trunc_b = trunc_dev[bi] if trunc_dev is not None else trunc_scalar
            bmods_b = tuple(None if m is None else m[bi] for m in bmods_dev)
            rmods_b = tuple(None if m is None else m[bi] for m in rmods_dev)
        elif device_timeline:
            # eager on-device slices: no host→device traffic per batch
            latent_b = latents_dev[sl]
            noise_b = [None if n is None else n[sl] for n in noise_dev]
            trunc_b = trunc_dev[sl] if trunc_dev is not None else trunc_scalar
            bmods_b = tuple(None if m is None else m[sl] for m in bmods_dev)
            rmods_b = tuple(None if m is None else m[sl] for m in rmods_dev)
        else:
            latent_b = jnp.asarray(latents[sl])
            noise_b = [None if n is None else jnp.asarray(n[sl]) for n in noise]
            trunc_b = jnp.asarray(trunc_t[sl]) if trunc_t is not None else trunc_scalar
            bmods_b = tuple(None if m is None else jnp.asarray(m[sl]) for m in bend_mods)
            rmods_b = tuple(None if m is None else jnp.asarray(m[sl]) for m in rw_mods)
            if sharding is not None:
                latent_b = jax.device_put(latent_b, sharding)
                noise_b = [None if n is None else jax.device_put(n, sharding) for n in noise_b]

        out = jit_step(params, latent_b, noise_b, trunc_b, bmods_b, rmods_b)

        # two-stage pipeline: fetch batch k here (overlapping batch k+1's
        # device compute) while the writer thread encodes batch k-1
        if pending is not None:
            frame_q.put(np.asarray(jax.device_get(pending)))
        pending = out

    if pending is not None:
        frame_q.put(np.asarray(jax.device_get(pending)))

    wt.join()
    writer.close()
    return output_file
