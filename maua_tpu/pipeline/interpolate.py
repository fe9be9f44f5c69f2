"""Latent-interpolation / noise-animation video (reference: generate_video.py).

Covers the reference's WORKING subset end-to-end:
* latent timelines — spline/slerp loops over sampled latents, a static
  first-latent hold (the reference's uncommented path,
  generate_video.py:214-217), or a user .npy (`--latents`,
  generate_video.py:210-211);
* the segmented moving-noise timeline (generate_video.py:288-336): per-scale
  noise that animates in one band of the video and holds still elsewhere,
  temporally smoothed;
* the optional noise-debug video (generate_video.py:364-405): the animated
  noise scales resized to 256², normalized, written to `<output>_noise.mp4`;
* the manipulation (bend) timeline list (generate_video.py:463-523): the
  layer-0 replication-pad + add-noise manipulation auto-applied when
  out_size exceeds the checkpoint resolution (the uncommented one), plus the
  translateX / zoom / rotate per-frame timelines the reference builds at
  generate_video.py:487-523 (commented-out upstream; functional bends here).

The reference's remaining commented-out experiments (frequency-band latent
splits :218-257, the latent-debug video :409-441, circular noise masks
:278-285,337-361) are abandoned upstream and intentionally not ported.

Run:  python -m maua_tpu.pipeline.interpolate --ckpt g.pt --duration 10
"""

from __future__ import annotations

import argparse
import math
import os
import uuid

import jax
import numpy as np


def segmented_noise(
    n_frames: int,
    out_size: int,
    G_res: int,
    stylegan1: bool = False,
    moving_frames: int = 200,
    mid_start: int = 260,
    gains: tuple[float, float, float] = (2.0, 4.0, 8.0),
    max_scale_idx: int = 14,
    smooth: float = 7.0,
    seed: int = 0,
) -> list:
    """The reference's segmented moving-noise timeline
    (generate_video.py:288-336): per noise scale i —

    * i < 4 (coarse):   [moving(moving_frames) × gains[0], static hold]
    * 4 ≤ i < 8 (mid):  [static(mid_start), moving × gains[1], static]
    * i ≥ 8 (fine):     [static hold, moving × gains[2]]
    * i > max_scale_idx: dropped (None — the reference's VRAM guard :293-295)

    `moving` is gaussian_filter(randn, 3); the assembled timeline is smoothed
    again with sigma=`smooth` (generate_video.py:336). The reference hardcodes
    200/260 frames for its 720-frame default; shorter videos clip the segments
    to fit. Noise geometry matches get_noise_range (SG1 vs SG2 indexing).
    """
    from ..audio.postprocess import gaussian_filter
    from .generate import get_noise_range

    mv = max(1, min(moving_frames, n_frames // 2))
    lead = min(mid_start, max(0, n_frames - mv) // 2)

    range_min, range_max, exponent = get_noise_range(out_size, G_res, stylegan1)
    rng = np.random.RandomState(seed)
    noise: list = []
    # eager DSP runs on host CPU (the tunneled accelerator rejects some eager
    # ops — CLAUDE.md pattern); timelines are fed back to device per batch by
    # the renderer anyway
    with jax.default_device(jax.devices("cpu")[0]):
        for i, scale in enumerate(range(range_min, range_max)):
            h = (2 if out_size == 1080 else 1) * 2 ** exponent(scale)
            w = (2 if out_size == 1920 else 1) * 2 ** exponent(scale)
            if i > max_scale_idx:
                noise.append(None)
                continue
            base = rng.randn(1, 1, h, w).astype(np.float32)
            gain = gains[0] if i < 4 else gains[1] if i < 8 else gains[2]
            moving = gain * np.asarray(
                gaussian_filter(rng.randn(mv, 1, h, w).astype(np.float32), 3)
            )
            if i < 4:
                parts = [moving, np.repeat(base, n_frames - mv, axis=0)]
            elif i < 8:
                parts = [
                    np.repeat(base, lead, axis=0),
                    moving,
                    np.repeat(base, n_frames - lead - mv, axis=0),
                ]
            else:
                parts = [np.repeat(base, n_frames - mv, axis=0), moving]
            timeline = np.concatenate([p for p in parts if len(p)], axis=0)
            noise.append(np.asarray(gaussian_filter(timeline, smooth), np.float32))
    return noise


def noise_debug_video(
    noise: list, output_file: str, fps: float, size: int = 256
) -> str | None:
    """Write the animated noise scales as a video (reference noise-debug
    output, generate_video.py:364-405): each non-None scale's timeline is
    bilinearly resized to `size`² and concatenated in time, normalized to
    [0, 255] grayscale. Returns the path, or None when no scale has a
    timeline (all static/None)."""
    import cv2

    from ..render.video import VideoWriter

    segments = []
    for n in noise:
        if n is None or len(n) == 0:
            continue
        # only animated scales are informative; a scale whose frames are all
        # identical would pad the video with a freeze-frame
        if len(n) > 1 and np.ptp(n, axis=0).max() < 1e-6:
            continue
        segments.append(n[:, 0])  # [T, h, w]
    if not segments:
        return None

    vw = VideoWriter(output_file, size, size, fps)
    try:
        for seg in segments:
            lo, hi = float(seg.min()), float(seg.max())
            scale = 255.0 / max(hi - lo, 1e-8)
            for frame in seg:
                f = cv2.resize(frame, (size, size), interpolation=cv2.INTER_LINEAR)
                f = ((f - lo) * scale).clip(0, 255).astype(np.uint8)
                vw.write(np.repeat(f[:, :, None], 3, axis=2))
    finally:
        vw.close()
    return output_file


def build_manipulations(
    n_frames: int,
    out_size: int,
    G_res: int,
    translate_layer: int | None = None,
    zoom_layer: int | None = None,
    rotate_layer: int | None = None,
    seed: int = 0,
) -> list:
    """The manipulation timeline list (reference generate_video.py:463-523)
    as functional bends:

    * when out_size > G_res, layer 0 is replication-padded from 4×4 up to the
      enlarged minimum resolution and overlaid with fixed 2·N(0,1) noise — the
      reference's one UNcommented manipulation (:470-483);
    * `translate_layer`: one full-width horizontal scroll over the video
      (linspace 0→1 of the layer width, :487-490);
    * `zoom_layer`: the smoothed rise-and-fall zoom ramp in [0.5, 1.5]
      (:493-510);
    * `rotate_layer`: one smoothed 0→360° turn (:513-517).
    """
    from ..audio.postprocess import gaussian_filter
    from ..reactive import add_noise_bend, pad_bend, rotate_bend, translate_bend, zoom_bend

    rng = np.random.RandomState(seed)
    bends = []
    log_min_res = 2 + int(math.log2(out_size)) - int(math.log2(G_res))
    if log_min_res > 2:
        pad = sum(2 ** (lres - 1) for lres in range(2, log_min_res))
        bends.append(pad_bend(0, (pad, pad, pad, pad), mode="edge"))
        side = 2**log_min_res
        bends.append(
            add_noise_bend(0, 2.0 * rng.randn(1, 1, side, side).astype(np.float32))
        )

    with jax.default_device(jax.devices("cpu")[0]):
        if translate_layer is not None:
            mod = np.linspace(0.0, 1.0, n_frames, dtype=np.float32)
            bends.append(translate_bend(translate_layer, mod))
        if zoom_layer is not None:
            ramp = np.concatenate(
                [
                    np.linspace(0.0, 3.0, n_frames // 2, dtype=np.float32),
                    np.linspace(3.0, 0.0, n_frames - n_frames // 2, dtype=np.float32) + 1,
                ]
            )
            ramp = np.array(gaussian_filter(ramp, 30.0))
            ramp -= ramp.min()
            ramp /= max(ramp.max(), 1e-8)
            bends.append(zoom_bend(zoom_layer, ramp + 0.5))
        if rotate_layer is not None:
            s = 1.0 / (1.0 + np.exp(-np.linspace(0.0, 1.0, n_frames + 1)))
            s -= s.min()
            s /= max(s.max(), 1e-8)
            bends.append(rotate_bend(rotate_layer, (360.0 * s[:-1]).astype(np.float32)))
    return bends


def interpolation_video(
    ckpt: str,
    n_latents: int = 8,
    duration: float = 10.0,
    fps: float = 30.0,
    loops: int = 1,
    interp: str = "spline",  # spline | slerp | static
    truncation: float = 1.0,
    smoothing: float = 2.0,
    batch: int = 8,
    out_size: int | None = None,
    output_file: str | None = None,
    seed: int = 0,
    noise_mode: str = "stored",  # stored | segmented
    noise_debug: bool = False,
    latents_file: str | None = None,
    G_res: int | None = None,
    stylegan1: bool = False,
    noconst: bool = False,
    channel_multiplier: int = 2,
    translate_layer: int | None = None,
    zoom_layer: int | None = None,
    rotate_layer: int | None = None,
) -> str:
    from ..models import Generator
    from ..reactive import generate_latents, slerp_loops, spline_loops
    from ..render import render
    from .generate import load_generator_for_render

    n_frames = int(round(duration * fps))

    if not stylegan1 and G_res is None:
        # the checkpoint is authoritative for architecture (io/torch_ckpt);
        # infer the resolution instead of defaulting like the reference CLI
        from ..io.torch_ckpt import infer_generator_config, load_torch_checkpoint

        sd = load_torch_checkpoint(ckpt)
        G_res = infer_generator_config(sd.get("g_ema", sd))["size"]

    if latents_file is not None:  # user-picked latents (generate_video.py:210-211)
        selection = np.load(latents_file).astype(np.float32)
    elif stylegan1:
        selection = np.asarray(_stylegan1_latents(ckpt, n_latents, seed))
    else:
        selection = np.asarray(generate_latents(
            n_latents, ckpt, G_res, noconst,
            channel_multiplier=channel_multiplier, seed=seed,
        ))

    if interp == "static":
        # the reference's uncommented path: hold the first latent, let the
        # segmented noise provide the motion (generate_video.py:214-217)
        latents = np.repeat(selection[[0]], n_frames, axis=0)
    elif interp == "slerp":
        latents = slerp_loops(
            selection, n_frames, loops, smoothing=smoothing,
            n_latent=selection.shape[1],
        )
    else:
        latents = spline_loops(selection, n_frames, loops)

    res = G_res or 1024
    gen, variables = load_generator_for_render(
        ckpt, res, out_size or res, noconst, 512, 8, channel_multiplier, 1, stylegan1
    )
    eff_out = out_size or res

    noise: list = []
    if noise_mode == "segmented":
        noise = segmented_noise(n_frames, eff_out, res, stylegan1, seed=seed)

    bends = build_manipulations(
        n_frames, eff_out, res, translate_layer, zoom_layer, rotate_layer, seed
    )

    trunc_latent = None
    if truncation != 1.0:
        if stylegan1:
            trunc_latent = jax.jit(lambda k: gen.mean_latent(variables, k))(
                jax.random.PRNGKey(seed)
            )
        else:
            trunc_latent = jax.jit(
                lambda k: gen.apply(variables, k, method=Generator.mean_latent)
            )(jax.random.PRNGKey(seed))

    if output_file is None:
        os.makedirs("output", exist_ok=True)
        output_file = f"output/interp_{uuid.uuid4().hex[:8]}.mp4"

    if noise_debug and noise:
        dbg = noise_debug_video(
            noise, os.path.splitext(output_file)[0] + "_noise.mp4", fps
        )
        if dbg:
            print(dbg)

    return render(
        generator=gen,
        variables=variables,
        latents=np.asarray(latents),
        noise=noise,
        output_file=output_file,
        batch_size=batch,
        fps=fps,
        truncation=float(truncation),
        truncation_latent=trunc_latent,
        bends=bends,
        out_size=out_size,
    )


def _stylegan1_latents(ckpt: str, n: int, seed: int):
    from ..models.stylegan1 import load_stylegan1

    sg1, sg1_vars = load_stylegan1(ckpt)
    zs = jax.random.normal(jax.random.PRNGKey(seed), (n, 512))
    return np.asarray(jax.jit(lambda z: sg1.apply(sg1_vars, z, map_latents=True))(zs))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="latent interpolation / noise animation video")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--n_latents", type=int, default=8)
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--n_frames", type=int, default=None,
                   help="overrides duration*fps (reference generate_video.py flag)")
    p.add_argument("--loops", type=int, default=1)
    p.add_argument("--interp", choices=["spline", "slerp", "static"], default="spline")
    p.add_argument("--truncation", type=float, default=1.0)
    p.add_argument("--smoothing", type=float, default=2.0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out_size", type=int, default=None)
    p.add_argument("--output_file", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    # reference generate_video.py flags
    p.add_argument("--G_res", type=int, default=None)
    p.add_argument("--latents", type=str, default=None, help="latent .npy selection")
    p.add_argument("--stylegan1", action="store_true")
    p.add_argument("--const", action="store_true", help="checkpoint uses LatentInput (noconst)")
    p.add_argument("--channel_multiplier", type=int, default=2)
    # working-subset extras
    p.add_argument("--noise_mode", choices=["stored", "segmented"], default="stored",
                   help="segmented = the reference's moving-noise timeline")
    p.add_argument("--noise_debug_video", action="store_true",
                   help="also write <output>_noise.mp4 of the animated noise scales")
    p.add_argument("--translate_layer", type=int, default=None)
    p.add_argument("--zoom_layer", type=int, default=None)
    p.add_argument("--rotate_layer", type=int, default=None)
    a = p.parse_args(argv)
    duration = a.duration
    fps = a.fps
    if a.n_frames is not None:
        duration = a.n_frames / fps
    out = interpolation_video(
        a.ckpt, a.n_latents, duration, fps, a.loops, a.interp,
        a.truncation, a.smoothing, a.batch, a.out_size, a.output_file, a.seed,
        noise_mode=a.noise_mode, noise_debug=a.noise_debug_video,
        latents_file=a.latents, G_res=a.G_res, stylegan1=a.stylegan1,
        noconst=a.const, channel_multiplier=a.channel_multiplier,
        translate_layer=a.translate_layer, zoom_layer=a.zoom_layer,
        rotate_layer=a.rotate_layer,
    )
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
