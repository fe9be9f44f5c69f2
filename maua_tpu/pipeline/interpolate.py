"""Latent-interpolation video (reference: generate_video.py:126-535): loop a
set of random latents with slerp or spline interpolation and render to video.

Run:  python -m maua_tpu.pipeline.interpolate --ckpt g.pt --duration 10
"""

from __future__ import annotations

import argparse
import os
import uuid

import jax
import numpy as np


def interpolation_video(
    ckpt: str,
    n_latents: int = 8,
    duration: float = 10.0,
    fps: float = 30.0,
    loops: int = 1,
    interp: str = "spline",  # spline | slerp
    truncation: float = 1.0,
    smoothing: float = 2.0,
    batch: int = 8,
    out_size: int | None = None,
    output_file: str | None = None,
    seed: int = 0,
) -> str:
    from ..io.torch_ckpt import load_generator
    from ..models import Generator
    from ..reactive import generate_latents, slerp_loops, spline_loops
    from ..render import render

    n_frames = int(round(duration * fps))
    selection = generate_latents(n_latents, ckpt, seed=seed)

    if interp == "slerp":
        latents = slerp_loops(
            np.asarray(selection), n_frames, loops, smoothing=smoothing,
            n_latent=selection.shape[1],
        )
    else:
        latents = spline_loops(np.asarray(selection), n_frames, loops)

    gen, variables = load_generator(ckpt, output_size=out_size)
    trunc_latent = None
    if truncation != 1.0:
        trunc_latent = jax.jit(
            lambda k: gen.apply(variables, k, method=Generator.mean_latent)
        )(jax.random.PRNGKey(seed))

    if output_file is None:
        os.makedirs("output", exist_ok=True)
        output_file = f"output/interp_{uuid.uuid4().hex[:8]}.mp4"

    return render(
        generator=gen,
        variables=variables,
        latents=np.asarray(latents),
        noise=[],
        output_file=output_file,
        batch_size=batch,
        fps=fps,
        truncation=float(truncation),
        truncation_latent=trunc_latent,
        out_size=out_size,
    )


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="latent interpolation video")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--n_latents", type=int, default=8)
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--loops", type=int, default=1)
    p.add_argument("--interp", choices=["spline", "slerp"], default="spline")
    p.add_argument("--truncation", type=float, default=1.0)
    p.add_argument("--smoothing", type=float, default=2.0)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--out_size", type=int, default=None)
    p.add_argument("--output_file", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)
    out = interpolation_video(
        a.ckpt, a.n_latents, a.duration, a.fps, a.loops, a.interp,
        a.truncation, a.smoothing, a.batch, a.out_size, a.output_file, a.seed,
    )
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
