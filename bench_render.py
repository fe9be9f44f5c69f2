"""End-to-end render benchmark (not the driver hook — see bench.py).

Measures the streaming renderer's full pipeline on the attached chip:
latent timeline → jitted bf16 synthesis + uint8 packing → device→host →
video writer. Reports frames/sec end-to-end and sec per minute of video —
the BASELINE.md end-to-end metric.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import jax

from maua_tpu.compile_cache import setup_compile_cache
setup_compile_cache()

import jax.numpy as jnp
import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--fps", type=float, default=24.0)
    p.add_argument("--dtype", choices=["bf16", "fp32"], default="bf16")
    p.add_argument("--mesh", type=int, default=0,
                   help="shard the frame axis over an N-device data mesh "
                        "(sharded device-resident timeline); 0 = single device")
    args = p.parse_args()

    from maua_tpu.models import Generator
    from maua_tpu.render import render

    mesh = None
    if args.mesh:
        from maua_tpu.parallel import get_mesh

        devs = jax.devices()[: args.mesh]
        assert len(devs) == args.mesh, f"asked for {args.mesh} devices, have {len(jax.devices())}"
        mesh = get_mesh(devs)
        assert args.batch % args.mesh == 0, "--batch must divide over --mesh"

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    gen = Generator(size=args.size, constant_input=True, dtype=dtype)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda: gen.init(rngs, jnp.zeros((1, 512))))()

    # W+ timeline (distinct per frame)
    z = jax.random.normal(jax.random.PRNGKey(2), (args.frames, 512))
    w = gen.apply(variables, z, method=Generator.get_latent)
    latents = np.asarray(jnp.repeat(w[:, None, :], gen.n_latent, axis=1))

    out = os.path.join(tempfile.mkdtemp(), "bench.mp4")

    # warmup/compile with a short prefix
    render(generator=gen, variables=variables, latents=latents[: args.batch], noise=[],
           output_file=out + ".warm.mp4", batch_size=args.batch, fps=args.fps, progress=False,
           mesh=mesh)

    t0 = time.time()
    render(generator=gen, variables=variables, latents=latents, noise=[],
           output_file=out, batch_size=args.batch, fps=args.fps, progress=False, mesh=mesh)
    dt = time.time() - t0

    fps_e2e = args.frames / dt
    sec_per_min = 60.0 * args.fps / fps_e2e
    print(
        json.dumps(
            {
                "metric": f"render_{args.size}_e2e_frames_per_sec",
                "value": round(fps_e2e, 2),
                "unit": "frames/s",
                "sec_per_min_of_video": round(sec_per_min, 1),
                "dtype": args.dtype,
                "mesh_devices": args.mesh or 1,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
