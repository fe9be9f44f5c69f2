"""Benchmark: 1024² StyleGAN2 synthesis throughput on the attached TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver's north-star of 60 frames/sec/chip at 1024²
(BASELINE.md — the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_FPS = 60.0


def main() -> int:
    from maua_tpu.models import Generator

    size = 1024
    batch = 8
    n_iters = 10

    gen = Generator(size=size, constant_input=True)
    cpu = jax.devices("cpu")[0] if any(d.platform == "cpu" for d in jax.devices()) else None
    init_rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda: gen.init(init_rngs, jnp.zeros((1, 512))))()

    @jax.jit
    def synth(z):
        img, _ = gen.apply(variables, z, randomize_noise=False)
        return img

    z = jax.random.normal(jax.random.PRNGKey(2), (batch, 512))

    # warmup/compile
    synth(z).block_until_ready()

    t0 = time.time()
    for i in range(n_iters):
        out = synth(z)
    out.block_until_ready()
    dt = time.time() - t0

    fps = batch * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "synth_1024_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
