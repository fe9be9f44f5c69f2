"""Benchmark: 1024² StyleGAN2 synthesis throughput on the attached TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} for the
flagship fast path (bf16 synthesis); extra context lines go to stderr.
Baseline: the driver's north-star of 60 frames/sec/chip at 1024²
(BASELINE.md — the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# persistent compile cache: the 1024² generator takes minutes to compile
# through the TPU tunnel; cache hits make repeat bench runs start in seconds
os.makedirs("/root/.cache/jax_comp_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

BASELINE_FPS = 60.0


def bench_dtype(dtype, batch: int = 16, n_iters: int = 8) -> float:
    from maua_tpu.models import Generator

    gen = Generator(size=1024, constant_input=True, dtype=dtype)
    init_rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda: gen.init(init_rngs, jnp.zeros((1, 512))))()

    @jax.jit
    def synth(z):
        img, _ = gen.apply(variables, z, randomize_noise=False)
        return img

    # distinct latents per step — the tunneled runtime dedupes repeat
    # dispatches of identical inputs, which inflates naive loops 1000x
    zs = [jax.random.normal(jax.random.PRNGKey(2 + i), (batch, 512)) for i in range(n_iters)]
    jax.block_until_ready(zs)
    synth(zs[0]).block_until_ready()  # compile + warmup

    t0 = time.time()
    outs = [synth(z) for z in zs]
    jax.block_until_ready(outs)
    dt = time.time() - t0
    return batch * n_iters / dt


def main() -> int:
    fps_bf16 = bench_dtype(jnp.bfloat16)
    print(f"bf16 1024^2 synth: {fps_bf16:.2f} frames/s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "synth_1024_frames_per_sec_per_chip",
                "value": round(fps_bf16, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps_bf16 / BASELINE_FPS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
