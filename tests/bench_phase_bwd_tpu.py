"""Dev utility: forward vs backward cost of each s2d phase op on the chip,
at the exact shapes the 1024² flagship generator uses (channel table: 128ch
@256-grid native, 64ch @512 res, 32ch @1024 res).

Round-5 motivation: the 1024² phase profile shows G fwd at 22% MFU but
G fwd/bwd at 8% (bwd ≈ 4× fwd; healthy is ≈2×) — this attributes which
adjoint is pathological. Tunnel-honest timing: chained carries, value-fetch
barrier, two-run-length slope (see tests/profile_train_tpu.py).

Usage: python tests/bench_phase_bwd_tpu.py [--batch 4] [--fp32]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

from maua_tpu.compile_cache import setup_compile_cache

setup_compile_cache()
import jax.numpy as jnp

from maua_tpu.ops.s2d import (
    depth_to_space,
    fir_taps,
    phase_conv3x3,
    phase_conv_up_blur,
    phase_conv1x1,
    phase_upsample,
    space_to_depth,
)

p = argparse.ArgumentParser()
p.add_argument("--batch", type=int, default=4)
p.add_argument("--fp32", action="store_true")
p.add_argument("--iters", type=int, default=6)
args = p.parse_args()
B = args.batch
dtype = jnp.float32 if args.fp32 else jnp.bfloat16
PEAK = 49e12 if args.fp32 else 197e12


def bench(name, fn, x0, w, flops):
    """fn(x, w) -> y; times fwd and fwd+bwd (grad wrt x AND w).

    Tunnel-honest: the carry (next x) is computed INSIDE the jitted fn from
    this call's result, so calls are truly sequential AND every dispatch has
    distinct inputs (the tunnel dedupes identical ones); the multiplier is
    kept ≥1.04 so the perturbation survives bf16 rounding, and the fwd+bwd
    carry is RMS-normalized so the chain can't overflow."""
    n1, n2 = 2, 2 + args.iters

    def fwd(x):
        y = fn(x, w)
        s = jnp.mean(y.astype(jnp.float32))
        nxt = x * (1.05 + 0.01 * jnp.tanh(s)).astype(x.dtype)
        return nxt, s

    def fwdbwd(x):
        def loss(xx, ww):
            return jnp.sum(fn(xx, ww).astype(jnp.float32) ** 2)

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        g32 = gx.astype(jnp.float32)
        nxt = (g32 * jax.lax.rsqrt(jnp.mean(g32**2) + 1e-20)).astype(x.dtype)
        return nxt, jnp.mean(g32) + jnp.mean(
            jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)), gw, jnp.zeros(())
            )
        )

    for tag, f, mult in (("fwd", fwd, 1.0), ("fwd+bwd", fwdbwd, 3.0)):
        jf = jax.jit(f)
        out = jf(x0)
        float(out[1])

        def run(k):
            x = x0
            o = None
            t0 = time.time()
            for _ in range(k):
                o = jf(x)
                x = o[0]
            float(o[1])
            return time.time() - t0

        t1, t2 = run(n1), run(n2)
        ms = (t2 - t1) / (n2 - n1) * 1000
        eff = flops * mult / (ms / 1000) / PEAK
        print(f"[row] {name} {tag}: {ms:.1f} ms  (~{flops*mult/1e9:.0f} GFLOP nominal, MFU~{eff*100:.0f}%)",
              flush=True)


key = jax.random.PRNGKey(0)

# res-512 up conv: native 128ch @256 -> phase 4*64 @256 (dense 4x4 kernel)
x = jax.random.normal(key, (B, 128, 256, 256), dtype)
w = jax.random.normal(key, (64, 128, 3, 3), dtype) * 0.05
taps = fir_taps([1, 3, 3, 1], 4.0)
f = lambda xx, ww: phase_conv_up_blur(xx, ww, taps)
bench("up_blur 256->512 (128->64ch)", f, x, w, 2 * B * 256 * 256 * 128 * 256 * 16)

# res-512 second conv: phase3x3 [B,256,256,256], w [64,64,3,3]
x = jax.random.normal(key, (B, 256, 256, 256), dtype)
w = jax.random.normal(key, (64, 64, 3, 3), dtype) * 0.05
bench("conv3x3 @512res (64ch phase)", phase_conv3x3, x, w,
      2 * B * 256 * 256 * 256 * 256 * 9)

# res-1024 up conv: phase in -> d2s -> native 64 @512 -> phase 4*32 @512
xp = jax.random.normal(key, (B, 256, 256, 256), dtype)
w = jax.random.normal(key, (32, 64, 3, 3), dtype) * 0.05
f = lambda xx, ww: phase_conv_up_blur(depth_to_space(xx), ww, taps)
bench("d2s+up_blur 512->1024 (64->32ch)", f, xp, w, 2 * B * 512 * 512 * 64 * 128 * 16)

# res-1024 second conv: phase3x3 [B,128,512,512], w [32,32,3,3]
x = jax.random.normal(key, (B, 128, 512, 512), dtype)
w = jax.random.normal(key, (32, 32, 3, 3), dtype) * 0.05
bench("conv3x3 @1024res (32ch phase)", phase_conv3x3, x, w,
      2 * B * 512 * 512 * 128 * 128 * 9)

# ToRGB 1x1 @1024res: phase [B,128,512,512] -> [B,12,512,512]
x = jax.random.normal(key, (B, 128, 512, 512), dtype)
w1 = jax.random.normal(key, (3, 32), dtype) * 0.1
bench("torgb1x1 @1024res", lambda xx, ww: phase_conv1x1(xx, ww), x, w1,
      2 * B * 512 * 512 * 128 * 12)

# skip pyramid upsample @1024res: native rgb [B,3,512,512] -> phase [B,12,512,512]
x = jax.random.normal(key, (B, 3, 512, 512), dtype)
wd = jnp.zeros((1,), dtype)  # unused weight slot
bench("phase_upsample rgb 512->1024", lambda xx, ww: phase_upsample(xx, [1, 3, 3, 1]) + ww[0] * 0,
      x, wd, 2 * B * 512 * 512 * 3 * 12 * 9)

# s2d/d2s roundtrip alone (layout cost)
x = jax.random.normal(key, (B, 256, 256, 256), dtype)
bench("d2s+s2d roundtrip @512res", lambda xx, ww: space_to_depth(depth_to_space(xx)) + ww[0] * 0,
      x, wd, 1)
