"""Dev utility: train-step throughput on the attached TPU chip.

Usage: python tests/bench_train_tpu.py [--size 256] [--batch 8] [--bf16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

from maua_tpu.compile_cache import setup_compile_cache
setup_compile_cache()
import jax.numpy as jnp

from maua_tpu.train import init_train_state, make_train_config, make_train_step

p = argparse.ArgumentParser()
p.add_argument("--size", type=int, default=256)
p.add_argument("--batch", type=int, default=8)
p.add_argument("--accum", type=int, default=1)
p.add_argument("--s2d", type=int, default=-1, help="s2d_min_res for G AND D; -1 auto, 0 off")
p.add_argument("--bf16", action="store_true")
p.add_argument("--fast_warp", action="store_true", help="1x-output-grid ADA warp (high-res mode)")
p.add_argument("--iters", type=int, default=8)
args = p.parse_args()

cfg = make_train_config(
    size=args.size, batch_size=args.batch, num_accumulate=args.accum,
    augment=True, lookahead=True, bf16=args.bf16, ada_fast_warp=args.fast_warp,
    d_reg_every=16, g_reg_every=4, s2d_min_res=args.s2d,
)
state, gen, disc = init_train_state(jax.random.PRNGKey(0), cfg)
print(f"s2d_min_res: G={gen.s2d_min_res} D={disc.s2d_min_res}", flush=True)
step = jax.jit(make_train_step(gen, disc, cfg))

reals = [
    jax.random.normal(
        jax.random.PRNGKey(10 + i), (args.accum, args.batch, 3, args.size, args.size)
    )
    for i in range(args.iters)
]
jax.block_until_ready(reals)

t0 = time.time()
state, metrics = step(state, reals[0], jax.random.PRNGKey(1))
jax.block_until_ready(metrics)
print(f"compile+first: {time.time()-t0:.1f}s", flush=True)

t0 = time.time()
for i in range(1, args.iters):
    state, metrics = step(state, reals[i], jax.random.PRNGKey(1 + i))
jax.block_until_ready(metrics)
dt = (time.time() - t0) / (args.iters - 1)
imgs_s = args.batch * args.accum / dt
print(
    f"size={args.size} batch={args.batch}x{args.accum} bf16={args.bf16}: "
    f"{dt*1000:.0f} ms/step, {imgs_s:.1f} imgs/s",
    flush=True,
)
try:
    ms = jax.local_devices()[0].memory_stats()
    print(f"HBM peak: {ms.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
          f"(limit {ms.get('bytes_limit', 0)/2**30:.2f})", flush=True)
except Exception:
    pass
for k, v in metrics.items():
    assert bool(jnp.isfinite(v)), (k, v)
print("metrics finite", flush=True)
