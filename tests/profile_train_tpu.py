"""Dev utility: per-phase train-step profile on the attached TPU chip.

Times each phase of the GAN train step (D fwd/bwd, R1 double-backward, G
fwd/bwd, path-length double-backward, ADA p-update, lookahead+EMA tail)
as its own jitted program, and reports XLA's own FLOP estimate + achieved
TFLOP/s + MFU per phase. This is the TPU equivalent of the reference's
per-phase NVTX ranges (reference: train_profile.py:141-286).

The "amortized" column divides the lazy phases by their reg_every so the
table sums to an effective per-iteration cost comparable to the fused
train_step time (lazy phases run every d_reg_every/g_reg_every iterations,
reference train.py:195-205,242-249).

Usage: python tests/profile_train_tpu.py --size 256 --batch 8 --bf16
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

from maua_tpu.compile_cache import setup_compile_cache

setup_compile_cache()
import jax.numpy as jnp

from maua_tpu.train import init_train_state, make_train_config, make_train_phases, make_train_step

# v5e MXU peak (per chip): 197 TFLOP/s bf16, ~49 TFLOP/s fp32 (bf16 pass count)
PEAK_BF16 = 197e12
PEAK_FP32 = 49e12

p = argparse.ArgumentParser()
p.add_argument("--size", type=int, default=256)
p.add_argument("--batch", type=int, default=8)
p.add_argument("--accum", type=int, default=1)
p.add_argument("--s2d", type=int, default=-1)
p.add_argument("--bf16", action="store_true")
p.add_argument("--fast_warp", action="store_true")
p.add_argument("--iters", type=int, default=6)
p.add_argument("--no_fused", action="store_true", help="skip the fused full-step timing")
args = p.parse_args()

cfg = make_train_config(
    size=args.size, batch_size=args.batch, num_accumulate=args.accum,
    augment=True, lookahead=True, bf16=args.bf16, ada_fast_warp=args.fast_warp,
    d_reg_every=16, g_reg_every=4, s2d_min_res=args.s2d,
)
state, gen, disc = init_train_state(jax.random.PRNGKey(0), cfg)
phases = make_train_phases(gen, disc, cfg)
peak = PEAK_BF16 if args.bf16 else PEAK_FP32

reals = jax.random.normal(
    jax.random.PRNGKey(10), (args.accum, args.batch, 3, args.size, args.size)
)
jax.block_until_ready(reals)

# the D phase's aux output feeds the ada phase; get a concrete one first
d_jit = jax.jit(phases["d"])
state2, d_aux = d_jit(state, reals, jax.random.PRNGKey(1))
jax.block_until_ready(d_aux)


def bench(name, fn, *inputs_per_iter):
    """Time a jitted phase. inputs_per_iter: a list per positional arg, one
    entry per iteration — the tunnel dedupes repeat dispatches of identical
    inputs, so every iteration must differ in at least one arg."""
    jit_fn = jax.jit(fn)
    first = [col[0] for col in inputs_per_iter]
    try:
        lowered = jit_fn.lower(*first)
        cost = lowered.compile().cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))
    except Exception:
        flops = 0.0
    out = jit_fn(*first)  # compile + warmup
    jax.block_until_ready(out)
    n = len(inputs_per_iter[0])
    t0 = time.time()
    outs = [jit_fn(*[col[i] for col in inputs_per_iter]) for i in range(n)]
    jax.block_until_ready(outs)
    ms = (time.time() - t0) / n * 1000
    return {"name": name, "ms": ms, "gflops": flops / 1e9,
            "tflops_s": flops / (ms / 1000) / 1e12 if ms > 0 else 0.0,
            "mfu": flops / (ms / 1000) / peak if ms > 0 else 0.0}


n = args.iters
keys = [jax.random.PRNGKey(100 + i) for i in range(n)]
states = [state] * n
reals_col = [reals] * n
rows = []
rows.append(bench("D fwd/bwd (incl. ADA warp x2, G fwd)", phases["d"], states, reals_col, keys))
rows.append(bench("R1 double-backward", phases["r1"], states, reals_col, keys))
rows.append(bench("G fwd/bwd (incl. ADA warp)", phases["g"], states, keys))
rows.append(bench("path-length double-backward", phases["path"], states, keys))
rows.append(bench("ADA p-update", phases["ada"], states, [d_aux] * n))
rows.append(bench("lookahead + EMA tail", phases["tail"], states))

# attribution: the ADA augment pipeline alone (fwd), on the same batch shape
from maua_tpu.train.augment import augment as _augment

def aug_only(img, key, ada_p):
    out, _ = _augment(img, ada_p, rng=key, fast_warp=cfg.ada_fast_warp)
    return out

imgs = [reals[0]] * n
rows.append(bench("  [attribution] ADA augment fwd only", aug_only, imgs, keys,
                  [jnp.asarray(0.5)] * n))

def synth_only(st, key):
    from maua_tpu.train.step import _mixed_wplus
    kw, kn = jax.random.split(key)
    wplus = _mixed_wplus(gen, st.g_params, st.g_buffers, kw, args.batch, cfg)
    img, _ = gen.apply(
        {"params": st.g_params, "buffers": st.g_buffers}, wplus,
        input_is_latent=True, randomize_noise=True, rngs={"noise": kn},
    )
    return img

rows.append(bench("  [attribution] G synth fwd only", synth_only, states, keys))

if not args.no_fused:
    step = jax.jit(make_train_step(gen, disc, cfg))
    # step=0 -> both lazy branches taken (worst case); also measure steady state
    st1, m = step(state, reals, jax.random.PRNGKey(1))
    jax.block_until_ready(m)
    t0 = time.time()
    outs = [step(state, reals, k) for k in keys]
    jax.block_until_ready(outs)
    fused_reg_ms = (time.time() - t0) / n * 1000
    # steady state: step where neither reg fires (step=1: 1%16!=0 and 1%4!=0)
    st_nr = state.replace(step=jnp.asarray(1, jnp.int32))
    m2 = step(st_nr, reals, jax.random.PRNGKey(2))
    jax.block_until_ready(m2)
    t0 = time.time()
    outs = [step(st_nr, reals, k) for k in keys]
    jax.block_until_ready(outs)
    fused_noreg_ms = (time.time() - t0) / n * 1000
else:
    fused_reg_ms = fused_noreg_ms = float("nan")

amort_total = 0.0
print(f"\n## phase profile: size={args.size} batch={args.batch}x{args.accum} "
      f"bf16={args.bf16} fast_warp={args.fast_warp} s2d={cfg.s2d_min_res}")
print(f"| phase | ms | GFLOP | TFLOP/s | MFU | amortized ms/iter |")
print(f"|---|---|---|---|---|---|")
for r in rows:
    amort = r["ms"]
    if r["name"].startswith("R1"):
        amort = r["ms"] / cfg.d_reg_every
    elif r["name"].startswith("path"):
        amort = r["ms"] / cfg.g_reg_every
    if not r["name"].startswith("  ["):
        amort_total += amort
    print(f"| {r['name']} | {r['ms']:.1f} | {r['gflops']:.0f} | "
          f"{r['tflops_s']:.1f} | {r['mfu']*100:.0f}% | {amort:.1f} |")
print(f"| **sum (amortized)** | | | | | **{amort_total:.1f}** |")
print(f"| fused step, both regs firing | {fused_reg_ms:.1f} | | | | |")
print(f"| fused step, no reg (steady) | {fused_noreg_ms:.1f} | | | | |")

try:
    ms = jax.local_devices()[0].memory_stats()
    print(f"HBM peak: {ms.get('peak_bytes_in_use', 0)/2**30:.2f} GiB")
except Exception:
    pass
