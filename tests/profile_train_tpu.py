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
p.add_argument("--fft_warp", action="store_true", help="gather-free FFT-shear ADA warp")
p.add_argument("--iters", type=int, default=6)
p.add_argument("--no_fused", action="store_true", help="skip the fused full-step timing")
p.add_argument("--reg_chunks", type=int, default=1,
               help="chunk the lazy-reg double-backwards (train/step.py reg_chunks)")
p.add_argument("--remat_synth", action="store_true",
               help="jax.checkpoint on G synthesis in the G phase")
p.add_argument("--fused_only", action="store_true",
               help="time ONLY the fused step (skip the per-phase rows; "
                    "avoids ~10 fresh 1024-scale compiles when sweeping "
                    "batch/reg_chunks configurations)")
args = p.parse_args()

cfg = make_train_config(
    size=args.size, batch_size=args.batch, num_accumulate=args.accum,
    augment=True, lookahead=True, bf16=args.bf16, ada_fast_warp=args.fast_warp,
    ada_warp_method="fft" if args.fft_warp else None,
    d_reg_every=16, g_reg_every=4, s2d_min_res=args.s2d,
    reg_chunks=args.reg_chunks, remat_synth=args.remat_synth,
)
state, gen, disc = init_train_state(jax.random.PRNGKey(0), cfg)
phases = make_train_phases(gen, disc, cfg)
peak = PEAK_BF16 if args.bf16 else PEAK_FP32

reals = jax.random.normal(
    jax.random.PRNGKey(10), (args.accum, args.batch, 3, args.size, args.size)
)
jax.block_until_ready(reals)

# the D phase's aux output feeds the ada phase; get a concrete one first
# (skipped in --fused_only: it would compile the full D phase just to feed
# the ada row, which fused_only doesn't run)
if not args.fused_only:
    d_jit = jax.jit(phases["d"])
    state2, d_aux = d_jit(state, reals, jax.random.PRNGKey(1))
    jax.block_until_ready(d_aux)
else:
    d_aux = None


def bench(name, fn, carry0, make_args, pick, scalar_of, n=None):
    """Time a jitted phase through the tunnel, robustly:

    * CHAINED carry — each call's first argument derives from the previous
      call's output (`pick`), so calls are truly sequential on the device
      (the tunneled runtime pipelines independent dispatches: unchained
      timings read 5x peak MFU).
    * A host fetch of `scalar_of(final_out)` is the completion barrier —
      measured: block_until_ready returns EARLY on this tunnel (19 ms for a
      chain whose value took 7.4 s to arrive).
    * TWO chain lengths, per-iter = slope (T(n2)-T(n1))/(n2-n1) — cancels the
      fixed dispatch/fetch latency (~seconds through the tunnel).
    """
    if args.fused_only and not name.startswith("fused"):
        return {"name": name, "ms": float("nan"), "gflops": 0.0,
                "tflops_s": 0.0, "mfu": 0.0}
    n2 = (n or args.iters) + 3
    jit_fn = jax.jit(fn)
    first = (carry0, *make_args(0))
    try:
        cost = jit_fn.lower(*first).compile().cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))
    except Exception:
        flops = 0.0
    out = jit_fn(*first)  # compile + warmup
    float(scalar_of(out))

    def run(k):
        carry = carry0
        t0 = time.time()
        out = None
        for i in range(k):
            out = jit_fn(carry, *make_args(i))
            carry = pick(out)
        float(scalar_of(out))  # final depends on the whole chain
        return time.time() - t0

    t1 = run(3)
    t2 = run(n2)
    ms = (t2 - t1) / (n2 - 3) * 1000
    row = {"name": name, "ms": ms, "gflops": flops / 1e9,
           "tflops_s": flops / (ms / 1000) / 1e12 if ms > 0 else 0.0,
           "mfu": flops / (ms / 1000) / peak if ms > 0 else 0.0}
    print(f"[row] {name}: {ms:.1f} ms, {flops/1e9:.0f} GFLOP, "
          f"MFU {row['mfu']*100:.0f}%", flush=True)
    return row


key_of = lambda i: jax.random.PRNGKey(100 + i)
pick_state = lambda out: out[0]
rows = []
rows.append(bench("D fwd/bwd (incl. ADA warp x2, G fwd)", phases["d"], state,
                  lambda i: (reals, key_of(i)), pick_state,
                  lambda out: out[1]["d_loss"]))
rows.append(bench("R1 double-backward", phases["r1"], state,
                  lambda i: (reals, key_of(i)), pick_state, lambda out: out[1]))
rows.append(bench("G fwd/bwd (incl. ADA warp)", phases["g"], state,
                  lambda i: (key_of(i),), pick_state, lambda out: out[1]))
rows.append(bench("path-length double-backward", phases["path"], state,
                  lambda i: (key_of(i),), pick_state, lambda out: out[1]))
rows.append(bench("ADA p-update", phases["ada"], state,
                  lambda i: (d_aux,), pick_state, lambda out: out[0].ada_p))
rows.append(bench("lookahead + EMA tail", lambda s: (phases["tail"](s),), state,
                  lambda i: (), pick_state, lambda out: out[0].step))

# attribution: the ADA augment pipeline alone (fwd), image chained through.
# The step augments in bf16 when --bf16 (train/step.py casts before augment,
# which selects the MXU dftmm shear) — attribute the same dtype
from maua_tpu.train.augment import augment as _augment

reals_attr = reals[0].astype(jnp.bfloat16) if args.bf16 else reals[0]

def aug_only(img, key):
    out, _ = _augment(img, jnp.asarray(0.5), rng=key, fast_warp=cfg.ada_fast_warp,
                      warp_method=cfg.ada_warp_method)
    return (out, jnp.mean(out.astype(jnp.float32)))

rows.append(bench("  [attribution] ADA augment fwd only", aug_only, reals_attr,
                  lambda i: (key_of(i),), lambda out: out[0], lambda out: out[1]))


def aug_fwd_bwd(img, key):
    # the G-phase augment cost: VJP through the augmented image (the gradient
    # w.r.t. the fakes flows through augment in the G phase)
    def loss(x):
        out, _ = _augment(x, jnp.asarray(0.5), rng=key, fast_warp=cfg.ada_fast_warp,
                          warp_method=cfg.ada_warp_method)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(img)
    return (g.astype(img.dtype), jnp.mean(g.astype(jnp.float32)))

rows.append(bench("  [attribution] ADA augment fwd+bwd", aug_fwd_bwd, reals_attr,
                  lambda i: (key_of(i),), lambda out: out[0], lambda out: out[1]))


def d_fwd_only(img, key):
    pred = disc.apply({"params": state.d_params}, img)
    # the carried input must GENUINELY differ per iteration (a 1e-12 nudge
    # rounds away in bf16 and the tunnel dedupes bitwise-identical
    # dispatches) AND must DEPEND ON pred — otherwise the carry chain is
    # img→img and the D computations of successive dispatches pipeline
    # (measured: 580% "MFU" when the carry skipped pred)
    pm = jnp.mean(pred.astype(jnp.float32))
    nxt = img * (1 + 1e-4 * jnp.tanh(pm)).astype(img.dtype) + 1e-3 * jax.random.normal(
        key, img.shape, img.dtype
    )
    return (nxt, pm)

rows.append(bench("  [attribution] D fwd only", d_fwd_only, reals_attr,
                  lambda i: (key_of(i),), lambda out: out[0], lambda out: out[1]))

def synth_only(z, key):
    from maua_tpu.train.step import _mixed_wplus
    kw, kn = jax.random.split(key)
    wplus = _mixed_wplus(gen, state.g_params, state.g_buffers, kw, args.batch, cfg)
    # fold the carried z in so each call depends on the previous one's output
    wplus = wplus + 1e-12 * z[:, None, : wplus.shape[-1]]
    img, _ = gen.apply(
        {"params": state.g_params, "buffers": state.g_buffers}, wplus,
        input_is_latent=True, randomize_noise=True, rngs={"noise": kn},
    )
    z_next = img.reshape(args.batch, -1)[:, : cfg.latent_dim].astype(jnp.float32)
    return (z_next, jnp.mean(img.astype(jnp.float32)))

rows.append(bench("  [attribution] G synth fwd only", synth_only,
                  jnp.zeros((args.batch, cfg.latent_dim)),
                  lambda i: (key_of(i),), lambda out: out[0], lambda out: out[1]))


def synth_fwd_bwd(z, key):
    # isolates the G backward from the G phase (which also carries D fwd +
    # D input-bwd + augment bwd): grad of a scalar of synth(wplus) wrt
    # g_params — healthy is ~3x the fwd-only row
    from maua_tpu.train.step import _mixed_wplus
    kw, kn = jax.random.split(key)

    def loss(g_params):
        wplus = _mixed_wplus(gen, g_params, state.g_buffers, kw, args.batch, cfg)
        wplus = wplus + 1e-12 * z[:, None, : wplus.shape[-1]]
        img = gen.apply(
            {"params": g_params, "buffers": state.g_buffers}, wplus,
            input_is_latent=True, randomize_noise=True, rngs={"noise": kn},
        )[0]
        return jnp.sum(img.astype(jnp.float32) ** 2), img

    (_, img), grads = jax.value_and_grad(loss, has_aux=True)(state.g_params)
    gsum = jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32)), grads, jnp.zeros(())
    )
    z_next = img.reshape(args.batch, -1)[:, : cfg.latent_dim].astype(jnp.float32) * (
        1 + 1e-6 * jnp.tanh(gsum)
    )
    return (z_next, jnp.mean(img.astype(jnp.float32)) + 1e-9 * gsum)

rows.append(bench("  [attribution] G synth fwd+bwd only", synth_fwd_bwd,
                  jnp.zeros((args.batch, cfg.latent_dim)),
                  lambda i: (key_of(i),), lambda out: out[0], lambda out: out[1]))

if not args.no_fused:
    raw_step = make_train_step(gen, disc, cfg)

    def make_pinned(pin):  # pin the step counter INSIDE jit (no host round-trip)
        def f(st, real, key):
            st2, m = raw_step(st.replace(step=jnp.full((), pin, jnp.int32)), real, key)
            return st2, m
        return f

    # step pinned to 0 -> both lazy branches fire every iter (worst case);
    # step pinned to 1 -> neither fires (steady state)
    fused_reg_ms = bench("fused both-regs", make_pinned(0), state,
                         lambda i: (reals, key_of(i)), pick_state,
                         lambda out: out[1]["Discriminator"])["ms"]
    fused_noreg_ms = bench("fused no-reg", make_pinned(1), state,
                           lambda i: (reals, key_of(i)), pick_state,
                           lambda out: out[1]["Discriminator"])["ms"]
else:
    fused_reg_ms = fused_noreg_ms = float("nan")

rows = [r for r in rows if r["ms"] == r["ms"]]  # drop skipped (nan) rows
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
