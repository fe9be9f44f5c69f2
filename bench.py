"""Benchmark: 1024² StyleGAN2 synthesis throughput on the attached TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} for the
flagship fast path (bf16 synthesis); extra keys record the fp32 fast-parity
operating point (the one that meets BOTH north-star targets: ≥60 fps AND
≤1e-3 vs the torch reference) and its measured max error against the actual
reference model at 256² full width. Context lines go to stderr.
Baseline: the driver's north-star of 60 frames/sec/chip at 1024²
(BASELINE.md — the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# persistent compile cache (host-keyed — stale cross-host CPU AOT artifacts
# SIGSEGV, see maua_tpu/compile_cache.py): the 1024² generator takes minutes
# to compile through the TPU tunnel; cache hits make repeat runs start fast
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from maua_tpu.compile_cache import setup_compile_cache

setup_compile_cache()

import jax.numpy as jnp

BASELINE_FPS = 60.0


def bench_dtype(dtype, batch: int = 64, n1: int = 2, n2: int = 6) -> float:
    """Pipelined synthesis throughput with an HONEST completion barrier.

    The tunneled runtime (a) dedupes repeat dispatches of identical inputs and
    (b) returns early from block_until_ready (measured: 19 ms for a chain whose
    value took 7.4 s to arrive) — so every iteration gets a distinct latent and
    the barrier is a host fetch of a scalar computed from the LAST dispatch
    (the single chip executes dispatches in order, so the last one completing
    implies all completed). Two run lengths; per-iter = slope, cancelling the
    fixed dispatch+fetch tunnel latency. Dispatches stay independent — the
    pipelined shape is the realistic streaming-render dispatch pattern.
    """
    from maua_tpu.models import Generator, auto_s2d_min_res

    gen = Generator(
        size=1024, constant_input=True, dtype=dtype, s2d_min_res=auto_s2d_min_res(1024)
    )
    init_rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = jax.jit(lambda: gen.init(init_rngs, jnp.zeros((1, 512))))()

    @jax.jit
    def synth(z):
        img, _ = gen.apply(variables, z, randomize_noise=False)
        return img, jnp.mean(img.astype(jnp.float32))

    zs = [
        jax.random.normal(jax.random.PRNGKey(2 + i), (batch, 512))
        for i in range(n1 + n2 + 1)
    ]
    jax.block_until_ready(zs)
    float(synth(zs[-1])[1])  # compile + warmup

    def run(zlist):
        t0 = time.time()
        out = None
        for z in zlist:
            out = synth(z)
        float(out[1])  # fetch = completion barrier for the in-order queue
        return time.time() - t0

    t1 = run(zs[:n1])
    t2 = run(zs[n1 : n1 + n2])
    return batch * (n2 - n1) / (t2 - t1)


def parity_err_vs_reference(size: int = 256, batch: int = 2):
    """Max abs error of the fast-parity point vs the actual torch reference
    (full-width generator, identical weights + stored noise). Returns None if
    the reference repo is not mounted."""
    import numpy as np

    ref_dir = "/root/reference"
    if not os.path.isdir(os.path.join(ref_dir, "models")):
        return None
    import torch
    import torch.utils.cpp_extension as ce

    ce.load = lambda *a, **k: None  # CUDA JIT stub; CPU paths don't use it
    sys.path.insert(0, ref_dir)
    import models.stylegan2 as ref_sg2

    torch.manual_seed(0)
    g_ref = ref_sg2.Generator(size, 512, 8).eval()
    sd = {k: v.detach() for k, v in g_ref.state_dict().items()}
    z = np.random.RandomState(1).randn(batch, 512).astype(np.float32)
    mean_w = np.random.RandomState(2).randn(512).astype(np.float32)
    g_ref.truncation_latent = torch.from_numpy(mean_w)
    with torch.no_grad():
        img_ref, _ = g_ref(
            [torch.from_numpy(z)],
            truncation=torch.from_numpy(np.ones(batch, np.float32)),
            randomize_noise=False,
        )
    img_ref = img_ref.numpy()
    del g_ref

    from maua_tpu.io import generator_variables_from_torch, infer_generator_config
    from maua_tpu.models import Generator, auto_s2d_min_res

    cfg = infer_generator_config(sd)
    gen = Generator(
        **cfg,
        s2d_min_res=auto_s2d_min_res(cfg["size"], cfg["channel_multiplier"], cfg["channel_max"]),
    )
    variables = generator_variables_from_torch(sd)

    with jax.default_matmul_precision("high"):

        @jax.jit
        def f(zz):
            img, _ = gen.apply(
                variables,
                zz,
                truncation=jnp.ones(batch),
                truncation_latent=jnp.asarray(mean_w),
                randomize_noise=False,
            )
            return img

        out = np.asarray(f(jnp.asarray(z)))
    return float(np.abs(out - img_ref).max())


def bench_train_step(
    size: int = 256, batch: int = 8, accum: int = 1, n1: int = 2, n2: int = 6,
    fast_warp: bool = False, warp_method: str | None = None,
    compute_flops: bool = True, reg_chunks: int = 1, remat_synth: bool = False,
) -> float:
    """Full GAN train step (D + ADA + lazy regs + G + lookahead + EMA), bf16.
    256² b8 is the packed-warp ADA operating point (train/augment); 1024²
    b4×3 honors the reference's flagship config (train.py:366,375: batch 12
    @1024² with accumulation) with the 1×-grid ADA warp + discriminator s2d.

    State chains through iterations (true sequential dependency) and the
    barrier is a host fetch of the final metrics scalar — block_until_ready
    returns early through the tunnel (see bench_dtype). Per-iter = two-run
    slope to cancel fixed tunnel latency."""
    import time as _time

    from maua_tpu.train import init_train_state, make_train_config, make_train_step

    cfg = make_train_config(
        size=size, batch_size=batch, num_accumulate=accum, bf16=True,
        lookahead=True, augment=True, d_reg_every=16, g_reg_every=4,
        ada_fast_warp=fast_warp, ada_warp_method=warp_method,
        reg_chunks=reg_chunks, remat_synth=remat_synth,
    )
    state, gen, disc = init_train_state(jax.random.PRNGKey(0), cfg)
    raw_step = make_train_step(gen, disc, cfg)
    step = jax.jit(raw_step)
    # uint8 NHWC reals — the production loader path (device-side
    # transpose+normalize, train/step.py) and 12× less HBM than fp32 CHW
    # (at 1024² batch 12 the fp32 buffers alone tipped the chip over);
    # two alternating buffers + a distinct rng key per call keep every
    # dispatch's input tuple unique for the deduping tunnel
    reals = [
        jax.random.randint(
            jax.random.PRNGKey(10 + i), (accum, batch, size, size, 3), 0, 256,
            dtype=jnp.uint8,
        )
        for i in range(2)
    ]
    jax.block_until_ready(reals)

    # AMORTIZED per-iteration FLOPs (honest MFU): whole-trace cost_analysis
    # counts BOTH lax.cond lazy-reg branches at full weight, overstating MFU
    # ~1.6x at 256² (round-4 VERDICT). Pin the iteration counter to a
    # constant so XLA folds each cond and dead-code-eliminates the branch
    # that cannot fire, then weight the reg deltas by their reg_every:
    #   step=1 -> neither reg;  step=g_reg_every (not a d_reg multiple) ->
    #   path only;  step=0 -> both.  (d_reg_every is a multiple of
    #   g_reg_every in all shipped configs, so an R1-only pin can't exist.)
    def _pinned_flops(pin: int) -> float:
        def f(st, real, key):
            import jax.numpy as _jnp

            return raw_step(st.replace(step=_jnp.full((), pin, _jnp.int32)), real, key)

        cost = jax.jit(f).lower(state, reals[-1], jax.random.PRNGKey(1)).compile().cost_analysis()
        return float((cost or {}).get("flops", 0.0))

    try:
        if not compute_flops:
            raise RuntimeError("flops skipped")
        f_steady = _pinned_flops(1)
        f_with_path = _pinned_flops(cfg.g_reg_every)
        f_both = _pinned_flops(0)
        f_path = max(f_with_path - f_steady, 0.0)
        f_r1 = max(f_both - f_with_path, 0.0)
        bench_train_step.last_flops = (
            f_steady + f_r1 / cfg.d_reg_every + f_path / cfg.g_reg_every
        )
    except Exception:
        bench_train_step.last_flops = 0.0
    _, m = step(state, reals[-1], jax.random.PRNGKey(1))
    float(m["Discriminator"])  # compile + warmup

    def run(k0, k):
        st = state
        t0 = _time.time()
        m = None
        for i in range(k):
            st, m = step(st, reals[(k0 + i) % 2], jax.random.PRNGKey(1 + k0 + i))
        float(m["Discriminator"])  # fetch = completion barrier
        return _time.time() - t0

    t1 = run(0, n1)
    t2 = run(n1, n2)
    return (t2 - t1) / (n2 - n1) * 1000


def main() -> int:
    fps_bf16 = bench_dtype(jnp.bfloat16)
    print(f"bf16 1024^2 synth: {fps_bf16:.2f} frames/s", file=sys.stderr)

    result = {
        "metric": "synth_1024_frames_per_sec_per_chip",
        "value": round(fps_bf16, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps_bf16 / BASELINE_FPS, 3),
    }

    # fast-parity operating point: fp32 with 3-pass body convs — must meet
    # BOTH ≥60 fps and ≤1e-3 vs reference (BASELINE.md north stars)
    try:
        with jax.default_matmul_precision("high"):
            fps_parity = bench_dtype(jnp.float32, batch=32)
        print(f"fp32 fast-parity 1024^2 synth: {fps_parity:.2f} frames/s", file=sys.stderr)
        result["parity_mode_fps"] = round(fps_parity, 2)
        result["parity_mode_vs_baseline"] = round(fps_parity / BASELINE_FPS, 3)
    except Exception as e:  # never fail the headline metric
        print(f"fast-parity bench failed: {e}", file=sys.stderr)

    try:
        err = parity_err_vs_reference()
        if err is not None:
            print(f"fast-parity max err vs torch reference @256^2: {err:.3e}", file=sys.stderr)
            result["parity_mode_max_err_vs_reference_256"] = err
    except Exception as e:
        print(f"parity check failed: {e}", file=sys.stderr)

    # 256² with the gather-free FFT-shear ADA warp (train/fft_warp.py) — the
    # recommended TPU training mode; the warp's gather/scatter was the
    # measured ~78% of the gather-mode step (PARITY.md phase profile)
    try:
        ms = bench_train_step(warp_method="fft")
        print(f"train step 256^2 batch 8 bf16 (fft warp): {ms:.0f} ms", file=sys.stderr)
        result["train_step_256_ms"] = round(ms, 1)
        result["train_imgs_per_sec"] = round(8 / (ms / 1000), 2)
        if bench_train_step.last_flops:
            # MFU vs v5e bf16 peak (197 TFLOP/s); FLOPs are the AMORTIZED
            # per-iteration estimate (steady branches + lazy regs / reg_every
            # — see _pinned_flops), matching the PARITY.md phase math
            result["train_256_mfu"] = round(
                bench_train_step.last_flops / (ms / 1000) / 197e12, 3)
            result["train_mfu_method"] = (
                "amortized flops: steady + r1/d_reg_every + path/g_reg_every "
                "(cond-pinned XLA cost_analysis) / measured steady-state ms"
            )
    except Exception as e:
        print(f"train-step bench failed: {e}", file=sys.stderr)

    # flagship 1024² training config (reference train.py:366,375: global
    # batch 12) — run as ONE batch-12 microbatch, FFT-shear warp, G+D s2d.
    # reg_chunks=3 bounds the lazy double-backward HBM (exact: chunk 4 is a
    # stddev_group multiple) and remat_synth frees G's activation set during
    # the G backward — together they fit batch 12 without accumulation, -19%
    # steady step vs 4×3 (PARITY.md batch-12×1 table). Gather-warp honest
    # baselines for the same configs: 1065 ms @256² (exact 2× warp), 7934 ms
    # here (1×-grid fast warp, 4×3), 2026-08-18
    try:
        ms = bench_train_step(size=1024, batch=12, accum=1, n1=1, n2=3, warp_method="fft",
                              reg_chunks=3, remat_synth=True)
        print(f"train step 1024^2 batch 12x1 bf16 (fft warp): {ms:.0f} ms", file=sys.stderr)
        result["train_step_1024_ms"] = round(ms, 1)
        result["train_1024_imgs_per_sec"] = round(12 / (ms / 1000), 2)
        if bench_train_step.last_flops:
            # same amortized-flops method as train_256_mfu
            result["train_1024_mfu"] = round(
                bench_train_step.last_flops / (ms / 1000) / 197e12, 3)
    except Exception as e:
        print(f"1024 train-step bench failed: {e}", file=sys.stderr)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
