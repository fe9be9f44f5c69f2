"""Training entry point: the host-side loop around the jitted train step.

Reference: train.py:351-613 — argparse, model/optimizer setup, dataset,
train loop with rank-0 logging, periodic sample grids / FID / checkpoints.
Run:  python -m maua_tpu.train.cli --path shards/ --size 256

Logging goes to stdout + a metrics.jsonl in the run dir (wandb is used when
importable and --wandb is passed, mirroring train.py:602-606)."""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, MultiResolutionRecordDataset
from ..parallel import get_mesh, is_main_process
from .checkpoint import latest_checkpoint, load_torch_training_checkpoint, restore_checkpoint, save_checkpoint
from .step import init_train_state, make_train_config, make_train_step


def save_image_grid(images: np.ndarray, path: str, n_cols: int = 4) -> None:
    """[-1,1] NCHW -> contact sheet png (reference: train.py:277-285 sample grids)."""
    from PIL import Image

    imgs = ((np.clip(images, -1, 1) + 1) * 127.5).astype(np.uint8).transpose(0, 2, 3, 1)
    n, h, w, _ = imgs.shape
    n_rows = -(-n // n_cols)
    sheet = np.zeros((n_rows * h, n_cols * w, 3), np.uint8)
    for i, img in enumerate(imgs):
        r, c = divmod(i, n_cols)
        sheet[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(sheet).save(path)


def train_loop(args) -> None:
    # multi-host bring-up FIRST (before any backend init): rendezvous with the
    # coordinator so jax.devices() spans all processes' chips (reference:
    # train.py:432-447 torch.distributed env:// rendezvous)
    from ..parallel import maybe_initialize_distributed, process_count

    multiprocess = maybe_initialize_distributed(
        getattr(args, "coordinator", None),
        getattr(args, "num_processes", None),
        getattr(args, "process_id", None),
    )
    if multiprocess:
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    mesh = get_mesh()
    cfg = make_train_config(
        size=args.size,
        batch_size=args.batch_size,
        num_accumulate=args.num_accumulate,
        lr=args.lr,
        r1=args.r1,
        path_regularize=args.path_regularize,
        d_reg_every=args.d_reg_every,
        g_reg_every=args.g_reg_every,
        mixing_prob=args.mixing,
        channel_multiplier=args.channel_multiplier,
        channel_max=args.channel_max,
        constant_input=not args.noconst,
        augment=args.augment,
        augment_p=args.augment_p,
        ada_target=args.ada_target,
        ada_length=args.ada_length,
        lookahead=args.lookahead,
        la_steps=args.la_steps,
        la_alpha=args.la_alpha,
        bcr_weight=args.balanced_consistency,
        contrastive_weight=args.contrastive,
        contrastive_momentum=args.contrastive_momentum,
        contrastive_queue=args.contrastive_queue,
        bf16=args.bf16,
        s2d_min_res=args.s2d_min_res,
        # auto: the 1×-output-grid ADA warp is the measured high-res operating
        # point (4× fewer gather/scatter windows); exact 2× oversampling at
        # low res where the warp is cheap
        ada_fast_warp=(args.size >= 512 if args.ada_fast_warp < 0 else bool(args.ada_fast_warp)),
        # auto: the gather-free FFT-shear warp (train/fft_warp.py) on
        # accelerators — the dominant measured step cost at every size is the
        # warp's gather/scatter, which this removes; the gather paths remain
        # for CPU (cheap there) and as the parity oracle
        ada_warp_method=(
            None
            if args.ada_warp == "auto" and jax.default_backend() == "cpu"
            else ("fft" if args.ada_warp == "auto" else (args.ada_warp or None))
        ),
        ada_fft_taper=(args.ada_fft_taper if args.ada_fft_taper > 0 else None),
        ada_fft_taper_conditional=not args.ada_fft_taper_always,
        # auto: chunk the lazy-reg double-backwards into stddev-group-sized
        # pieces at ≥512² (their peak HBM is what bounds the batch there —
        # measured at 1024² b12); a no-op at small sizes
        reg_chunks=(
            args.reg_chunks
            if args.reg_chunks > 0
            else (max(1, args.batch_size // 4) if args.size >= 512 else 1)
        ),
        # auto: rematerialize G synthesis in the G phase at ≥512² (the G
        # backward otherwise holds G's AND D's activation sets; bit-identical
        # metrics, and the enabler — with reg_chunks — for batch 12 @1024²)
        remat_synth=(
            args.remat_synth > 0
            if args.remat_synth >= 0
            else args.size >= 512
        ),
    )
    if getattr(args, "print_config", False):
        import json as _json

        print(_json.dumps(cfg._asdict()))
        return
    state, gen, disc = init_train_state(jax.random.PRNGKey(args.seed), cfg)
    step_fn = jax.jit(make_train_step(gen, disc, cfg))

    # jitted EMA sampler for FID-in-training: eager dispatch is slow
    # everywhere and unsupported on the tunneled axon backend
    from functools import partial as _partial

    # reference FID sampling protocol (validation/metrics.py:86,100-103):
    # synthesize with truncation toward the EMA mean latent; eval/metrics.fid
    # draws the per-batch truncation U(0.9, 1.5) and passes it in
    @jax.jit
    def _fid_mean_latent(g_ema_params, g_buffers, key):
        return gen.apply(
            {"params": g_ema_params, "buffers": g_buffers}, key, method=type(gen).mean_latent
        )

    @_partial(jax.jit, static_argnames=("batch",))
    def _fid_synth(g_ema_params, g_buffers, mean_w, key, batch, trunc):
        z = jax.random.normal(key, (batch, cfg.latent_dim))
        img, _ = gen.apply(
            {"params": g_ema_params, "buffers": g_buffers},
            z,
            truncation=jnp.broadcast_to(trunc, (batch,)),
            truncation_latent=mean_w,
            randomize_noise=False,
        )
        return img

    # replicated output so rank 0 can np.asarray() it for the PNG even when
    # the computation spanned a multi-process mesh
    from ..parallel import replicated

    @_partial(jax.jit, out_shardings=replicated(mesh))
    def _grid_synth(g_ema_params, g_buffers, z):
        img, _ = gen.apply({"params": g_ema_params, "buffers": g_buffers}, z, randomize_noise=False)
        return img

    if args.checkpoint:
        if args.checkpoint.endswith(".pt"):
            state = load_torch_training_checkpoint(args.checkpoint, state, args.transfer_mapping_only)
        else:
            state = restore_checkpoint(args.checkpoint, state)
    elif args.resume:
        latest = latest_checkpoint(args.run_dir)
        if latest:
            state = restore_checkpoint(latest, state)

    # uint8 input pipeline by default: the loader ships [A,B,H,W,3] uint8 and
    # the jitted step normalizes on device — 4x less host->device traffic
    # (train/step.py). --no_uint8_loader restores host-side fp32 conversion.
    dataset = MultiResolutionRecordDataset(
        args.path, resolution=args.size, uint8_hwc=not args.no_uint8_loader
    )
    loader = DataLoader(
        dataset,
        batch_size=cfg.batch_size,
        num_accumulate=cfg.num_accumulate,
        num_workers=args.num_workers,
        mesh=mesh,
        seed=args.seed,
    )

    os.makedirs(args.run_dir, exist_ok=True)
    metrics_file = open(os.path.join(args.run_dir, "metrics.jsonl"), "a")
    wandb_run = None
    if args.wandb and is_main_process():
        try:
            import wandb

            wandb_run = wandb.init(project=args.wandb_project, config=vars(args))
        except Exception as e:
            print(f"wandb unavailable ({e}); logging to jsonl only")

    sample_z = jax.random.normal(jax.random.PRNGKey(args.seed + 1), (args.n_sample, cfg.latent_dim))

    # periodic eval during training (reference: train.py:287-305). Two
    # metrics: FID (requires precomputed stats + ideally real inception
    # weights — see eval/cli.py) and SWD (eval/swd.py — weight-free sliced
    # Wasserstein over pyramid patches; the trajectory metric usable in
    # environments without pretrained backbones)
    eval_feats = None
    real_stats = None
    swd_reals = None
    if args.eval_every > 0 and multiprocess:
        print("eval-in-training is single-process only (host-side loops); skipping")
    elif args.eval_every > 0 and args.eval_metric == "swd":
        n_swd = min(args.swd_n_sample, len(dataset))
        reals = np.stack([dataset[i] for i in range(n_swd)])
        if reals.dtype == np.uint8:  # loader-default uint8 HWC records
            reals = reals.transpose(0, 3, 1, 2).astype(np.float32) / 127.5 - 1.0
        swd_reals = reals
    elif args.eval_every > 0 and args.inception_stats:
        import pickle

        from ..eval.cli import _feature_net

        eval_feats, eval_pretrained, eval_fingerprint = _feature_net(
            args.inception_weights, getattr(args, 'fid_inception', False))
        with open(args.inception_stats, "rb") as f:
            real_stats = pickle.load(f)

    # observability: phase-level trace capture + out-of-band device monitor
    # (reference: train_profile.py NVTX phases, gpumon.py daemon)
    monitor = None
    if args.monitor:
        from ..telemetry.monitor import DeviceMonitor
        from ..telemetry.profiling import install_compile_metrics

        install_compile_metrics()  # accumulate XLA trace/lower/compile timings
        monitor = DeviceMonitor(os.path.join(args.run_dir, "tpumon.jsonl"), wandb_run=wandb_run).start()
    trace_ctx = None
    if args.profile:
        from ..telemetry import profile_trace

        trace_ctx = profile_trace(os.path.join(args.run_dir, "trace"))
        trace_ctx.__enter__()

    from ..telemetry import phase

    spec_state = None
    if args.log_spec_norm:
        from ..telemetry import init_spectral_state

        spec_state = {
            "G": init_spectral_state(state.g_params),
            "D": init_spectral_state(state.d_params),
        }

    rng = jax.random.PRNGKey(args.seed + 2)
    start = int(state.step)
    t_last = time.time()
    for i in range(start, args.iter):
        with phase("data"):
            real = next(loader)
        rng, key = jax.random.split(rng)
        with phase("train_step"):
            state, metrics = step_fn(state, real, key)
        if args.profile and i - start >= args.profile_iters:
            trace_ctx.__exit__(None, None, None)
            trace_ctx = None
            args.profile = False

        if i % args.log_every == 0:
            # computed on EVERY process (jitted work over global-mesh params
            # must be entered by all processes or the run deadlocks); IO is
            # rank-0-gated below
            jax.block_until_ready(metrics)
            log = {k: float(v) for k, v in metrics.items()}
            if spec_state is not None:
                # power-iteration spectral norms (reference: train.py:259-275)
                from ..telemetry import spectral_norms
                from ..telemetry.spectral import summarize

                for net, params in (("G", state.g_params), ("D", state.d_params)):
                    sigmas, spec_state[net] = spectral_norms(params, spec_state[net])
                    log.update({f"{net} {k}": v for k, v in summarize(sigmas).items()})
            log["step"] = i
            log["sec_per_iter"] = (time.time() - t_last) / max(args.log_every, 1)
            t_last = time.time()
            if is_main_process():
                print(json.dumps({k: round(v, 5) if isinstance(v, float) else v for k, v in log.items()}))
                metrics_file.write(json.dumps(log) + "\n")
                metrics_file.flush()
                if wandb_run is not None:
                    wandb_run.log(log, step=i)

        if args.img_every > 0 and i % args.img_every == 0:
            imgs = _grid_synth(state.g_ema_params, state.g_buffers, sample_z)
            if is_main_process():
                save_image_grid(np.asarray(imgs), os.path.join(args.run_dir, f"samples/{i:07d}.png"))

        if (
            swd_reals is not None
            and args.eval_every > 0
            and i > 0
            and i % args.eval_every == 0
        ):
            from ..eval.swd import swd as swd_fn

            n_swd = swd_reals.shape[0]
            fakes = []
            kf = jax.random.PRNGKey(args.seed + 7 + i)
            mean_w = _fid_mean_latent(
                state.g_ema_params, state.g_buffers, jax.random.PRNGKey(args.seed)
            )
            for start in range(0, n_swd, args.fid_batch):
                b = min(args.fid_batch, n_swd - start)
                kf, kb = jax.random.split(kf)
                img = _fid_synth(
                    state.g_ema_params, state.g_buffers, mean_w,
                    kb, args.fid_batch, jnp.asarray(1.0),
                )
                fakes.append(np.asarray(img[:b], np.float32))
            scores = swd_fn(swd_reals, np.concatenate(fakes))
            scores["step"] = i
            print(json.dumps({"SWD": scores["swd_avg"], "step": i}))
            metrics_file.write(json.dumps(scores) + "\n")
            metrics_file.flush()
            if wandb_run is not None:
                wandb_run.log({"SWD": scores["swd_avg"]}, step=i)

        if (
            process_count() == 1  # FID's host-side feature loop reads per-batch
            # frames with np.asarray — only valid when every shard is addressable
            and real_stats is not None
            and args.eval_every > 0
            and i > 0
            and i % args.eval_every == 0
        ):
            from ..eval import fid as fid_fn

            mean_w = _fid_mean_latent(
                state.g_ema_params, state.g_buffers, jax.random.PRNGKey(args.seed)
            )

            def synthesize(key, batch, trunc):
                return _fid_synth(
                    state.g_ema_params, state.g_buffers, mean_w, key, batch, jnp.asarray(trunc)
                )

            scores = fid_fn(
                synthesize, eval_feats, real_stats,
                n_sample=args.fid_n_sample, batch_size=args.fid_batch,
            )
            scores["step"] = i
            scores["pretrained"] = eval_pretrained
            scores["weights_fingerprint"] = eval_fingerprint
            print(json.dumps({"FID": scores["fid"], "step": i}))
            metrics_file.write(json.dumps(scores) + "\n")
            metrics_file.flush()
            if wandb_run is not None:
                wandb_run.log({"FID": scores["fid"]}, step=i)

        # EVERY process must enter save_checkpoint: orbax's save runs a
        # sync_global_processes barrier (process_allgather) — a rank-0-only
        # call deadlocks the coordination service (observed: 30 s Gloo
        # GetKeyValue timeout). Orbax gates the actual writes to the primary
        # host internally.
        if args.checkpoint_every > 0 and i > 0 and i % args.checkpoint_every == 0:
            save_checkpoint(args.run_dir, state, step=i)

    save_checkpoint(args.run_dir, state)
    loader.close()
    metrics_file.close()
    if monitor is not None:
        monitor.stop()
    if trace_ctx is not None:
        trace_ctx.__exit__(None, None, None)
    if multiprocess:
        # orderly teardown: without this the coordinator process can exit
        # while a lagging rank is still polling the coordination service,
        # which the peer escalates to a FATAL "leader died" abort (observed
        # on the 2-process localhost test). shutdown() barriers + disconnects.
        jax.distributed.shutdown()


def build_parser() -> argparse.ArgumentParser:
    # flags mirror reference train.py:354-426
    p = argparse.ArgumentParser(description="maua_tpu StyleGAN2-ADA training")
    p.add_argument("--path", type=str, required=True, help="record-shard directory")
    p.add_argument("--run_dir", type=str, default="runs/default")
    p.add_argument("--iter", type=int, default=20_000)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--num_accumulate", type=int, default=1)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--r1", type=float, default=1e-5)
    p.add_argument("--path_regularize", type=float, default=2.0)
    p.add_argument("--d_reg_every", type=int, default=16)
    p.add_argument("--g_reg_every", type=int, default=4)
    p.add_argument("--mixing", type=float, default=0.9)
    p.add_argument("--channel_multiplier", type=int, default=2)
    p.add_argument("--channel_max", type=int, default=512,
                   help="fmap cap (StyleGAN fmap_max); narrow models for tests/smoke runs")
    p.add_argument("--noconst", action="store_true")
    p.add_argument("--augment", action="store_true", default=True)
    p.add_argument("--no-augment", dest="augment", action="store_false")
    p.add_argument("--augment_p", type=float, default=0.0)
    p.add_argument("--ada_target", type=float, default=0.6)
    p.add_argument("--ada_length", type=float, default=15_000)
    p.add_argument("--lookahead", action="store_true", default=True)
    p.add_argument("--no-lookahead", dest="lookahead", action="store_false")
    p.add_argument("--la_steps", type=int, default=500)
    p.add_argument("--la_alpha", type=float, default=0.5)
    p.add_argument("--balanced_consistency", type=float, default=0.0)
    p.add_argument("--print_config", action="store_true",
                   help="print the resolved TrainConfig as JSON and exit (wiring check)")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 conv compute in G/D (params fp32) — the TPU fast path")
    p.add_argument("--s2d_min_res", type=int, default=-1,
                   help="polyphase (s2d) generator evaluation from this resolution up; -1=auto, 0=off")
    p.add_argument("--reg_chunks", type=int, default=-1,
                   help="split lazy-reg (R1/path) microbatches into k sequential "
                        "chunks — exact, bounds the double-backward peak HBM; "
                        "-1 = auto (batch/4 at >=512², else 1)")
    p.add_argument("--remat_synth", type=int, default=-1,
                   help="jax.checkpoint on G synthesis in the G phase (bit-"
                        "identical, trades one synthesis fwd for the whole G "
                        "activation set of peak HBM); -1 = auto (on at >=512²)")
    p.add_argument("--ada_warp", type=str, default="auto",
                   choices=["auto", "", "fft", "matmul", "conv"],
                   help="ADA geometric warp: auto = FFT-shear on accelerators / "
                        "gather on CPU; '' = platform-auto gather; matmul/conv = "
                        "that specific gather path; fft = always FFT-shear")
    p.add_argument("--ada_fft_taper", type=float, default=0.85,
                   help="fft-warp raised-cosine band taper start (fraction of "
                        "Nyquist); <=0 disables the taper entirely")
    p.add_argument("--ada_fft_taper_always", action="store_true",
                   help="apply the fft-warp taper to ALL rows (round-3 "
                        "behavior) instead of only fractionally-shifted ones")
    p.add_argument("--ada_fast_warp", type=int, default=-1,
                   help="1x-output-grid ADA warp: -1=auto (on for size>=512), 0=off, 1=on")
    p.add_argument("--contrastive", type=float, default=0.0)
    p.add_argument("--contrastive_momentum", type=float, default=0.0,
                   help="MoCo momentum key-encoder beta (0 = keys through D itself)")
    p.add_argument("--contrastive_queue", type=int, default=0,
                   help="MoCo negative-key ring buffer size (multiple of 2*batch; 0 = off)")
    p.add_argument("--checkpoint", type=str, default=None, help=".pt (torch) or orbax dir")
    p.add_argument("--transfer_mapping_only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--checkpoint_every", type=int, default=1000)
    p.add_argument("--img_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--n_sample", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--no_uint8_loader", action="store_true",
                   help="ship fp32 CHW batches (host-side conversion) instead "
                        "of the default uint8 NHWC device-normalized pipeline")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb_project", type=str, default="maua_tpu")
    p.add_argument("--log_spec_norm", action="store_true")
    p.add_argument("--eval_every", type=int, default=0, help="metric interval (0 = off)")
    p.add_argument("--eval_metric", type=str, default="fid", choices=["fid", "swd"],
                   help="fid needs --inception_stats (+ ideally real weights); swd "
                        "(eval/swd.py) is weight-free — right for convergence "
                        "trajectories without pretrained backbones")
    p.add_argument("--swd_n_sample", type=int, default=256,
                   help="real/fake set size for --eval_metric swd")
    p.add_argument("--inception_stats", type=str, default=None, help="pkl from eval.cli inception")
    p.add_argument("--inception_weights", type=str, default=None)
    p.add_argument("--fid_inception", action="store_true", help="inception_weights are pytorch-fid pt_inception")
    p.add_argument("--fid_n_sample", type=int, default=2500)
    p.add_argument("--fid_batch", type=int, default=6)
    p.add_argument("--profile", action="store_true", help="capture an xprof trace of the first iters")
    p.add_argument("--profile_iters", type=int, default=5)
    p.add_argument("--monitor", action="store_true", help="background HBM/RSS monitor to tpumon.jsonl")
    # multi-host rendezvous (reference: train.py:432-447 --local_rank + env://
    # init_process_group); also honors COORDINATOR_ADDRESS/NUM_PROCESSES/
    # PROCESS_ID env vars when flags are absent
    p.add_argument("--coordinator", type=str, default=None,
                   help="host:port of process 0 for multi-host runs (jax.distributed)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def main(argv=None) -> int:
    train_loop(build_parser().parse_args(argv))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
