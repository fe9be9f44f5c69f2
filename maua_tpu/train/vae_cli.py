"""VAE hyperparameter-sweep entry point.

Reference: accelerate/accelerate_logcosh.py:87-229 (and the inception/segnet
variants) — a wandb-sweep trial: hyperparameters come from the sweep config,
one VAE is trained with a perceptual loss, the final "Score" scalar is logged
(27000 sentinel on divergence/OOM, with OOM batch-halving retries).

Run a single trial from the CLI:

  python -m maua_tpu.train.vae_cli --path shards/ --model logcosh \
      --latent_dim 512 --learning_rate 1e-3 --vae_alpha 10 --vae_beta 1

Under a wandb sweep agent the same flags are overridden by wandb.config keys
of the same names (the reference's `train(**wandb.config)` wiring,
accelerate_logcosh.py:226-229).
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from .vae import FAILURE_SCORE, make_perceptual_loss, sweep_trial


def build_model(args):
    from ..models.autoencoder import InceptionVAE, LogCoshVAE, VariationalConvSegNet

    hidden = tuple(int(args.number_filters) * (2**i) for i in range(args.n_layers))
    if args.model == "logcosh":
        return LogCoshVAE(
            latent_dim=int(args.latent_dim),
            hidden_dims=hidden,
            alpha=float(args.vae_alpha),
            beta=float(args.vae_beta),
            kld_weight=float(args.kl_divergence_weight),
        )
    if args.model == "inception":
        return InceptionVAE(latent_dim=int(args.latent_dim), base=int(args.number_filters))
    if args.model == "segnet":
        return VariationalConvSegNet(latent_dim=int(args.latent_dim))
    raise ValueError(f"unknown --model {args.model}")


def make_data_fn(path: str, size: int, seed: int = 0):
    from ..data import MultiResolutionRecordDataset

    dataset = MultiResolutionRecordDataset(path, resolution=size)

    def data_fn(batch_size: int):
        rng = np.random.RandomState(seed)

        def gen():
            while True:
                idx = rng.randint(0, len(dataset), size=batch_size)
                yield np.stack([dataset[int(i)] for i in idx])

        return gen()

    return data_fn


def run_trial(args, wandb_run=None) -> float:
    data_fn = make_data_fn(args.path, args.size, args.seed)

    perceptual = None
    if args.perceptual_weight > 0:
        backbone_sd = None
        if args.vgg_weights:
            import torch

            sd = torch.load(args.vgg_weights, map_location="cpu", weights_only=False)
            backbone_sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        perceptual = make_perceptual_loss(backbone_sd, image_size=args.size)

    def on_log(entry: dict) -> None:
        print(json.dumps(entry))
        if wandb_run is not None:
            wandb_run.log(entry)

    score, _variables = sweep_trial(
        lambda: build_model(args),
        data_fn,
        batch_size=args.batch_size,
        n_steps=args.iter,
        lr=args.learning_rate,
        perceptual_weight=args.perceptual_weight,
        perceptual_loss=perceptual,
        on_log=on_log,
    )
    print(json.dumps({"Score": score, "failed": score >= FAILURE_SCORE}))
    if wandb_run is not None:
        wandb_run.log({"Score": score})
    return score


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="VAE sweep trial (reference: accelerate_logcosh.py)")
    p.add_argument("--path", required=True, help=".mrec shard directory")
    p.add_argument("--model", choices=["logcosh", "inception", "segnet"], default="logcosh")
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--iter", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    # swept hyperparameters (names mirror the reference sweep config)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--number_filters", type=int, default=32)
    p.add_argument("--n_layers", type=int, default=5)
    p.add_argument("--vae_alpha", type=float, default=10.0)
    p.add_argument("--vae_beta", type=float, default=1.0)
    p.add_argument("--kl_divergence_weight", type=float, default=1.0)
    p.add_argument("--perceptual_weight", type=float, default=0.0)
    p.add_argument("--vgg_weights", type=str, default=None, help="torchvision vgg16 state dict for the perceptual loss")
    p.add_argument("--wandb", action="store_true")
    p.add_argument("--wandb_project", type=str, default="maua-stylegan")
    args = p.parse_args(argv)

    wandb_run = None
    if args.wandb:
        try:
            import wandb

            wandb_run = wandb.init(project=args.wandb_project, config=vars(args))
            # under a sweep agent, wandb.config carries the swept values —
            # they override the CLI defaults (reference: train(**wandb.config))
            for k, v in dict(wandb_run.config).items():
                if hasattr(args, k):
                    setattr(args, k, v)
        except Exception as e:
            print(f"wandb unavailable ({e}); running standalone")

    run_trial(args, wandb_run)
    if wandb_run is not None:
        wandb_run.finish()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
