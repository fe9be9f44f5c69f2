"""Standalone metric CLIs (reference: validation/calc_fid.py, calc_ppl.py,
calc_inception.py — the first two had broken imports upstream; these work).

  python -m maua_tpu.eval.cli inception --path shards/ --size 256 --out stats.pkl
  python -m maua_tpu.eval.cli fid --ckpt g.pt --stats stats.pkl --n_sample 50000
  python -m maua_tpu.eval.cli ppl --ckpt g.pt --n_sample 5000

InceptionV3 weights: pass --inception_weights at a torchvision inception_v3
state dict (the reference's choice), or add --fid_inception for a pytorch-fid
state dict (pt_inception-2015-12-05-*.pth); without it a randomly-initialized
feature net is used (relative numbers only — clearly labeled).
"""

from __future__ import annotations

import argparse
import json
import pickle
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _feature_net(weights_path: str | None, fid_variant: bool = False):
    from .inception import InceptionV3, inception_variables_from_torch
    from .metrics import weights_fingerprint

    # default torchvision semantics = reference's validation stack; pass
    # fid_variant=True when `weights_path` is a pytorch-fid pt_inception .pth
    net = InceptionV3(fid_variant=fid_variant)
    if weights_path:
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        variables = inception_variables_from_torch(sd)
        calibrated = True
    else:
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 299, 299)))
        calibrated = False

    def feats(img):
        return net.apply(variables, InceptionV3.preprocess(img))

    return feats, calibrated, weights_fingerprint(variables)


def cmd_inception(args) -> int:
    from ..data import MultiResolutionRecordDataset
    from .metrics import cached_dataset_stats

    feats, calibrated, fingerprint = _feature_net(args.inception_weights, args.fid_inception)
    ds = MultiResolutionRecordDataset(args.path, resolution=args.size)

    def batches():
        batch = []
        for i in range(len(ds)):
            batch.append(ds[i])
            if len(batch) == args.batch:
                yield np.stack(batch)
                batch = []
        if batch:
            yield np.stack(batch)

    stats = cached_dataset_stats(feats, batches(), args.out, max_items=args.n_sample)
    print(json.dumps({
        "n_features": int(stats[0].shape[0]), "calibrated": calibrated,
        "pretrained": calibrated, "weights_fingerprint": fingerprint, "out": args.out,
    }))
    return 0


def cmd_fid(args) -> int:
    from ..io.torch_ckpt import load_generator
    from ..models import Generator
    from .metrics import fid

    gen, variables = load_generator(args.ckpt)
    feats, calibrated, fingerprint = _feature_net(args.inception_weights, args.fid_inception)

    # reference sampling protocol (validation/metrics.py:86,100-103): truncate
    # toward mean_latent(2^14); per-batch truncation U(0.9, 1.5) unless fixed
    mean_w = jax.jit(
        lambda key: gen.apply(variables, key, method=Generator.mean_latent)
    )(jax.random.PRNGKey(0))

    @partial(jax.jit, static_argnames=("batch",))
    def _synth(key, batch, trunc):
        z = jax.random.normal(key, (batch, gen.style_dim))
        img, _ = gen.apply(
            variables,
            z,
            truncation=jnp.broadcast_to(trunc, (batch,)),
            truncation_latent=mean_w,
            randomize_noise=False,
        )
        return img

    def synthesize(key, batch, trunc):
        return _synth(key, batch, jnp.asarray(trunc))

    with open(args.stats, "rb") as f:
        real_stats = pickle.load(f)
    out = fid(
        synthesize, feats, real_stats, n_sample=args.n_sample, batch_size=args.batch,
        truncation=args.truncation,
    )
    out["calibrated_features"] = calibrated
    out["pretrained"] = calibrated
    out["weights_fingerprint"] = fingerprint
    out["feature_net"] = (
        ("fid-inception" if args.fid_inception else "torchvision-inception")
        + ("" if calibrated else "-random")
    )
    out["truncation"] = args.truncation if args.truncation is not None else "U(0.9,1.5)"
    print(json.dumps(out))
    return 0


def cmd_ppl(args) -> int:
    from ..io.torch_ckpt import load_generator
    from ..models import Generator
    from .metrics import ppl

    gen, variables = load_generator(args.ckpt)

    # called inside ppl()'s jitted batch fn — keep as traceable fns
    def map_latents(key, n):
        z = jax.random.normal(key, (n, gen.style_dim))
        return gen.apply(variables, z, method=Generator.get_latent)

    def synthesize_from_w(w):
        wp = jnp.repeat(w[:, None, :], gen.n_latent, axis=1)
        img, _ = gen.apply(variables, wp, input_is_latent=True, randomize_noise=False)
        return img

    if args.lpips_weights:
        from ..train.vae import make_perceptual_loss
        from .metrics import weights_fingerprint
        import torch

        sd = torch.load(args.lpips_weights, map_location="cpu", weights_only=False)
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        pl = make_perceptual_loss(sd, net="vgg")
        dist = lambda a, b: jax.vmap(lambda x, y: pl(x[None], y[None]))(a, b)
        dist_name = "lpips-vgg"
        fingerprint: str | None = weights_fingerprint(sd)
    else:
        # multi-scale L2 as the perceptual proxy when no LPIPS weights exist
        def dist(a, b):
            total = jnp.zeros(a.shape[0])
            for s in (1, 2, 4):
                aa = a[:, :, ::s, ::s]
                bb = b[:, :, ::s, ::s]
                total = total + jnp.mean(jnp.square(aa - bb), axis=(1, 2, 3))
            return total

        dist_name = "multiscale-l2-proxy"
        fingerprint = None

    val = ppl(synthesize_from_w, map_latents, dist, n_sample=args.n_sample, batch_size=args.batch, crop=args.crop)
    # the number is only comparable to published PPLs when distance=lpips-vgg:
    # tag the JSON so a reader of the output alone can tell
    print(json.dumps({
        "ppl": val, "distance": dist_name,
        "pretrained": args.lpips_weights is not None,
        "weights_fingerprint": fingerprint,
    }))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="standalone eval metrics")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("inception", help="precompute dataset feature stats")
    pi.add_argument("--path", required=True)
    pi.add_argument("--size", type=int, default=256)
    pi.add_argument("--batch", type=int, default=16)
    pi.add_argument("--n_sample", type=int, default=None)
    pi.add_argument("--out", type=str, required=True)
    pi.add_argument("--inception_weights", type=str, default=None)
    pi.add_argument("--fid_inception", action="store_true", help="weights are pytorch-fid pt_inception (FIDInception pools)")

    pf = sub.add_parser("fid", help="FID of a checkpoint vs cached stats")
    pf.add_argument("--ckpt", required=True)
    pf.add_argument("--stats", required=True)
    pf.add_argument("--n_sample", type=int, default=50_000)
    pf.add_argument("--batch", type=int, default=64)
    pf.add_argument("--inception_weights", type=str, default=None)
    pf.add_argument("--fid_inception", action="store_true", help="weights are pytorch-fid pt_inception (FIDInception pools)")
    pf.add_argument("--truncation", type=float, default=None,
                    help="fixed truncation; default draws U(0.9,1.5) per batch (reference protocol)")

    pp = sub.add_parser("ppl", help="perceptual path length")
    pp.add_argument("--ckpt", required=True)
    pp.add_argument("--n_sample", type=int, default=5000)
    pp.add_argument("--batch", type=int, default=16)
    pp.add_argument("--crop", action="store_true")
    pp.add_argument("--lpips_weights", type=str, default=None)

    args = p.parse_args(argv)
    return {"inception": cmd_inception, "fid": cmd_fid, "ppl": cmd_ppl}[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
