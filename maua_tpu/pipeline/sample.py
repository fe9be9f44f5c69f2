"""Simple image sampler (reference: generate.py:8-51): sample N images from a
checkpoint's g_ema with truncation, save as PNGs / a contact sheet.

Run:  python -m maua_tpu.pipeline.sample --ckpt g.pt --pics 16 --truncation 0.7
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def sample(
    ckpt: str,
    pics: int = 20,
    sample_batch: int = 8,
    truncation: float = 1.0,
    truncation_mean: int = 2**14,
    out_dir: str = "sample",
    seed: int = 0,
    grid: bool = True,
):
    from PIL import Image

    from ..io.torch_ckpt import load_generator
    from ..models import Generator

    gen, variables = load_generator(ckpt)
    mean_w = None
    if truncation < 1.0:
        mean_w = jax.jit(
            lambda k: gen.apply(variables, k, truncation_mean, method=Generator.mean_latent)
        )(jax.random.PRNGKey(seed + 1))

    @jax.jit
    def synth(z):
        img, _ = gen.apply(
            variables, z, truncation=truncation, truncation_latent=mean_w, randomize_noise=False
        )
        return img

    os.makedirs(out_dir, exist_ok=True)
    imgs = []
    rng = jax.random.PRNGKey(seed)
    done = 0
    while done < pics:
        rng, key = jax.random.split(rng)
        z = jax.random.normal(key, (sample_batch, gen.style_dim))
        batch = np.asarray(synth(z))
        take = min(sample_batch, pics - done)
        for i in range(take):
            arr = ((np.clip(batch[i], -1, 1) + 1) * 127.5).astype(np.uint8).transpose(1, 2, 0)
            Image.fromarray(arr).save(os.path.join(out_dir, f"{done + i:06d}.png"))
        imgs.append(batch[:take])
        done += take

    if grid:
        from ..train.cli import save_image_grid

        save_image_grid(np.concatenate(imgs), os.path.join(out_dir, "grid.png"))
    return os.path.abspath(out_dir)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="sample images from a checkpoint")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--pics", type=int, default=20)
    p.add_argument("--sample_batch", type=int, default=8)
    p.add_argument("--truncation", type=float, default=1.0)
    p.add_argument("--truncation_mean", type=int, default=2**14)
    p.add_argument("--out_dir", type=str, default="sample")
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args(argv)
    sample(a.ckpt, a.pics, a.sample_batch, a.truncation, a.truncation_mean, a.out_dir, a.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
