"""Dev utility: fabricate a structured image dataset for end-to-end training
runs on the chip (the image has no real photo corpus). Images are smooth
random color fields (mixtures of 2-D gaussians + sinusoids) — enough spatial
statistics for the GAN losses/regularizers to produce meaningful gradients,
unlike white noise, and they JPEG-compress well.

Usage: python tests/make_synth_dataset.py --out /tmp/synth1024 --n 256 --size 1024
Then:  python -m maua_tpu.data.prepare /tmp/synth1024/img --out /tmp/synth1024/rec --sizes 1024
"""

import argparse
import os

import numpy as np


def synth_image(rng: np.random.RandomState, size: int) -> np.ndarray:
    yy, xx = np.meshgrid(
        np.linspace(-1, 1, size, dtype=np.float32),
        np.linspace(-1, 1, size, dtype=np.float32),
        indexing="ij",
    )
    img = np.zeros((size, size, 3), np.float32)
    for _ in range(rng.randint(3, 7)):
        cx, cy = rng.uniform(-1, 1, 2)
        sx, sy = rng.uniform(0.1, 0.8, 2)
        rot = rng.uniform(0, np.pi)
        xr = (xx - cx) * np.cos(rot) + (yy - cy) * np.sin(rot)
        yr = -(xx - cx) * np.sin(rot) + (yy - cy) * np.cos(rot)
        blob = np.exp(-(xr**2 / sx**2 + yr**2 / sy**2))
        img += blob[..., None] * rng.uniform(-1, 1, 3).astype(np.float32)
    for _ in range(rng.randint(1, 4)):
        fx, fy = rng.uniform(1, 6, 2)
        ph = rng.uniform(0, 2 * np.pi)
        wave = np.sin(fx * np.pi * xx + fy * np.pi * yy + ph)
        img += 0.3 * wave[..., None] * rng.uniform(-1, 1, 3).astype(np.float32)
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return (img * 255).astype(np.uint8)


def main() -> int:
    from PIL import Image

    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    img_dir = os.path.join(args.out, "img")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    for i in range(args.n):
        Image.fromarray(synth_image(rng, args.size)).save(
            os.path.join(img_dir, f"{i:05d}.jpg"), quality=92
        )
        if (i + 1) % 50 == 0:
            print(f"{i + 1}/{args.n}", flush=True)
    print(f"wrote {args.n} images to {img_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
