"""Latent selection tool.

Reference: select_latents.py — a tkinter gallery where left/right clicks sort
generated latents into "intro"/"drop" sets, saved as .npy + a contact-sheet
jpg. This image has no display, so the rebuild is batch-oriented: render
numbered contact sheets of mapped latents, then select by index list
(interactive prompt or --pick) into named sets with the same .npy outputs.

Run:  python -m maua_tpu.pipeline.select_latents --ckpt g.pt --n 24 --out sel
      python -m maua_tpu.pipeline.select_latents --ckpt g.pt --pick intro=0,3,7 --pick drop=1,2
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def render_contact_sheet(images: np.ndarray, path: str, n_cols: int = 8, label: bool = True) -> None:
    """[-1,1] NCHW -> numbered contact sheet (reference: select_latents.py:
    contact-sheet jpg output)."""
    from PIL import Image, ImageDraw

    imgs = ((np.clip(images, -1, 1) + 1) * 127.5).astype(np.uint8).transpose(0, 2, 3, 1)
    n, h, w, _ = imgs.shape
    n_rows = -(-n // n_cols)
    sheet = np.zeros((n_rows * h, n_cols * w, 3), np.uint8)
    for i, img in enumerate(imgs):
        r, c = divmod(i, n_cols)
        sheet[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
    im = Image.fromarray(sheet)
    if label:
        draw = ImageDraw.Draw(im)
        for i in range(n):
            r, c = divmod(i, n_cols)
            draw.text((c * w + 4, r * h + 2), str(i), fill=(255, 64, 64))
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    im.save(path)


def generate_and_select(
    ckpt: str,
    n: int = 24,
    out_dir: str = "workspace/selection",
    picks: dict[str, list[int]] | None = None,
    truncation: float = 0.75,
    seed: int = 0,
    batch: int = 8,
    interactive: bool = False,
) -> dict[str, str]:
    """Generate n mapped latents + images; save sheet; split into sets."""
    from ..io.torch_ckpt import load_generator
    from ..models import Generator

    gen, variables = load_generator(ckpt)
    zs = jax.random.normal(jax.random.PRNGKey(seed), (n, gen.style_dim))
    wplus = jax.jit(lambda z: gen.apply(variables, z, map_latents=True))(zs)  # [n, L, D]

    mean_w = jax.jit(
        lambda k: gen.apply(variables, k, method=Generator.mean_latent)
    )(jax.random.PRNGKey(seed + 1))

    @jax.jit
    def synth(w, t):
        img, _ = gen.apply(
            variables, w, input_is_latent=True, truncation=t,
            truncation_latent=mean_w, randomize_noise=False,
        )
        return img

    imgs = []
    for i in range(0, n, batch):
        chunk = wplus[i : i + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = jnp.concatenate([chunk, chunk[-1:].repeat(pad, 0)])
        imgs.append(np.asarray(synth(chunk, jnp.asarray(truncation)))[: batch - pad or batch])
    images = np.concatenate(imgs)[:n]

    os.makedirs(out_dir, exist_ok=True)
    sheet_path = os.path.join(out_dir, "sheet.jpg")
    render_contact_sheet(images, sheet_path)
    np.save(os.path.join(out_dir, "all_latents.npy"), np.asarray(wplus))
    print(f"contact sheet: {sheet_path}")

    if interactive and picks is None:
        picks = {}
        print("enter comma-separated indices per set (empty to finish), e.g. 'intro=0,3,7'")
        while True:
            line = input("> ").strip()
            if not line:
                break
            name, _, idx = line.partition("=")
            picks[name.strip()] = [int(i) for i in idx.split(",") if i.strip()]

    outputs = {"all": os.path.join(out_dir, "all_latents.npy")}
    for name, indices in (picks or {}).items():
        sel = np.asarray(wplus)[np.asarray(indices)]
        p = os.path.join(out_dir, f"{name}_latents.npy")
        np.save(p, sel)
        render_contact_sheet(images[np.asarray(indices)], os.path.join(out_dir, f"{name}_sheet.jpg"))
        outputs[name] = p
        print(f"saved {len(indices)} latents -> {p}")
    return outputs


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="generate + select latents")
    p.add_argument("--ckpt", required=True)
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--out", type=str, default="workspace/selection")
    p.add_argument("--truncation", type=float, default=0.75)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pick", action="append", default=[], help="name=i,j,k (repeatable)")
    p.add_argument("--interactive", action="store_true")
    args = p.parse_args(argv)
    picks = {}
    for spec in args.pick:
        name, _, idx = spec.partition("=")
        picks[name] = [int(i) for i in idx.split(",") if i.strip()]
    generate_and_select(
        args.ckpt, args.n, args.out, picks or None, args.truncation, args.seed,
        interactive=args.interactive,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
