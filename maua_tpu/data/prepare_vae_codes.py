"""prepare_vae_codes: encode a record dataset through a trained VAE and store
the latent codes as a new record dataset (reference: prepare_vae_codes.py:
15-80 — LMDB of VAE codes for training generators in latent space).

Run:  python -m maua_tpu.data.prepare_vae_codes --path shards/ --size 128 \
          --vae_ckpt vae.orbax --out codes/
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from .records import MultiResolutionRecordDataset, RecordShardWriter


def encode_dataset(
    model,
    variables,
    path: str,
    size: int,
    out_dir: str,
    batch: int = 16,
    shard_size: int = 4096,
    name: str = "codes",
) -> int:
    """Encode every image; codes stored as float32 .npy blobs in .mrec shards
    keyed by resolution 0 (codes have no spatial resolution)."""
    ds = MultiResolutionRecordDataset(path, resolution=size)

    @jax.jit
    def encode(x):
        out = model.apply(
            variables, x, rngs={"latent": jax.random.PRNGKey(0)},
            mutable=["batch_stats"],
        )[0]
        recon, mu, log_var = out
        return mu

    os.makedirs(out_dir, exist_ok=True)
    writer = None
    shard_idx = 0
    written = 0
    for start in range(0, len(ds), batch):
        imgs = np.stack([ds[i] for i in range(start, min(start + batch, len(ds)))])
        pad = batch - len(imgs)
        if pad:
            imgs = np.concatenate([imgs, imgs[-1:].repeat(pad, 0)])
        mu = np.asarray(encode(jnp.asarray(imgs)))[: batch - pad or batch]
        for code in mu:
            if writer is None or written % shard_size == 0:
                if writer is not None:
                    writer.close()
                writer = RecordShardWriter(os.path.join(out_dir, f"{name}-0-{shard_idx:04d}.mrec"))
                shard_idx += 1
            writer.append(pickle.dumps(code.astype(np.float32)))
            written += 1
    if writer is not None:
        writer.close()
    return written


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="encode dataset to VAE codes")
    p.add_argument("--path", required=True)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--vae_ckpt", type=str, default=None, help="orbax dir of trained LogCoshVAE")
    args = p.parse_args(argv)

    from ..models.autoencoder import LogCoshVAE

    model = LogCoshVAE(latent_dim=args.latent_dim)
    x0 = jnp.zeros((1, 3, args.size, args.size))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)}, x0
    )
    if args.vae_ckpt:
        import orbax.checkpoint as ocp

        variables = ocp.StandardCheckpointer().restore(os.path.abspath(args.vae_ckpt), jax.device_get(variables))

    n = encode_dataset(model, variables, args.path, args.size, args.out, args.batch)
    print(f"encoded {n} codes -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
