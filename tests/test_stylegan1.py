"""StyleGAN1 inference-port tests: fabricate a lernapparat-format state dict,
ingest, and synthesize (reference: models/stylegan1.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.models.stylegan1 import (
    StyleGAN1,
    _nf,
    g1_mapping,
    stylegan1_variables_from_torch,
)


def fabricate_sg1_sd(size=32, seed=0):
    """Random G_style state dict with the lernapparat key schema
    (reference: models/stylegan1.py:193-217,330-504)."""
    rng = np.random.RandomState(seed)
    sd = {}
    for i in range(8):
        # use_wscale with lrmul=0.01 stores weights at init_std = 1/lrmul
        # (reference: stylegan1.py:21-27)
        sd[f"g_mapping.dense{i}.weight"] = (100.0 * rng.randn(512, 512)).astype(np.float32)
        sd[f"g_mapping.dense{i}.bias"] = np.zeros(512, np.float32)

    import math

    log = int(math.log2(size))
    resolutions = [2**r for r in range(2, log + 1)]
    ch = [min(32, _nf(r - 1)) for r in range(2, log + 1)]  # narrow for 1-core CI
    for i, res in enumerate(resolutions):
        p = f"g_synthesis.blocks.{res}x{res}"
        c = ch[i]
        if i == 0:
            sd[f"{p}.const"] = rng.randn(1, c, 4, 4).astype(np.float32)
            sd[f"{p}.bias"] = np.zeros(c, np.float32)
            sd[f"{p}.conv.weight"] = rng.randn(c, c, 3, 3).astype(np.float32) * 0.1
            sd[f"{p}.conv.bias"] = np.zeros(c, np.float32)
        else:
            cin = ch[i - 1]
            sd[f"{p}.conv0_up.weight"] = rng.randn(c, cin, 3, 3).astype(np.float32) * 0.1
            sd[f"{p}.conv0_up.bias"] = np.zeros(c, np.float32)
            sd[f"{p}.conv1.weight"] = rng.randn(c, c, 3, 3).astype(np.float32) * 0.1
            sd[f"{p}.conv1.bias"] = np.zeros(c, np.float32)
        for epi in ("epi1", "epi2"):
            sd[f"{p}.{epi}.top_epi.noise.weight"] = np.zeros(c, np.float32)
            sd[f"{p}.{epi}.style_mod.lin.weight"] = rng.randn(2 * c, 512).astype(np.float32) * 0.1
            sd[f"{p}.{epi}.style_mod.lin.bias"] = np.zeros(2 * c, np.float32)
    sd["g_synthesis.torgb.weight"] = rng.randn(3, ch[-1], 1, 1).astype(np.float32) * 0.1
    sd["g_synthesis.torgb.bias"] = np.zeros(3, np.float32)
    return sd


def test_ingest_infers_resolution_and_synthesizes():
    sd = fabricate_sg1_sd(size=32)
    model, variables = stylegan1_variables_from_torch(sd)
    assert model.size == 32
    assert model.num_layers == 4

    z = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
    img, _ = model.apply(variables, z, input_is_latent=False, randomize_noise=False)
    assert img.shape == (2, 3, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_mapping_broadcast_and_truncation():
    sd = fabricate_sg1_sd(size=16)
    model, variables = stylegan1_variables_from_torch(sd)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 512))
    w = model.apply(variables, z, map_latents=True)
    assert w.shape == (2, 18, 512)

    mean_w = model.mean_latent(variables, jax.random.PRNGKey(1), n=256)
    img_t, _ = model.apply(
        variables, w, truncation=0.5, truncation_latent=mean_w, randomize_noise=False
    )
    img_n, _ = model.apply(variables, w, randomize_noise=False)
    assert not np.allclose(np.asarray(img_t), np.asarray(img_n))

    # truncation=0 collapses all samples to the mean image (first 8 layers);
    # remaining layers differ but at 16px there are only 6 style layers, so
    # outputs must be identical across the batch
    img_0, _ = model.apply(
        variables, w, truncation=0.0, truncation_latent=mean_w, randomize_noise=False
    )
    a = np.asarray(img_0)
    np.testing.assert_allclose(a[0], a[1], atol=1e-4)


def test_widescreen_const_padding():
    sd = fabricate_sg1_sd(size=32)
    model, variables = stylegan1_variables_from_torch(sd, output_size=1920)
    assert model.const_hw == (4, 8)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 512))
    img, _ = model.apply(variables, z, input_is_latent=False, randomize_noise=False)
    assert img.shape == (1, 3, 32, 64)


def test_stored_noise_buffers_used_when_not_randomized():
    sd = fabricate_sg1_sd(size=16)
    # give noise layers weight so noise actually shows up
    for k in list(sd):
        if k.endswith("noise.weight"):
            sd[k] = np.ones_like(sd[k])
    model, va = stylegan1_variables_from_torch(sd, noise_rng=jax.random.PRNGKey(1))
    _, vb = stylegan1_variables_from_torch(sd, noise_rng=jax.random.PRNGKey(2))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 512))
    ia, _ = model.apply(va, z, input_is_latent=False, randomize_noise=False)
    ib, _ = model.apply(vb, z, input_is_latent=False, randomize_noise=False)
    assert not np.allclose(np.asarray(ia), np.asarray(ib))
