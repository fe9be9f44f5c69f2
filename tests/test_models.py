"""Model-layer tests: ModulatedConv2d parity vs. the per-sample-weight math,
generator/discriminator shapes, truncation, bends, activation maps."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.models import Discriminator, Generator
from maua_tpu.models.blocks import ModulatedConv2d
from maua_tpu.ops import upfirdn2d, setup_filter


def _per_sample_reference(x, weight, scale, style, demodulate, kernel_size):
    """Direct transcription of the reference math (models/stylegan2.py:217-254):
    per-sample modulated weights + grouped conv, computed with explicit loops."""
    b, cin, h, w = x.shape
    cout = weight.shape[0]
    out = np.zeros((b, cout, h, w), dtype=np.float64)
    pad = kernel_size // 2
    for n in range(b):
        wmod = scale * weight * style[n][None, :, None, None]  # [O,I,kh,kw]
        if demodulate:
            demod = 1.0 / np.sqrt(np.sum(wmod**2, axis=(1, 2, 3)) + 1e-8)
            wmod = wmod * demod[:, None, None, None]
        xp = np.pad(x[n], ((0, 0), (pad, pad), (pad, pad)))
        for o in range(cout):
            acc = np.zeros((h, w))
            for i in range(cin):
                for ky in range(kernel_size):
                    for kx in range(kernel_size):
                        acc += wmod[o, i, ky, kx] * xp[i, ky : ky + h, kx : kx + w]
            out[n, o] = acc
    return out


def test_modulated_conv_matches_per_sample_weights():
    rng = np.random.RandomState(0)
    b, cin, cout, hw, ks = 3, 4, 5, 8, 3
    x = rng.randn(b, cin, hw, hw).astype(np.float32)
    mod = ModulatedConv2d(cout, ks, demodulate=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.zeros((b, 16)))
    style_latent = rng.randn(b, 16).astype(np.float32)
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(style_latent)))

    # recompute the style vector the module produced, then run the reference math
    p = params["params"]
    w_lin = np.asarray(p["modulation"]["weight"])
    b_lin = np.asarray(p["modulation"]["bias"])
    s = style_latent @ (w_lin / math.sqrt(w_lin.shape[0])) + b_lin
    weight = np.asarray(p["weight"])
    scale = 1.0 / math.sqrt(cin * ks * ks)
    want = _per_sample_reference(x.astype(np.float64), weight, scale, s, True, ks)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_modulated_conv_no_demod():
    rng = np.random.RandomState(1)
    b, cin, cout, hw, ks = 2, 3, 4, 6, 1
    x = rng.randn(b, cin, hw, hw).astype(np.float32)
    mod = ModulatedConv2d(cout, ks, demodulate=False)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.zeros((b, 8)))
    style_latent = rng.randn(b, 8).astype(np.float32)
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(style_latent)))

    p = params["params"]
    w_lin = np.asarray(p["modulation"]["weight"])
    b_lin = np.asarray(p["modulation"]["bias"])
    s = style_latent @ (w_lin / math.sqrt(w_lin.shape[0])) + b_lin
    want = _per_sample_reference(
        x.astype(np.float64), np.asarray(p["weight"]), 1.0 / math.sqrt(cin), s, False, ks
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_modulated_conv_upsample_matches_per_sample():
    """Upsample path: input-scale + shared conv_transpose + demod must equal
    per-sample-weight conv_transpose (reference: models/stylegan2.py:227-238)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    b, cin, cout, hw, ks = 2, 3, 4, 5, 3
    x = rng.randn(b, cin, hw, hw).astype(np.float32)
    mod = ModulatedConv2d(cout, ks, demodulate=True, upsample=True)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.zeros((b, 8)))
    style_latent = rng.randn(b, 8).astype(np.float32)
    got = np.asarray(mod.apply(params, jnp.asarray(x), jnp.asarray(style_latent)))

    p = params["params"]
    w_lin = np.asarray(p["modulation"]["weight"])
    b_lin = np.asarray(p["modulation"]["bias"])
    s = style_latent @ (w_lin / math.sqrt(w_lin.shape[0])) + b_lin
    weight = np.asarray(p["weight"])
    scale = 1.0 / math.sqrt(cin * ks * ks)

    # per-sample path via torch (same ops as the reference, rewritten)
    outs = []
    for n in range(b):
        wmod = scale * weight * s[n][None, :, None, None]
        demod = 1.0 / np.sqrt(np.sum(wmod**2, axis=(1, 2, 3)) + 1e-8)
        wmod = wmod * demod[:, None, None, None]
        wt = torch.tensor(wmod.transpose(1, 0, 2, 3))  # [I, O, kh, kw]
        y = F.conv_transpose2d(torch.tensor(x[n : n + 1]), wt, stride=2, padding=0)
        outs.append(y.numpy())
    y = np.concatenate(outs, 0)
    # blur per reference pad math
    kblur = np.asarray(setup_filter([1, 3, 3, 1], gain=4.0))
    pcalc = (4 - 2) - (ks - 1)
    pad0 = (pcalc + 1) // 2 + 1
    pad1 = pcalc // 2 + 1
    want = np.asarray(upfirdn2d(jnp.asarray(y), jnp.asarray(kblur), pad=(pad0, pad1)))
    assert got.shape == want.shape == (b, cout, hw * 2, hw * 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def tiny_gen():
    gen = Generator(size=32, style_dim=64, n_mlp=2, channel_multiplier=1, constant_input=True, channel_max=64)
    z = jnp.zeros((2, 64))
    variables = gen.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, z)
    return gen, variables


def test_generator_forward_shapes(tiny_gen):
    gen, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    img, _ = gen.apply(variables, z, randomize_noise=False)
    assert img.shape == (2, 3, 32, 32)
    assert gen.n_latent == 8 and gen.num_layers == 7


def test_generator_deterministic_with_stored_noise(tiny_gen):
    gen, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 64))
    a, _ = gen.apply(variables, z, randomize_noise=False)
    b, _ = gen.apply(variables, z, randomize_noise=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generator_randomize_noise_uses_rng(tiny_gen):
    gen, variables = tiny_gen
    # NoiseInjection weights init to 0 (reference: models/stylegan2.py:259), so
    # bump them to 1 to make the noise path observable.
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    for k in flat:
        if k[-2:] == ("noise", "weight"):
            flat[k] = jnp.ones_like(flat[k])
    variables = dict(variables, params=flax.traverse_util.unflatten_dict(flat))
    z = jax.random.normal(jax.random.PRNGKey(3), (2, 64))
    a, _ = gen.apply(variables, z, randomize_noise=True, rngs={"noise": jax.random.PRNGKey(0)})
    b, _ = gen.apply(variables, z, randomize_noise=True, rngs={"noise": jax.random.PRNGKey(9)})
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_generator_input_is_latent_and_wplus(tiny_gen):
    gen, variables = tiny_gen
    w = jax.random.normal(jax.random.PRNGKey(4), (2, 64))
    img, lat = gen.apply(variables, w, input_is_latent=True, randomize_noise=False, return_latents=True)
    assert lat.shape == (2, 8, 64)
    wp = jnp.repeat(w[:, None, :], 8, axis=1)
    img2, _ = gen.apply(variables, wp, input_is_latent=True, randomize_noise=False)
    np.testing.assert_allclose(np.asarray(img), np.asarray(img2), atol=1e-6)


def test_generator_tensor_truncation(tiny_gen):
    gen, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 64))
    tl = gen.apply(variables, jax.random.PRNGKey(0), 256, method=Generator.mean_latent)
    # truncation 0 -> every sample collapses to the mean latent image
    img0, _ = gen.apply(
        variables, z, truncation=jnp.zeros((2,)), truncation_latent=tl, randomize_noise=False
    )
    imgm, _ = gen.apply(variables, jnp.broadcast_to(tl, (2, 64)), input_is_latent=True, randomize_noise=False)
    np.testing.assert_allclose(np.asarray(img0), np.asarray(imgm), atol=1e-4)
    # per-sample truncation: sample 0 truncated, sample 1 untouched
    t = jnp.asarray([0.0, 1.0])
    imgt, _ = gen.apply(variables, z, truncation=t, truncation_latent=tl, randomize_noise=False)
    full, _ = gen.apply(variables, z, randomize_noise=False)
    np.testing.assert_allclose(np.asarray(imgt[0]), np.asarray(img0[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(imgt[1]), np.asarray(full[1]), atol=1e-4)


def test_truncation_without_latent_raises(tiny_gen):
    """Array/tensor truncation signals intent to truncate — without a
    truncation_latent it must raise, not silently skip (the float!=1 case was
    already guarded; the array case used to fall through and return
    untruncated frames)."""
    gen, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(5), (2, 64))
    for bad in (0.7, jnp.full((2,), 0.7), np.float32(0.5)):
        with pytest.raises(ValueError, match="truncation"):
            gen.apply(variables, z, truncation=bad, randomize_noise=False)
    # scalar 1.0 in any form is the identity — allowed without a latent
    for ok in (1.0, np.float32(1.0), jnp.asarray(1.0)):
        gen.apply(variables, z, truncation=ok, randomize_noise=False)


def test_generator_activation_maps_and_bends(tiny_gen):
    gen, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(6), (1, 64))
    img, amaps = gen.apply(variables, z, randomize_noise=False, return_activation_maps=True)
    assert len(amaps) == gen.num_layers  # one per StyledConv (reference: :545-569)
    # a bend that zeroes layer 1 must change the output
    bends = [(1, lambda x: jnp.zeros_like(x))]
    img_b, _ = gen.apply(variables, z, randomize_noise=False, bends=bends)
    assert not np.allclose(np.asarray(img), np.asarray(img_b))


def test_generator_style_mixing(tiny_gen):
    gen, variables = tiny_gen
    z1 = jax.random.normal(jax.random.PRNGKey(7), (1, 64))
    z2 = jax.random.normal(jax.random.PRNGKey(8), (1, 64))
    img, lat = gen.apply(
        variables, [z1, z2], inject_index=3, randomize_noise=False, return_latents=True
    )
    w1 = gen.apply(variables, z1, method=Generator.get_latent)
    w2 = gen.apply(variables, z2, method=Generator.get_latent)
    np.testing.assert_allclose(np.asarray(lat[:, :3]), np.asarray(jnp.repeat(w1[:, None], 3, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lat[:, 3:]), np.asarray(jnp.repeat(w2[:, None], 5, 1)), atol=1e-6)


def test_generator_map_latents(tiny_gen):
    gen, variables = tiny_gen
    z = jax.random.normal(jax.random.PRNGKey(9), (4, 64))
    wplus = gen.apply(variables, z, map_latents=True)
    assert wplus.shape == (4, 8, 64)
    w = gen.apply(variables, z, method=Generator.get_latent)
    np.testing.assert_allclose(np.asarray(wplus[:, 0]), np.asarray(w), atol=1e-6)


def test_generator_latent_input_noconst():
    gen = Generator(size=16, style_dim=32, n_mlp=1, channel_multiplier=1, constant_input=False, channel_max=32)
    z = jnp.zeros((2, 32))
    variables = gen.init({"params": jax.random.PRNGKey(0)}, z, randomize_noise=False)
    img, _ = gen.apply(variables, jax.random.normal(jax.random.PRNGKey(1), (2, 32)), randomize_noise=False)
    assert img.shape == (2, 3, 16, 16)


def test_generator_min_rgb_size():
    gen = Generator(size=16, style_dim=32, n_mlp=1, channel_multiplier=1, constant_input=True, min_rgb_size=8, channel_max=32)
    z = jnp.zeros((1, 32))
    variables = gen.init({"params": jax.random.PRNGKey(0)}, z, randomize_noise=False)
    img, _ = gen.apply(variables, z, randomize_noise=False)
    assert img.shape == (1, 3, 16, 16)


def test_discriminator_shapes_and_odd_batch():
    disc = Discriminator(size=32, channel_multiplier=1, channel_max=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 32, 32))
    params = disc.init(jax.random.PRNGKey(1), x)
    out = disc.apply(params, x)
    assert out.shape == (4, 1)
    # batch not divisible by stddev_group falls back to whole-batch grouping
    x3 = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 32, 32))
    assert disc.apply(params, x3).shape == (3, 1)


def test_generator_widescreen_noise_buffers():
    from maua_tpu.models import noise_shapes

    shapes = noise_shapes(1024, output_size=1920)
    assert shapes[-1] == (1, 1, 1024, 2048)
    shapes = noise_shapes(1024, output_size=1080)
    assert shapes[-1] == (1, 1, 2048, 1024)


def test_widescreen_synthesis_with_pad_bend():
    """2:1 widescreen: output_size=1920 reshapes the noise buffers and a
    layer-0 replication-pad bend widens the constant (the tauceti recipe,
    reference: models/stylegan2.py:461-470 + examples/tauceti.py:94-100)."""
    from maua_tpu.reactive import pad_bend, bends_for_batch

    gen = Generator(
        size=16, style_dim=32, n_mlp=1, channel_multiplier=1, constant_input=True,
        channel_max=32, output_size=1920,
    )
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, jnp.zeros((1, 32))
    )
    # widescreen noise buffers are [1, 1, h, 2h]
    assert variables["buffers"]["noise_0"].shape == (1, 1, 4, 8)

    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    img, _ = gen.apply(
        variables, z, randomize_noise=False,
        bends=bends_for_batch([pad_bend(0, (2, 2, 0, 0))], 0, 2),
    )
    assert img.shape == (2, 3, 16, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_precision_policy():
    """fp32 defaults to HIGHEST; under jax.default_matmul_precision('high')
    only the config-following sites relax (bf16 always native; exact sites
    never relax) — the fast-parity operating point's contract."""
    from jax import lax

    from maua_tpu.models.blocks import _conv_precision, _exact_precision

    xf = jnp.zeros((2, 2), jnp.float32)
    xb = jnp.zeros((2, 2), jnp.bfloat16)
    assert _conv_precision(xf) == lax.Precision.HIGHEST
    assert _conv_precision(xb) is None
    assert _exact_precision(xf) == lax.Precision.HIGHEST
    with jax.default_matmul_precision("high"):
        assert _conv_precision(xf) is None  # defer to the config
        assert _exact_precision(xf) == lax.Precision.HIGHEST  # never relaxes
