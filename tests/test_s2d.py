"""Space-to-depth (polyphase) op parity: every phase-space op must equal its
native full-resolution counterpart exactly (same MACs, reordered)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.ops.s2d import (
    depth_to_space,
    fir_taps,
    phase_conv1x1,
    phase_conv3x3,
    phase_conv_down_blur,
    phase_conv_up_blur,
    phase_upsample,
    space_to_depth,
)
from maua_tpu.ops.upfirdn2d import setup_filter, upfirdn2d


@pytest.mark.parametrize("ksize,phase_out", [(3, False), (3, True), (1, False), (1, True)])
def test_phase_conv_down_blur_matches_native(ksize, phase_out):
    """The discriminator's Blur + stride-2 VALID conv (ConvLayer downsample)
    equals the folded dense phase conv, both output representations."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 16, 12).astype(np.float32))
    w = jnp.asarray(rng.randn(7, 5, ksize, ksize).astype(np.float32))
    blur = (1, 3, 3, 1)
    p = (len(blur) - 2) + (ksize - 1)
    k2 = setup_filter(list(blur))
    xb = upfirdn2d(x, k2, pad=((p + 1) // 2, p // 2))
    ref = jax.lax.conv_general_dilated(
        xb, w, (2, 2), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    got = phase_conv_down_blur(space_to_depth(x), w, fir_taps(blur, 1.0), phase_out=phase_out)
    if phase_out:
        got = depth_to_space(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_s2d_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 12))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))
    # phase-major indexing: P[b, (py*2+px)*C + c, i, j] = x[b, c, 2i+py, 2j+px]
    p = np.asarray(space_to_depth(x))
    xn = np.asarray(x)
    assert p[1, (1 * 2 + 0) * 3 + 2, 3, 5] == xn[1, 2, 7, 10]


def test_phase_conv3x3_matches_native():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16, 12))
    w = jax.random.normal(jax.random.PRNGKey(2), (7, 5, 3, 3))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    out = depth_to_space(phase_conv3x3(space_to_depth(x), w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_phase_conv_up_blur_matches_native():
    """phase_conv_up_blur == _conv_transpose2d_nchw(stride 2) + Blur pad
    (1,1) — the exact up-sampling path of ModulatedConv2d, in one dense
    composite conv."""
    from maua_tpu.models.blocks import _conv_transpose2d_nchw

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 8, 6))
    w = jax.random.normal(jax.random.PRNGKey(4), (7, 5, 3, 3))  # [O, I, 3, 3]
    y_full = _conv_transpose2d_nchw(x, w.transpose(1, 0, 2, 3), stride=2)
    k2 = setup_filter([1, 3, 3, 1], gain=4.0)
    ref = upfirdn2d(y_full, k2, pad=(1, 1))

    out = depth_to_space(phase_conv_up_blur(x, w, fir_taps([1, 3, 3, 1], 4.0)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_phase_upsample_matches_native():
    """phase_upsample == Upsample (upfirdn up=2, pad (2,1), gain 4) — the
    skip-pyramid path of ToRGB."""
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 8, 6))
    k2 = setup_filter([1, 3, 3, 1], gain=4.0)
    ref = upfirdn2d(x, k2, up=2, down=1, pad=(2, 1))
    out = depth_to_space(phase_upsample(x, [1, 3, 3, 1], gain=4.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_phase_conv1x1_matches_native():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 5, 8, 6))
    w1 = jax.random.normal(jax.random.PRNGKey(7), (3, 5))
    ref = jnp.einsum("oi,bihw->bohw", w1, x)
    out = depth_to_space(phase_conv1x1(space_to_depth(x), w1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("min_rgb_size", [4, 16])
def test_generator_s2d_matches_native(min_rgb_size):
    """Full Generator with s2d_min_res set must produce the same images as the
    native path — same params, exact transform (fp32 tol 1e-4). Covers the
    up-conv, body conv, ToRGB, skip pyramid, noise buffers, and min_rgb_size
    interplay."""
    from maua_tpu.models import Generator

    kw = dict(size=32, style_dim=64, n_mlp=2, channel_multiplier=1, channel_max=64,
              constant_input=True, min_rgb_size=min_rgb_size)
    gen_n = Generator(**kw)
    gen_p = Generator(**kw, s2d_min_res=8)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = gen_n.init(rngs, jnp.zeros((1, 64)))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))

    a, _ = gen_n.apply(variables, z, randomize_noise=False)
    b, _ = gen_p.apply(variables, z, randomize_noise=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # randomize_noise parity: the phase path draws the SAME native-shaped
    # noise from the same RNG stream
    a, _ = gen_n.apply(variables, z, randomize_noise=True, rngs={"noise": jax.random.PRNGKey(7)})
    b, _ = gen_p.apply(variables, z, randomize_noise=True, rngs={"noise": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_generator_s2d_bends_and_activations():
    """Bends and activation maps stay native-layout under s2d (converted
    around the hook points)."""
    from maua_tpu.models import Generator

    kw = dict(size=32, style_dim=64, n_mlp=2, channel_multiplier=1, channel_max=64,
              constant_input=True)
    gen_n = Generator(**kw)
    gen_p = Generator(**kw, s2d_min_res=8)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = gen_n.init(rngs, jnp.zeros((1, 64)))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))

    bends = [(3, lambda x: jnp.flip(x, axis=-1))]
    a, acts_a = gen_n.apply(variables, z, randomize_noise=False, bends=bends,
                            return_activation_maps=True)
    b, acts_b = gen_p.apply(variables, z, randomize_noise=False, bends=bends,
                            return_activation_maps=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    assert len(acts_a) == len(acts_b)
    for xa, xb in zip(acts_a, acts_b):
        assert xa.shape == xb.shape
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-4)


def test_train_step_s2d_matches_native():
    """One full GAN train step with the generator in polyphase (s2d) mode
    produces the same losses/gradient effects as the native path — the phase
    convs' autodiff is an exact reordering (fp32 CPU, tolerance for sum
    order)."""
    import jax

    from maua_tpu.train import init_train_state, make_train_config, make_train_step

    common = dict(size=16, latent_dim=32, batch_size=4, num_accumulate=1,
                  channel_max=32, channel_multiplier=1, lookahead=False,
                  augment=False, d_reg_every=2, g_reg_every=2,
                  # bitwise rng parity needed: phase draws must replicate the
                  # native path's values (the production default draws in
                  # phase layout — distribution-identical but different bits)
                  fast_phase_noise=False)
    cfg_n = make_train_config(**common, s2d_min_res=0)
    cfg_p = make_train_config(**common, s2d_min_res=8)
    state_n, gen_n, disc_n = init_train_state(jax.random.PRNGKey(0), cfg_n)
    state_p, gen_p, disc_p = init_train_state(jax.random.PRNGKey(0), cfg_p)
    assert gen_p.s2d_min_res == 8 and gen_n.s2d_min_res == 0

    real = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 3, 16, 16))
    step_n = jax.jit(make_train_step(gen_n, disc_n, cfg_n))
    step_p = jax.jit(make_train_step(gen_p, disc_p, cfg_p))
    sn, mn = step_n(state_n, real, jax.random.PRNGKey(7))
    sp, mp = step_p(state_p, real, jax.random.PRNGKey(7))
    for k in mn:
        np.testing.assert_allclose(float(mn[k]), float(mp[k]), rtol=2e-3, atol=2e-4, err_msg=str(k))
    # parameters after the update agree (same data, same rng, exact transform)
    gn = jax.tree_util.tree_leaves(sn.g_params)
    gp = jax.tree_util.tree_leaves(sp.g_params)
    for a, b in zip(gn, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_generator_s2d_fast_phase_noise():
    """fast_phase_noise=True (the training default, TrainConfig) draws fresh
    noise directly in the phase layout — different bits, same distribution:
    outputs stay finite and match the native path's per-image statistics;
    stored-noise evaluation (randomize_noise=False) is bit-identical to the
    default path (the flag only affects fresh draws)."""
    from maua_tpu.models import Generator

    kw = dict(size=16, style_dim=32, n_mlp=1, channel_multiplier=1,
              constant_input=True, channel_max=32, s2d_min_res=8)
    gen = Generator(**kw)
    gen_fast = Generator(**kw, fast_phase_noise=True)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = gen.init(rngs, jnp.zeros((1, 32)))
    # NoiseInjection weights init to 0 (reference semantics) — noise would be
    # a no-op; turn them on so the draw path actually matters
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(variables["params"])
    for path in flat:
        if "noise" in path and path[-1] == "weight":
            flat[path] = jnp.ones_like(flat[path])
    variables = {**variables, "params": unflatten_dict(flat)}
    z = jax.random.normal(jax.random.PRNGKey(2), (4, 32))

    a, _ = gen.apply(variables, z, randomize_noise=False)
    b, _ = gen_fast.apply(variables, z, randomize_noise=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    c, _ = gen.apply(variables, z, randomize_noise=True, rngs={"noise": jax.random.PRNGKey(7)})
    d, _ = gen_fast.apply(variables, z, randomize_noise=True, rngs={"noise": jax.random.PRNGKey(7)})
    assert np.isfinite(np.asarray(d)).all()
    # same distribution, different bits: per-image mean/std track closely
    np.testing.assert_allclose(np.asarray(c).std(), np.asarray(d).std(), rtol=0.2)
    assert float(np.abs(np.asarray(c) - np.asarray(d)).max()) > 1e-6


def test_generator_s2d_widescreen_and_odd_guard():
    """s2d matches native for widescreen geometries (output_size=1920, noise
    [h, 2h], const-widening pad bend). Phase layers always have even full-res
    dims (the up-conv doubles its input), so no geometry guard is needed."""
    from maua_tpu.models import Generator

    from maua_tpu.reactive import bends_for_batch, pad_bend

    kw = dict(size=16, style_dim=32, n_mlp=1, channel_multiplier=1,
              constant_input=True, channel_max=32, output_size=1920)
    gen_n = Generator(**kw)
    gen_p = Generator(**kw, s2d_min_res=8)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = gen_n.init(rngs, jnp.zeros((1, 32)))
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    # widescreen needs the const-widening layer-0 pad bend (tauceti recipe)
    bends = bends_for_batch([pad_bend(0, (2, 2, 0, 0))], 0, 2)
    a, _ = gen_n.apply(variables, z, randomize_noise=False, bends=bends)
    b, _ = gen_p.apply(variables, z, randomize_noise=False, bends=bends)
    assert b.shape == (2, 3, 16, 32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)




def test_discriminator_s2d_matches_native():
    """D with s2d_min_res set equals the native D exactly (same params): the
    from_rgb pack, phase ResBlocks, and phase→native hand-off are exact
    reorderings. Also checks return_hidden."""
    from maua_tpu.models import Discriminator

    kw = dict(size=32, channel_multiplier=1, channel_max=32)
    d_n = Discriminator(**kw)
    d_p = Discriminator(**kw, s2d_min_res=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 32, 32))
    variables = d_n.init(jax.random.PRNGKey(1), x)
    a, ha = d_n.apply(variables, x, return_hidden=True)
    b, hb = d_p.apply(variables, x, return_hidden=True)
    assert hb.shape == ha.shape  # hidden is below the threshold → native rep
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4)
    np.testing.assert_allclose(np.asarray(hb), np.asarray(ha), atol=2e-4)


def test_discriminator_s2d_r1_double_backward_matches_native():
    """The R1 penalty (grad-of-grad through every phase conv, incl. the folded
    blur⊕down kernels) matches the native path — this is the gradient that
    trains at 1024² (reference: train.py:71-75)."""
    from maua_tpu.models import Discriminator

    kw = dict(size=16, channel_multiplier=1, channel_max=32)
    d_n = Discriminator(**kw)
    d_p = Discriminator(**kw, s2d_min_res=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 16, 16))
    variables = d_n.init(jax.random.PRNGKey(1), x)

    def r1(params, disc):
        def pred_sum(img):
            return jnp.sum(disc.apply({"params": params}, img))

        g = jax.grad(pred_sum)(x)
        return jnp.sum(jnp.square(g))

    val_n, grad_n = jax.value_and_grad(lambda p: r1(p, d_n))(variables["params"])
    val_p, grad_p = jax.value_and_grad(lambda p: r1(p, d_p))(variables["params"])
    np.testing.assert_allclose(float(val_p), float(val_n), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(grad_n), jax.tree_util.tree_leaves(grad_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-4)


def test_train_step_s2d_on_mesh():
    """The phase-space generator composes with GSPMD data parallelism: a full
    train step with s2d_min_res=8 on the 8-device CPU mesh runs with the
    batch axis actually split and produces finite metrics (the phase
    reshapes/convs are batch-parallel, so XLA shards them like the native
    ops)."""
    import jax

    from maua_tpu.parallel import get_mesh, shard_batch
    from maua_tpu.train import init_train_state, make_train_config, make_train_step

    cfg = make_train_config(size=16, channel_max=32, batch_size=8, num_accumulate=1,
                            augment=False, lookahead=False, d_reg_every=1, g_reg_every=1,
                            s2d_min_res=8)
    state, gen, disc = init_train_state(jax.random.PRNGKey(0), cfg)
    assert gen.s2d_min_res == 8
    step = jax.jit(make_train_step(gen, disc, cfg))
    mesh = get_mesh()
    real_host = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 3, 16, 16))
    real = shard_batch(real_host, mesh, batch_dim=1)
    shard_shapes = {s.data.shape for s in real.addressable_shards}
    assert shard_shapes == {(1, 1, 3, 16, 16)}, shard_shapes
    state, metrics = step(state, real, jax.random.PRNGKey(2))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)


def test_render_on_mesh_with_s2d(tmp_path):
    """Frame-axis data-parallel render with the generator in phase (s2d)
    mode: the polyphase convs shard over the batch axis like the native ones
    (inference counterpart of test_train_step_s2d_on_mesh)."""
    import os

    import jax

    from maua_tpu.models import Generator
    from maua_tpu.parallel import get_mesh
    from maua_tpu.render import render

    gen = Generator(size=16, style_dim=32, n_mlp=1, channel_multiplier=1,
                    constant_input=True, channel_max=32, s2d_min_res=8)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, jnp.zeros((1, 32))
    )
    w = gen.apply(variables, jax.random.normal(jax.random.PRNGKey(2), (1, 32)),
                  method=Generator.get_latent)
    latents = jnp.repeat(jnp.repeat(w[None], 8, 0), gen.n_latent, 1)
    out = str(tmp_path / "mesh_s2d.mp4")
    render(generator=gen, variables=variables, latents=latents, noise=[],
           output_file=out, batch_size=8, fps=4, mesh=get_mesh())
    assert os.path.exists(out) or os.path.exists(out + ".npy")
