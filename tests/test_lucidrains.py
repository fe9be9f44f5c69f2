"""Alt-StyleGAN2 (lucidrains variant) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.models.lucidrains import (
    Conv2DMod,
    LucidrainsDiscriminator,
    LucidrainsGenerator,
    StyleVectorizer,
    VectorQuantize,
    gradient_penalty,
    hinge_d_loss,
    hinge_g_loss,
    mixed_styles,
)


def test_generator_shapes_with_attention():
    gen = LucidrainsGenerator(image_size=32, latent_dim=64, network_capacity=4, attn_layers=(2,))
    n = gen.num_layers
    styles = jax.random.normal(jax.random.PRNGKey(0), (2, n, 64))
    noise = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 1))
    params = gen.init(jax.random.PRNGKey(2), styles, noise)
    img = gen.apply(params, styles, noise)
    assert img.shape == (2, 3, 32, 32)
    assert np.isfinite(np.asarray(img)).all()


def test_discriminator_with_fq_and_attention():
    d = LucidrainsDiscriminator(image_size=32, network_capacity=4, fq_layers=(1,), attn_layers=(2,))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    params = d.init(jax.random.PRNGKey(1), x)
    logits, qloss = d.apply(params, x)
    assert logits.shape == (2,)
    assert np.isfinite(float(qloss))


def test_conv2dmod_matches_per_sample_weights():
    """The scale-input/shared-conv/demod identity must equal the reference's
    per-sample weight construction (lucidrains.py:319-339)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 8, 8).astype(np.float32))
    style = jnp.asarray(rng.randn(2, 4).astype(np.float32))
    m = Conv2DMod(out_chan=6, kernel=3)
    params = m.init(jax.random.PRNGKey(0), x, style)
    got = np.asarray(m.apply(params, x, style))

    w = np.asarray(params["params"]["weight"])  # [6,4,3,3]
    outs = []
    for b in range(2):
        wb = w * (np.asarray(style)[b] + 1.0)[None, :, None, None]
        d = 1.0 / np.sqrt((wb**2).sum(axis=(1, 2, 3)) + 1e-8)
        wb = wb * d[:, None, None, None]
        xb = np.asarray(x)[b]
        out = np.zeros((6, 8, 8), np.float32)
        xp = np.pad(xb, ((0, 0), (1, 1), (1, 1)))
        for o in range(6):
            for i in range(4):
                for dy in range(3):
                    for dx in range(3):
                        out[o] += wb[o, i, dy, dx] * xp[i, dy : dy + 8, dx : dx + 8]
        outs.append(out)
    want = np.stack(outs)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_vector_quantize_straight_through():
    vq = VectorQuantize(dim=4, codebook_size=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 2))
    params = vq.init(jax.random.PRNGKey(1), x)
    out, loss = vq.apply(params, x)
    assert out.shape == x.shape
    assert float(loss) >= 0
    # gradient flows through the straight-through estimator
    g = jax.grad(lambda x: float(0) + jnp.sum(vq.apply(params, x)[0] ** 2))(x)
    assert np.abs(np.asarray(g)).sum() > 0


def test_losses_and_gp():
    real = jnp.asarray([-2.0, -1.5])
    fake = jnp.asarray([2.0, 1.0])
    assert float(hinge_d_loss(real, fake)) == 0.0  # well-separated -> no loss
    assert float(hinge_g_loss(fake)) == 1.5

    d = LucidrainsDiscriminator(image_size=16, network_capacity=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16, 16))
    params = d.init(jax.random.PRNGKey(1), x)
    gp = gradient_penalty(lambda im: d.apply(params, im), x)
    assert np.isfinite(float(gp)) and float(gp) > 0


def test_mixed_styles_shape():
    sv = StyleVectorizer(emb=32, depth=2)
    params = sv.init(jax.random.PRNGKey(0), jnp.zeros((1, 32)))
    styles = mixed_styles(jax.random.PRNGKey(1), lambda z: sv.apply(params, z), 4, 5, 32)
    assert styles.shape == (4, 5, 32)


def test_diffgrad_damps_static_gradients():
    """DiffGrad friction: with a constant gradient, step 2's update is damped
    by sigmoid(0)=0.5 relative to plain Adam's bias-corrected step."""
    from maua_tpu.train import diffgrad

    opt = diffgrad(1e-2, 0.5, 0.9)
    params = {"w": jnp.zeros(3)}
    g = {"w": jnp.ones(3)}
    state = opt.init(params)
    u1, state = opt.update(g, state, params)
    u2, state = opt.update(g, state, params)
    # first step: prev_grad=0 -> dfc=sigmoid(1); second: dfc=sigmoid(0)=0.5
    import scipy.special as sp

    ratio = float(u2["w"][0] / u1["w"][0])
    assert ratio == pytest.approx(0.5 / sp.expit(1.0), rel=1e-4)


@pytest.mark.slow
def test_lucidrains_trainer_two_steps(tmp_path):
    """Two full Trainer steps at 32²: finite metrics, params move, EMA resets/
    holds per the reference schedule, NaN recovery restores the checkpoint
    (reference: lucidrains.py:625-1010)."""
    from maua_tpu.train import LucidrainsConfig, LucidrainsTrainer, NanException

    cfg = LucidrainsConfig(
        image_size=32,
        latent_dim=32,
        style_depth=2,
        network_capacity=2,
        batch_size=2,
        gradient_accumulate_every=2,
        fq_layers=(1,),
        attn_layers=(2,),
    )
    tr = LucidrainsTrainer(cfg, models_dir=str(tmp_path), save_every=1)
    g0 = np.asarray(jax.tree_util.tree_leaves(tr.state.g_params)[0]).copy()
    ge0 = np.asarray(jax.tree_util.tree_leaves(tr.state.ge_params)[0]).copy()

    real = jax.random.normal(jax.random.PRNGKey(5), (2, 2, 3, 32, 32))
    m1 = tr.train(real)
    m2 = tr.train(real)
    for m in (m1, m2):
        for k, v in m.items():
            assert np.isfinite(v), (k, v)
    assert m1["R1"] > 0  # GP applied at step 0 (steps % 4 == 0)
    assert int(tr.state.step) == 2
    g1 = np.asarray(jax.tree_util.tree_leaves(tr.state.g_params)[0])
    assert not np.allclose(g0, g1)
    # below ema_start and not at a reset step -> EMA params still the init copy
    assert np.allclose(ge0, np.asarray(jax.tree_util.tree_leaves(tr.state.ge_params)[0]))

    # sampling (EMA + truncation) produces finite images
    img = tr.generate(jax.random.PRNGKey(9), n=2)
    assert img.shape == (2, 3, 32, 32) and np.isfinite(img).all()

    # NaN recovery: poison the state, feed NaN reals -> NanException + reload
    real_nan = real.at[0, 0].set(jnp.nan)
    with pytest.raises(NanException):
        tr.train(real_nan)
    # restored from the last checkpoint (step 2 was saved with save_every=1)
    assert int(tr.state.step) == 2
