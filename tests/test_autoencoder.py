"""VAE family tests: shapes, loss finiteness, log-cosh loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.models.autoencoder import (
    ConvSegNet,
    InceptionVAE,
    LogCoshVAE,
    VariationalConvSegNet,
    vae_loss,
)


def test_logcosh_vae_roundtrip_and_loss():
    model = LogCoshVAE(hidden_dims=(8, 16, 32, 64, 128), latent_dim=128)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 64, 64))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "latent": jax.random.PRNGKey(2)}, x
    )
    (fake, mu, log_var), _ = model.apply(
        variables, x, rngs={"latent": jax.random.PRNGKey(3)}, mutable=["batch_stats"]
    )
    assert fake.shape == x.shape
    losses = model.loss(x, fake, mu, log_var)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # log-cosh of zero residual is zero
    z = model.loss(x, x, jnp.zeros_like(mu), jnp.zeros_like(log_var))
    assert float(z["Reconstruction"]) == pytest.approx(0.0, abs=1e-5)
    assert float(z["Total"]) == pytest.approx(0.0, abs=1e-5)


def test_conv_segnet_shapes():
    model = ConvSegNet(width_mult=0.125)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 64, 64))
    variables = model.init(jax.random.PRNGKey(1), x)
    out, _ = model.apply(variables, x, mutable=["batch_stats"])
    assert out.shape == x.shape


def test_variational_conv_segnet_shapes():
    model = VariationalConvSegNet(width_mult=0.125)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 64, 64))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "latent": jax.random.PRNGKey(2)}, x
    )
    (out, mu, log_var), _ = model.apply(
        variables, x, rngs={"latent": jax.random.PRNGKey(3)}, mutable=["batch_stats"]
    )
    assert out.shape == x.shape
    l = vae_loss(x, out, mu, log_var)
    assert np.isfinite(float(l["Total"]))


def test_inception_vae_shapes():
    model = InceptionVAE(base=8, latent_dim=32, n_down=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "latent": jax.random.PRNGKey(2)}, x
    )
    (out, mu, log_var), _ = model.apply(
        variables, x, rngs={"latent": jax.random.PRNGKey(3)}, mutable=["batch_stats"]
    )
    assert out.shape == x.shape
    assert mu.shape == (2, 32)
