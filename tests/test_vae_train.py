"""VAE trainer tests: loss decreases on a toy dataset; sweep scoring works."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from maua_tpu.models.autoencoder import LogCoshVAE
from maua_tpu.train.vae import FAILURE_SCORE, make_perceptual_loss, sweep_trial, train_vae


def toy_data(batch):
    rng = np.random.RandomState(0)
    base = rng.rand(batch, 3, 32, 32).astype(np.float32) * 2 - 1
    return itertools.repeat(base)


def test_train_vae_loss_decreases():
    model = LogCoshVAE(hidden_dims=(8, 16, 32, 64), latent_dim=64)
    variables, history = train_vae(model, toy_data(4), n_steps=24, lr=3e-3, log_every=8)
    assert len(history) >= 3
    assert history[-1]["Total"] < history[0]["Total"]


def test_perceptual_loss_zero_for_identical():
    loss = make_perceptual_loss(net="alex", image_size=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    assert float(loss(x, x)) == 0.0
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    assert float(loss(x, y)) > 0


def test_sweep_trial_scores():
    score, variables = sweep_trial(
        lambda: LogCoshVAE(hidden_dims=(8, 16, 32, 64), latent_dim=32),
        toy_data,
        batch_size=4,
        n_steps=10,
        log_every=5,
    )
    assert score != FAILURE_SCORE
    assert variables is not None
