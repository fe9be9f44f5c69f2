"""StyleGAN2 GAN losses and regularizers.

Reference semantics (reference: train.py:65-102):
  d_logistic_loss   = softplus(-real) + softplus(fake)        (train.py:65-69)
  d_r1_penalty      = ||∂real_pred/∂real_img||²               (train.py:71-75)
  g_nonsaturating   = softplus(-fake)                         (train.py:78-80)
  path length reg   = E[(||J^T y|| - a)²], a = EMA of lengths (train.py:82-102)

The reference needs create_graph=True double-backward through its CUDA
kernels (opcode table op/fused_bias_act_kernel.cu:36-45); here both
regularizers are a `jax.grad` nested inside the outer loss `jax.grad`, which
XLA differentiates to arbitrary order.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def d_logistic_loss(real_pred: Array, fake_pred: Array) -> Array:
    """Non-saturating logistic D loss (reference: train.py:65-69)."""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(jax.nn.softplus(fake_pred))


def g_nonsaturating_loss(fake_pred: Array) -> Array:
    """Non-saturating G loss (reference: train.py:78-80)."""
    return jnp.mean(jax.nn.softplus(-fake_pred))


def d_r1_penalty(d_apply: Callable[[Array], Array], real_img: Array) -> Array:
    """R1 gradient penalty: mean over batch of sum-of-squares of
    ∂ sum(D(x)) / ∂x (reference: train.py:71-75). Differentiable wrt D params
    because jax.grad composes — the caller takes grad of this wrt params."""

    def scalar_pred(x):
        return jnp.sum(d_apply(x))

    grad = jax.grad(scalar_pred)(real_img)
    # the reference halves the penalty (train.py:74: r1_loss / 2.0)
    return 0.5 * jnp.mean(jnp.sum(jnp.square(grad.reshape(grad.shape[0], -1)), axis=1))


def g_path_length_regularization(
    g_apply: Callable[[Array], tuple[Array, Array]],
    latents: Array,
    mean_path_length: Array,
    rng: jax.Array,
    decay: float = 0.01,
) -> tuple[Array, Array, Array]:
    """Perceptual path length regularizer (reference: train.py:82-102).

    g_apply: W+ latents [B, n_latent, D] -> (image, latent). The JVP trick:
    grad wrt latents of <image, noise>/sqrt(HW) gives J^T y; its norm is
    penalized toward the EMA of itself.

    Returns (penalty, updated_mean_path_length, path_lengths).
    """

    def proj(lat, noise_img):
        img, _ = g_apply(lat)
        h, w = img.shape[-2], img.shape[-1]
        return jnp.sum(img * noise_img) / math.sqrt(h * w)

    # draw the image-shaped noise with a dry forward shape probe avoided:
    # caller passes rng; shape comes from one traced forward (XLA dedups it).
    img_shape = jax.eval_shape(lambda l: g_apply(l)[0], latents).shape
    noise_img = jax.random.normal(rng, img_shape, dtype=latents.dtype)

    grad = jax.grad(proj)(latents, noise_img)
    path_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grad), axis=2), axis=1))

    path_mean = mean_path_length + decay * (jnp.mean(path_lengths) - mean_path_length)
    penalty = jnp.mean(jnp.square(path_lengths - path_mean))
    # NaN guard (reference: train.py:96-97)
    path_mean = jnp.where(jnp.isnan(path_mean), mean_path_length, path_mean)
    penalty = jnp.where(jnp.isnan(penalty), 0.0, penalty)
    return penalty, jax.lax.stop_gradient(path_mean), path_lengths
