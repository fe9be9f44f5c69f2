"""GAN inversion: optimize W+ latent + per-layer noise to reconstruct images.

Reference: projector.py:16-199 (canonical flow; its import was broken
upstream) — LPIPS + MSE + multi-scale noise autocorrelation regularizer,
cosine lr ramp, latent noise annealing, per-step noise renormalization.
Here the whole optimization step (forward + losses + grads + Adam update +
noise normalize) is one jitted function.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import Generator

Array = jnp.ndarray


def noise_regularize(noises: list[Array]) -> Array:
    """Multi-scale autocorrelation penalty pushing noise toward white
    (reference: projector.py:16-36)."""
    loss = jnp.zeros(())
    for noise in noises:
        n = noise
        while True:
            size = n.shape[2]
            loss = loss + jnp.mean(n * jnp.roll(n, 1, axis=3)) ** 2
            loss = loss + jnp.mean(n * jnp.roll(n, 1, axis=2)) ** 2
            if size <= 8:
                break
            n = n.reshape(n.shape[0], 1, size // 2, 2, size // 2, 2).mean(axis=(3, 5))
    return loss


def noise_normalize(noises: list[Array]) -> list[Array]:
    """Project each noise map back to zero-mean unit-std
    (reference: projector.py:39-47)."""
    return [(n - jnp.mean(n)) / jnp.maximum(jnp.std(n), 1e-8) for n in noises]


def _lr_schedule(step: int, n_steps: int, lr: float, rampdown: float = 0.25, rampup: float = 0.05):
    """Cosine ramp-up/down (reference: projector.py:50-57)."""
    t = step / n_steps
    ramp = jnp.minimum(1.0, (1.0 - t) / rampdown)
    ramp = 0.5 - 0.5 * jnp.cos(ramp * math.pi)
    ramp = ramp * jnp.minimum(1.0, t / rampup)
    return lr * ramp


def project(
    gen: Generator,
    variables: dict[str, Any],
    target: Array,
    n_steps: int = 1000,
    lr: float = 0.1,
    latent_noise: float = 0.05,
    noise_regularize_weight: float = 1e5,
    mse_weight: float = 0.0,
    distance_fn: Optional[Callable[[Array, Array], Array]] = None,
    rng: Optional[jax.Array] = None,
    log_every: int = 0,
):
    """Invert `target` [-1,1] NCHW; returns (latent W+ [B,L,D], noises, history).

    distance_fn defaults to downsampled MSE when no LPIPS weights are
    available (the reference uses LPIPS at 256², projector.py:127,150)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b = target.shape[0]

    # latent stats for init + annealing noise scale (projector.py:94-125)
    k_stat, k_rng = jax.random.split(rng)
    z = jax.random.normal(k_stat, (10_000, gen.style_dim))
    w = gen.apply(variables, z, method=Generator.get_latent)
    latent_mean = jnp.mean(w, axis=0)
    latent_std = float(jnp.sqrt(jnp.mean(jnp.sum(jnp.square(w - latent_mean), axis=1))))

    latent_in = jnp.tile(latent_mean[None, None], (b, gen.n_latent, 1))
    from ..models import noise_shapes

    noises = [
        jax.random.normal(jax.random.fold_in(k_rng, i), (b,) + s[1:])
        for i, s in enumerate(noise_shapes(gen.size))
    ]

    if distance_fn is None:

        def distance_fn(a, t):
            a = jax.image.resize(a, (a.shape[0], a.shape[1], 64, 64), "bilinear")
            t = jax.image.resize(t, (t.shape[0], t.shape[1], 64, 64), "bilinear")
            return jnp.mean(jnp.square(a - t), axis=(1, 2, 3))

    opt = optax.adam(1.0)  # lr folded in via schedule scaling
    params = {"latent": latent_in, "noises": noises}
    opt_state = opt.init(params)

    def loss_fn(p, key, noise_strength):
        lat = p["latent"] + jax.random.normal(key, p["latent"].shape) * noise_strength
        img, _ = gen.apply(
            variables, lat, input_is_latent=True, noise=p["noises"], randomize_noise=False
        )
        d = jnp.mean(distance_fn(img, target))
        n_reg = noise_regularize(p["noises"])
        mse = jnp.mean(jnp.square(img - target))
        return d + noise_regularize_weight * n_reg + mse_weight * mse, (d, n_reg)

    @jax.jit
    def step(p, o, key, step_i):
        t = step_i / n_steps
        strength = latent_std * latent_noise * jnp.maximum(0.0, 1.0 - t / 0.75) ** 2
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, key, strength)
        cur_lr = _lr_schedule(step_i, n_steps, lr)
        updates, o = opt.update(jax.tree_util.tree_map(lambda g: g, grads), o, p)
        p = jax.tree_util.tree_map(lambda x, u: x + cur_lr * u, p, updates)
        p = {"latent": p["latent"], "noises": noise_normalize(p["noises"])}
        return p, o, loss, aux

    history = []
    for i in range(n_steps):
        k_rng, key = jax.random.split(k_rng)
        params, opt_state, loss, aux = step(params, opt_state, key, jnp.asarray(i, jnp.float32))
        if log_every and i % log_every == 0:
            history.append({"step": i, "loss": float(loss), "dist": float(aux[0])})

    return params["latent"], params["noises"], history
