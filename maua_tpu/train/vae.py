"""VAE training + hyperparameter-sweep scoring.

Reference: accelerate/accelerate_logcosh.py (and the inception/segnet
variants) — VAE training with a VGG19 perceptual loss, wandb-sweep "Score"
scalar, and OOM-retry batch halving (:215-229). Rebuilt as one generic
trainer over the flax VAE family (models/autoencoder.py); the perceptual
loss reuses the LPIPS VGG backbone (eval/lpips.py) with random or ingested
torchvision weights.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jnp.ndarray

FAILURE_SCORE = 27_000.0  # sweep sentinel (reference: accelerate_logcosh.py:221)


def make_perceptual_loss(backbone_sd=None, net: str = "vgg", image_size: int = 64):
    """VGG-feature L1 distance (the VGGLoss of accelerate_logcosh.py:29-84).
    Falls back to random-feature distance when no weights are supplied (still
    a useful stationary perceptual metric for sweeps/tests)."""
    from ..eval.lpips import LPIPS, lpips_variables_from_torch

    lp = LPIPS(net=net)
    x0 = jnp.zeros((1, 3, image_size, image_size))
    params = lp.init(jax.random.PRNGKey(0), x0, x0)
    if backbone_sd is not None:
        loaded = lpips_variables_from_torch(backbone_sd, None, net)["params"]
        merged = dict(params["params"])
        merged["features"] = loaded["features"]
        params = {"params": merged}

    def loss(a: Array, b: Array) -> Array:
        return jnp.mean(lp.apply(params, a, b))

    return loss


def train_vae(
    model,
    data_iter,
    n_steps: int = 1000,
    lr: float = 1e-3,
    perceptual_weight: float = 0.0,
    perceptual_loss: Optional[Callable[[Array, Array], Array]] = None,
    kld_weight: float = 1.0,
    rng: Optional[jax.Array] = None,
    log_every: int = 50,
    on_log: Optional[Callable[[dict], None]] = None,
):
    """Train any of the VAE family; returns (variables, history).

    model(x, rng, train) -> (recon, mu, log_var); model.loss optional
    (LogCoshVAE) else MSE+KLD (vae_loss)."""
    from ..models.autoencoder import vae_loss

    if rng is None:
        rng = jax.random.PRNGKey(0)
    rng, k_init, k_lat = jax.random.split(rng, 3)
    x0 = jnp.asarray(next(data_iter))
    variables = model.init({"params": k_init, "latent": k_lat}, x0)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    loss_fn_model = getattr(model, "loss", None)

    def loss_fn(p, bs, x, key):
        out, updates = model.apply(
            {"params": p, "batch_stats": bs},
            x,
            rngs={"latent": key},
            mutable=["batch_stats"],
        )
        recon, mu, log_var = out
        if loss_fn_model is not None:
            losses = loss_fn_model(x, recon, mu, log_var)
        else:
            losses = vae_loss(x, recon, mu, log_var, kld_weight)
        total = losses["Total"]
        if perceptual_weight > 0 and perceptual_loss is not None:
            p_loss = perceptual_loss(recon, x)
            losses["Perceptual"] = p_loss
            total = total + perceptual_weight * p_loss
        losses["Total"] = total
        return total, (losses, updates["batch_stats"])

    @jax.jit
    def step(p, bs, o, x, key):
        (total, (losses, bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(p, bs, x, key)
        updates, o = opt.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, bs, o, losses

    history = []
    t0 = time.time()
    for i in range(n_steps):
        x = jnp.asarray(next(data_iter))
        rng, key = jax.random.split(rng)
        params, batch_stats, opt_state, losses = step(params, batch_stats, opt_state, x, key)
        if i % log_every == 0:
            entry = {k: float(v) for k, v in losses.items()}
            entry.update({"step": i, "elapsed": time.time() - t0})
            history.append(entry)
            if on_log:
                on_log(entry)
            if not np.isfinite(entry["Total"]):
                break

    return {"params": params, "batch_stats": batch_stats}, history


def sweep_trial(
    model_fn: Callable[[], Any],
    data_fn: Callable[[int], Any],
    batch_size: int = 32,
    min_batch: int = 1,
    **train_kwargs,
) -> tuple[float, Any]:
    """One sweep trial with OOM-retry batch halving (reference:
    accelerate_logcosh.py:215-229): on resource errors, halve the batch and
    retry; on failure return the sentinel score. Score = final Total loss."""
    while batch_size >= min_batch:
        try:
            model = model_fn()
            variables, history = train_vae(model, data_fn(batch_size), **train_kwargs)
            if not history or not np.isfinite(history[-1]["Total"]):
                return FAILURE_SCORE, None
            return history[-1]["Total"], variables
        except (RuntimeError, jax.errors.JaxRuntimeError) as e:
            if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                batch_size //= 2
                continue
            raise
    return FAILURE_SCORE, None
