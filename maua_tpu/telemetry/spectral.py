"""Spectral-norm tracking by power iteration — tracking only, no
normalization (reference: validation/spectral_norm.py:4-103, wired by
train.py:461-473 and logged as min/mean/max at train.py:259-275).

Functional: `init_spectral_state(params)` builds persistent u-vectors for
every ≥2-D weight; `spectral_norms(params, state)` runs one power-iteration
step per weight and returns ({name: sigma}, new_state). Jittable; call it on
G/D params each log interval.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _iter_weights(params: Any, prefix: str = ""):
    if isinstance(params, dict):
        for k, v in sorted(params.items()):
            yield from _iter_weights(v, f"{prefix}/{k}" if prefix else str(k))
    else:
        if hasattr(params, "ndim") and params.ndim >= 2:
            yield prefix, params


def _as_matrix(w: Array) -> Array:
    return w.reshape(w.shape[0], -1)


def init_spectral_state(params: Any, rng: jax.Array | None = None) -> dict[str, Array]:
    """Random unit u-vector per tracked weight (spectral_norm.py:24-36)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    state = {}
    for i, (name, w) in enumerate(_iter_weights(params)):
        key = jax.random.fold_in(rng, i)
        u = jax.random.normal(key, (_as_matrix(w).shape[0],))
        state[name] = u / jnp.linalg.norm(u)
    return state


def spectral_norms(params: Any, state: dict[str, Array], n_iter: int = 1, eps: float = 1e-12):
    """One (or n) power-iteration steps per weight → sigma estimates
    (spectral_norm.py:38-64)."""
    sigmas: dict[str, Array] = {}
    new_state: dict[str, Array] = {}
    for name, w in _iter_weights(params):
        m = _as_matrix(w)
        u = state[name]
        for _ in range(n_iter):
            v = m.T @ u
            v = v / jnp.maximum(jnp.linalg.norm(v), eps)
            u = m @ v
            u = u / jnp.maximum(jnp.linalg.norm(u), eps)
        sigmas[name] = u @ (m @ v)
        new_state[name] = jax.lax.stop_gradient(u)
    return sigmas, new_state


def summarize(sigmas: dict[str, Array]) -> dict[str, float]:
    """min/mean/max summary like the reference logs (train.py:259-275)."""
    vals = jnp.stack(list(sigmas.values()))
    return {
        "spectral_min": float(jnp.min(vals)),
        "spectral_mean": float(jnp.mean(vals)),
        "spectral_max": float(jnp.max(vals)),
    }
