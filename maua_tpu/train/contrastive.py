"""SimCLR-style contrastive regularization on the discriminator's hidden layer.

Reference: contrastive_learner.py — InfoNCE (`contrastive_loss`) and NT-Xent
losses on projected hidden-layer features of D, with queries/keys accumulated
over the original/augmented image pairs each D step (train.py:177-182,
contrastive_learner.py:230-253). Functional rebuild: the projection head is
an explicit params pytree, features come from
Discriminator(..., return_hidden=True), and query/key accumulation is just a
list of feature batches inside the jitted step.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def contrastive_loss(queries: Array, keys: Array, temperature: float = 0.1) -> Array:
    """InfoNCE: i-th query matches i-th key (reference:
    contrastive_learner.py:48-53)."""
    logits = queries @ keys.T
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    logits = logits / temperature
    labels = jnp.arange(queries.shape[0])
    return jnp.mean(
        -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=1)
    )


def nt_xent_loss(queries: Array, keys: Array, temperature: float = 0.1) -> Array:
    """NT-Xent over the 2b×2b similarity matrix with the diagonal masked
    (reference: contrastive_learner.py:56-70)."""
    b = queries.shape[0]
    n = 2 * b
    projs = jnp.concatenate([queries, keys])
    logits = projs @ projs.T
    mask = jnp.eye(n, dtype=bool)
    neg_inf = jnp.finfo(logits.dtype).min
    logits = jnp.where(mask, neg_inf, logits) / temperature
    # positive of sample i is i+b (and vice versa)
    labels = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, labels[:, None], axis=1).sum()
    return loss / (2 * (b - 1))


def init_projection_head(rng: jax.Array, feat_dim: int, hidden: int = 256, out: int = 128) -> dict[str, Any]:
    """2-layer MLP projector (the SimCLR head the reference builds lazily,
    contrastive_learner.py:160-180)."""
    k1, k2 = jax.random.split(rng)
    return {
        "w1": jax.random.normal(k1, (feat_dim, hidden)) / jnp.sqrt(feat_dim),
        "b1": jnp.zeros(hidden),
        "w2": jax.random.normal(k2, (hidden, out)) / jnp.sqrt(hidden),
        "b2": jnp.zeros(out),
    }


def project(head: dict[str, Any], feats: Array) -> Array:
    h = feats.reshape(feats.shape[0], -1)
    h = jax.nn.relu(h @ head["w1"] + head["b1"])
    h = h @ head["w2"] + head["b2"]
    return h / jnp.maximum(jnp.linalg.norm(h, axis=1, keepdims=True), 1e-8)


def contrastive_regularizer(
    d_hidden: Callable[[Array], Array],
    head: dict[str, Any],
    originals: Sequence[Array],
    augmenteds: Sequence[Array],
    loss_type: str = "infonce",
    temperature: float = 0.1,
) -> Array:
    """Accumulate (original, augmented) pairs — the reference calls the
    learner once for fakes and once for reals then computes one loss
    (train.py:177-182) — and return the contrastive loss."""
    queries = jnp.concatenate([project(head, d_hidden(x)) for x in originals])
    keys = jnp.concatenate([project(head, d_hidden(x)) for x in augmenteds])
    if loss_type == "nt_xent":
        return nt_xent_loss(queries, keys, temperature)
    return contrastive_loss(queries, keys, temperature)
