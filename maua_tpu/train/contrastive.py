"""SimCLR/MoCo-style contrastive regularization on D's hidden layer.

Reference: contrastive_learner.py — InfoNCE (`contrastive_loss`) and NT-Xent
losses on projected hidden-layer features of D, with queries/keys accumulated
over the original/augmented image pairs each D step (train.py:177-182,
contrastive_learner.py:230-253). Functional rebuild: the projection head is
an explicit params pytree, features come from
Discriminator(..., return_hidden=True), and query/key accumulation is just a
list of feature batches inside the jitted step.

The reference's MoCo machinery (contrastive_learner.py:155-253) is rebuilt as
an explicit `ContrastiveState` pytree threaded through the jitted train step
instead of module mutation + deepcopy singletons:
* momentum key encoder (`use_momentum`/`momentum_value`, ref :180-186,216-222)
  -> `key_d_params`, an EMA copy of D's params updated once per D step
  (`momentum_update`); keys go through it under stop_gradient.
* bilinear key transform (`use_bilinear`, ref :187-190,244-245) ->
  `bilinear_w`, applied to PROJECTED keys (the reference applies it to the
  raw flattened hidden layer, whose dim² matrix would be ~64M params at
  256²; projected-space keeps the same role at 128² — documented deviation).
* query/key accumulation across calls (ref safe_concat :230-253) -> within a
  step this is the `originals`/`augmenteds` batch concatenation; ACROSS steps
  it becomes a fixed-size MoCo negative queue (`queue`, `queue_ptr`) of
  projected keys, used as extra negatives in InfoNCE (queues are unbounded
  python lists in the reference; a ring buffer is the jittable equivalent).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence

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


def init_projection_head(
    rng: jax.Array, feat_dim: int, hidden: int = 256, out: int = 128, bilinear: bool = False
) -> dict[str, Any]:
    """2-layer MLP projector (the SimCLR head the reference builds lazily,
    contrastive_learner.py:160-180). With `bilinear`, adds the identity-init
    key transform W (ref :187-190,244-245 — applied there to the raw hidden
    layer whose dim² matrix would be ~64M params at 256²; here to the
    projected keys, same role at out² params). Trains with D's optimizer, as
    the reference's learner params do (train.py:572-579)."""
    k1, k2 = jax.random.split(rng)
    head = {
        "w1": jax.random.normal(k1, (feat_dim, hidden)) / jnp.sqrt(feat_dim),
        "b1": jnp.zeros(hidden),
        "w2": jax.random.normal(k2, (hidden, out)) / jnp.sqrt(hidden),
        "b2": jnp.zeros(out),
    }
    if bilinear:
        head["bw"] = jnp.eye(out)
    return head


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


# ---------------------------------------------------------------------------
# MoCo machinery: momentum key encoder + bilinear key transform + key queue
# (reference: contrastive_learner.py:155-253)
# ---------------------------------------------------------------------------


class ContrastiveState(NamedTuple):
    """Non-trainable contrastive machinery carried in the train state.

    key_d_params: momentum (EMA) copy of D's params, or None.
    (the bilinear key transform is NOT here — it lives in the projection-head
    pytree so it trains with D's optimizer; see init_projection_head.)
    queue:        [Q, out] ring buffer of past projected keys (negatives).
    queue_ptr:    scalar int32 write cursor.
    queue_filled: scalar int32, how many slots hold real keys (< Q at start —
                  unfilled slots are masked out of the softmax, unlike MoCo's
                  random-init warmup which pollutes early losses).
    """

    key_d_params: Optional[Any] = None
    queue: Optional[Array] = None
    queue_ptr: Optional[Array] = None
    queue_filled: Optional[Array] = None


def init_contrastive_state(
    d_params: Any, use_momentum: bool, queue_size: int, out_dim: int = 128
) -> Optional[ContrastiveState]:
    """Build the ContrastiveState for the configured options (None if neither
    momentum nor a queue is requested — the plain SimCLR path)."""
    if not use_momentum and queue_size <= 0:
        return None
    key_d = jax.tree_util.tree_map(jnp.asarray, d_params) if use_momentum else None
    queue = jnp.zeros((queue_size, out_dim)) if queue_size > 0 else None
    ptr = jnp.zeros((), jnp.int32) if queue_size > 0 else None
    filled = jnp.zeros((), jnp.int32) if queue_size > 0 else None
    return ContrastiveState(key_d, queue, ptr, filled)


def momentum_update(cl_state: ContrastiveState, d_params: Any, beta: float) -> ContrastiveState:
    """EMA the key encoder toward D (reference: contrastive_learner.py:100-110,
    update_moving_average) — called once per D optimizer step."""
    if cl_state is None or cl_state.key_d_params is None:
        return cl_state
    new_key = jax.tree_util.tree_map(
        lambda old, new: old * beta + (1.0 - beta) * new, cl_state.key_d_params, d_params
    )
    return cl_state._replace(key_d_params=new_key)


def enqueue_keys(cl_state: ContrastiveState, keys: Array) -> ContrastiveState:
    """Write a batch of projected keys into the ring buffer. Q % batch == 0 is
    asserted at config time so the write never wraps mid-batch (MoCo's own
    simplification)."""
    if cl_state is None or cl_state.queue is None:
        return cl_state
    keys = jax.lax.stop_gradient(keys).astype(cl_state.queue.dtype)
    q = cl_state.queue.shape[0]
    queue = jax.lax.dynamic_update_slice(cl_state.queue, keys, (cl_state.queue_ptr, 0))
    ptr = (cl_state.queue_ptr + keys.shape[0]) % q
    filled = jnp.minimum(cl_state.queue_filled + keys.shape[0], q)
    return cl_state._replace(queue=queue, queue_ptr=ptr, queue_filled=filled)


def contrastive_loss_with_queue(
    queries: Array, keys: Array, queue: Array, queue_filled: Array, temperature: float = 0.1
) -> Array:
    """InfoNCE with the ring buffer's past keys as extra negatives (the MoCo
    objective): logits = q @ [keys; queue]^T, positives on the diagonal of the
    keys block; unfilled queue slots are masked to -inf."""
    b = queries.shape[0]
    logits = queries @ jnp.concatenate([keys, queue.astype(keys.dtype)]).T  # [b, b+Q]
    slot = jnp.arange(queue.shape[0])
    neg_inf = jnp.finfo(logits.dtype).min
    queue_mask = jnp.where(slot < queue_filled, 0.0, neg_inf)  # [Q]
    logits = logits.at[:, b:].add(queue_mask)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    logits = logits / temperature
    labels = jnp.arange(b)
    return jnp.mean(
        -jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1), labels[:, None], axis=1)
    )


def contrastive_regularizer_moco(
    d_hidden: Callable[[Array], Array],
    key_d_hidden: Optional[Callable[[Array], Array]],
    head: dict[str, Any],
    cl_state: Optional[ContrastiveState],
    originals: Sequence[Array],
    augmenteds: Sequence[Array],
    loss_type: str = "infonce",
    temperature: float = 0.1,
) -> tuple[Array, Optional[ContrastiveState]]:
    """The full contrastive step: queries = D(original) through the head,
    keys = key-encoder(augmented) through the head (stop-gradient when the
    momentum encoder is active, ref contrastive_learner.py:238-241), loss
    against current keys (+ queued negatives for InfoNCE), then the new keys
    are enqueued. Returns (loss, updated cl_state)."""
    queries = jnp.concatenate([project(head, d_hidden(x)) for x in originals])
    if key_d_hidden is not None:
        keys = jnp.concatenate(
            [project(head, jax.lax.stop_gradient(key_d_hidden(x))) for x in augmenteds]
        )
        keys = jax.lax.stop_gradient(keys)
    else:
        keys = jnp.concatenate([project(head, d_hidden(x)) for x in augmenteds])
    if "bw" in head:
        # bilinear key transform (ref contrastive_learner.py:244-245); the
        # projected-space W trains through the loss with D's optimizer
        keys = keys @ head["bw"].T

    use_queue = (
        cl_state is not None and cl_state.queue is not None and loss_type != "nt_xent"
    )
    if use_queue:
        loss = contrastive_loss_with_queue(
            queries, keys, cl_state.queue, cl_state.queue_filled, temperature
        )
        cl_state = enqueue_keys(cl_state, keys)
    elif loss_type == "nt_xent":
        loss = nt_xent_loss(queries, keys, temperature)
    else:
        loss = contrastive_loss(queries, keys, temperature)
    return loss, cl_state
