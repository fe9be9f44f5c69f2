"""Generator EMA (reference: train.py:45-49, accumulate(), decay 0.5^(32/10k))."""

from __future__ import annotations

from typing import Any

import jax

EMA_DECAY_DEFAULT = 0.5 ** (32 / 10_000)  # ≈ 0.99778


def ema_update(ema_params: Any, params: Any, decay: float = EMA_DECAY_DEFAULT) -> Any:
    """ema <- decay*ema + (1-decay)*params over the whole pytree."""
    return jax.tree_util.tree_map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)
