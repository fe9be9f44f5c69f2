"""Lookahead-minimax optimizer wrapper.

Reference semantics (reference: lookahead_minimax.py:19-186, used
train.py:517-520): wrap (G optimizer, D optimizer); every `k` G-steps,
interpolate BOTH networks' fast weights toward cached slow weights with
coefficient alpha (0.5) and refresh the cache — the "joint minimax lookahead"
of Chavdarova et al. Optional pullback resets inner optimizer momentum.

Here it is a pure function over pytrees, composed around any optax optimizer:
state holds the slow-weight cache + step counter; `lookahead_minimax_step`
runs after the inner G update.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class LookaheadState(NamedTuple):
    slow_g: Any  # cached slow G params
    slow_d: Any  # cached slow D params
    step: jnp.ndarray  # int32 G-step counter


def lookahead_minimax_init(g_params: Any, d_params: Any) -> LookaheadState:
    return LookaheadState(
        slow_g=jax.tree_util.tree_map(jnp.asarray, g_params),
        slow_d=jax.tree_util.tree_map(jnp.asarray, d_params),
        step=jnp.zeros((), jnp.int32),
    )


def _lerp_tree(slow: Any, fast: Any, alpha: float) -> Any:
    """slow + alpha * (fast - slow)  (reference: lookahead_minimax.py:150-166)."""
    return jax.tree_util.tree_map(lambda s, f: s + alpha * (f - s), slow, fast)


def lookahead_minimax_step(
    state: LookaheadState,
    g_params: Any,
    d_params: Any,
    k: int = 500,
    alpha: float = 0.5,
) -> tuple[LookaheadState, Any, Any]:
    """Advance the joint-lookahead clock; on every k-th step pull both nets
    toward the slow weights and refresh the cache (reference:
    lookahead_minimax.py:135-186). Branch-free (lax.cond) so it jits."""
    step = state.step + 1
    sync = (step % k) == 0

    def do_sync(_):
        new_g = _lerp_tree(state.slow_g, g_params, alpha)
        new_d = _lerp_tree(state.slow_d, d_params, alpha)
        return new_g, new_d, new_g, new_d

    def no_sync(_):
        return g_params, d_params, state.slow_g, state.slow_d

    new_g, new_d, slow_g, slow_d = jax.lax.cond(sync, do_sync, no_sync, None)
    return LookaheadState(slow_g=slow_g, slow_d=slow_d, step=step), new_g, new_d
