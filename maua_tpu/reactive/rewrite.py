"""Model rewriting: per-batch weight overrides as a params-pytree transform.

The reference rewrites weights by setattr-ing transformed Parameters onto the
live generator every batch (reference: render.py:160-167) — incompatible with
jit. Here a rewrite is `Rewrite(param_path, transform, modulation)` where
`transform(weight, mod)` is a pure function of the original weight and the
batch's modulation slice; `rewrites_for_batch` produces a *new* params pytree
(original weights untouched) that is fed to Generator.apply — weights become
just another input to the compiled step, which XLA pipelines like any other.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Sequence

import jax.numpy as jnp

Array = jnp.ndarray


class Rewrite(NamedTuple):
    param_path: str  # "/"-separated path into the params pytree, e.g. "convs_3/conv/weight"
    transform: Callable[[Array, Optional[Array]], Array]  # (weight, mod[B]) -> weight
    modulation: Optional[Array] = None  # [n_frames] timeline


def _get_path(tree: Any, path: str) -> Array:
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


def _set_path(tree: Any, path: str, value: Array) -> Any:
    """Functional set: returns a copy of `tree` with `path` replaced."""
    parts = path.split("/")
    if len(parts) == 1:
        new = dict(tree)
        new[parts[0]] = value
        return new
    new = dict(tree)
    new[parts[0]] = _set_path(tree[parts[0]], "/".join(parts[1:]), value)
    return new


def apply_rewrites(params: Any, rewrites: Sequence[Rewrite], mods: Sequence[Optional[Array]]) -> Any:
    """Apply each rewrite's transform to the ORIGINAL weight (reference
    semantics: transforms always act on original_weights, render.py:122-127,
    161) and return the updated params pytree."""
    out = params
    for rw, mod in zip(rewrites, mods):
        w = _get_path(params, rw.param_path)
        out = _set_path(out, rw.param_path, rw.transform(w, mod))
    return out


def rewrites_for_batch(params: Any, rewrites: Sequence[Rewrite], start: int, end: int) -> Any:
    """Params pytree for frames [start:end): transforms receive the
    modulation slice for the batch (reference: render.py:160-162)."""
    if not rewrites:
        return params
    mods = [
        None if rw.modulation is None else jnp.asarray(rw.modulation[start:end])
        for rw in rewrites
    ]
    return apply_rewrites(params, rewrites, mods)
