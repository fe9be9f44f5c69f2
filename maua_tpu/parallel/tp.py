"""Tensor-parallel (channel-sharded) synthesis — the optional model-sharding
extension beyond the reference's DP-only design (SURVEY.md §2.7/§7: the
reference's ~30-90M-param models fit on one device, so TP is an extension,
not table stakes).

Strategy: StyleGAN2's compute is conv layers [O, I, kh, kw]; shard the
output-channel axis of every synthesis conv over a `model` mesh axis (and the
matching noise/act biases), replicate everything small (style MLP, modulation
linears, ToRGB heads). Under GSPMD, jit with these shardings makes XLA
partition each conv channel-wise and insert the reduce-scatter/all-gather
collectives between layers — no hand-written collectives. Combine with the
`data` axis for 2-D (dp × tp) meshes.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MODEL_AXIS = "model"


def get_2d_mesh(n_data: int, n_model: int, devices=None) -> Mesh:
    """(data × model) mesh."""
    devs = np.asarray(devices if devices is not None else jax.devices()[: n_data * n_model])
    return Mesh(devs.reshape(n_data, n_model), ("data", MODEL_AXIS))


def _spec_for(path: tuple[str, ...], leaf, n_model: int) -> P:
    """PartitionSpec for one Generator param leaf.

    Shards the out-channel axis of StyledConv conv kernels and their matching
    per-channel biases; everything else (mapping MLP, modulation linears,
    ToRGB with 3 output channels, scalars, noise buffers) stays replicated.
    """
    name = "/".join(path)
    shape = getattr(leaf, "shape", ())

    is_styled_conv_weight = (
        ("conv1" in path or any(p.startswith("convs_") for p in path))
        and "conv" in path
        and path[-1] == "weight"
        and len(shape) == 4
    )
    is_act_bias = (
        ("conv1" in path or any(p.startswith("convs_") for p in path))
        and path[-1] == "act_bias"
        and len(shape) == 1
    )
    if is_styled_conv_weight and shape[0] % n_model == 0:
        return P(MODEL_AXIS, None, None, None)
    if is_act_bias and shape[0] % n_model == 0:
        return P(MODEL_AXIS)
    return P()


def generator_param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for Generator params on a mesh with a `model`
    axis; pairs with jax.jit(in_shardings=...) or device_put."""
    n_model = mesh.shape[MODEL_AXIS]

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        return NamedSharding(mesh, _spec_for(path, tree, n_model))

    return walk(params)


def shard_generator_params(params: Any, mesh: Mesh) -> Any:
    """Place params on the mesh with TP shardings (replicated where small)."""
    shardings = generator_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
