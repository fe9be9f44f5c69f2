"""Export flax variables BACK to the rosinality torch format.

The inverse of io/torch_ckpt.py: lets checkpoints trained here be consumed by
the reference ecosystem (and every other rosinality-format tool). Layouts:
linear [in,out]→[out,in], modconv [O,I,k,k]→[1,O,I,k,k], act_bias→
activate.bias, buffers→noises.noise_i (key schema of reference
train.py:335-343, models/stylegan2.py).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

__all__ = ["generator_state_dict_to_torch", "save_torch_checkpoint"]


def generator_state_dict_to_torch(variables: Mapping[str, Any], gen) -> dict[str, np.ndarray]:
    """Generator flax variables → rosinality-format state dict (numpy)."""
    p = variables["params"]
    sd: dict[str, np.ndarray] = {}

    def put_lin(prefix, tree):
        sd[f"{prefix}.weight"] = np.asarray(tree["weight"]).T
        if "bias" in tree:
            sd[f"{prefix}.bias"] = np.asarray(tree["bias"])

    def put_modconv(prefix, tree):
        sd[f"{prefix}.weight"] = np.asarray(tree["weight"])[None]
        put_lin(f"{prefix}.modulation", tree["modulation"])

    def put_styled(prefix, tree):
        put_modconv(f"{prefix}.conv", tree["conv"])
        sd[f"{prefix}.noise.weight"] = np.asarray(tree["noise"]["weight"])
        sd[f"{prefix}.activate.bias"] = np.asarray(tree["act_bias"])

    def put_torgb(prefix, tree):
        put_modconv(f"{prefix}.conv", tree["conv"])
        sd[f"{prefix}.bias"] = np.asarray(tree["bias"])

    for i in range(gen.n_mlp):
        put_lin(f"style.{i + 1}", p["style"][f"dense_{i}"])
    if "input" in p["g_input"]:
        sd["input.input"] = np.asarray(p["g_input"]["input"])
    else:
        put_lin("input.linear", p["g_input"]["linear"])
        sd["input.activate.bias"] = np.asarray(p["g_input"]["act_bias"])
    put_styled("conv1", p["conv1"])
    put_torgb("to_rgb1", p["to_rgb1"])
    n_convs = sum(1 for k in p if k.startswith("convs_"))
    for i in range(n_convs):
        put_styled(f"convs.{i}", p[f"convs_{i}"])
    for i in range(n_convs // 2):
        put_torgb(f"to_rgbs.{i}", p[f"to_rgbs_{i}"])
    for k, v in variables.get("buffers", {}).items():
        sd[f"noises.{k}"] = np.asarray(v)
    return sd


def save_torch_checkpoint(path: str, gen, g_ema_variables, g_variables=None, d_state_dict=None) -> str:
    """Write a reference-compatible .pt with the {g, d, g_ema} key schema
    (reference: train.py:324-345). Missing pieces are omitted."""
    import torch

    def to_torch(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}

    ckpt: dict[str, Any] = {"g_ema": to_torch(generator_state_dict_to_torch(g_ema_variables, gen))}
    if g_variables is not None:
        ckpt["g"] = to_torch(generator_state_dict_to_torch(g_variables, gen))
    if d_state_dict is not None:
        ckpt["d"] = to_torch(d_state_dict)
    torch.save(ckpt, path)
    return path
