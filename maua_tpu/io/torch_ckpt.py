"""Torch-checkpoint ingestion: rosinality-format StyleGAN2 `.pt` → flax variables.

The reference trains/saves torch pickles with keys {g, d, g_ema, g_optim,
d_optim} (reference: train.py:324-345) and loads `g_ema` in the Generator
constructor (models/stylegan2.py:458-459). This module maps those state dicts
onto maua_tpu's parameter pytrees so real checkpoints run on TPU unchanged.

Layout conventions mapped:
  torch EqualLinear.weight [out, in]      -> ours [in, out]   (transpose)
  torch ModulatedConv2d.weight [1,O,I,k,k]-> ours [O,I,k,k]   (squeeze)
  torch conv weights OIHW                 -> ours OIHW        (direct)
  torch FusedLeakyReLU.bias               -> ours act_bias
  torch noise buffers noises.noise_i      -> ours buffers/noise_i
"""

from __future__ import annotations

import re
import warnings
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "generator_variables_from_torch",
    "discriminator_variables_from_torch",
    "load_generator",
]


def load_torch_checkpoint(path: str) -> dict[str, Any]:
    """Load a torch .pt checkpoint to numpy-backed state dicts (CPU torch)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(obj):
        if isinstance(obj, torch.Tensor):
            return obj.detach().cpu().numpy()
        if isinstance(obj, Mapping):
            return {k: to_np(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(to_np(v) for v in obj)
        return obj

    return to_np(ckpt)


def _lin(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, jnp.ndarray]:
    """torch EqualLinear -> {weight [in,out], bias}."""
    out = {"weight": jnp.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
    return out


def _modconv(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, Any]:
    """torch ModulatedConv2d -> {weight [O,I,k,k], modulation:{...}}."""
    w = np.asarray(sd[f"{prefix}.weight"])
    if w.ndim == 5:
        w = w[0]
    return {"weight": jnp.asarray(w), "modulation": _lin(sd, f"{prefix}.modulation")}


def _styled_conv(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, Any]:
    return {
        "conv": _modconv(sd, f"{prefix}.conv"),
        "noise": {"weight": jnp.asarray(sd[f"{prefix}.noise.weight"])},
        "act_bias": jnp.asarray(sd[f"{prefix}.activate.bias"]),
    }


def _to_rgb(sd: Mapping[str, np.ndarray], prefix: str) -> dict[str, Any]:
    return {
        "conv": _modconv(sd, f"{prefix}.conv"),
        "bias": jnp.asarray(sd[f"{prefix}.bias"]),
    }


def generator_variables_from_torch(state_dict: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Map a rosinality Generator state dict onto maua_tpu Generator variables.

    Returns {"params": ..., "buffers": ...} ready for Generator.apply. The
    generator config (size, n_mlp, constant_input) is inferred from the keys.
    """
    sd = state_dict
    params: dict[str, Any] = {}

    # mapping network: style.0 is PixelNorm (no params); style.1..n are EqualLinear
    n_mlp = 0
    while f"style.{n_mlp + 1}.weight" in sd:
        n_mlp += 1
    params["style"] = {f"dense_{i}": _lin(sd, f"style.{i + 1}") for i in range(n_mlp)}

    # input: ConstantInput (input.input [1,C,4,4]) or LatentInput (input.linear.*)
    if "input.linear.weight" in sd:
        params["g_input"] = {
            "linear": _lin(sd, "input.linear"),
            "act_bias": jnp.asarray(sd["input.activate.bias"]),
        }
    else:
        params["g_input"] = {"input": jnp.asarray(sd["input.input"])}

    params["conv1"] = _styled_conv(sd, "conv1")
    params["to_rgb1"] = _to_rgb(sd, "to_rgb1")

    n_convs = len({int(m.group(1)) for k in sd if (m := re.match(r"convs\.(\d+)\.", k))})
    for i in range(n_convs):
        params[f"convs_{i}"] = _styled_conv(sd, f"convs.{i}")
    for i in range(n_convs // 2):
        params[f"to_rgbs_{i}"] = _to_rgb(sd, f"to_rgbs.{i}")

    buffers = {
        k.split(".")[-1]: jnp.asarray(v) for k, v in sd.items() if k.startswith("noises.noise_")
    }
    return {"params": params, "buffers": buffers}


def _conv_layer(sd: Mapping[str, np.ndarray], prefix: str, downsample: bool, activate: bool = True) -> dict[str, Any]:
    """torch ConvLayer (a Sequential: [Blur?] EqualConv2d [FusedLeakyReLU?])
    (reference: models/stylegan2.py:579-621). Sequential index of the conv
    shifts by one when a Blur precedes it."""
    idx = 1 if downsample else 0
    out: dict[str, Any] = {"conv": {"weight": jnp.asarray(sd[f"{prefix}.{idx}.weight"])}}
    if f"{prefix}.{idx}.bias" in sd:
        out["conv"]["bias"] = jnp.asarray(sd[f"{prefix}.{idx}.bias"])
    if activate and f"{prefix}.{idx + 1}.bias" in sd:
        out["act_bias"] = jnp.asarray(sd[f"{prefix}.{idx + 1}.bias"])
    return out


def discriminator_variables_from_torch(state_dict: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Map a rosinality Discriminator state dict onto maua_tpu variables."""
    sd = state_dict
    params: dict[str, Any] = {"from_rgb": _conv_layer(sd, "convs.0", downsample=False)}

    n_blocks = len({int(m.group(1)) for k in sd if (m := re.match(r"convs\.(\d+)\.", k))}) - 1
    # reference block i covers resolutions log_size..3 (models/stylegan2.py:665-670)
    log_size = n_blocks + 2
    for j in range(n_blocks):
        prefix = f"convs.{j + 1}"
        block = {
            "conv1": _conv_layer(sd, f"{prefix}.conv1", downsample=False),
            "conv2": _conv_layer(sd, f"{prefix}.conv2", downsample=True),
        }
        if f"{prefix}.skip.1.weight" in sd:
            block["skip"] = _conv_layer(sd, f"{prefix}.skip", downsample=True, activate=False)
        params[f"block_{log_size - j}"] = block

    params["final_conv"] = _conv_layer(sd, "final_conv", downsample=False)
    params["final_linear_0"] = _lin(sd, "final_linear.0")
    params["final_linear_1"] = _lin(sd, "final_linear.1")
    return {"params": params}


def infer_generator_config(state_dict: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Infer (size, style_dim, n_mlp, channel_multiplier, constant_input) from
    a rosinality state dict — mirrors the size auto-probe idea the reference
    uses for StyleGAN1 (models/stylegan1.py:509-543)."""
    sd = state_dict
    n_mlp = 0
    while f"style.{n_mlp + 1}.weight" in sd:
        n_mlp += 1
    style_dim = int(np.asarray(sd["style.1.weight"]).shape[1])
    n_convs = len({int(m.group(1)) for k in sd if (m := re.match(r"convs\.(\d+)\.", k))})
    log_size = n_convs // 2 + 2
    size = 2**log_size
    constant_input = "input.input" in sd and np.asarray(sd["input.input"]).ndim == 4
    # channel multiplier from the final conv's channel count vs. the table;
    # channel_max (fmap cap) from the widest conv observed
    last_ch = int(np.asarray(sd[f"convs.{n_convs - 1}.conv.weight"]).shape[1])
    base = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128, 256: 64, 512: 32, 1024: 16}[size]
    channel_multiplier = max(1, last_ch // base) if size >= 64 else 2
    channel_max = max(
        int(np.asarray(v).shape[1])
        for k, v in sd.items()
        if re.fullmatch(r"convs\.\d+\.conv\.weight", k)
    )
    channel_max = max(channel_max, last_ch)
    return dict(
        size=size,
        style_dim=style_dim,
        n_mlp=n_mlp,
        channel_multiplier=channel_multiplier,
        constant_input=constant_input,
        channel_max=channel_max if channel_max < 512 else 512,
    )


def load_generator(
    checkpoint: str,
    key: str = "g_ema",
    output_size: int | None = None,
    base_res_factor: float = 1,
    **overrides,
):
    """Build a Generator + variables from a torch checkpoint — the TPU
    equivalent of `Generator(checkpoint=...)` (reference:
    generate_audiovisual.py:194-205, models/stylegan2.py:458-470).

    When output_size induces widescreen noise geometry, the stored square
    noise buffers are re-sampled to the new shapes (the reference draws fresh
    randn buffers, models/stylegan2.py:461-470; we resize deterministically by
    tiling the stored buffer to preserve texture for parity).

    The CHECKPOINT IS AUTHORITATIVE for architecture config: any override in
    `overrides` that names an architecture key inferred from the state dict
    (size, style_dim, n_mlp, channel_multiplier, constant_input, channel_max)
    is ignored with a warning when it conflicts — the variables come from the
    state dict, so honoring the override would build a Generator whose param
    tree cannot be applied (the reference crashes on such mismatches,
    models/stylegan2.py:458-459). Callers who need a different architecture
    should build Generator(...) directly and transfer weights explicitly."""
    from ..models import Generator, noise_shapes

    ckpt = load_torch_checkpoint(checkpoint)
    sd = ckpt[key] if key in ckpt else ckpt
    config = infer_generator_config(sd)
    # Architecture keys are authoritative from the state dict: the variables
    # come from `sd` regardless of `overrides`, so a conflicting override
    # (e.g. a CLI default --noconst/--size that doesn't match the checkpoint)
    # would build a Generator whose param tree cannot be applied. The
    # reference crashes on such mismatches (models/stylegan2.py:458-459 raw
    # load_state_dict); we keep the inferred value and warn instead.
    for k, v in list(overrides.items()):
        if k in config:
            if v != config[k]:
                warnings.warn(
                    f"load_generator: ignoring override {k}={v!r}; checkpoint "
                    f"implies {k}={config[k]!r}"
                )
            overrides.pop(k)
    config.update(overrides)
    # default to polyphase (s2d) evaluation on accelerators (exact, 2-4x on
    # the low-channel high-res layers — ops/s2d.py); pass s2d_min_res=0 to
    # opt out. CPU conv layouts don't lane-pad, so s2d would only add its
    # structural-zero MACs there.
    if config.get("s2d_min_res", "auto") == "auto":
        import jax

        from ..models import auto_s2d_min_res

        if jax.default_backend() == "cpu":
            config["s2d_min_res"] = 0
        else:
            config["s2d_min_res"] = auto_s2d_min_res(
                config["size"], config["channel_multiplier"], config["channel_max"]
            )
    gen = Generator(output_size=output_size, base_res_factor=base_res_factor, **config)
    variables = generator_variables_from_torch(sd)

    shapes = noise_shapes(config["size"], output_size, base_res_factor)
    buffers = {}
    for i, shape in enumerate(shapes):
        buf = variables["buffers"].get(f"noise_{i}")
        if buf is None or tuple(buf.shape) != shape:
            src = buf if buf is not None else jnp.zeros((1, 1, 2, 2))
            reps = (1, 1, -(-shape[2] // src.shape[2]), -(-shape[3] // src.shape[3]))
            buf = jnp.tile(src, reps)[:, :, : shape[2], : shape[3]]
        buffers[f"noise_{i}"] = buf
    variables["buffers"] = buffers
    return gen, variables
