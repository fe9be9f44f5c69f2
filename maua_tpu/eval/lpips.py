"""LPIPS perceptual distance, flax.

Rebuilds reference validation/lpips/ (richzhang port: PNetLin over
vgg16/alex features with linear calibration, networks_basic.py:21-98):
imagenet-normalized input → backbone feature stacks → unit-normalize per
channel → linear 1×1 heads → spatial mean → sum over layers.

Backbone weights ingest from torchvision state dicts
(`lpips_variables_from_torch`); the linear heads load from the richzhang
.pth files the reference vendors (reference:
validation/lpips/weights/v0.1/*.pth — data files, loadable without the repo).
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# imagenet shift/scale in [-1,1] space (reference: networks_basic.py scaling_layer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

VGG16_SLICES = ((0, 4), (4, 9), (9, 16), (16, 23), (23, 30))  # relu1_2..relu5_3
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
ALEX_CHANNELS = [64, 192, 384, 256, 256]
VGG_CHANNELS = [64, 128, 256, 512, 512]


class _VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        feats = []
        idx = 0
        conv_i = 0
        slice_ends = [e for _, e in VGG16_SLICES]
        for v in VGG16_CFG:
            if v == "M":
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
                idx += 1
            else:
                w = self.param(f"conv{conv_i}_weight", nn.initializers.lecun_normal(), (v, x.shape[1], 3, 3))
                b = self.param(f"conv{conv_i}_bias", nn.initializers.zeros, (v,))
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW")
                ) + b[None, :, None, None]
                x = jax.nn.relu(x)
                conv_i += 1
                idx += 2
            if idx in slice_ends:
                feats.append(x)
        return feats


class _AlexFeatures(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> list[Array]:
        specs = [  # (out, k, stride, pad)
            (64, 11, 4, 2),
            (192, 5, 1, 2),
            (384, 3, 1, 1),
            (256, 3, 1, 1),
            (256, 3, 1, 1),
        ]
        feats = []
        for i, (out, k, s, p) in enumerate(specs):
            w = self.param(f"conv{i}_weight", nn.initializers.lecun_normal(), (out, x.shape[1], k, k))
            b = self.param(f"conv{i}_bias", nn.initializers.zeros, (out,))
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), ((p, p), (p, p)), dimension_numbers=("NCHW", "OIHW", "NCHW")
            ) + b[None, :, None, None]
            x = jax.nn.relu(x)
            feats.append(x)
            if i in (0, 1):  # maxpool after conv1, conv2
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
                )
        return feats


def _unit_normalize(x: Array, eps: float = 1e-10) -> Array:
    # reference util.normalize_tensor: x / (||x||_C + eps). The tiny inner
    # epsilon keeps sqrt differentiable at 0 without changing the value.
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=1, keepdims=True) + 1e-20)
    return x / (norm + eps)


class LPIPS(nn.Module):
    """lpips(x, y) for x, y in [-1, 1] NCHW → [N] distances."""

    net: str = "vgg"  # "vgg" | "alex"

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
        scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
        backbone = _VGG16Features(name="features") if self.net == "vgg" else _AlexFeatures(name="features")
        channels = VGG_CHANNELS if self.net == "vgg" else ALEX_CHANNELS

        fx = backbone((x - shift) / scale)
        fy = backbone((y - shift) / scale)

        total = jnp.zeros(x.shape[0])
        for i, (a, b) in enumerate(zip(fx, fy)):
            d = jnp.square(_unit_normalize(a) - _unit_normalize(b))  # [N,C,H,W]
            lin = self.param(f"lin{i}", nn.initializers.ones, (channels[i],))
            # richzhang lin layers are 1x1 convs with non-negative weights
            d = jnp.sum(d * jnp.maximum(lin, 0.0)[None, :, None, None], axis=1)
            total = total + jnp.mean(d, axis=(1, 2))
        return total


def lpips_variables_from_torch(
    backbone_sd: Mapping[str, np.ndarray] | None,
    lin_sd: Mapping[str, np.ndarray] | None,
    net: str = "vgg",
) -> dict[str, Any]:
    """Assemble LPIPS params from torchvision backbone + richzhang lin heads.

    backbone_sd: torchvision vgg16/alexnet state dict (features.N.weight/bias).
    lin_sd: richzhang .pth (lin{i}.model.1.weight [1,C,1,1]).
    Missing pieces stay at init (useful for architecture tests)."""
    params: dict[str, Any] = {"features": {}}
    channels = VGG_CHANNELS if net == "vgg" else ALEX_CHANNELS

    if backbone_sd is not None:
        conv_keys = sorted(
            {int(k.split(".")[1]) for k in backbone_sd if k.startswith("features.") and k.endswith(".weight")}
        )
        for i, layer_idx in enumerate(conv_keys):
            params["features"][f"conv{i}_weight"] = jnp.asarray(backbone_sd[f"features.{layer_idx}.weight"])
            params["features"][f"conv{i}_bias"] = jnp.asarray(backbone_sd[f"features.{layer_idx}.bias"])

    if lin_sd is not None:
        for i in range(len(channels)):
            key = f"lin{i}.model.1.weight"
            if key in lin_sd:
                params[f"lin{i}"] = jnp.asarray(np.asarray(lin_sd[key]).reshape(-1))
    return {"params": params}
