"""InceptionV3 pool3 feature extractor (FID backbone), flax.

Architecture matches the reference's validation stack
(reference: validation/inception.py:13-306): conv stem, InceptionA/B/C/D/E
mixed blocks, global average pool → 2048-d features. BasicConv2d is
conv(no bias) + batchnorm(eps=1e-3, inference stats) + relu. Weights ingest
from the pytorch-fid / torchvision state dict via
`inception_variables_from_torch`.

The reference constructs `models.inception_v3(pretrained=True)` — the
TORCHVISION variant (validation/inception.py:85, use_fid_inception=False at
:40) — so that is our default: 3×3/1/1 avg pools divide by 9 everywhere
(count_include_pad=True) and Mixed_7c's pool branch is an AVG pool.
`fid_variant=True` switches to pytorch-fid's FIDInception semantics
(count-excluded avg pools, max pool in Mixed_7c,
reference: validation/inception.py:183-306) for ingesting the TF-ported
pt_inception weights.

Input convention (matching pytorch-fid `normalize_input=True` on [0,1] images,
i.e. x*2-1): images in [-1, 1], NCHW, resized to 299² by the caller (or use
`preprocess`).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class BasicConv2d(nn.Module):
    out_channels: int
    kernel_size: tuple[int, int]
    stride: int = 1
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (self.out_channels, x.shape[1], *self.kernel_size),
        )
        out = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.stride, self.stride),
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        # inference-mode batchnorm with stored stats (eps=1e-3)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_channels,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_channels,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_channels,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_channels,))
        inv = scale * jax.lax.rsqrt(var + 1e-3)
        out = out * inv[None, :, None, None] + (bias - mean * inv)[None, :, None, None]
        return jax.nn.relu(out)


def _maxpool(x: Array, k: int = 3, s: int = 2, pad: int = 0) -> Array:
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, 1, k, k),
        (1, 1, s, s),
        ((0, 0), (0, 0), (pad, pad), (pad, pad)),
    )


def _avgpool(x: Array, k: int = 3, s: int = 1, pad: int = 1, count_include_pad: bool = True) -> Array:
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, k, k), (1, 1, s, s), ((0, 0), (0, 0), (pad, pad), (pad, pad))
    )
    if count_include_pad:  # torch F.avg_pool2d default (torchvision inception)
        return summed / float(k * k)
    # pytorch-fid FIDInception pools exclude the zero padding from the count
    counts = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add, (1, 1, k, k), (1, 1, s, s), ((0, 0), (0, 0), (pad, pad), (pad, pad))
    )
    return summed / counts


class InceptionA(nn.Module):
    pool_features: int
    fid_variant: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_3")(b3)
        bp = _avgpool(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _maxpool(x)
        return jnp.concatenate([b3, bd, bp], axis=1)


class InceptionC(nn.Module):
    channels_7x7: int
    fid_variant: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avgpool(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _maxpool(x)
        return jnp.concatenate([b3, b7, bp], axis=1)


class InceptionE(nn.Module):
    pool_type: str = "avg"  # pytorch-fid variant uses max-pool in the LAST E block
    fid_variant: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=1)
        if self.pool_type == "max":
            bp = _maxpool(x, 3, 1, 1)
        else:
            bp = _avgpool(x, count_include_pad=not self.fid_variant)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=1)


class InceptionV3(nn.Module):
    """pool3 (2048-d) feature extractor; input [-1,1] NCHW at 299².

    Default = torchvision semantics (the reference's choice,
    validation/inception.py:85); fid_variant=True = pytorch-fid FIDInception.
    """

    fid_variant: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fid = self.fid_variant
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _maxpool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool(x)
        x = InceptionA(32, fid_variant=fid, name="Mixed_5b")(x)
        x = InceptionA(64, fid_variant=fid, name="Mixed_5c")(x)
        x = InceptionA(64, fid_variant=fid, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, fid_variant=fid, name="Mixed_6b")(x)
        x = InceptionC(160, fid_variant=fid, name="Mixed_6c")(x)
        x = InceptionC(160, fid_variant=fid, name="Mixed_6d")(x)
        x = InceptionC(192, fid_variant=fid, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(fid_variant=fid, name="Mixed_7b")(x)
        x = InceptionE(pool_type="max" if fid else "avg", fid_variant=fid, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(2, 3))  # adaptive avg pool -> [N, 2048]

    @staticmethod
    def preprocess(img: Array) -> Array:
        """[-1,1] NCHW any size → 299² bilinear (pytorch-fid resize)."""
        return jax.image.resize(img, (img.shape[0], img.shape[1], 299, 299), "bilinear")


def inception_variables_from_torch(state_dict: Mapping[str, np.ndarray]) -> dict[str, Any]:
    """Map a pytorch-fid/torchvision InceptionV3 state dict onto the flax tree.

    torch names: <block>.conv.weight, <block>.bn.{weight,bias,running_mean,
    running_var} per BasicConv2d."""
    params: dict[str, Any] = {}

    def conv_entry(prefix: str) -> dict[str, np.ndarray]:
        return {
            "weight": jnp.asarray(state_dict[f"{prefix}.conv.weight"]),
            "bn_scale": jnp.asarray(state_dict[f"{prefix}.bn.weight"]),
            "bn_bias": jnp.asarray(state_dict[f"{prefix}.bn.bias"]),
            "bn_mean": jnp.asarray(state_dict[f"{prefix}.bn.running_mean"]),
            "bn_var": jnp.asarray(state_dict[f"{prefix}.bn.running_var"]),
        }

    def ingest(flax_prefix: str, torch_prefix: str, names: Sequence[str]):
        block: dict[str, Any] = params.setdefault(flax_prefix, {})
        for n in names:
            block[n] = conv_entry(f"{torch_prefix}.{n}")

    for stem in ["Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1", "Conv2d_4a_3x3"]:
        params[stem] = conv_entry(stem)
    a_names = ["branch1x1", "branch5x5_1", "branch5x5_2", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3", "branch_pool"]
    for blk in ["Mixed_5b", "Mixed_5c", "Mixed_5d"]:
        ingest(blk, blk, a_names)
    ingest("Mixed_6a", "Mixed_6a", ["branch3x3", "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3"])
    c_names = ["branch1x1", "branch7x7_1", "branch7x7_2", "branch7x7_3",
               "branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3", "branch7x7dbl_4", "branch7x7dbl_5", "branch_pool"]
    for blk in ["Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"]:
        ingest(blk, blk, c_names)
    ingest("Mixed_7a", "Mixed_7a", ["branch3x3_1", "branch3x3_2", "branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3", "branch7x7x3_4"])
    e_names = ["branch1x1", "branch3x3_1", "branch3x3_2a", "branch3x3_2b",
               "branch3x3dbl_1", "branch3x3dbl_2", "branch3x3dbl_3a", "branch3x3dbl_3b", "branch_pool"]
    for blk in ["Mixed_7b", "Mixed_7c"]:
        ingest(blk, blk, e_names)
    return {"params": params}
