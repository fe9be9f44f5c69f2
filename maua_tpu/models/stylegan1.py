"""StyleGAN1 inference port (lernapparat architecture), TPU-native.

Reference: models/stylegan1.py — G_mapping (pixelnorm + 8 equalized linears,
lrmul 0.01, lrelu), G_synthesis (InputBlock + GSynthesisBlocks of
[fused-upscale conv → blur → bias] + LayerEpilogue [noise → lrelu →
instance-norm → style mod]), final 1×1 toRGB; Truncation lerps the first 8
layers toward the mean latent (stylegan1.py:224-236); G_style adds widescreen
constant-layer padding (stylegan1.py:550-568) and per-scale noise buffers.

Inference-only, so implemented as pure functions over a params pytree ingested
directly from the torch checkpoint (no flax boilerplate); `StyleGAN1` wraps
them with the same `.apply(variables, latents, ...)` surface the renderer uses
for the SG2 Generator, so `render()` takes either model. The resolution
auto-probe chain 1024→512→256→128 (stylegan1.py:509-543) becomes direct
inference of the resolution from the state-dict keys.
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .blocks import apply_bends

Array = jnp.ndarray


def _nf(stage: int, fmap_base: int = 8192, fmap_max: int = 512) -> int:
    return min(int(fmap_base / (2.0**stage)), fmap_max)


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _linear(p: Mapping[str, Array], x: Array, gain: float = math.sqrt(2), lrmul: float = 1.0) -> Array:
    """Equalized linear (use_wscale): y = x @ (W*he_std*lrmul)^T + b*lrmul
    (reference: stylegan1.py:12-38)."""
    w = p["weight"]
    he_std = gain * w.shape[1] ** -0.5
    out = x @ (w * he_std * lrmul).T
    if "bias" in p:
        out = out + p["bias"] * lrmul
    return out


def _conv(p: Mapping[str, Array], x: Array, gain: float = math.sqrt(2), pad: Optional[int] = None) -> Array:
    w = p["weight"]
    k = w.shape[-1]
    he_std = gain * (w.shape[1] * k * k) ** -0.5
    pad = k // 2 if pad is None else pad
    out = jax.lax.conv_general_dilated(
        x, (w * he_std).astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "bias" in p:
        out = out + p["bias"].reshape(1, -1, 1, 1)
    return out


def _blur121(x: Array) -> Array:
    k = jnp.asarray([1.0, 2.0, 1.0])
    k2 = jnp.outer(k, k)
    k2 = (k2 / jnp.sum(k2)).astype(x.dtype)
    n, c, h, w = x.shape
    out = jax.lax.conv_general_dilated(
        x.reshape(n * c, 1, h, w), k2[None, None], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out.reshape(n, c, h, w)


def _upscale2d(x: Array) -> Array:
    b, c, h, w = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :, None], (b, c, h, 2, w, 2)).reshape(b, c, 2 * h, 2 * w)


def _conv_up_fused(p: Mapping[str, Array], x: Array, gain: float = math.sqrt(2)) -> Array:
    """Fused upscale+conv for large maps (reference: stylegan1.py:82-93):
    pad weight, sum 4 shifts, conv_transpose stride 2."""
    w = p["weight"]  # [O, I, 3, 3]
    k = w.shape[-1]
    he_std = gain * (w.shape[1] * k * k) ** -0.5
    w = (w * he_std).transpose(1, 0, 2, 3)  # -> [I, O, 3, 3] (conv_transpose layout)
    wp = jnp.pad(w, ((0, 0), (0, 0), (1, 1), (1, 1)))
    w4 = wp[:, :, 1:, 1:] + wp[:, :, :-1, 1:] + wp[:, :, 1:, :-1] + wp[:, :, :-1, :-1]  # [I,O,4,4]
    # torch conv_transpose2d(stride=2, padding=(4-1)//2=1)
    wt = jnp.flip(w4, (-2, -1)).transpose(1, 0, 2, 3)  # -> [O, I, 4, 4] correlation form
    out = jax.lax.conv_general_dilated(
        x, wt.astype(x.dtype), (1, 1),
        padding=((2, 2), (2, 2)),  # full pad (k-1=3) minus torch padding 1
        lhs_dilation=(2, 2),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out


def _epilogue(p: Mapping[str, Array], x: Array, w_slice: Array, noise: Optional[Array], rng=None) -> Array:
    """noise → lrelu → instance-norm → style mod (reference: stylegan1.py:243-316)."""
    nw = p["noise_weight"].reshape(1, -1, 1, 1)
    if noise is None:
        if rng is not None:
            noise = jax.random.normal(rng, (x.shape[0], 1, x.shape[2], x.shape[3]), x.dtype)
        else:
            noise = jnp.zeros((1, 1, x.shape[2], x.shape[3]), x.dtype)
    x = x + nw * noise.astype(x.dtype)
    x = _lrelu(x)
    mean = jnp.mean(x, axis=(2, 3), keepdims=True)
    var = jnp.var(x, axis=(2, 3), keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    style = _linear(p["style"], w_slice, gain=1.0)  # [B, 2C]
    s = style.reshape(style.shape[0], 2, -1)[:, :, :, None, None]
    return x * (s[:, 0] + 1.0) + s[:, 1]


def g1_mapping(params: Mapping[str, Any], z: Array, n_latent: int = 18) -> Array:
    """z [B,512] → W+ [B,18,512] (reference: stylegan1.py:193-217)."""
    x = z * jax.lax.rsqrt(jnp.mean(jnp.square(z), axis=1, keepdims=True) + 1e-8)
    for i in range(8):
        x = _lrelu(_linear(params[f"dense{i}"], x, lrmul=0.01))
    return jnp.repeat(x[:, None, :], n_latent, axis=1)


def g1_synthesis(
    params: Mapping[str, Any],
    wplus: Array,
    noise: Sequence[Optional[Array]],
    bends: Sequence[Any] = (),
    rng: Optional[jax.Array] = None,
) -> Array:
    """W+ [B,2L,512] + per-block noise → image (reference: stylegan1.py:419-504)."""
    blocks = params["blocks"]
    n_blocks = len(blocks)
    x = None
    for i in range(n_blocks):
        bp = blocks[i]
        nz = noise[i] if i < len(noise) else None
        ki = None if rng is None else jax.random.fold_in(rng, i)
        if i == 0:
            const = bp["const"]  # [1, nf, h, w]
            x = jnp.broadcast_to(const, (wplus.shape[0],) + const.shape[1:])
            x = x + bp["bias"].reshape(1, -1, 1, 1)
            x = _epilogue(bp["epi1"], x, wplus[:, 0], nz, ki)
            x = _conv(bp["conv"], x)
            x = _epilogue(bp["epi2"], x, wplus[:, 1], nz, ki)
        else:
            if min(x.shape[2:]) * 2 >= 128:
                x = _conv_up_fused(bp["conv0_up"], x)
            else:
                x = _upscale2d(x)
                x = _conv(bp["conv0_up"], x, pad=1)
            # blur sits between conv and bias in the reference ("intermediate")
            # but conv helpers add bias already; 1-px error vs bias-after-blur
            # is zero because blur is linear and bias is constant per channel
            # (blur(x)+b == blur(x+b) for normalized kernels)
            x = _blur121(x)
            x = _epilogue(bp["epi1"], x, wplus[:, 2 * i], nz, ki)
            x = _conv(bp["conv1"], x)
            x = _epilogue(bp["epi2"], x, wplus[:, 2 * i + 1], nz, ki)
        x = apply_bends(x, i, bends)
    return _conv(params["torgb"], x, gain=1.0, pad=0)


class StyleGAN1:
    """G_style-compatible wrapper exposing the SG2 Generator apply surface."""

    def __init__(self, size: int, const_hw: tuple[int, int] = (4, 4)):
        self.size = size
        self.log_size = int(math.log2(size))
        self.n_latent = 18
        self.num_layers = self.log_size - 1  # one noise per block
        self.const_hw = const_hw

    def apply(
        self,
        variables: Mapping[str, Any],
        styles: Array,
        input_is_latent: bool = True,
        noise: Optional[Sequence[Optional[Array]]] = None,
        randomize_noise: bool = False,
        truncation: float | Array = 1.0,
        truncation_latent: Optional[Array] = None,
        bends: Sequence[Any] = (),
        rngs: Optional[Mapping[str, jax.Array]] = None,
        map_latents: bool = False,
        **_,
    ):
        params = variables["params"]
        buffers = variables.get("buffers", {})
        if map_latents:
            return g1_mapping(params["g_mapping"], styles, self.n_latent)

        latent = styles
        if not input_is_latent:
            latent = g1_mapping(params["g_mapping"], latent, self.n_latent)
        if latent.ndim == 2:
            latent = jnp.repeat(latent[:, None, :], self.n_latent, axis=1)

        # first-8-layer truncation (reference: stylegan1.py:224-236,585-588)
        apply_trunc = truncation_latent is not None and not (
            isinstance(truncation, float) and truncation == 1.0
        )
        if apply_trunc:
            t = jnp.asarray(truncation, latent.dtype).reshape(-1, 1, 1)
            tl = truncation_latent.reshape(1, 1, -1)
            interp = tl + t * (latent - tl)
            do_trunc = (jnp.arange(self.n_latent) < 8)[None, :, None]
            latent = jnp.where(do_trunc, interp, latent)

        nz: list[Optional[Array]] = list(noise) if noise is not None else [None] * self.num_layers
        rng = rngs.get("noise") if (rngs and randomize_noise) else None
        if not randomize_noise:
            for i in range(self.num_layers):
                if i < len(nz) and nz[i] is None and f"noise_{i}" in buffers:
                    nz[i] = buffers[f"noise_{i}"]

        img = g1_synthesis(params["g_synthesis"], latent, nz, bends, rng)
        return img, None

    def mean_latent(self, variables, rng: jax.Array, n: int = 2**14) -> Array:
        z = jax.random.normal(rng, (n, 512))
        w = g1_mapping(variables["params"]["g_mapping"], z, 1)
        return jnp.mean(w[:, 0], axis=0, keepdims=True)


def stylegan1_variables_from_torch(
    state_dict: Mapping[str, np.ndarray],
    output_size: Optional[int] = None,
    noise_rng: Optional[jax.Array] = None,
) -> tuple["StyleGAN1", dict[str, Any]]:
    """Ingest a lernapparat-format G_style checkpoint; infers resolution from
    the block names (replacing the try/except probe chain,
    stylegan1.py:509-543) and applies the widescreen const-layer reshaping
    (stylegan1.py:550-568)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    block_res = sorted(
        {int(k.split(".")[2].split("x")[0]) for k in sd if k.startswith("g_synthesis.blocks.")}
    )
    size = block_res[-1]
    n_blocks = len(block_res)

    def lin(prefix):
        out = {"weight": jnp.asarray(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            out["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return out

    def epi(prefix):
        return {
            "noise_weight": jnp.asarray(sd[f"{prefix}.top_epi.noise.weight"]),
            "style": lin(f"{prefix}.style_mod.lin"),
        }

    mapping = {f"dense{i}": lin(f"g_mapping.dense{i}") for i in range(8)}

    blocks: dict[int, Any] = {}
    const = np.asarray(sd["g_synthesis.blocks.4x4.const"])  # [1, nf, 4, 4]

    # widescreen const reshaping
    if output_size == 1920:
        const = np.concatenate(
            [const[:, :, :, [0]], const[:, :, :, [0]], const, const[:, :, :, [-1]], const[:, :, :, [-1]]],
            axis=3,
        )
    elif output_size == 512 and size == 1024:
        ch, cw = const.shape[2], const.shape[3]
        const = const[:, :, ch // 4 : 3 * ch // 4, cw // 4 : 3 * cw // 4]

    for i, res in enumerate(block_res):
        prefix = f"g_synthesis.blocks.{res}x{res}"
        if i == 0:
            blocks[i] = {
                "const": jnp.asarray(const),
                "bias": jnp.asarray(sd[f"{prefix}.bias"]),
                "epi1": epi(f"{prefix}.epi1"),
                "conv": lin(f"{prefix}.conv"),
                "epi2": epi(f"{prefix}.epi2"),
            }
        else:
            blocks[i] = {
                "conv0_up": lin(f"{prefix}.conv0_up"),
                "epi1": epi(f"{prefix}.epi1"),
                "conv1": lin(f"{prefix}.conv1"),
                "epi2": epi(f"{prefix}.epi2"),
            }

    params = {
        "g_mapping": mapping,
        "g_synthesis": {"blocks": blocks, "torgb": lin("g_synthesis.torgb")},
    }

    # per-scale noise buffers sized from the (possibly widescreen) const
    ch, cw = const.shape[2], const.shape[3]
    rng = noise_rng if noise_rng is not None else jax.random.PRNGKey(0)
    buffers = {}
    for i in range(n_blocks):
        rng, key = jax.random.split(rng)
        buffers[f"noise_{i}"] = jax.random.normal(key, (1, 1, ch * 2**i, cw * 2**i))

    model = StyleGAN1(size, (ch, cw))
    return model, {"params": params, "buffers": buffers}


def load_stylegan1(checkpoint: str, output_size: Optional[int] = None):
    """Load a torch G_style checkpoint (reference: generate_audiovisual.py:41-42)."""
    from ..io.torch_ckpt import load_torch_checkpoint

    ckpt = load_torch_checkpoint(checkpoint)
    sd = ckpt.get("g_ema", ckpt) if isinstance(ckpt, dict) else ckpt
    # raw G_style state dicts are flat
    if not any(k.startswith("g_synthesis") for k in sd):
        raise ValueError("not a StyleGAN1 (G_style) checkpoint")
    return stylegan1_variables_from_torch(sd, output_size=output_size)
