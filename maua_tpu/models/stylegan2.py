"""StyleGAN2 Generator / Discriminator, TPU-native.

Feature-parity with the reference model (reference: models/stylegan2.py:368-711):
mapping MLP, constant OR latent-mapped input (`--noconst`), style mixing with
inject_index, tensor-valued per-sample truncation, per-layer noise (stored
buffers, explicit timelines, or fresh RNG), min_rgb_size, activation-map
capture, network-bend hooks at every layer, and noise-buffer geometry for
widescreen output sizes (1920x1080 / 1080x1920 / base_res_factor).

Functional differences by design (not behavior):
* Noise buffers live in a separate `buffers` variable collection (the
  reference registers them as torch buffers, models/stylegan2.py:432-436).
* `truncation_latent` is passed in explicitly (or precomputed via
  `mean_latent`); no hidden module state mutation inside a jitted call.
* Network bending is a list of (layer_id, fn) pure functions over activations
  (replacing ManipulationLayer, models/stylegan2.py:297-307); model rewriting
  is a params-pytree override (replacing render.py:160-167's setattr hack).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.s2d import depth_to_space as _d2s
from .blocks import (
    DEFAULT_BLUR_KERNEL,
    ConstantInput,
    ConvLayer,
    EqualLinear,
    LatentInput,
    ResBlock,
    StyledConv,
    ToRGB,
    apply_bends,
    minibatch_stddev,
    pixel_norm,
)

Array = jnp.ndarray


def channel_map(channel_multiplier: int = 2, channel_max: int = 512) -> dict[int, int]:
    """Per-resolution channel table (reference: models/stylegan2.py:395-405).

    channel_max caps the width (StyleGAN's fmap_max; the reference hardcodes
    512) — lets tests and small configs use narrow models."""
    table = {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }
    return {k: min(v, channel_max) for k, v in table.items()}


def auto_s2d_min_res(size: int, channel_multiplier: int = 2, channel_max: int = 512) -> int:
    """Smallest synthesis resolution whose channel count drops below the TPU's
    128-lane width — the optimal `Generator.s2d_min_res` (512 for the
    full-width 1024² model; 0 = disabled when every layer is already
    lane-full, e.g. size<=256 at full width). Measured @1024² bf16 batch 16:
    thr=512 253.8 fps vs thr=256 221.0 vs native 200.6."""
    channels = channel_map(channel_multiplier, channel_max)
    for res in sorted(channels):
        if 8 <= res <= size and channels[res] < 128:
            return res
    return 0


def noise_shapes(
    size: int,
    output_size: Optional[int] = None,
    base_res_factor: float = 1,
) -> list[tuple[int, int, int, int]]:
    """Spatial geometry of the per-layer noise buffers, including the
    widescreen reshaping rule (reference: models/stylegan2.py:432-436,461-470)."""
    log_size = int(math.log2(size))
    num_layers = (log_size - 2) * 2 + 1
    shapes = []
    for layer_idx in range(num_layers):
        res = (layer_idx + 5) // 2
        if output_size is not None and (output_size != size or base_res_factor != 1):
            h = int(base_res_factor * 2**res * (2 if output_size == 1080 else 1))
            w = int(base_res_factor * 2**res * (2 if output_size == 1920 else 1))
        else:
            h = w = 2**res
        shapes.append((1, 1, h, w))
    return shapes


class MappingNetwork(nn.Module):
    """PixelNorm + n_mlp equalized linears with fused lrelu, lr_mul=0.01
    (reference: models/stylegan2.py:388-393)."""

    style_dim: int = 512
    n_mlp: int = 8
    lr_mlp: float = 0.01

    @nn.compact
    def __call__(self, z: Array) -> Array:
        x = pixel_norm(z)
        for i in range(self.n_mlp):
            x = EqualLinear(
                self.style_dim, lr_mul=self.lr_mlp, activation="fused_lrelu", name=f"dense_{i}"
            )(x)
        return x


class Generator(nn.Module):
    """StyleGAN2 synthesis + mapping (reference: models/stylegan2.py:368-576)."""

    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = DEFAULT_BLUR_KERNEL
    lr_mlp: float = 0.01
    constant_input: bool = False
    min_rgb_size: int = 4
    output_size: Optional[int] = None
    base_res_factor: float = 1
    channel_max: int = 512
    dtype: Any = jnp.float32  # synthesis compute dtype; bf16 = TPU fast path
    # Resolutions >= s2d_min_res run in space-to-depth (polyphase) form
    # (ops/s2d.py): exact same math on a half-res grid with 4x channels, which
    # fills the TPU's 128-wide lanes when the layer's channel count is below
    # 128. 0 disables. Recommended: the first resolution whose channel count
    # drops below 128 (512 for the full-width 1024² model). Must be >= 8.
    s2d_min_res: int = 0
    # Training opt-in (train/step.py): randomize_noise draws at phase layers
    # happen directly in the phase layout [B,4,h,w] instead of native
    # [B,1,2h,2w]+space_to_depth — distribution-identical (iid), ~5× cheaper
    # (XLA:TPU sublane-pads 1-channel tensors ~8×; see blocks.NoiseInjection).
    # Default False keeps bitwise rng parity between native and s2d paths.
    fast_phase_noise: bool = False

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    def setup(self):
        channels = channel_map(self.channel_multiplier, self.channel_max)
        self.style = MappingNetwork(self.style_dim, self.n_mlp, self.lr_mlp)
        if self.constant_input:
            self.g_input = ConstantInput(channels[4])
        else:
            self.g_input = LatentInput(channels[4])
        self.conv1 = StyledConv(channels[4], 3, blur_kernel=self.blur_kernel, layer_id=1)
        self.to_rgb1 = ToRGB(upsample=False)

        convs, to_rgbs = [], []
        in_channel = channels[4]
        layer_id = 1
        for i in range(3, self.log_size + 1):
            out_channel = channels[2**i]
            layer_id += 1
            convs.append(
                StyledConv(
                    out_channel, 3, upsample=True, blur_kernel=self.blur_kernel, layer_id=layer_id
                )
            )
            layer_id += 1
            convs.append(StyledConv(out_channel, 3, blur_kernel=self.blur_kernel, layer_id=layer_id))
            to_rgbs.append(ToRGB(blur_kernel=self.blur_kernel))
            in_channel = out_channel
        self.convs = convs
        self.to_rgbs = to_rgbs

        # stored noise buffers (reference: models/stylegan2.py:432-436,461-470)
        shapes = noise_shapes(self.size, self.output_size, self.base_res_factor)
        self.noises = [
            self.variable("buffers", f"noise_{i}", jnp.zeros, s, jnp.float32)
            for i, s in enumerate(shapes)
        ]

    def map_latents(self, styles: Array) -> Array:
        """z [B, style_dim] -> W+ [B, n_latent, style_dim] fast path
        (reference: models/stylegan2.py:506-509)."""
        w = self.style(styles)
        return jnp.repeat(w[:, None, :], self.n_latent, axis=1)

    def mean_latent(self, rng: jax.Array, n_latent: int = 2**14) -> Array:
        """Mean mapped latent for truncation (reference: models/stylegan2.py:483-487)."""
        z = jax.random.normal(rng, (n_latent, self.style_dim))
        return jnp.mean(self.style(z), axis=0, keepdims=True)

    def get_latent(self, z: Array) -> Array:
        return self.style(z)

    def __call__(
        self,
        styles: Array | Sequence[Array],
        return_latents: bool = False,
        return_activation_maps: bool = False,
        inject_index: Optional[int] = None,
        truncation: float | Array = 1.0,
        truncation_latent: Optional[Array] = None,
        input_is_latent: bool = False,
        noise: Optional[Sequence[Optional[Array]]] = None,
        randomize_noise: bool = True,
        bends: Sequence[Any] = (),
        map_latents: bool = False,
    ):
        """Synthesize images.

        Mirrors the reference forward signature (models/stylegan2.py:492-576);
        `bends` replaces `transform_dict_list` with (layer_id, fn) pairs.
        `truncation` may be a python float or a per-sample [B] array
        (tensor truncation, models/stylegan2.py:537-543).
        """
        if map_latents:
            return self.map_latents(styles if isinstance(styles, jnp.ndarray) else styles[0])

        # --- style mixing / W+ assembly (models/stylegan2.py:511-529) ---
        if not input_is_latent:
            if isinstance(styles, jnp.ndarray):
                styles = [styles]
            ws = [self.style(s) for s in styles]
            if len(ws) < 2:
                if ws[0].ndim < 3:
                    latent = jnp.repeat(ws[0][:, None, :], self.n_latent, axis=1)
                else:
                    latent = ws[0]
            else:
                idx = inject_index if inject_index is not None else self.n_latent // 2
                latent = jnp.concatenate(
                    [
                        jnp.repeat(ws[0][:, None, :], idx, axis=1),
                        jnp.repeat(ws[1][:, None, :], self.n_latent - idx, axis=1),
                    ],
                    axis=1,
                )
        else:
            latent = styles if isinstance(styles, jnp.ndarray) else styles[0]
            if latent.ndim == 2:
                latent = jnp.repeat(latent[:, None, :], self.n_latent, axis=1)

        # --- noise defaults (models/stylegan2.py:531-535) ---
        if noise is None:
            noise = [None] * self.num_layers
        noise = list(noise)
        if not randomize_noise:
            for i in range(self.num_layers):
                if noise[i] is None:
                    noise[i] = self.noises[i].value
        # randomize_noise=True with None entries: NoiseInjection draws from the
        # 'noise' RNG stream per layer.

        # --- truncation: always-applied per-sample lerp (models/stylegan2.py:537-543)
        trunc = jnp.asarray(truncation, dtype=latent.dtype)
        apply_trunc = truncation_latent is not None
        # tensor truncation can't be value-checked at trace time — but passing
        # an array at all signals intent to truncate, so it needs the latent
        # too (silently skipping would return wrong frames)
        if not apply_trunc:
            try:  # python/numpy/0-d scalars are value-checkable at trace time
                wants_trunc = float(truncation) != 1.0
            except (TypeError, jax.errors.TracerArrayConversionError):
                wants_trunc = True  # traced or per-sample vector truncation
        if not apply_trunc and wants_trunc:
            raise ValueError(
                "truncation != 1 (or tensor truncation) requires truncation_latent "
                "(precompute with Generator.mean_latent — the reference computes it "
                "lazily in-module, models/stylegan2.py:539-540, which is not "
                "jit-compatible)"
            )
        if apply_trunc:
            tl = truncation_latent.reshape(1, -1)[None]  # [1,1,style_dim]
            t = jnp.broadcast_to(trunc.reshape(-1), (latent.shape[0],))[:, None, None]
            latent = tl + t * (latent - tl)

        activation_maps = []

        # --- synthesis (models/stylegan2.py:545-569) ---
        # mapping/truncation stay fp32; synthesis runs in self.dtype (bf16 on
        # TPU keeps the MXU in native precision; fp32 for 1e-3 parity mode)
        if self.constant_input:
            out = self.g_input(latent.shape[0])
        else:
            out = self.g_input(latent)
        out = out.astype(self.dtype)
        latent_fp32 = latent  # pre-cast W+ for return_latents consumers (projector, path reg)
        latent = latent.astype(self.dtype)
        noise = [None if n is None else n.astype(self.dtype) for n in noise]
        out = apply_bends(out, 0, bends)
        out = self.conv1(out, latent[:, 0], noise=noise[0], bends=bends)
        activation_maps.append(out)

        current_size = 4
        image = self.to_rgb1(out, latent[:, 1]) if self.min_rgb_size <= current_size else None

        # s2d spatial-evenness note: every phase layer's dims are 2x its
        # input's (the up-conv doubles them), so the full-res dims are always
        # even and space-to-depth applies to any geometry, widescreen or
        # fractional base_res_factor included (odd COARSE dims are fine)
        thr = max(self.s2d_min_res, 8) if self.s2d_min_res > 0 else None
        out_phase = False
        image_phase = False

        i = 1
        for k in range(len(self.to_rgbs)):
            conv_a, conv_b, to_rgb = self.convs[2 * k], self.convs[2 * k + 1], self.to_rgbs[k]
            in_phase = out_phase
            out_phase = thr is not None and current_size * 2 >= thr
            out = conv_a(
                out, latent[:, i], noise=noise[2 * k + 1], bends=bends,
                phase_in=in_phase, phase_out=out_phase,
                fast_phase_noise=self.fast_phase_noise,
            )
            current_size *= 2
            activation_maps.append(_d2s(out) if out_phase else out)
            out = conv_b(
                out, latent[:, i + 1], noise=noise[2 * k + 2], bends=bends,
                phase_in=out_phase, phase_out=out_phase,
                fast_phase_noise=self.fast_phase_noise,
            )
            activation_maps.append(_d2s(out) if out_phase else out)
            if self.min_rgb_size <= current_size:
                image = to_rgb(out, latent[:, i + 2], image, phase=out_phase, skip_phase=image_phase)
                image_phase = out_phase
            i += 2

        if image_phase:
            image = _d2s(image)
        image = image.astype(jnp.float32)
        if return_activation_maps:
            return image, activation_maps
        if return_latents:
            return image, latent_fp32.astype(jnp.float32)
        return image, None


class Discriminator(nn.Module):
    """StyleGAN2 discriminator (reference: models/stylegan2.py:646-711)."""

    size: int = 1024
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = DEFAULT_BLUR_KERNEL
    use_skip: bool = True
    stddev_group: int = 4
    stddev_feat: int = 1
    channel_max: int = 512
    dtype: Any = jnp.float32  # conv compute dtype (bf16 = TPU fast path)
    # Resolutions >= s2d_min_res run space-to-depth (polyphase, ops/s2d.py):
    # D's high-res layers have the same <128-channel lane-padding tax the
    # generator's do (4.4x off peak measured @1024²), including inside the R1
    # double-backward. Exact same math/params; 0 disables. The downsample
    # convs fold their FIR into one dense phase conv (phase_conv_down_blur).
    s2d_min_res: int = 0

    @nn.compact
    def __call__(self, x: Array, return_hidden: bool = False):
        """return_hidden=True also returns the last-resblock activation — the
        hidden layer the contrastive learner hooks (reference:
        contrastive_learner.py:115-153 picks D's layer=-2 via forward hook)."""
        channels = channel_map(self.channel_multiplier, self.channel_max)
        log_size = int(math.log2(self.size))
        thr = max(self.s2d_min_res, 8) if self.s2d_min_res > 0 else None

        x = x.astype(self.dtype)
        phase = thr is not None and self.size >= thr
        out = ConvLayer(channels[self.size], 1, name="from_rgb")(x, phase_out=phase)
        for i in range(log_size, 2, -1):
            res_out = 2 ** (i - 1)
            phase_next = thr is not None and res_out >= thr
            out = ResBlock(
                channels[res_out],
                blur_kernel=self.blur_kernel,
                use_skip=self.use_skip,
                name=f"block_{i}",
            )(out, phase_in=phase, phase_out=phase_next)
            phase = phase_next
        hidden = out

        batch = out.shape[0]
        # stddev statistics in fp32 (variance of near-equal values cancels
        # catastrophically in bf16), then back to the compute dtype
        out = minibatch_stddev(out.astype(jnp.float32), self.stddev_group, self.stddev_feat).astype(self.dtype)
        out = ConvLayer(channels[4], 3, name="final_conv")(out)
        out = out.reshape(batch, -1).astype(jnp.float32)
        out = EqualLinear(channels[4], activation="fused_lrelu", name="final_linear_0")(out)
        out = EqualLinear(1, name="final_linear_1")(out)
        if return_hidden:
            return out, hidden
        return out
