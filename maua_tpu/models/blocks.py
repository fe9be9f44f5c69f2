"""StyleGAN2 building blocks, TPU-native.

Semantics match the reference blocks (reference: models/stylegan2.py:15-365)
but the implementation is idiomatic JAX/Flax:

* `ModulatedConv2d` does NOT use the reference's groups=batch per-sample-weight
  trick (models/stylegan2.py:217-254), which is hostile to XLA tiling. It uses
  the algebraic identity  conv(x, W * s) == conv(x * s, W)  — scale the input
  by the per-sample style, convolve with the shared weight (one big MXU conv),
  then scale the output by the per-sample demodulation factor. Numerically
  identical (exact linearity), vmap-able, and keeps the conv batched so XLA can
  tile it onto the MXU. The upsample path applies the same identity around a
  stride-2 transposed conv.
* Equalized-lr layers fold their He-init scale into the matmul at apply time,
  as in the reference (models/stylegan2.py:94-150).
* All parameter layouts: linear kernels [in, out]; conv kernels OIHW
  [out, in, kh, kw] (io/torch_ckpt.py maps the reference's layouts onto these).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.fused_act import fused_leaky_relu
from ..ops.s2d import (
    depth_to_space,
    fir_taps,
    phase_conv1x1,
    phase_conv3x3,
    phase_conv_down_blur,
    phase_conv_up_blur,
    phase_upsample,
    space_to_depth,
)
from ..ops.upfirdn2d import setup_filter, upfirdn2d

Array = jnp.ndarray
DEFAULT_BLUR_KERNEL = (1, 3, 3, 1)

def _conv_precision(x: Array):
    """fp32 conv/matmul precision policy:
    * bf16 activations -> None (native single-pass MXU, fast mode);
    * fp32 default     -> HIGHEST (6-pass bf16 emulation = true fp32 parity);
    * fp32 under `jax.default_matmul_precision("high")` -> defer to that
      config (3-pass, ~2x faster, ~1e-4 end-to-end err — the middle
      operating point). The config is part of jit's trace context, so
      switching it retraces correctly."""
    if x.dtype == jnp.bfloat16:
        return None
    return lax.Precision.HIGHEST if jax.config.jax_default_matmul_precision is None else None


def _exact_precision(x: Array):
    """HIGHEST regardless of the matmul-precision config (bf16 stays native).
    Used on the parity-sensitive, computationally-negligible sites — style
    MLP, modulation linears, and non-demodulated (ToRGB) convs — whose errors
    pass undamped into the image; relaxing them buys ~0 fps and ~3x error."""
    return None if x.dtype == jnp.bfloat16 else lax.Precision.HIGHEST



def pixel_norm(x: Array, eps: float = 1e-8) -> Array:
    """x * rsqrt(mean(x^2, channel) + eps) (reference: models/stylegan2.py:15-20)."""
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=1, keepdims=True) + eps)


class EqualLinear(nn.Module):
    """Equalized-lr linear; weight drawn N(0,1)/lr_mul, applied with
    scale = lr_mul/sqrt(in_dim), bias applied with lr_mul
    (reference: models/stylegan2.py:120-150)."""

    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None  # None | "fused_lrelu"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        w = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) / self.lr_mul,
            (in_dim, self.out_dim),
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.constant(self.bias_init), (self.out_dim,))
        out = jnp.dot(x, (w * scale).astype(x.dtype), precision=_exact_precision(x))
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(out, b * self.lr_mul if b is not None else None)
        if b is not None:
            out = out + (b * self.lr_mul).astype(out.dtype)
        return out


class EqualConv2d(nn.Module):
    """Equalized-lr conv2d, scale = 1/sqrt(in*k*k) (reference: models/stylegan2.py:94-118).

    phase_in/phase_out select the space-to-depth execution path (ops/s2d.py):
    stride-1 convs stay on the phase grid; a stride-2 conv consumes the
    pre-folded blur (blur_taps) via phase_conv_down_blur — the caller must NOT
    blur separately. (False, True) at stride 1 packs a native input (from_rgb)."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(
        self,
        x: Array,
        phase_in: bool = False,
        phase_out: bool = False,
        blur_taps: Optional[tuple] = None,
    ) -> Array:
        in_channel = x.shape[1] // (4 if phase_in else 1)
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.out_channel, in_channel, self.kernel_size, self.kernel_size),
        )
        scale = 1.0 / math.sqrt(in_channel * self.kernel_size**2)
        w_shared = (w * scale).astype(x.dtype)
        prec = _conv_precision(x)
        if phase_in or phase_out:
            if self.stride == 2:
                if not phase_in:
                    raise NotImplementedError("phase-space stride-2 conv needs a phase input")
                out = phase_conv_down_blur(x, w_shared, blur_taps, phase_out=phase_out, precision=prec)
            else:
                if phase_in and not phase_out:
                    raise NotImplementedError("stride-1 phase conv keeps the phase rep")
                if not phase_in:
                    x = space_to_depth(x)
                if self.kernel_size == 1:
                    out = phase_conv1x1(x, w_shared[:, :, 0, 0], precision=prec)
                elif self.kernel_size == 3:
                    out = phase_conv3x3(x, w_shared, precision=prec)
                else:
                    raise NotImplementedError("phase-space conv supports kernel sizes 1 and 3")
        else:
            out = lax.conv_general_dilated(
                x,
                w_shared,
                window_strides=(self.stride, self.stride),
                padding=((self.padding, self.padding), (self.padding, self.padding)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=prec,
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channel,))
            if phase_out:
                b = jnp.tile(b, 4)
            out = out + b.reshape(1, -1, 1, 1).astype(out.dtype)
        return out


class Blur(nn.Module):
    """FIR blur via upfirdn2d (reference: models/stylegan2.py:76-92)."""

    kernel: Sequence[int] = DEFAULT_BLUR_KERNEL
    pad: tuple[int, int] = (0, 0)
    upsample_factor: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = setup_filter(list(self.kernel), gain=float(self.upsample_factor**2))
        return upfirdn2d(x, k, pad=tuple(self.pad))


class Upsample(nn.Module):
    """2x FIR upsample (reference: models/stylegan2.py:34-52)."""

    kernel: Sequence[int] = DEFAULT_BLUR_KERNEL
    factor: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = setup_filter(list(self.kernel), gain=float(self.factor**2))
        p = k.shape[0] - self.factor
        pad0 = (p + 1) // 2 + self.factor - 1
        pad1 = p // 2
        return upfirdn2d(x, k, up=self.factor, down=1, pad=(pad0, pad1))


class Downsample(nn.Module):
    """2x FIR downsample (reference: models/stylegan2.py:55-73)."""

    kernel: Sequence[int] = DEFAULT_BLUR_KERNEL
    factor: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = setup_filter(list(self.kernel))
        p = k.shape[0] - self.factor
        pad0 = (p + 1) // 2
        pad1 = p // 2
        return upfirdn2d(x, k, up=1, down=self.factor, pad=(pad0, pad1))


def _conv_transpose2d_nchw(x: Array, w_oihw: Array, stride: int, precision=None) -> Array:
    """torch-semantics conv_transpose2d(stride, padding=0) expressed as an
    input-dilated correlation with the spatially-flipped, channel-swapped
    kernel. w_oihw is the *forward* conv weight [out, in, kh, kw]; the
    transposed conv maps in->out of its [in_ch := out? ] adjoint:
    here w plays torch's conv_transpose weight role [in_channel, out_channel, kh, kw].
    """
    kh, kw = w_oihw.shape[-2:]
    # torch conv_transpose2d(input[N,Cin], weight[Cin,Cout,kh,kw]) ==
    # conv(lhs_dilated input, flip(weight).transpose(IO)) with full padding.
    w = jnp.flip(w_oihw, (-2, -1)).transpose(1, 0, 2, 3)  # -> [Cout, Cin, kh, kw]
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=precision if precision is not None else _conv_precision(x),
    )


class ModulatedConv2d(nn.Module):
    """Style-modulated, demodulated conv (reference: models/stylegan2.py:164-254).

    TPU-first reformulation: for demodulated convs,
        y_b = demod_b * conv(x_b * style_b, scale * W)
    where demod_b[o] = rsqrt(sum_i style_b[i]^2 * sum_k (scale*W[o,i,k])^2 + 1e-8).
    This is exactly the reference's per-sample-weight math by linearity of conv,
    but runs as one batched conv on shared weights (MXU-friendly, no groups).
    """

    out_channel: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = DEFAULT_BLUR_KERNEL
    eps: float = 1e-8

    @nn.compact
    def __call__(
        self, x: Array, style: Array, phase_in: bool = False, phase_out: bool = False
    ) -> Array:
        """phase_in/phase_out select the space-to-depth (polyphase) execution
        path (ops/s2d.py) — numerically exact, same params, 2-4× faster on
        TPU for channel counts below the 128-lane width."""
        b, in_channel, h, w_in = x.shape
        if phase_in:
            in_channel //= 4
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.out_channel, in_channel, self.kernel_size, self.kernel_size),
        )
        scale = 1.0 / math.sqrt(in_channel * self.kernel_size**2)

        # style s: [B, in_channel], bias_init=1 modulation MLP
        s = EqualLinear(in_channel, bias_init=1.0, name="modulation")(style)

        if self.demodulate:
            # sum_k (scale*W)^2 over spatial -> [out, in]; per-sample demod via
            # one small matmul instead of materializing per-sample weights.
            # always fp32: rsqrt of near-cancelling sums is precision-critical
            w_sq = jnp.sum(jnp.square(weight * scale), axis=(2, 3))  # [O, I]
            sigma = jnp.dot(
                jnp.square(s.astype(jnp.float32)), w_sq.T, precision=lax.Precision.HIGHEST
            )  # [B, O]
            demod = lax.rsqrt(sigma + self.eps)

        w_shared = (weight * scale).astype(x.dtype)

        # Only the HIGH-RES demodulated body convs follow the matmul-precision
        # config — they are the whole FLOPs budget. Everything cheap stays
        # exact: ToRGB-style non-demodulated convs (error adds straight into
        # the image) and low-res body convs (≤64², ~15% of MACs but ~half the
        # error sites). Measured @1024²: all-HIGH = 3.2e-3 max err, body-only
        # HIGH = 1.05e-3, high-res-body-only HIGH = see PARITY.md — for the
        # same ~66 fps (vs 41 all-HIGHEST).
        cheap = (h * w_in * (4 if phase_in else 1)) <= 64 * 64
        prec = _conv_precision(x) if (self.demodulate and not cheap) else _exact_precision(x)

        if phase_out:
            # polyphase paths (ops/s2d.py) — exact transforms of the branches
            # below, sharing the same params
            if self.downsample:
                raise NotImplementedError("phase-space downsample is not used by the generator")
            if self.upsample:
                if phase_in:
                    x = depth_to_space(x)
                x = x * s[:, :, None, None].astype(x.dtype)
                # transpose-conv and 4-tap blur folded into one dense 4x4
                # conv; per-channel demod commutes with the per-channel blur
                out = phase_conv_up_blur(
                    x, w_shared, fir_taps(self.blur_kernel, 4.0), precision=prec
                )
                if self.demodulate:
                    out = out * jnp.tile(demod, (1, 4))[:, :, None, None].astype(out.dtype)
                return out
            if not phase_in:
                x = space_to_depth(x)
            x = x * jnp.tile(s, (1, 4))[:, :, None, None].astype(x.dtype)
            if self.kernel_size == 1:
                out = phase_conv1x1(x, w_shared[:, :, 0, 0], precision=prec)
            else:
                if self.kernel_size != 3:
                    raise NotImplementedError("phase-space conv supports kernel sizes 1 and 3")
                out = phase_conv3x3(x, w_shared, precision=prec)
            if self.demodulate:
                out = out * jnp.tile(demod, (1, 4))[:, :, None, None].astype(out.dtype)
            return out
        if phase_in:
            x = depth_to_space(x)

        x = x * s[:, :, None, None].astype(x.dtype)

        if self.upsample:
            # reference: conv_transpose2d(stride=2, padding=0) with transposed
            # per-sample weights, then Blur (models/stylegan2.py:227-238). The
            # shared-weight transpose uses W^T[in, out] layout semantics.
            out = _conv_transpose2d_nchw(x, w_shared.transpose(1, 0, 2, 3), stride=2, precision=prec)
            if self.demodulate:
                out = out * demod[:, :, None, None].astype(out.dtype)
            factor = 2
            p = (len(self.blur_kernel) - factor) - (self.kernel_size - 1)
            pad0 = (p + 1) // 2 + factor - 1
            pad1 = p // 2 + 1
            out = Blur(self.blur_kernel, pad=(pad0, pad1), upsample_factor=factor, name="blur")(out)
        elif self.downsample:
            factor = 2
            p = (len(self.blur_kernel) - factor) + (self.kernel_size - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            x = Blur(self.blur_kernel, pad=(pad0, pad1), name="blur")(x)
            out = lax.conv_general_dilated(
                x,
                w_shared,
                window_strides=(2, 2),
                padding="VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=prec,
            )
            if self.demodulate:
                out = out * demod[:, :, None, None].astype(out.dtype)
        else:
            pad = self.kernel_size // 2
            out = lax.conv_general_dilated(
                x,
                w_shared,
                window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
                precision=prec,
            )
            if self.demodulate:
                out = out * demod[:, :, None, None].astype(out.dtype)
        return out


class NoiseInjection(nn.Module):
    """out = x + weight * noise, scalar learned weight
    (reference: models/stylegan2.py:257-266)."""

    @nn.compact
    def __call__(
        self,
        x: Array,
        noise: Optional[Array] = None,
        phase: bool = False,
        fast_phase_noise: bool = False,
    ) -> Array:
        w = self.param("weight", nn.initializers.zeros, (1,))
        if phase:
            # x is the phase rep [B,4C,h,w]; noise arrives (or is drawn) at
            # native [.,1,2h,2w] and is phase-packed — the SAME values the
            # native path adds, so parity holds even for randomize_noise.
            # fast_phase_noise (training opt-in, train/step.py): fresh noise
            # is drawn DIRECTLY in the phase layout [B,4,h,w] — iid normals
            # are permutation-invariant, so the distribution is identical,
            # but the [B,1,2h,2w] draw + space_to_depth is skipped: the
            # 1-channel native shape is sublane-padded ~8× by XLA:TPU
            # (measured @1024² b4: 6.7 ms per synthesis for the native-shape
            # draws vs 1.4 ms phase-layout). Bitwise rng parity with the
            # native path is deliberately given up in this mode.
            b, c4, h, width = x.shape
            if noise is None and fast_phase_noise:
                noise_p = jax.random.normal(
                    self.make_rng("noise"), (b, 4, h, width), dtype=x.dtype
                )
                out = x.reshape(b, 4, c4 // 4, h, width) + w.astype(x.dtype) * noise_p[:, :, None]
                return out.reshape(b, c4, h, width)
            if noise is None:
                noise = jax.random.normal(
                    self.make_rng("noise"), (b, 1, 2 * h, 2 * width), dtype=x.dtype
                )
            noise_p = space_to_depth(noise.astype(x.dtype))  # [.,4,h,w]
            out = x.reshape(b, 4, c4 // 4, h, width) + w.astype(x.dtype) * noise_p[:, :, None]
            return out.reshape(b, c4, h, width)
        if noise is None:
            b, _, h, width = x.shape
            noise = jax.random.normal(self.make_rng("noise"), (b, 1, h, width), dtype=x.dtype)
        return x + w.astype(x.dtype) * noise.astype(x.dtype)


class ConstantInput(nn.Module):
    """Learned constant 4x4 input (reference: models/stylegan2.py:269-278)."""

    channel: int
    size: int = 4

    @nn.compact
    def __call__(self, batch: int) -> Array:
        const = self.param("input", nn.initializers.normal(stddev=1.0), (1, self.channel, self.size, self.size))
        return jnp.broadcast_to(const, (batch, self.channel, self.size, self.size))


class LatentInput(nn.Module):
    """Latent-mapped 4x4 input — the `--noconst` feature
    (reference: models/stylegan2.py:281-294). Takes latent[:, 0]."""

    channel: int
    size: int = 4

    @nn.compact
    def __call__(self, latent: Array) -> Array:
        b = latent.shape[0]
        out = EqualLinear(self.channel * self.size * self.size, activation="fused_lrelu", name="linear")(latent[:, 0])
        bias = self.param("act_bias", nn.initializers.zeros, (self.channel * self.size * self.size,))
        out = fused_leaky_relu(out, bias)
        return out.reshape(b, self.channel, self.size, self.size)


# A "bend" is (layer_id, fn); fn: activation [B,C,H,W] -> [B,C,H,W]. This is the
# functional replacement for the reference's ManipulationLayer module-mutation
# pattern (models/stylegan2.py:297-307) — see reactive/bend.py.
Bend = tuple[int, Callable[[Array], Array]]


def apply_bends(x: Array, layer_id: int, bends: Sequence[Any]) -> Array:
    for bend in bends or ():
        if isinstance(bend, dict):
            bid, fn = bend["layer"], bend["transform"]
        else:
            bid, fn = bend
        if bid == layer_id:
            x = fn(x)
    return x


class StyledConv(nn.Module):
    """ModulatedConv2d -> NoiseInjection -> fused leaky-relu (+ bend hook)
    (reference: models/stylegan2.py:310-343)."""

    out_channel: int
    kernel_size: int
    upsample: bool = False
    blur_kernel: Sequence[int] = DEFAULT_BLUR_KERNEL
    demodulate: bool = True
    layer_id: int = -1

    @nn.compact
    def __call__(
        self,
        x: Array,
        style: Array,
        noise: Optional[Array] = None,
        bends: Sequence[Any] = (),
        phase_in: bool = False,
        phase_out: bool = False,
        fast_phase_noise: bool = False,
    ) -> Array:
        out = ModulatedConv2d(
            self.out_channel,
            self.kernel_size,
            demodulate=self.demodulate,
            upsample=self.upsample,
            blur_kernel=self.blur_kernel,
            name="conv",
        )(x, style, phase_in=phase_in, phase_out=phase_out)
        out = NoiseInjection(name="noise")(
            out, noise, phase=phase_out, fast_phase_noise=fast_phase_noise
        )
        bias = self.param("act_bias", nn.initializers.zeros, (self.out_channel,))
        out = fused_leaky_relu(out, jnp.tile(bias, 4) if phase_out else bias)
        if phase_out and any(
            (b["layer"] if isinstance(b, dict) else b[0]) == self.layer_id for b in bends or ()
        ):
            # bends are defined on native activations: convert around them
            # (exact; only pays when a bend actually targets this layer)
            bent = apply_bends(depth_to_space(out), self.layer_id, bends)
            if bent.shape[-1] % 2 or bent.shape[-2] % 2:
                raise ValueError(
                    f"bend at layer {self.layer_id} produced odd spatial dims "
                    f"{bent.shape[-2:]}, which the space-to-depth path cannot "
                    "re-pack; pad to even dims or disable s2d (s2d_min_res=0)"
                )
            out = space_to_depth(bent)
        elif not phase_out:
            out = apply_bends(out, self.layer_id, bends)
        return out


class ToRGB(nn.Module):
    """1x1 modulated (non-demodulated) conv to RGB + skip-pyramid upsample
    (reference: models/stylegan2.py:346-365)."""

    upsample: bool = True
    blur_kernel: Sequence[int] = DEFAULT_BLUR_KERNEL

    @nn.compact
    def __call__(
        self,
        x: Array,
        style: Array,
        skip: Optional[Array] = None,
        phase: bool = False,
        skip_phase: bool = False,
    ) -> Array:
        out = ModulatedConv2d(3, 1, demodulate=False, name="conv")(
            x, style, phase_in=phase, phase_out=phase
        )
        bias = self.param("bias", nn.initializers.zeros, (1, 3, 1, 1))
        out = out + (jnp.tile(bias, (1, 4, 1, 1)) if phase else bias).astype(out.dtype)
        if skip is not None:
            if phase:
                skip_native = depth_to_space(skip) if skip_phase else skip
                out = out + phase_upsample(skip_native.astype(out.dtype), list(self.blur_kernel), gain=4.0)
            else:
                skip = Upsample(self.blur_kernel, name="upsample")(skip)
                out = out + skip
        return out


class ConvLayer(nn.Module):
    """Discriminator conv layer: optional blur+stride-2, equal conv, fused act
    (reference: models/stylegan2.py:579-621)."""

    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = DEFAULT_BLUR_KERNEL
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x: Array, phase_in: bool = False, phase_out: bool = False) -> Array:
        """phase_in/phase_out: space-to-depth execution (ops/s2d.py) for the
        low-channel high-res discriminator layers; exact same math/params."""
        blur_taps = None
        if self.downsample:
            if phase_in:
                # the FIR is folded into the phase down-conv (ops/s2d.py)
                blur_taps = fir_taps(self.blur_kernel, 1.0)
            else:
                factor = 2
                p = (len(self.blur_kernel) - factor) + (self.kernel_size - 1)
                pad0 = (p + 1) // 2
                pad1 = p // 2
                x = Blur(self.blur_kernel, pad=(pad0, pad1), name="blur")(x)
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2
        out = EqualConv2d(
            self.out_channel,
            self.kernel_size,
            stride=stride,
            padding=padding,
            use_bias=self.use_bias and not self.activate,
            name="conv",
        )(x, phase_in=phase_in, phase_out=phase_out, blur_taps=blur_taps)
        if self.activate:
            if self.use_bias:
                bias = self.param("act_bias", nn.initializers.zeros, (self.out_channel,))
                out = fused_leaky_relu(out, jnp.tile(bias, 4) if phase_out else bias)
            else:
                out = fused_leaky_relu(out, None)
        return out


class ResBlock(nn.Module):
    """D residual block with optional 1x1 downsample skip
    (reference: models/stylegan2.py:623-643)."""

    out_channel: int
    blur_kernel: Sequence[int] = DEFAULT_BLUR_KERNEL
    use_skip: bool = True

    @nn.compact
    def __call__(self, x: Array, phase_in: bool = False, phase_out: bool = False) -> Array:
        """phase_in: x is the space-to-depth rep of this block's resolution;
        phase_out: return the downsampled result in phase form too."""
        in_channel = x.shape[1] // (4 if phase_in else 1)
        out = ConvLayer(in_channel, 3, name="conv1")(x, phase_in=phase_in, phase_out=phase_in)
        out = ConvLayer(
            self.out_channel, 3, downsample=True, blur_kernel=self.blur_kernel, name="conv2"
        )(out, phase_in=phase_in, phase_out=phase_out)
        if self.use_skip:
            skip = ConvLayer(
                self.out_channel, 1, downsample=True, activate=False, use_bias=False, name="skip"
            )(x, phase_in=phase_in, phase_out=phase_out)
            out = (out + skip) / math.sqrt(2.0)
        return out


def minibatch_stddev(x: Array, group_size: int = 4, num_features: int = 1, eps: float = 1e-8) -> Array:
    """Append the cross-sample stddev feature map
    (reference: models/stylegan2.py:685-703). Group size clamps to batch."""
    b, c, h, w = x.shape
    group = min(b, group_size)
    if b % group != 0:  # reference's try/except fallback -> whole-batch group
        group = b
    y = x.reshape(group, -1, num_features, c // num_features, h, w)
    y = jnp.sqrt(jnp.var(y, axis=0) + eps)
    y = jnp.mean(y, axis=(2, 3, 4), keepdims=True)  # over feat-chan, H, W
    y = jnp.squeeze(y, axis=2)  # [b//group, num_features, 1, 1]
    y = jnp.tile(y, (group, 1, h, w))
    return jnp.concatenate([x, y], axis=1)
