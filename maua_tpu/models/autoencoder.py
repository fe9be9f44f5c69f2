"""Autoencoder / VAE family (reference: models/autoencoder.py).

LogCoshVAE (log-cosh reconstruction + KLD, autoencoder.py:41-141),
ConvSegNet / VariationalConvSegNet (VGG-style conv AE, autoencoder.py:337-480),
and InceptionVAE (multi-kernel inception blocks, autoencoder.py:490+), rebuilt
in flax. These are trained by the hyperparameter sweep trainers in
maua_tpu/train/vae.py (reference: accelerate/).

BatchNorm runs with batch statistics (the reference always trains these nets);
pass `train=False` + batch_stats for eval.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fused_act import fused_leaky_relu

Array = jnp.ndarray


def _upsample2x(x: Array) -> Array:
    """Bilinear 2× upsample (align_corners=False, torch Upsample)."""
    b, c, h, w = x.shape
    return jax.image.resize(x, (b, c, 2 * h, 2 * w), "bilinear")


def _maxpool2(x: Array) -> Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


class ConvBN(nn.Module):
    """conv + batchnorm + activation (reference conv2DBatchNormRelu,
    autoencoder.py:143-169; LogCoshVAE uses FusedLeakyReLU instead of relu)."""

    features: int
    kernel: int = 3
    stride: int = 1
    act: str = "relu"  # "relu" | "fused_lrelu" | "none"

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        w = self.param(
            "weight", nn.initializers.lecun_normal(), (self.features, x.shape[1], self.kernel, self.kernel)
        )
        pad = (self.kernel - 1) // 2
        out = jax.lax.conv_general_dilated(
            x, w, (self.stride, self.stride), ((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        out = nn.BatchNorm(use_running_average=not train, axis=1, momentum=0.9, epsilon=1e-5)(out)
        if self.act == "relu":
            return jax.nn.relu(out)
        if self.act == "fused_lrelu":
            bias = self.param("act_bias", nn.initializers.zeros, (self.features,))
            return fused_leaky_relu(out, bias)
        return out


class LogCoshVAE(nn.Module):
    """reference: models/autoencoder.py:41-141."""

    in_channels: int = 3
    latent_dim: int = 512
    hidden_dims: Sequence[int] = (32, 64, 128, 256, 512)
    alpha: float = 10.0
    beta: float = 1.0
    kld_weight: float = 1.0

    @nn.compact
    def __call__(self, x: Array, rng: Optional[jax.Array] = None, train: bool = True):
        h = x
        for i, hd in enumerate(self.hidden_dims):
            h = ConvBN(hd, 3, stride=2, act="fused_lrelu", name=f"enc_{i}")(h, train)
        flat = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.latent_dim, name="fc_mu")(flat)
        log_var = nn.Dense(self.latent_dim, name="fc_var")(flat)

        if rng is None:
            rng = self.make_rng("latent")
        std = jnp.exp(0.5 * log_var)
        z = mu + std * jax.random.normal(rng, std.shape)

        d = nn.Dense(self.hidden_dims[-1] * 4, name="decoder_input")(z)
        # the reference reshapes to (-1, latent_dim, 2, 2) (autoencoder.py:116),
        # which silently breaks whenever latent_dim != hidden_dims[-1]; use the
        # dimension the Dense actually produced
        d = d.reshape(-1, self.hidden_dims[-1], 2, 2)
        rev = list(reversed(self.hidden_dims))
        for i in range(len(rev) - 1):
            d = _upsample2x(d)
            d = ConvBN(rev[i + 1], 3, act="fused_lrelu", name=f"dec_{i}")(d, train)
        d = _upsample2x(d)
        d = ConvBN(rev[-1], 3, act="fused_lrelu", name="final_0")(d, train)
        w = self.param("final_weight", nn.initializers.lecun_normal(), (3, rev[-1], 3, 3))
        d = jax.lax.conv_general_dilated(
            d, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
        return jnp.tanh(d), mu, log_var

    def loss(self, real: Array, fake: Array, mu: Array, log_var: Array) -> dict[str, Array]:
        """log-cosh reconstruction + KLD (reference: autoencoder.py:130-141)."""
        t = fake - real
        rec = self.alpha * t + jnp.log1p(jnp.exp(-2 * self.alpha * t)) - math.log(2.0)
        rec = jnp.mean(rec) / self.alpha
        kld = jnp.mean(-0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=1))
        total = rec + self.beta * self.kld_weight * kld
        return {"Total": total, "Reconstruction": rec, "Kullback Leibler Divergence": -kld}


_SEG_ENC = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_SEG_DEC = [(512, 3), (512, 2, 256), (256, 2, 128), (128, 1, 64), (64, 1, None)]


def _seg_dec_chans(in_channels: int) -> list[tuple[int, ...]]:
    return [(512, 512, 512), (512, 512, 256), (256, 256, 128), (128, 64), (64, in_channels)]


class ConvSegNet(nn.Module):
    """VGG-ish conv autoencoder (reference: autoencoder.py:337-398).

    width_mult scales all hidden widths (1.0 = reference widths) — small
    configs for tests / fast sweeps."""

    in_channels: int = 3
    width_mult: float = 1.0

    def _w(self, ch: int) -> int:
        return max(4, int(ch * self.width_mult))

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        h = x
        for bi, (ch, n) in enumerate(_SEG_ENC):
            for ci in range(n):
                h = ConvBN(self._w(ch), 3, name=f"enc{bi}_{ci}")(h, train)
            h = _maxpool2(h)
        h = jnp.tanh(h)

        for bi, chs in enumerate(_seg_dec_chans(self.in_channels)):
            h = _upsample2x(h)
            for ci, ch in enumerate(chs):
                w = ch if (bi == len(_seg_dec_chans(3)) - 1 and ci == len(chs) - 1) else self._w(ch)
                h = ConvBN(w, 3, name=f"dec{bi}_{ci}")(h, train)
        return h


class VariationalConvSegNet(nn.Module):
    """reference: autoencoder.py:401-480 — ConvSegNet encoder + fc mu/var +
    tanh decoder; latent is 512·4·4 at 128² input."""

    in_channels: int = 3
    width_mult: float = 1.0

    def _w(self, ch: int) -> int:
        return max(4, int(ch * self.width_mult))

    @nn.compact
    def __call__(self, x: Array, rng: Optional[jax.Array] = None, train: bool = True):
        h = x
        for bi, (ch, n) in enumerate(_SEG_ENC):
            for ci in range(n):
                h = ConvBN(self._w(ch), 3, name=f"enc{bi}_{ci}")(h, train)
            h = _maxpool2(h)
        h = jnp.tanh(h)
        spatial = h.shape[-1]
        enc_ch = h.shape[1]
        flat = h.reshape(h.shape[0], -1)
        dim = flat.shape[1]
        mu = nn.Dense(dim, name="fc_mu")(flat)
        log_var = nn.Dense(dim, name="fc_var")(flat)
        if rng is None:
            rng = self.make_rng("latent")
        z = mu + jnp.exp(0.5 * log_var) * jax.random.normal(rng, mu.shape)

        h = z.reshape(-1, enc_ch, spatial, spatial)
        for bi, chs in enumerate(_seg_dec_chans(self.in_channels)):
            h = _upsample2x(h)
            for ci, ch in enumerate(chs):
                w = ch if (bi == len(_seg_dec_chans(3)) - 1 and ci == len(chs) - 1) else self._w(ch)
                h = ConvBN(w, 3, name=f"dec{bi}_{ci}")(h, train)
        return jnp.tanh(h), mu, log_var


class _IncBlock(nn.Module):
    """Parallel 1/3/5/7-kernel conv block (reference EncoderInceptionModuleSignle,
    autoencoder.py:490-511 — single-conv variant)."""

    features: int

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        outs = []
        for k in (1, 3, 5, 7):
            outs.append(ConvBN(self.features // 4, k, name=f"k{k}")(x, train))
        return jnp.concatenate(outs, axis=1)


class InceptionVAE(nn.Module):
    """reference: autoencoder.py:639+ — inception-block encoder/decoder VAE."""

    in_channels: int = 3
    latent_dim: int = 512
    base: int = 64
    n_down: int = 4

    @nn.compact
    def __call__(self, x: Array, rng: Optional[jax.Array] = None, train: bool = True):
        h = ConvBN(self.base, 3, name="stem")(x, train)
        for i in range(self.n_down):
            h = _IncBlock(self.base * 2 ** min(i, 3), name=f"enc_{i}")(h, train)
            h = _maxpool2(h)
        spatial = h.shape[-1]
        enc_ch = h.shape[1]
        flat = h.reshape(h.shape[0], -1)
        mu = nn.Dense(self.latent_dim, name="fc_mu")(flat)
        log_var = nn.Dense(self.latent_dim, name="fc_var")(flat)
        if rng is None:
            rng = self.make_rng("latent")
        z = mu + jnp.exp(0.5 * log_var) * jax.random.normal(rng, mu.shape)

        h = nn.Dense(enc_ch * spatial * spatial, name="fc_dec")(z).reshape(-1, enc_ch, spatial, spatial)
        for i in range(self.n_down):
            h = _upsample2x(h)
            ch = self.base * 2 ** max(self.n_down - 2 - i, 0)
            h = _IncBlock(ch, name=f"dec_{i}")(h, train)
        w = self.param("out_weight", nn.initializers.lecun_normal(), (self.in_channels, h.shape[1], 3, 3))
        out = jax.lax.conv_general_dilated(
            h, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NCHW", "OIHW", "NCHW")
        )
        return jnp.tanh(out), mu, log_var


def vae_loss(real: Array, fake: Array, mu: Array, log_var: Array, kld_weight: float = 1.0) -> dict[str, Array]:
    """Plain MSE+KLD loss for the SegNet/Inception VAEs."""
    rec = jnp.mean(jnp.square(fake - real))
    kld = jnp.mean(-0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=1))
    return {"Total": rec + kld_weight * kld, "Reconstruction": rec, "Kullback Leibler Divergence": -kld}
