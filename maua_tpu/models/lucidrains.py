"""Alternative StyleGAN2 (lucidrains/stylegan2-pytorch fork), TPU-native.

Reference: lucidrains.py — a self-contained variant with its own blocks:
StyleVectorizer (plain lrelu MLP, :266-277), per-pixel learned noise
projections and bilinear upsampling in GeneratorBlock (:342-375), RGBBlock
accumulation (:280-302), Conv2DMod with groups=batch (:305-339), residual
DiscriminatorBlocks (:378-398), optional linear attention (Residual(Rezero(
ImageLinearAttention)), :421-430) and feature-quantization (VectorQuantize)
layers in D (:469-487), hinge loss + R1-style gradient penalty + EMA wrapper
(:512-624).

TPU-first: Conv2DMod uses the scale-input/shared-conv/demod-output identity
(see models/blocks.py) instead of groups=batch; linear attention is two
einsum contractions (MXU-friendly, O(N·d²)); VQ is a small codebook lookup
with straight-through estimator + commitment loss.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray
EPS = 1e-8


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


def _upsample2x_bilinear(x: Array) -> Array:
    b, c, h, w = x.shape
    return jax.image.resize(x, (b, c, 2 * h, 2 * w), "bilinear")


class Conv2DMod(nn.Module):
    """Modulated conv, weights W*(style+1), optional demod
    (reference: lucidrains.py:305-339)."""

    out_chan: int
    kernel: int = 3
    demod: bool = True

    @nn.compact
    def __call__(self, x: Array, style: Array) -> Array:
        in_chan = x.shape[1]
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0 / (1 + 0.2**2), "fan_in", "normal"),
            (self.out_chan, in_chan, self.kernel, self.kernel),
        )
        s = style + 1.0  # [B, in_chan]
        if self.demod:
            w_sq = jnp.sum(jnp.square(w), axis=(2, 3))  # [O, I]
            sigma = jnp.einsum("bi,oi->bo", jnp.square(s), w_sq)
            demod = lax.rsqrt(sigma + EPS)
        x = x * s[:, :, None, None].astype(x.dtype)
        pad = (self.kernel - 1) // 2
        out = lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        if self.demod:
            out = out * demod[:, :, None, None].astype(out.dtype)
        return out


class StyleVectorizer(nn.Module):
    """depth × (linear + lrelu) (reference: lucidrains.py:266-277)."""

    emb: int = 512
    depth: int = 8

    @nn.compact
    def __call__(self, z: Array) -> Array:
        x = z
        for i in range(self.depth):
            x = _lrelu(nn.Dense(self.emb, name=f"dense_{i}")(x))
        return x


class LinearAttention(nn.Module):
    """Image linear attention (the ImageLinearAttention the reference wraps
    in Residual(Rezero(·)), lucidrains.py:421-430): softmax(q over channels),
    softmax(k over pixels), two einsums — O(N·d²) instead of O(N²·d)."""

    chan: int
    key_dim: int = 64
    heads: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, c, h, w = x.shape
        d = self.key_dim
        q = nn.Conv(self.heads * d, (1, 1), use_bias=False, name="to_q")(x.transpose(0, 2, 3, 1))
        k = nn.Conv(self.heads * d, (1, 1), use_bias=False, name="to_k")(x.transpose(0, 2, 3, 1))
        v = nn.Conv(self.heads * d, (1, 1), use_bias=False, name="to_v")(x.transpose(0, 2, 3, 1))
        q = q.reshape(b, h * w, self.heads, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, h * w, self.heads, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, h * w, self.heads, d).transpose(0, 2, 1, 3)
        q = jax.nn.softmax(q * d**-0.5, axis=-1)
        k = jax.nn.softmax(k, axis=-2)
        ctx = jnp.einsum("bhnd,bhne->bhde", k, v)
        out = jnp.einsum("bhnd,bhde->bhne", q, ctx)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.heads * d)
        out = nn.Conv(c, (1, 1), name="to_out")(out)
        # Rezero residual (reference: Rezero, lucidrains.py:88-95)
        g = self.param("rezero_g", nn.initializers.zeros, ())
        return x + (g * out.transpose(0, 3, 1, 2)).astype(x.dtype)


class VectorQuantize(nn.Module):
    """Feature quantization with straight-through estimator + commitment loss
    (the VectorQuantize D layers, reference: lucidrains.py:469-487)."""

    dim: int
    codebook_size: int = 256
    commitment: float = 0.25

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        # x: [B, C, H, W] -> quantize along C per pixel
        codebook = self.param(
            "codebook", nn.initializers.normal(1.0), (self.codebook_size, self.dim)
        )
        flat = x.transpose(0, 2, 3, 1).reshape(-1, self.dim)
        d = (
            jnp.sum(flat**2, 1, keepdims=True)
            - 2 * flat @ codebook.T
            + jnp.sum(codebook**2, 1)[None]
        )
        idx = jnp.argmin(d, axis=1)
        quant = codebook[idx]
        commit_loss = jnp.mean(jnp.square(jax.lax.stop_gradient(quant) - flat))
        codebook_loss = jnp.mean(jnp.square(quant - jax.lax.stop_gradient(flat)))
        loss = codebook_loss + self.commitment * commit_loss
        quant = flat + jax.lax.stop_gradient(quant - flat)  # straight-through
        out = quant.reshape(x.shape[0], x.shape[2], x.shape[3], self.dim).transpose(0, 3, 1, 2)
        return out, loss


class RGBBlock(nn.Module):
    """(reference: lucidrains.py:280-302)."""

    latent_dim: int
    upsample: bool
    rgba: bool = False

    @nn.compact
    def __call__(self, x: Array, prev_rgb: Optional[Array], istyle: Array) -> Array:
        style = nn.Dense(x.shape[1], name="to_style")(istyle)
        out_filters = 4 if self.rgba else 3
        x = Conv2DMod(out_filters, 1, demod=False, name="conv")(x, style)
        if prev_rgb is not None:
            x = x + prev_rgb
        if self.upsample:
            x = _upsample2x_bilinear(x)
        return x


class GeneratorBlock(nn.Module):
    """(reference: lucidrains.py:342-375)."""

    latent_dim: int
    filters: int
    upsample: bool = True
    upsample_rgb: bool = True
    rgba: bool = False

    @nn.compact
    def __call__(self, x, prev_rgb, istyle, inoise):
        if self.upsample:
            x = _upsample2x_bilinear(x)
        h, w = x.shape[2], x.shape[3]
        crop = inoise[:, :h, :w, :]  # [B, H, W, 1]
        noise1 = nn.Dense(self.filters, name="to_noise1")(crop).transpose(0, 3, 2, 1)
        noise2 = nn.Dense(self.filters, name="to_noise2")(crop).transpose(0, 3, 2, 1)

        style1 = nn.Dense(x.shape[1], name="to_style1")(istyle)
        x = Conv2DMod(self.filters, 3, name="conv1")(x, style1)
        x = _lrelu(x + noise1)

        style2 = nn.Dense(self.filters, name="to_style2")(istyle)
        x = Conv2DMod(self.filters, 3, name="conv2")(x, style2)
        x = _lrelu(x + noise2)

        rgb = RGBBlock(self.latent_dim, self.upsample_rgb, self.rgba, name="to_rgb")(x, prev_rgb, istyle)
        return x, rgb


class LucidrainsGenerator(nn.Module):
    """(reference: lucidrains.py:401-446)."""

    image_size: int = 128
    latent_dim: int = 512
    network_capacity: int = 16
    transparent: bool = False
    attn_layers: Sequence[int] = ()

    @property
    def num_layers(self) -> int:
        return int(math.log2(self.image_size) - 1)

    @nn.compact
    def __call__(self, styles: Array, input_noise: Array) -> Array:
        """styles: [B, num_layers, latent_dim]; input_noise: [B, S, S, 1]."""
        n = self.num_layers
        init_channels = 4 * self.network_capacity
        filters = [init_channels] + [self.network_capacity * (2 ** (i + 1)) for i in range(n)][::-1]

        initial = self.param("initial_block", nn.initializers.normal(1.0), (init_channels, 4, 4))
        x = jnp.broadcast_to(initial[None], (styles.shape[0],) + initial.shape)

        rgb = None
        for ind in range(n):
            in_chan, out_chan = filters[ind], filters[ind + 1]
            num_layer = n - ind
            if num_layer in self.attn_layers:
                x = LinearAttention(in_chan, name=f"attn_{ind}_0")(x)
                x = LinearAttention(in_chan, name=f"attn_{ind}_1")(x)
            x, rgb = GeneratorBlock(
                self.latent_dim,
                out_chan,
                upsample=ind != 0,
                upsample_rgb=ind != n - 1,
                rgba=self.transparent,
                name=f"block_{ind}",
            )(x, rgb, styles[:, ind], input_noise)
        return rgb


class LucidrainsDiscriminator(nn.Module):
    """(reference: lucidrains.py:449-509). Returns (logits, quantize_loss)."""

    image_size: int = 128
    network_capacity: int = 16
    fq_layers: Sequence[int] = ()
    fq_dict_size: int = 256
    attn_layers: Sequence[int] = ()
    transparent: bool = False

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        n = int(math.log2(self.image_size) - 1)
        filters = [4 if self.transparent else 3] + [
            self.network_capacity * (2**i) for i in range(n + 1)
        ]
        q_loss = jnp.zeros(())
        for ind in range(len(filters) - 1):
            out_chan = filters[ind + 1]
            is_not_last = ind != len(filters) - 2
            res = nn.Conv(out_chan, (1, 1), name=f"res_{ind}")(x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
            h = nn.Conv(out_chan, (3, 3), padding=1, name=f"conv_{ind}_0")(x.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
            h = _lrelu(h)
            h = nn.Conv(out_chan, (3, 3), padding=1, name=f"conv_{ind}_1")(h.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
            h = _lrelu(h)
            x = h + res
            if is_not_last:
                x = nn.Conv(out_chan, (3, 3), strides=2, padding=1, name=f"down_{ind}")(
                    x.transpose(0, 2, 3, 1)
                ).transpose(0, 3, 1, 2)
            if (ind + 1) in self.attn_layers:
                x = LinearAttention(out_chan, name=f"attn_{ind}_0")(x)
                x = LinearAttention(out_chan, name=f"attn_{ind}_1")(x)
            if (ind + 1) in self.fq_layers:
                x, l = VectorQuantize(out_chan, self.fq_dict_size, name=f"fq_{ind}")(x)
                q_loss = q_loss + l

        flat = x.reshape(x.shape[0], -1)
        logit = nn.Dense(1, name="to_logit")(flat)
        return logit.squeeze(-1), q_loss


# ---------------------------------------------------------------------------
# losses (reference: lucidrains.py:146-160, Trainer :625+)
# ---------------------------------------------------------------------------


def hinge_d_loss(real_logits: Array, fake_logits: Array) -> Array:
    """(relu(1+real) + relu(1-fake)).mean() — note the reference's sign
    convention trains D to push real negative (lucidrains.py Trainer)."""
    return jnp.mean(jax.nn.relu(1.0 + real_logits)) + jnp.mean(jax.nn.relu(1.0 - fake_logits))


def hinge_g_loss(fake_logits: Array) -> Array:
    return jnp.mean(fake_logits)


def gradient_penalty(d_apply, images: Array, weight: float = 10.0) -> Array:
    """R1-style GP on real images (reference: lucidrains.py:146-158)."""

    def scalar(x):
        out, _ = d_apply(x)
        return jnp.sum(out)

    g = jax.grad(scalar)(images)
    return weight * jnp.mean(jnp.sum(jnp.square(g.reshape(g.shape[0], -1)), axis=1))


def mixed_styles(rng: jax.Array, vectorizer_apply, batch: int, num_layers: int, latent_dim: int, mixing_prob: float = 0.9) -> Array:
    """tiled W per layer with per-sample mixing (reference:
    lucidrains.py:165-176 noise_list/mixed_list)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    w1 = vectorizer_apply(jax.random.normal(k1, (batch, latent_dim)))
    w2 = vectorizer_apply(jax.random.normal(k2, (batch, latent_dim)))
    mix = jax.random.bernoulli(k3, mixing_prob, (batch,))
    tt = jax.random.randint(k4, (batch,), 1, num_layers)
    tt = jnp.where(mix, tt, num_layers)
    layer_idx = jnp.arange(num_layers)[None, :, None]
    return jnp.where(layer_idx >= tt[:, None, None], w2[:, None], w1[:, None])
