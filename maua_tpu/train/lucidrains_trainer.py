"""Trainer for the lucidrains alt-StyleGAN2 models — the reference's 600-line
`Trainer` class (reference: lucidrains.py:512-624 model wrapper, :625-1010
Trainer) rebuilt TPU-first:

* The whole iteration (D hinge + quantize + lazy GP, G hinge + lazy
  lucidrains path penalty, EMA/reset scheduling) is ONE jitted XLA program —
  the lazy phases (`steps % 4`, `steps % 32`, EMA `% 10` past 20k, averaging
  reset `% 1000 == 2` below 25k, lucidrains.py:777-788,935-944) are `lax.cond`
  on the traced step counter, so only the taken branch executes.
* DiffGrad (torch_optimizer.DiffGrad, betas (0.5, 0.9), lucidrains.py:555-557)
  is implemented as an optax gradient transformation.
* Gradient accumulation is a lax.scan over a leading microbatch axis
  (lucidrains.py:816-855).
* apex-style NaN recovery (raise_if_nan / NanException + reload-last-
  checkpoint, lucidrains.py:59-61,133-136,946-952) becomes a host-side check
  of the step's returned metrics: on NaN the trainer restores the last saved
  checkpoint and raises NanException for the caller's retry loop.
"""

from __future__ import annotations

import math
import os
from typing import Any, NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.lucidrains import (
    LucidrainsDiscriminator,
    LucidrainsGenerator,
    StyleVectorizer,
    gradient_penalty,
    hinge_d_loss,
    mixed_styles,
)

Array = jnp.ndarray
EPS = 1e-8


class NanException(Exception):
    """(reference: lucidrains.py:59-61)."""


# ---------------------------------------------------------------------------
# DiffGrad (torch_optimizer.DiffGrad; reference imports it at lucidrains.py:21
# and builds both optimizers with it at :555-557)
# ---------------------------------------------------------------------------


class DiffGradState(NamedTuple):
    count: Array
    mu: Any
    nu: Any
    prev_grad: Any


def diffgrad(
    learning_rate: float, b1: float = 0.5, b2: float = 0.9, eps: float = 1e-8
) -> optax.GradientTransformation:
    """Adam with a per-element 'friction' sigmoid(|g_prev - g|) on the first
    moment — elements whose gradient is changing slowly get damped updates."""

    def init_fn(params):
        z = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)
        return DiffGradState(jnp.zeros((), jnp.int32), z(params), z(params), z(params))

    def update_fn(grads, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def upd(m, v, g, pg):
            dfc = jax.nn.sigmoid(jnp.abs(pg - g))  # friction coefficient
            m_hat = m / bc1
            v_hat = v / bc2
            return -learning_rate * (m_hat * dfc) / (jnp.sqrt(v_hat) + eps)

        updates = jax.tree_util.tree_map(upd, mu, nu, grads, state.prev_grad)
        return updates, DiffGradState(count, mu, nu, grads)

    return optax.GradientTransformation(init_fn, update_fn)


# ---------------------------------------------------------------------------
# train state + config
# ---------------------------------------------------------------------------


class LucidrainsConfig(NamedTuple):
    """(reference Trainer args, lucidrains.py:627-651)."""

    image_size: int = 128
    latent_dim: int = 512
    style_depth: int = 8
    network_capacity: int = 16
    transparent: bool = False
    batch_size: int = 4
    gradient_accumulate_every: int = 1
    lr: float = 2e-4
    mixed_prob: float = 0.9
    gp_every: int = 4  # apply_gradient_penalty = steps % 4 == 0
    pl_every: int = 32  # apply_path_penalty = steps % 32 == 0
    ema_beta: float = 0.995  # EMA(0.995), lucidrains.py:544
    ema_every: int = 10  # GAN.EMA() every 10 steps ... (:935-936)
    ema_start: int = 20_000  # ... past 20k steps
    reset_ema_until: int = 25_000  # reset_parameter_averaging schedule (:938-939)
    pl_decay: float = 0.99  # pl_length_ma = EMA(0.99) (:678)
    fq_layers: tuple = ()
    fq_dict_size: int = 256
    attn_layers: tuple = ()


@flax.struct.dataclass
class LucidrainsTrainState:
    step: Array
    s_params: Any  # style vectorizer S
    g_params: Any  # generator G
    d_params: Any
    se_params: Any  # EMA copies SE / GE (reference :543-549)
    ge_params: Any
    g_opt_state: Any  # one DiffGrad over (S, G) params (reference :555)
    d_opt_state: Any
    pl_mean: Array


def _models(cfg: LucidrainsConfig):
    S = StyleVectorizer(emb=cfg.latent_dim, depth=cfg.style_depth)
    G = LucidrainsGenerator(
        image_size=cfg.image_size,
        latent_dim=cfg.latent_dim,
        network_capacity=cfg.network_capacity,
        transparent=cfg.transparent,
        attn_layers=cfg.attn_layers,
    )
    D = LucidrainsDiscriminator(
        image_size=cfg.image_size,
        network_capacity=cfg.network_capacity,
        fq_layers=cfg.fq_layers,
        fq_dict_size=cfg.fq_dict_size,
        attn_layers=cfg.attn_layers,
        transparent=cfg.transparent,
    )
    return S, G, D


def init_lucidrains_state(rng: jax.Array, cfg: LucidrainsConfig) -> LucidrainsTrainState:
    S, G, D = _models(cfg)
    ks, kg, kd = jax.random.split(rng, 3)
    n_layers = G.num_layers
    chans = 4 if cfg.transparent else 3

    s_params = S.init(ks, jnp.zeros((2, cfg.latent_dim)))["params"]
    g_params = G.init(
        kg,
        jnp.zeros((2, n_layers, cfg.latent_dim)),
        jnp.zeros((2, cfg.image_size, cfg.image_size, 1)),
    )["params"]
    d_params = D.init(kd, jnp.zeros((2, chans, cfg.image_size, cfg.image_size)))["params"]

    g_opt = diffgrad(cfg.lr, 0.5, 0.9)
    d_opt = diffgrad(cfg.lr, 0.5, 0.9)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    return LucidrainsTrainState(
        step=jnp.zeros((), jnp.int32),
        s_params=s_params,
        g_params=g_params,
        d_params=d_params,
        se_params=copy(s_params),  # reset_parameter_averaging at init (:573)
        ge_params=copy(g_params),
        g_opt_state=g_opt.init((s_params, g_params)),
        d_opt_state=d_opt.init(d_params),
        pl_mean=jnp.zeros(()),
    )


# ---------------------------------------------------------------------------
# the jitted step
# ---------------------------------------------------------------------------


def make_lucidrains_train_step(cfg: LucidrainsConfig):
    """train_step(state, real [accum, B, C, S, S], rng) -> (state, metrics)."""
    S, G, D = _models(cfg)
    g_opt = diffgrad(cfg.lr, 0.5, 0.9)
    d_opt = diffgrad(cfg.lr, 0.5, 0.9)
    n_layers = G.num_layers
    zeros_like = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)

    def w_of(s_params, rng):
        return mixed_styles(
            rng,
            lambda z: S.apply({"params": s_params}, z),
            cfg.batch_size,
            n_layers,
            cfg.latent_dim,
            cfg.mixed_prob,
        )

    def image_noise(rng, batch):
        # uniform image noise (reference: lucidrains.py:178-180)
        return jax.random.uniform(rng, (batch, cfg.image_size, cfg.image_size, 1))

    def g_apply(g_params, w, noise):
        return G.apply({"params": g_params}, w, noise)

    def d_apply(d_params, img):
        return D.apply({"params": d_params}, img)

    # ---- D phase (reference :814-855) ----
    def d_loss_fn(d_params, sg_params, real, rng, apply_gp):
        s_params, g_params = sg_params
        kw, kn = jax.random.split(rng)
        w = w_of(s_params, kw)
        fake = jax.lax.stop_gradient(g_apply(g_params, w, image_noise(kn, cfg.batch_size)))
        fake_out, fake_q = d_apply(d_params, fake)
        real_out, real_q = d_apply(d_params, real)
        divergence = hinge_d_loss(real_out, fake_out)
        quantize = jnp.mean(fake_q + real_q)
        loss = divergence + quantize
        gp = jax.lax.cond(
            apply_gp,
            lambda: gradient_penalty(lambda x: d_apply(d_params, x), real),
            lambda: jnp.zeros(()),
        )
        loss = loss + gp
        aux = {"Divergence": divergence, "Quantize": quantize, "R1": gp}
        return loss / cfg.gradient_accumulate_every, aux

    # ---- G phase (reference :858-893) ----
    def g_loss_fn(sg_params, d_params, rng, pl_mean, apply_pl):
        s_params, g_params = sg_params
        kw, kn, kp = jax.random.split(rng, 3)
        w = w_of(s_params, kw)
        noise = image_noise(kn, cfg.batch_size)
        fake = g_apply(g_params, w, noise)
        fake_out, _ = d_apply(d_params, fake)
        gen_loss = jnp.mean(fake_out)  # hinge G loss (reference :869)

        def pl_branch():
            # perturb W by noise scaled to its batch std (reference :874-884)
            std = 0.1 / (jnp.std(w, axis=0, keepdims=True) + EPS)
            w2 = w + jax.random.normal(kp, w.shape) / (std + EPS)
            pl_images = g_apply(g_params, w2, noise)
            pl_lengths = jnp.mean(jnp.square(pl_images - fake), axis=(1, 2, 3))
            pl_loss = jnp.mean(jnp.square(pl_lengths - pl_mean))
            pl_loss = jnp.where(jnp.isnan(pl_loss), 0.0, pl_loss)
            return pl_loss, jnp.mean(pl_lengths)

        pl_loss, avg_pl = jax.lax.cond(
            apply_pl, pl_branch, lambda: (jnp.zeros(()), jnp.zeros(()))
        )
        loss = gen_loss + pl_loss
        aux = {"Generator": gen_loss, "Path Length": pl_loss, "avg_pl": avg_pl}
        return loss / cfg.gradient_accumulate_every, aux

    def train_step(state: LucidrainsTrainState, real: Array, rng: jax.Array):
        """real: [gradient_accumulate_every, batch, C, S, S] in [-1, 1]."""
        apply_gp = state.step % cfg.gp_every == 0
        apply_pl = state.step % cfg.pl_every == 0
        k_d, k_g = jax.random.split(rng)

        # D
        sg = (state.s_params, state.g_params)

        def d_scan(carry, inp):
            grads_acc, aux_acc = carry
            r, key = inp
            (_, aux), grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.d_params, sg, r, key, apply_gp
            )
            return (
                jax.tree_util.tree_map(jnp.add, grads_acc, grads),
                jax.tree_util.tree_map(jnp.add, aux_acc, aux),
            ), None

        keys = jax.random.split(k_d, cfg.gradient_accumulate_every)
        init_aux = {"Divergence": jnp.zeros(()), "Quantize": jnp.zeros(()), "R1": jnp.zeros(())}
        (d_grads, d_aux), _ = jax.lax.scan(d_scan, (zeros_like(state.d_params), init_aux), (real, keys))
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        # G (uses the UPDATED discriminator, matching the sequential reference loop)
        def g_scan(carry, key):
            grads_acc, aux_acc = carry
            (_, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                sg, d_params, key, state.pl_mean, apply_pl
            )
            return (
                jax.tree_util.tree_map(jnp.add, grads_acc, grads),
                jax.tree_util.tree_map(jnp.add, aux_acc, aux),
            ), None

        keys_g = jax.random.split(k_g, cfg.gradient_accumulate_every)
        init_gaux = {"Generator": jnp.zeros(()), "Path Length": jnp.zeros(()), "avg_pl": jnp.zeros(())}
        (g_grads, g_aux), _ = jax.lax.scan(g_scan, (zeros_like(sg), init_gaux), keys_g)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state, sg)
        s_params, g_params = optax.apply_updates(sg, g_updates)

        # pl_mean moving average (reference :930-933)
        avg_pl = g_aux["avg_pl"] / cfg.gradient_accumulate_every
        new_pl = cfg.pl_decay * state.pl_mean + (1 - cfg.pl_decay) * avg_pl
        new_pl = jnp.where(jnp.isnan(new_pl), state.pl_mean, new_pl)
        pl_mean = jnp.where(apply_pl, new_pl, state.pl_mean)

        # EMA every 10 steps past 20k; hard reset every 1000 (+2) below 25k
        def ema_upd(ema, cur):
            return jax.tree_util.tree_map(
                lambda e, c: cfg.ema_beta * e + (1 - cfg.ema_beta) * c, ema, cur
            )

        do_ema = jnp.logical_and(state.step % cfg.ema_every == 0, state.step > cfg.ema_start)
        do_reset = jnp.logical_and(
            state.step <= cfg.reset_ema_until, state.step % 1000 == 2
        )
        se, ge = jax.lax.cond(
            do_reset,
            lambda: (s_params, g_params),
            lambda: jax.lax.cond(
                do_ema,
                lambda: (ema_upd(state.se_params, s_params), ema_upd(state.ge_params, g_params)),
                lambda: (state.se_params, state.ge_params),
            ),
        )

        n_acc = cfg.gradient_accumulate_every
        metrics = {
            "Discriminator": d_aux["Divergence"] / n_acc,
            "Quantize": d_aux["Quantize"] / n_acc,
            "R1": d_aux["R1"] / n_acc,
            "Generator": g_aux["Generator"] / n_acc,
            "Path Length": g_aux["Path Length"] / n_acc,
            "Mean Path Length": pl_mean,
        }
        new_state = state.replace(
            step=state.step + 1,
            s_params=s_params,
            g_params=g_params,
            d_params=d_params,
            se_params=se,
            ge_params=ge,
            g_opt_state=g_opt_state,
            d_opt_state=d_opt_state,
            pl_mean=pl_mean,
        )
        return new_state, metrics

    return train_step


# ---------------------------------------------------------------------------
# host-side trainer: loop, checkpoints, NaN recovery
# ---------------------------------------------------------------------------


class LucidrainsTrainer:
    """Host loop around the jitted step (reference Trainer, lucidrains.py:625+).

    NaN recovery matches the reference (:946-952): when a step's losses come
    back non-finite, reload the most recent checkpoint and raise NanException;
    callers wrap `.train()` in a retry loop exactly like the reference's
    `retry_call(self.train, tries=3, exceptions=NanException)`.
    """

    def __init__(self, cfg: LucidrainsConfig, models_dir: str = "models", name: str = "default", save_every: int = 1000, seed: int = 0):
        self.cfg = cfg
        self.name = name
        self.models_dir = os.path.join(models_dir, name)
        os.makedirs(self.models_dir, exist_ok=True)
        self.save_every = save_every
        self.state = init_lucidrains_state(jax.random.PRNGKey(seed), cfg)
        self.step_fn = jax.jit(make_lucidrains_train_step(cfg))
        self._rng = jax.random.PRNGKey(seed + 1)
        self.last_metrics: dict[str, float] = {}

    # -- checkpoints (reference save/load, lucidrains.py:1012-1040) --
    def _ckpt_path(self, num: int) -> str:
        return os.path.join(self.models_dir, f"model_{num}.msgpack")

    def save(self, num: Optional[int] = None) -> str:
        import flax.serialization

        num = int(self.state.step) // self.save_every if num is None else num
        path = self._ckpt_path(num)
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(self.state))
        return path

    def load(self, num: int = -1) -> None:
        import glob

        import flax.serialization

        if num == -1:
            paths = glob.glob(os.path.join(self.models_dir, "model_*.msgpack"))
            if not paths:
                raise FileNotFoundError(f"no checkpoints under {self.models_dir}")
            num = max(int(os.path.basename(p).split("_")[1].split(".")[0]) for p in paths)
        with open(self._ckpt_path(num), "rb") as f:
            self.state = flax.serialization.from_bytes(self.state, f.read())

    # -- one training iteration --
    def train(self, real: Array) -> dict[str, float]:
        """real: [gradient_accumulate_every, batch, C, S, S]. Raises
        NanException (after restoring the last checkpoint) on divergence."""
        self._rng, key = jax.random.split(self._rng)
        new_state, metrics = self.step_fn(self.state, real, key)
        metrics = {k: float(v) for k, v in metrics.items()}
        if not all(math.isfinite(v) for v in metrics.values()):
            ckpt_num = int(self.state.step) // self.save_every
            try:
                self.load(ckpt_num)
            except FileNotFoundError:
                pass  # no checkpoint yet: keep the pre-step state
            raise NanException(f"NaN detected at step {int(self.state.step)}: {metrics}")
        self.state = new_state
        self.last_metrics = metrics
        if int(self.state.step) % self.save_every == 0:
            self.save()
        return metrics

    # -- sampling with truncation (reference generate_truncated, :1042-1060) --
    def generate(self, rng: jax.Array, n: int = 8, use_ema: bool = True, trunc_psi: float = 0.6) -> np.ndarray:
        S_, G_, _ = _models(self.cfg)
        s_params = self.state.se_params if use_ema else self.state.s_params
        g_params = self.state.ge_params if use_ema else self.state.g_params
        k1, k2, k3 = jax.random.split(rng, 3)
        w = S_.apply({"params": s_params}, jax.random.normal(k1, (n, self.cfg.latent_dim)))
        # truncate toward the mean W estimated from a large z batch (:1046-1052)
        w_mean = jnp.mean(
            S_.apply({"params": s_params}, jax.random.normal(k2, (2000, self.cfg.latent_dim))),
            axis=0,
        )
        w = w_mean + trunc_psi * (w - w_mean)
        n_layers = G_.num_layers
        wt = jnp.repeat(w[:, None], n_layers, axis=1)
        noise = jax.random.uniform(k3, (n, self.cfg.image_size, self.cfg.image_size, 1))
        img = G_.apply({"params": g_params}, wt, noise)
        return np.asarray(img)
