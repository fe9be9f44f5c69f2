"""The jitted GAN train step: D phase, lazy R1, ADA adaptation, G phase, lazy
path-length regularization, lookahead-minimax, EMA — one XLA program.

Rebuilds reference train.py:105-348 TPU-first:
* One jit compiles the whole iteration; data-parallelism is GSPMD — params
  replicated, batch dim-0 sharded over the `data` mesh axis; global means make
  XLA insert the gradient all-reduces that DDP hooks did
  (reference: train.py:555-579).
* Lazy regularization (reference: train.py:195-205,242-249) is `lax.cond` on
  step % reg_every — only the taken branch executes at runtime.
* Gradient accumulation (reference: train.py:157-193) is a `lax.scan` over a
  leading microbatch axis.
* Style mixing (reference: train.py:59-62, models/stylegan2.py:511-525) is
  per-sample W-space mixing with a traced inject index (jit-friendly, no
  Python RNG).
* ADA's r_t statistic is computed on the global (sharded) batch — the psum
  the reference does by hand (train.py:207-224, distributed.py:42-52) falls
  out of GSPMD.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..models import Discriminator, Generator
from .augment import augment, ada_adjust_p
from .ema import EMA_DECAY_DEFAULT, ema_update
from .lookahead import LookaheadState, lookahead_minimax_init, lookahead_minimax_step
from .losses import d_logistic_loss, g_nonsaturating_loss

Array = jnp.ndarray


class TrainConfig(NamedTuple):
    """Static training hyper-parameters (reference argparse train.py:354-426)."""

    size: int = 256
    latent_dim: int = 512
    batch_size: int = 8  # global batch per microbatch
    num_accumulate: int = 1
    lr: float = 2e-3
    r1: float = 1e-5  # scaled by size² at config build (train.py:430)
    path_regularize: float = 2.0
    path_batch_shrink: int = 2
    d_reg_every: int = 16
    g_reg_every: int = 4
    mixing_prob: float = 0.9
    channel_multiplier: int = 2
    channel_max: int = 512
    constant_input: bool = False
    augment: bool = True
    augment_p: float = 0.0  # 0 = adaptive
    ada_target: float = 0.6
    ada_length: float = 15_000.0  # per real prediction (reference train.py:405)
    lookahead: bool = True
    la_steps: int = 500
    la_alpha: float = 0.5
    ema_decay: float = EMA_DECAY_DEFAULT
    bcr_weight: float = 0.0  # balanced consistency regularization (train.py:184-189)
    contrastive_weight: float = 0.0  # SimCLR regularizer on D's hidden layer (train.py:177-182)
    contrastive_loss_type: str = "infonce"  # "infonce" | "nt_xent"
    # MoCo options (reference contrastive_learner.py:155-253): momentum beta
    # for an EMA key encoder (0 = keys through D itself), and a ring buffer of
    # past projected keys used as extra InfoNCE negatives (0 = no queue; must
    # be a multiple of 2*batch_size — fakes+reals are enqueued each microbatch)
    contrastive_momentum: float = 0.0
    contrastive_queue: int = 0
    contrastive_bilinear: bool = False  # bilinear key transform (ref :187-190)
    bf16: bool = False  # bf16 conv compute in G synthesis + D (params stay fp32)
    # -1 = auto (models.auto_s2d_min_res), 0 = off: polyphase evaluation of
    # the generator's low-channel high-res layers (ops/s2d.py) — exact, and
    # ~2-4x per conv on TPU at 512/1024 resolutions; a no-op for size<=256
    # full-width models whose layers are all >=128 channels
    s2d_min_res: int = -1
    # 1×-output-grid ADA warp (augment.py apply_affine oversample_grid=False):
    # 4× fewer gather windows + backward scatter updates — the measured warp
    # bottleneck at 1024². Source-side antialiasing retained; recommended for
    # size >= 512 training
    ada_fast_warp: bool = False
    # "fft" = the gather-free FFT-shear ADA warp (train/fft_warp.py): the
    # whole geometric augment becomes FFTs + MXU matmuls, removing the
    # per-pixel gather (108 ms fwd @256² b8) and its scatter adjoint (the
    # measured ~78%-of-step cost). Square training images only. None = use
    # the gather paths per ada_fast_warp
    ada_warp_method: str | None = None
    # fft-warp band taper (fft_warp.py): raised-cosine from this fraction of
    # Nyquist, applied only to fractionally-shifted rows when conditional
    # (lattice transforms — incl. the identity during ADA warm-up — stay
    # exact). None disables; conditional=False restores always-on (ablation)
    ada_fft_taper: float | None = 0.85
    ada_fft_taper_conditional: bool = True
    # randomize_noise draws at s2d phase layers happen directly in the phase
    # layout (distribution-identical iid, ~5× cheaper — blocks.NoiseInjection);
    # False restores bitwise rng parity with the native path (used by the
    # exact-reordering parity test, tests/test_s2d.py)
    fast_phase_noise: bool = True
    # split each lazy-regularizer microbatch into this many sequential chunks
    # (lax.scan): the R1/path double-backward grad is a mean over samples, so
    # chunking is EXACT while dividing the reg branches' peak HBM (measured:
    # R1 temps are what OOM a batch-12 1024² step — the branch holds D's
    # full activation set plus the grad-of-grad graph). 1 = whole microbatch.
    reg_chunks: int = 1
    # rematerialize G synthesis in the G phase (jax.checkpoint): the G
    # backward otherwise holds G's AND D's activation sets simultaneously;
    # remat trades one extra synthesis forward for ~the whole G activation
    # set of peak HBM — the enabling trade for batch 12 @1024² on a 16 GB
    # chip (jax.checkpoint is the TPU idiom for exactly this)
    remat_synth: bool = False


def make_train_config(**kwargs) -> TrainConfig:
    """Build a TrainConfig applying the reference's derived args:
    r1 *= size² (train.py:430); bCR/contrastive force augmentation on
    (train.py:427-428)."""
    cfg = TrainConfig(**kwargs)
    if cfg.bcr_weight > 0 or cfg.contrastive_weight > 0:
        cfg = cfg._replace(augment=True)
    return cfg._replace(r1=cfg.r1 * cfg.size**2)


def _reg_adjusted_adam(lr: float, reg_every: int) -> optax.GradientTransformation:
    """Adam with lazy-regularization-adjusted lr/betas
    (reference: train.py:505-515): ratio = n/(n+1), lr*ratio, betas**ratio."""
    ratio = reg_every / (reg_every + 1.0)
    return optax.adam(lr * ratio, b1=0.0**ratio, b2=0.99**ratio)


@flax.struct.dataclass
class GANTrainState:
    step: Array
    g_params: Any
    d_params: Any
    g_ema_params: Any
    g_buffers: Any
    g_opt_state: Any
    d_opt_state: Any
    lookahead: Optional[LookaheadState]
    cl_head: Optional[Any]  # contrastive projection head (None when disabled)
    mean_path_length: Array
    ada_p: Array
    ada_signs: Array
    ada_n: Array
    # MoCo machinery (momentum key encoder + key queue), None unless enabled
    cl_state: Optional[Any] = None


def init_train_state(rng: jax.Array, cfg: TrainConfig) -> tuple[GANTrainState, Generator, Discriminator]:
    """Construct models + optimizer state (reference: train.py:449-520)."""
    import jax.numpy as _jnp

    dtype = _jnp.bfloat16 if cfg.bf16 else _jnp.float32
    s2d = cfg.s2d_min_res
    if s2d < 0:
        # auto: lane-filling only pays on accelerators; the CPU path would
        # just execute the dense phase kernels' 2.25x structural-zero MACs
        # (mirrors pipeline/generate.py's backend guard)
        if jax.default_backend() == "cpu":
            s2d = 0
        else:
            from ..models import auto_s2d_min_res

            s2d = auto_s2d_min_res(cfg.size, cfg.channel_multiplier, cfg.channel_max)
    gen = Generator(
        size=cfg.size,
        style_dim=cfg.latent_dim,
        channel_multiplier=cfg.channel_multiplier,
        channel_max=cfg.channel_max,
        constant_input=cfg.constant_input,
        dtype=dtype,
        s2d_min_res=s2d,
        # training draws fresh noise every step: take the phase-layout draw
        # (distribution-identical, ~5× cheaper — blocks.NoiseInjection);
        # inference keeps the default bitwise-parity draws
        fast_phase_noise=cfg.fast_phase_noise,
    )
    disc = Discriminator(
        size=cfg.size, channel_multiplier=cfg.channel_multiplier, channel_max=cfg.channel_max,
        dtype=dtype, s2d_min_res=s2d,
    )

    kg, kd, kn = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.latent_dim))
    g_vars = gen.init({"params": kg, "noise": kn}, z)
    d_vars = disc.init(kd, jnp.zeros((2, 3, cfg.size, cfg.size)))

    g_params = g_vars["params"]
    g_buffers = g_vars.get("buffers", {})
    d_params = d_vars["params"]

    g_opt = _reg_adjusted_adam(cfg.lr, cfg.g_reg_every)
    d_opt = _reg_adjusted_adam(cfg.lr, cfg.d_reg_every)

    cl_head = None
    cl_state = None
    if cfg.contrastive_weight > 0:
        from .contrastive import init_contrastive_state, init_projection_head

        _, hidden = disc.apply(d_vars, jnp.zeros((2, 3, cfg.size, cfg.size)), return_hidden=True)
        feat_dim = int(hidden.size // hidden.shape[0])
        cl_head = init_projection_head(
            jax.random.fold_in(rng, 7), feat_dim, bilinear=cfg.contrastive_bilinear
        )
        if cfg.contrastive_queue > 0 and cfg.contrastive_queue % (2 * cfg.batch_size) != 0:
            raise ValueError(
                f"contrastive_queue ({cfg.contrastive_queue}) must be a multiple of "
                f"2*batch_size ({2 * cfg.batch_size}) — fakes+reals enqueue together"
            )
        cl_state = init_contrastive_state(
            d_params, cfg.contrastive_momentum > 0, cfg.contrastive_queue
        )

    state = GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_ema_params=jax.tree_util.tree_map(jnp.asarray, g_params),
        g_buffers=g_buffers,
        g_opt_state=g_opt.init(g_params),
        d_opt_state=d_opt.init((d_params, cl_head)),
        lookahead=lookahead_minimax_init(g_params, d_params) if cfg.lookahead else None,
        cl_head=cl_head,
        mean_path_length=jnp.zeros(()),
        ada_p=jnp.asarray(cfg.augment_p, jnp.float32),
        ada_signs=jnp.zeros(()),
        ada_n=jnp.zeros(()),
        cl_state=cl_state,
    )
    return state, gen, disc


def _mixed_wplus(gen: Generator, g_params: Any, buffers: Any, rng: jax.Array, batch: int, cfg: TrainConfig) -> Array:
    """Sample z (+ optional second z), map through the style MLP, and build a
    per-sample style-mixed W+ [B, n_latent, D] with a traced inject index."""
    n_latent = gen.n_latent
    kz1, kz2, kmix, kidx = jax.random.split(rng, 4)
    z1 = jax.random.normal(kz1, (batch, cfg.latent_dim))
    z2 = jax.random.normal(kz2, (batch, cfg.latent_dim))

    def map_style(z):
        return gen.apply({"params": g_params, "buffers": buffers}, z, method=Generator.get_latent)

    w1 = map_style(z1)  # [B, D]
    w2 = map_style(z2)
    use_mix = jax.random.bernoulli(kmix, cfg.mixing_prob, (batch,))
    inject = jax.random.randint(kidx, (batch,), 1, n_latent)
    inject = jnp.where(use_mix, inject, n_latent)  # no-mix -> all w1

    layer_idx = jnp.arange(n_latent)[None, :, None]  # [1, L, 1]
    take_w2 = layer_idx >= inject[:, None, None]
    wplus = jnp.where(take_w2, w2[:, None, :], w1[:, None, :])
    return wplus


def make_train_phases(gen: Generator, disc: Discriminator, cfg: TrainConfig) -> dict:
    """The train step's phases as individually jittable functions.

    Returns {"d": d_phase, "r1": r1_phase, "g": g_phase, "path": path_phase,
    "tail": tail} — the exact closures `make_train_step` composes (same order,
    same semantics), exposed so the phase profiler (tests/profile_train_tpu.py)
    can compile and time each one on its own. Mirrors the reference's
    per-phase NVTX ranges in train_profile.py:141-286.
    """
    g_opt = _reg_adjusted_adam(cfg.lr, cfg.g_reg_every)
    d_opt = _reg_adjusted_adam(cfg.lr, cfg.d_reg_every)
    zeros_like = lambda t: jax.tree_util.tree_map(jnp.zeros_like, t)

    def synth(g_params, wplus, noise_rng, buffers):
        img, _ = gen.apply(
            {"params": g_params, "buffers": buffers},
            wplus,
            input_is_latent=True,
            randomize_noise=True,
            rngs={"noise": noise_rng},
        )
        return img

    def d_apply(d_params, img):
        return disc.apply({"params": d_params}, img)

    # ---------------- D phase ----------------
    def d_microbatch_loss(d_and_head, g_params, buffers, real, rng, ada_p, cl_state):
        d_params, cl_head = d_and_head
        kw, kn, ka1, ka2 = jax.random.split(rng, 4)
        b = real.shape[0]
        wplus = _mixed_wplus(gen, g_params, buffers, kw, b, cfg)
        fake = jax.lax.stop_gradient(synth(g_params, wplus, kn, buffers))
        # bf16 mode: augment in bf16 — D casts its input to bf16 anyway, and
        # the fft warp's shear then runs as MXU DFT matmuls instead of VPU
        # jnp.fft (fft_warp._shift_rows_dftmm; measured 14.7 ms per
        # rfft+irfft roundtrip @1024², 2×17 ms of the 27 ms warp fwd)
        adt = jnp.bfloat16 if cfg.bf16 else None
        fake_in = fake.astype(adt) if adt else fake
        real_in = real.astype(adt) if adt else real
        # fused fake/real pass: ONE interleaved [2B] augment + D application
        # instead of two [B] ones — per-sample math is identical (augment and
        # D act per sample), and the INTERLEAVED order [f0,r0,f1,r1,…] keeps
        # minibatch_stddev's strided groups pure (group m pools samples
        # {m, m+s, m+2s, …} with stride s = 2B/group; s is even whenever
        # B % 4 == 0, so every group is all-fake or all-real — the same
        # statistic two separate applications compute). Halves the per-call
        # fixed costs of the warp FFT/matmuls and D's conv launches at 1024².
        # purity needs stride 2B/group even, i.e. B % stddev_group == 0 —
        # derive from the actual group size so a future configurable group
        # can't silently mix fakes and reals within a stddev group
        fuse = (
            b % disc.stddev_group == 0
            and cfg.bcr_weight == 0
            and cfg.contrastive_weight == 0
        )
        if fuse:
            both = jnp.stack([fake_in, real_in], axis=1).reshape(2 * b, *real.shape[1:])
            if cfg.augment:
                both, _ = augment(both, ada_p, rng=ka1, fast_warp=cfg.ada_fast_warp, warp_method=cfg.ada_warp_method,
                                  fft_taper=cfg.ada_fft_taper, fft_taper_conditional=cfg.ada_fft_taper_conditional)
            pred = d_apply(d_params, both)
            fake_pred, real_pred = pred[0::2], pred[1::2]
            fake_aug, real_aug = None, None  # only bCR/contrastive need them
        elif cfg.augment:
            fake_aug, _ = augment(fake_in, ada_p, rng=ka1, fast_warp=cfg.ada_fast_warp, warp_method=cfg.ada_warp_method,
                                  fft_taper=cfg.ada_fft_taper, fft_taper_conditional=cfg.ada_fft_taper_conditional)
            real_aug, _ = augment(real_in, ada_p, rng=ka2, fast_warp=cfg.ada_fast_warp, warp_method=cfg.ada_warp_method,
                                  fft_taper=cfg.ada_fft_taper, fft_taper_conditional=cfg.ada_fft_taper_conditional)
        else:
            fake_aug, real_aug = fake, real
        if not fuse:
            fake_pred = d_apply(d_params, fake_aug)
            real_pred = d_apply(d_params, real_aug)
        loss = d_logistic_loss(real_pred, fake_pred)
        if cfg.bcr_weight > 0:
            # balanced consistency regularization (train.py:184-189)
            c = jnp.mean(jnp.square(real_pred - d_apply(d_params, real))) + jnp.mean(
                jnp.square(fake_pred - d_apply(d_params, fake))
            )
            loss = loss + cfg.bcr_weight * c
        if cfg.contrastive_weight > 0 and cl_head is not None:
            # SimCLR regularizer on D's hidden layer: original vs augmented
            # pairs for fakes and reals (train.py:177-182); MoCo options
            # (momentum key encoder, key queue) when configured
            # (contrastive_learner.py:155-253)
            from .contrastive import contrastive_regularizer_moco

            def d_hidden(img):
                return disc.apply({"params": d_params}, img, return_hidden=True)[1]

            key_d_hidden = None
            if cl_state is not None and cl_state.key_d_params is not None:
                key_params = jax.lax.stop_gradient(cl_state.key_d_params)

                def key_d_hidden(img):
                    return disc.apply({"params": key_params}, img, return_hidden=True)[1]

            cl, cl_state = contrastive_regularizer_moco(
                d_hidden, key_d_hidden, cl_head, cl_state,
                [fake, real], [fake_aug, real_aug],
                loss_type=cfg.contrastive_loss_type,
            )
            loss = loss + cfg.contrastive_weight * cl
        aux = {
            "d_loss": loss,
            "real_score": jnp.mean(real_pred),
            "fake_score": jnp.mean(fake_pred),
            "sign_sum": jnp.sum(jnp.sign(real_pred)),
            "n_pred": jnp.asarray(real_pred.shape[0], jnp.float32),
        }
        return loss / cfg.num_accumulate, (aux, cl_state)

    def d_phase(state: GANTrainState, real_imgs, rng):
        d_and_head = (state.d_params, state.cl_head)

        def scan_body(carry, inp):
            grads_acc, aux_acc, cl_state = carry
            real, key = inp
            (_, (aux, cl_state)), grads = jax.value_and_grad(d_microbatch_loss, has_aux=True)(
                d_and_head, state.g_params, state.g_buffers, real, key, state.ada_p, cl_state
            )
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            aux_acc = jax.tree_util.tree_map(jnp.add, aux_acc, aux)
            return (grads_acc, aux_acc, cl_state), None

        keys = jax.random.split(rng, cfg.num_accumulate)
        init_aux = {
            "d_loss": jnp.zeros(()),
            "real_score": jnp.zeros(()),
            "fake_score": jnp.zeros(()),
            "sign_sum": jnp.zeros(()),
            "n_pred": jnp.zeros(()),
        }
        (grads, aux, cl_state), _ = jax.lax.scan(
            scan_body, (zeros_like(d_and_head), init_aux, state.cl_state), (real_imgs, keys)
        )
        # the projection head trains with D's optimizer (as the DDP-wrapped
        # learner's parameters do in the reference, train.py:572-579)
        updates, d_opt_state = d_opt.update(grads, state.d_opt_state, d_and_head)
        d_params, cl_head = optax.apply_updates(d_and_head, updates)
        if cfg.contrastive_momentum > 0:
            from .contrastive import momentum_update

            cl_state = momentum_update(cl_state, d_params, cfg.contrastive_momentum)
        return (
            state.replace(
                d_params=d_params, cl_head=cl_head, d_opt_state=d_opt_state, cl_state=cl_state
            ),
            aux,
        )

    # ---------------- R1 phase (lazy, cond) ----------------
    # reg_chunks splits each microbatch into sequential chunks: the R1 grad
    # is a mean over samples, so Σ_chunks grad(mean_chunk)/k == grad(mean) —
    # exact, but the double-backward branch's peak HBM (D activations + the
    # grad-of-grad graph) scales with the chunk size, not the batch
    reg_k = max(1, cfg.reg_chunks)
    if cfg.batch_size % reg_k != 0:
        raise ValueError(f"reg_chunks ({reg_k}) must divide batch_size ({cfg.batch_size})")
    if reg_k > 1 and (cfg.batch_size // reg_k) % disc.stddev_group != 0:
        # minibatch-stddev pools contiguous groups of stddev_group samples;
        # chunks that are whole multiples of the group keep R1's D function
        # bitwise-identical to the unchunked batch — anything else silently
        # regroups the statistic (measured 2% R1 drift at chunk 2, group 4)
        raise ValueError(
            f"batch_size/reg_chunks ({cfg.batch_size // reg_k}) must be a "
            f"multiple of the discriminator stddev group ({disc.stddev_group})"
        )

    def r1_loss_fn(d_params, real, rng, ada_p):
        # R1 is computed on RAW (un-augmented) reals like the reference
        # (train.py:195-205). The batch is reused from the D phase (a fresh
        # loader draw can't thread through the jitted step signature) —
        # equivalent in distribution since the loader shuffles every epoch.
        del rng, ada_p

        def scalar_pred(x):
            return jnp.sum(d_apply(d_params, x))

        grad_img = jax.grad(scalar_pred)(real)
        r1 = 0.5 * jnp.mean(jnp.sum(jnp.square(grad_img.reshape(grad_img.shape[0], -1)), axis=1))
        return cfg.r1 * cfg.d_reg_every * r1 / (cfg.num_accumulate * reg_k), r1 / reg_k

    def r1_phase(state: GANTrainState, real_imgs, rng):
        def scan_body(carry, inp):
            grads_acc, r1_acc = carry
            real, key = inp
            (_, r1), grads = jax.value_and_grad(r1_loss_fn, has_aux=True)(
                state.d_params, real, key, state.ada_p
            )
            return (jax.tree_util.tree_map(jnp.add, grads_acc, grads), r1_acc + r1), None

        a, b = real_imgs.shape[0], real_imgs.shape[1]
        chunked = real_imgs.reshape(a * reg_k, b // reg_k, *real_imgs.shape[2:])
        keys = jax.random.split(rng, a * reg_k)
        (grads, r1_sum), _ = jax.lax.scan(
            scan_body, (zeros_like(state.d_params), jnp.zeros(())), (chunked, keys)
        )
        # optimizer state spans (d_params, cl_head); R1 touches only D
        d_and_head = (state.d_params, state.cl_head)
        grads_pair = (grads, zeros_like(state.cl_head))
        updates, d_opt_state = d_opt.update(grads_pair, state.d_opt_state, d_and_head)
        d_params, cl_head = optax.apply_updates(d_and_head, updates)
        return state.replace(d_params=d_params, cl_head=cl_head, d_opt_state=d_opt_state), r1_sum

    # ---------------- G phase ----------------
    g_synth = jax.checkpoint(synth) if cfg.remat_synth else synth

    def g_loss_fn(g_params, d_params, buffers, rng, ada_p, batch):
        kw, kn, ka = jax.random.split(rng, 3)
        wplus = _mixed_wplus(gen, g_params, buffers, kw, batch, cfg)
        fake = g_synth(g_params, wplus, kn, buffers)
        if cfg.augment:
            if cfg.bf16:  # see d_microbatch_loss — bf16 augment is the MXU path
                fake = fake.astype(jnp.bfloat16)
            fake, _ = augment(fake, ada_p, rng=ka, fast_warp=cfg.ada_fast_warp, warp_method=cfg.ada_warp_method,
                                  fft_taper=cfg.ada_fft_taper, fft_taper_conditional=cfg.ada_fft_taper_conditional)
        loss = g_nonsaturating_loss(d_apply(d_params, fake))
        return loss / cfg.num_accumulate, loss

    def g_phase(state: GANTrainState, rng):
        def scan_body(carry, key):
            grads_acc, loss_acc = carry
            (_, loss), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
                state.g_params, state.d_params, state.g_buffers, key, state.ada_p, cfg.batch_size
            )
            return (jax.tree_util.tree_map(jnp.add, grads_acc, grads), loss_acc + loss), None

        keys = jax.random.split(rng, cfg.num_accumulate)
        (grads, loss_sum), _ = jax.lax.scan(
            scan_body, (zeros_like(state.g_params), jnp.zeros(())), keys
        )
        updates, g_opt_state = g_opt.update(grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        return state.replace(g_params=g_params, g_opt_state=g_opt_state), loss_sum

    # ---------------- path-length phase (lazy, cond) ----------------
    # reg_chunks: each chunk draws its own fresh latents at path_batch/k (the
    # same estimator family as path_batch_shrink itself, reference
    # train.py:242-249); the EMA path mean updates once per chunk instead of
    # once per microbatch (decay 0.01 — negligible schedule difference)
    path_batch = max(1, cfg.batch_size // max(cfg.path_batch_shrink, 1) // reg_k)

    def path_loss_fn(g_params, buffers, rng, mean_path_length):
        kw, kn, kimg = jax.random.split(rng, 3)
        wplus = _mixed_wplus(gen, g_params, buffers, kw, path_batch, cfg)

        def image_of(lat):
            return synth(g_params, lat, kn, buffers)

        img_shape = jax.eval_shape(image_of, wplus).shape
        h, w = img_shape[-2], img_shape[-1]
        img_noise = jax.random.normal(kimg, img_shape) / math.sqrt(h * w)

        def proj(lat):
            return jnp.sum(image_of(lat) * img_noise)

        grad_lat = jax.grad(proj)(wplus)
        path_lengths = jnp.sqrt(jnp.mean(jnp.sum(jnp.square(grad_lat), axis=2), axis=1))
        path_mean = mean_path_length + 0.01 * (jnp.mean(path_lengths) - mean_path_length)
        penalty = jnp.mean(jnp.square(path_lengths - path_mean))
        path_mean = jnp.where(jnp.isnan(path_mean), mean_path_length, path_mean)
        loss = cfg.path_regularize * cfg.g_reg_every * penalty / (cfg.num_accumulate * reg_k)
        return loss, (penalty / reg_k, jax.lax.stop_gradient(path_mean))

    def path_phase(state: GANTrainState, rng):
        def scan_body(carry, key):
            grads_acc, pen_acc, mpl = carry
            (_, (pen, mpl)), grads = jax.value_and_grad(path_loss_fn, has_aux=True)(
                state.g_params, state.g_buffers, key, mpl
            )
            return (jax.tree_util.tree_map(jnp.add, grads_acc, grads), pen_acc + pen, mpl), None

        keys = jax.random.split(rng, cfg.num_accumulate * reg_k)
        (grads, pen_sum, mpl), _ = jax.lax.scan(
            scan_body,
            (zeros_like(state.g_params), jnp.zeros(()), state.mean_path_length),
            keys,
        )
        updates, g_opt_state = g_opt.update(grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        return (
            state.replace(g_params=g_params, g_opt_state=g_opt_state, mean_path_length=mpl),
            pen_sum,
        )

    # ---------------- ADA p-adaptation (between R1 and G, train.py:207-224) --
    def ada_phase(state: GANTrainState, d_aux):
        """ADA p-adaptation from the D phase's real-pred sign stats; the sign
        sums are global already (batch dim sharded -> XLA all-reduces them —
        the psum the reference does by hand, distributed.py:42-52)."""
        if cfg.augment and cfg.augment_p == 0:
            signs = state.ada_signs + d_aux["sign_sum"]
            n = state.ada_n + d_aux["n_pred"]
            new_p, signs, n, r_t = ada_adjust_p(
                state.ada_p, signs, n, cfg.ada_target, cfg.ada_length
            )
            state = state.replace(ada_p=new_p, ada_signs=signs, ada_n=n)
        else:
            r_t = jnp.zeros(())
        return state, r_t

    # ---------------- tail: lookahead-minimax + EMA ----------------
    def tail(state: GANTrainState):
        """After the fwd/bwd phases: lookahead-minimax joint slow-weight sync
        (lookahead_minimax.py:135-186), EMA (train.py:45-49,251), step bump."""
        if cfg.lookahead and state.lookahead is not None:
            la, g_params, d_params = lookahead_minimax_step(
                state.lookahead, state.g_params, state.d_params, cfg.la_steps, cfg.la_alpha
            )
            state = state.replace(lookahead=la, g_params=g_params, d_params=d_params)

        g_ema = ema_update(state.g_ema_params, state.g_params, cfg.ema_decay)
        return state.replace(g_ema_params=g_ema, step=state.step + 1)

    return {
        "d": d_phase, "r1": r1_phase, "ada": ada_phase,
        "g": g_phase, "path": path_phase, "tail": tail,
    }


def make_train_step(gen: Generator, disc: Discriminator, cfg: TrainConfig):
    """Build the jittable train_step(state, real_imgs, rng) -> (state, metrics).

    real_imgs: [num_accumulate, batch, 3, size, size] float in [-1, 1], OR
    [num_accumulate, batch, size, size, 3] uint8 straight from the decoder —
    the uint8 form is transposed + normalized on device (4x less host->device
    traffic; the TPU-idiomatic input pipeline). The choice is static at trace
    time (dtype is part of the jit signature).
    """
    phases = make_train_phases(gen, disc, cfg)
    d_phase, r1_phase, ada_phase = phases["d"], phases["r1"], phases["ada"]
    g_phase, path_phase, tail = phases["g"], phases["path"], phases["tail"]

    def train_step(state: GANTrainState, real_imgs: Array, rng: jax.Array):
        """real_imgs: [A, B, 3, H, W] float in [-1,1] or [A, B, H, W, 3] uint8."""
        # trace-time layout guard: dtype alone must not pick the layout —
        # an fp32-NHWC (or uint8-CHW) batch would be consumed as garbage
        chan_axis = 4 if real_imgs.dtype == jnp.uint8 else 2
        if real_imgs.ndim != 5 or real_imgs.shape[chan_axis] != 3:
            raise ValueError(
                f"train_step expects {'[A,B,H,W,3] uint8' if real_imgs.dtype == jnp.uint8 else '[A,B,3,H,W] float'}"
                f", got {real_imgs.dtype} {real_imgs.shape}"
            )
        if real_imgs.dtype == jnp.uint8:
            # same formula as the host converter (native/convert.cpp:19-29)
            real_imgs = (
                jnp.transpose(real_imgs, (0, 1, 4, 2, 3)).astype(jnp.float32)
                * (1.0 / 127.5) - 1.0
            )
        k_d, k_r1, k_g, k_path = jax.random.split(rng, 4)

        state, d_aux = d_phase(state, real_imgs, k_d)

        do_r1 = (cfg.r1 > 0) and True
        if do_r1:
            state, r1_val = jax.lax.cond(
                state.step % cfg.d_reg_every == 0,
                lambda s: r1_phase(s, real_imgs, k_r1),
                lambda s: (s, jnp.zeros(())),
                state,
            )
        else:
            r1_val = jnp.zeros(())

        state, r_t = ada_phase(state, d_aux)

        state, g_loss = g_phase(state, k_g)

        if cfg.path_regularize > 0:
            state, path_pen = jax.lax.cond(
                state.step % cfg.g_reg_every == 0,
                lambda s: path_phase(s, k_path),
                lambda s: (s, jnp.zeros(())),
                state,
            )
        else:
            path_pen = jnp.zeros(())

        state = tail(state)

        n_acc = cfg.num_accumulate
        metrics = {
            "Generator": g_loss / n_acc,
            "Discriminator": d_aux["d_loss"] / n_acc,
            "Real Score": d_aux["real_score"] / n_acc,
            "Fake Score": d_aux["fake_score"] / n_acc,
            "R1 Penalty": r1_val / n_acc,
            "Path Length Regularization": path_pen / n_acc,
            "Rt": r_t,
            "Augment": state.ada_p,
            "Mean Path Length": state.mean_path_length,
        }
        return state, metrics

    return train_step
