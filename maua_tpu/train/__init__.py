"""GAN training stack: losses, ADA augmentation, EMA, lookahead-minimax,
gradient accumulation, and the mesh-DP train step.

TPU-native rebuild of the reference trainer (reference: train.py:45-348,
augment.py, lookahead_minimax.py) — double-backward regularizers are nested
`jax.grad` (no custom kernel opcodes needed), gradient sync is a psum inside
one jitted step (no DDP hooks), ADA's r_t statistic is a pmean over the mesh
(reference: distributed.py:42-52, train.py:207-224).
"""

from .losses import (
    d_logistic_loss,
    g_nonsaturating_loss,
    d_r1_penalty,
    g_path_length_regularization,
)
from .ema import ema_update, EMA_DECAY_DEFAULT
from .lookahead import lookahead_minimax_init, lookahead_minimax_step, LookaheadState
from .augment import AugmentParams, augment, ada_adjust_p
from .step import (
    GANTrainState,
    make_train_config,
    init_train_state,
    make_train_phases,
    make_train_step,
    TrainConfig,
)
from .lucidrains_trainer import (
    LucidrainsConfig,
    LucidrainsTrainer,
    LucidrainsTrainState,
    NanException,
    diffgrad,
    init_lucidrains_state,
    make_lucidrains_train_step,
)

__all__ = [
    "d_logistic_loss",
    "g_nonsaturating_loss",
    "d_r1_penalty",
    "g_path_length_regularization",
    "ema_update",
    "EMA_DECAY_DEFAULT",
    "lookahead_minimax_init",
    "lookahead_minimax_step",
    "LookaheadState",
    "AugmentParams",
    "augment",
    "ada_adjust_p",
    "GANTrainState",
    "TrainConfig",
    "make_train_config",
    "init_train_state",
    "make_train_phases",
    "make_train_step",
    "LucidrainsConfig",
    "LucidrainsTrainer",
    "LucidrainsTrainState",
    "NanException",
    "diffgrad",
    "init_lucidrains_state",
    "make_lucidrains_train_step",
]
