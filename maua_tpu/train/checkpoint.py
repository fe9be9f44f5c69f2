"""Checkpoint save/resume.

Reference semantics (reference: train.py:324-345 save {g, d, g_ema, g_optim,
d_optim} every checkpoint_every; resume train.py:522-553 incl.
`transfer_mapping_only` which loads just the style MLP). Native format is
orbax (async-capable, TPU-friendly); ingestion of the reference's torch .pt
checkpoints goes through io/torch_ckpt.py.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np

from .step import GANTrainState


def save_checkpoint(ckpt_dir: str, state: GANTrainState, step: Optional[int] = None, keep: int = 5) -> str:
    """Orbax save of the full train state; returns the checkpoint path."""
    import orbax.checkpoint as ocp

    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:07d}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()

    # retention: drop oldest beyond `keep`
    ckpts = sorted(
        d for d in os.listdir(ckpt_dir) if re.fullmatch(r"step_\d+", d)
    )
    for old in ckpts[:-keep]:
        import shutil

        shutil.rmtree(os.path.join(ckpt_dir, old), ignore_errors=True)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = sorted(d for d in os.listdir(ckpt_dir) if re.fullmatch(r"step_\d+", d))
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


def restore_checkpoint(path: str, template: GANTrainState) -> GANTrainState:
    """Restore into the structure of `template` (from init_train_state)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, jax.device_get(template))


def load_torch_training_checkpoint(
    path: str,
    state: GANTrainState,
    transfer_mapping_only: bool = False,
) -> GANTrainState:
    """Resume from a reference-format torch checkpoint: maps g/d/g_ema state
    dicts onto the flax params (reference: train.py:522-553). Optimizer moment
    tensors are NOT ported (Adam moments restart — the reference's lookahead
    wrapper also re-inits its slow-weight cache on load,
    lookahead_minimax.py:79-98)."""
    from ..io.torch_ckpt import (
        discriminator_variables_from_torch,
        generator_variables_from_torch,
        load_torch_checkpoint,
    )

    ckpt = load_torch_checkpoint(path)

    if transfer_mapping_only:
        g_vars = generator_variables_from_torch(ckpt["g"]) if "g" in ckpt else None
        if g_vars is not None:
            new_g = dict(state.g_params)
            new_g["style"] = g_vars["params"]["style"]
            state = state.replace(g_params=new_g)
        e_vars = generator_variables_from_torch(ckpt["g_ema"]) if "g_ema" in ckpt else None
        if e_vars is not None:
            new_e = dict(state.g_ema_params)
            new_e["style"] = e_vars["params"]["style"]
            state = state.replace(g_ema_params=new_e)
        return state

    if "g" in ckpt:
        g_vars = generator_variables_from_torch(ckpt["g"])
        state = state.replace(g_params=g_vars["params"], g_buffers=g_vars.get("buffers", state.g_buffers))
    if "g_ema" in ckpt:
        state = state.replace(g_ema_params=generator_variables_from_torch(ckpt["g_ema"])["params"])
    if "d" in ckpt:
        state = state.replace(d_params=discriminator_variables_from_torch(ckpt["d"])["params"])

    # start_iter from the filename when parseable (train.py:527-531)
    m = re.search(r"(\d+)", os.path.basename(path))
    if m:
        state = state.replace(step=np.int32(int(m.group(1))))
    return state
