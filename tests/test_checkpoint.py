"""Checkpoint save/restore round-trip + torch-resume mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.train import init_train_state, make_train_config
from maua_tpu.train.checkpoint import (
    latest_checkpoint,
    load_torch_training_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def tiny_state():
    cfg = make_train_config(size=16, batch_size=2, lookahead=True, channel_max=32)
    state, gen, disc = init_train_state(jax.random.PRNGKey(0), cfg)
    return cfg, state, gen, disc


def test_orbax_roundtrip(tiny_state, tmp_path):
    cfg, state, gen, disc = tiny_state
    d = str(tmp_path / "ckpts")
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    path = save_checkpoint(d, state)
    assert latest_checkpoint(d) == path

    cfg2 = make_train_config(size=16, batch_size=2, lookahead=True, channel_max=32)
    template, _, _ = init_train_state(jax.random.PRNGKey(99), cfg2)
    restored = restore_checkpoint(path, template)
    assert int(restored.step) == 42
    a = jax.tree_util.tree_leaves(state.g_params)[0]
    b = jax.tree_util.tree_leaves(restored.g_params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_torch_resume_full_and_mapping_only(tiny_state, tmp_path):
    import torch

    from test_torch_ckpt import _flax_gen_to_torch_sd

    cfg, state, gen, disc = tiny_state
    # fabricate a torch ckpt from a DIFFERENT init
    other, gen2, _ = init_train_state(jax.random.PRNGKey(7), cfg)
    sd = _flax_gen_to_torch_sd({"params": other.g_params, "buffers": other.g_buffers}, gen2)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    p = str(tmp_path / "ckpt_000123.pt")
    torch.save({"g": sd, "g_ema": sd}, p)

    resumed = load_torch_training_checkpoint(p, state)
    assert int(resumed.step) == 123
    got = np.asarray(resumed.g_params["style"]["dense_0"]["weight"])
    want = np.asarray(other.g_params["style"]["dense_0"]["weight"])
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # transfer_mapping_only: style MLP replaced, synthesis untouched
    mapped = load_torch_training_checkpoint(p, state, transfer_mapping_only=True)
    np.testing.assert_allclose(
        np.asarray(mapped.g_params["style"]["dense_0"]["weight"]), want, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(mapped.g_params["conv1"]["conv"]["weight"]),
        np.asarray(state.g_params["conv1"]["conv"]["weight"]),
        rtol=1e-6,
    )
