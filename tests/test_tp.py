"""Tensor-parallel extension tests: channel-sharded synthesis on a 2x4
(data x model) CPU mesh must match the replicated result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.models import Generator
from maua_tpu.parallel import (
    MODEL_AXIS,
    generator_param_shardings,
    get_2d_mesh,
    shard_generator_params,
)
from jax.sharding import NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = Generator(size=32, style_dim=32, n_mlp=2, channel_multiplier=1,
                    constant_input=True, channel_max=64)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32)),
    )
    return gen, variables


def test_sharding_specs_cover_conv_channels(gen_and_vars):
    gen, variables = gen_and_vars
    mesh = get_2d_mesh(2, 4)
    shardings = generator_param_shardings(variables["params"], mesh)
    conv_w = shardings["conv1"]["conv"]["weight"]
    assert conv_w.spec == P(MODEL_AXIS, None, None, None)
    # small heads stay replicated
    assert shardings["to_rgb1"]["conv"]["weight"].spec == P()
    assert shardings["style"]["dense_0"]["weight"].spec == P()


def test_tp_synthesis_matches_replicated(gen_and_vars):
    gen, variables = gen_and_vars
    mesh = get_2d_mesh(2, 4)

    z = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    want, _ = gen.apply(variables, z, randomize_noise=False)

    params_tp = shard_generator_params(variables["params"], mesh)
    buffers = jax.device_put(variables["buffers"], NamedSharding(mesh, P()))
    z_sharded = jax.device_put(z, NamedSharding(mesh, P("data")))

    @jax.jit
    def synth(p, b, z):
        img, _ = gen.apply({"params": p, "buffers": b}, z, randomize_noise=False)
        return img

    got = synth(params_tp, buffers, z_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_tp_synthesis_1024_shaped_with_s2d():
    """TP parity at the flagship 1024² GEOMETRY (channel_max-narrowed for the
    CPU mesh, as the model tests do) with polyphase s2d evaluation enabled —
    proves the channel shardings compose with the s2d phase layout's
    kernel-construction einsums, not just the 32² toy."""
    gen = Generator(
        size=1024, style_dim=32, n_mlp=1, channel_multiplier=2,
        channel_max=32, constant_input=True, s2d_min_res=512,
    )
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32)),
    )
    mesh = get_2d_mesh(2, 4)

    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    want, _ = jax.jit(
        lambda v, z: gen.apply(v, z, randomize_noise=False)
    )(variables, z)

    params_tp = shard_generator_params(variables["params"], mesh)
    # every 1024²-geometry conv is 32-out-channel -> must actually shard
    leaves_sharded = [
        s.spec for s in jax.tree_util.tree_leaves(
            generator_param_shardings(variables["params"], mesh),
            is_leaf=lambda x: isinstance(x, NamedSharding),
        )
        if s.spec != P()
    ]
    assert len(leaves_sharded) > 10, "expected conv kernels to shard at 1024² geometry"

    buffers = jax.device_put(variables["buffers"], NamedSharding(mesh, P()))
    z_sharded = jax.device_put(z, NamedSharding(mesh, P("data")))

    @jax.jit
    def synth(p, b, z):
        img, _ = gen.apply({"params": p, "buffers": b}, z, randomize_noise=False)
        return img

    got = synth(params_tp, buffers, z_sharded)
    assert got.shape == (2, 3, 1024, 1024)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-4)
