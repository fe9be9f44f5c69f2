"""Checkpoint-ingestion tests: a synthetic rosinality-format state dict must
map onto the flax variable tree with identical structure, shapes, and values
(transposes/squeezes verified by round-trip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maua_tpu.io import (
    discriminator_variables_from_torch,
    generator_variables_from_torch,
    infer_generator_config,
)
from maua_tpu.models import Discriminator, Generator


def _flax_gen_to_torch_sd(variables, gen):
    """Fabricate a reference-format state dict from flax params — now a thin
    wrapper over the library exporter (io/torch_export.py) so tests and
    production share one mapping."""
    from maua_tpu.io import generator_state_dict_to_torch

    return generator_state_dict_to_torch(variables, gen)


@pytest.mark.parametrize("constant_input", [True, False])
def test_generator_roundtrip(constant_input):
    gen = Generator(size=32, style_dim=64, n_mlp=2, channel_multiplier=1, constant_input=constant_input, channel_max=64)
    z = jnp.zeros((1, 64))
    variables = gen.init({"params": jax.random.PRNGKey(0)}, z, randomize_noise=False)
    sd = _flax_gen_to_torch_sd(variables, gen)

    cfg = infer_generator_config(sd)
    assert cfg["size"] == 32 and cfg["style_dim"] == 64 and cfg["n_mlp"] == 2
    assert cfg["constant_input"] == constant_input

    loaded = generator_variables_from_torch(sd)
    # exact tree + value equality
    orig_flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    loaded_params = loaded["params"]
    for path, leaf in orig_flat:
        node = loaded_params
        for part in path:
            node = node[part.key]
        assert node.shape == leaf.shape, path
        np.testing.assert_array_equal(np.asarray(node), np.asarray(leaf))

    # converted checkpoint actually runs
    img, _ = gen.apply(loaded, jax.random.normal(jax.random.PRNGKey(1), (1, 64)), randomize_noise=False)
    orig_img, _ = gen.apply(variables, jax.random.normal(jax.random.PRNGKey(1), (1, 64)), randomize_noise=False)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(orig_img))


def test_discriminator_roundtrip():
    disc = Discriminator(size=32, channel_multiplier=1, channel_max=64)
    x = jnp.zeros((2, 3, 32, 32))
    variables = disc.init(jax.random.PRNGKey(0), x)
    p = variables["params"]

    sd = {}

    def put_convlayer(prefix, tree, downsample):
        idx = 1 if downsample else 0
        sd[f"{prefix}.{idx}.weight"] = np.asarray(tree["conv"]["weight"])
        if "bias" in tree["conv"]:
            sd[f"{prefix}.{idx}.bias"] = np.asarray(tree["conv"]["bias"])
        if "act_bias" in tree:
            sd[f"{prefix}.{idx + 1}.bias"] = np.asarray(tree["act_bias"])

    put_convlayer("convs.0", p["from_rgb"], False)
    blocks = sorted(int(k.split("_")[1]) for k in p if k.startswith("block_"))
    for j, res in enumerate(sorted(blocks, reverse=True)):
        put_convlayer(f"convs.{j + 1}.conv1", p[f"block_{res}"]["conv1"], False)
        put_convlayer(f"convs.{j + 1}.conv2", p[f"block_{res}"]["conv2"], True)
        put_convlayer(f"convs.{j + 1}.skip", p[f"block_{res}"]["skip"], True)
    put_convlayer("final_conv", p["final_conv"], False)
    sd["final_linear.0.weight"] = np.asarray(p["final_linear_0"]["weight"]).T
    sd["final_linear.0.bias"] = np.asarray(p["final_linear_0"]["bias"])
    sd["final_linear.1.weight"] = np.asarray(p["final_linear_1"]["weight"]).T
    sd["final_linear.1.bias"] = np.asarray(p["final_linear_1"]["bias"])

    loaded = discriminator_variables_from_torch(sd)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32))
    np.testing.assert_array_equal(
        np.asarray(disc.apply(loaded, x)), np.asarray(disc.apply(variables, x))
    )


def test_save_torch_checkpoint_roundtrips_through_loader(tmp_path):
    """Export .pt -> load_generator round trip (bidirectional interop)."""
    from maua_tpu.io import load_generator, save_torch_checkpoint

    gen = Generator(size=16, style_dim=32, n_mlp=1, channel_multiplier=1,
                    constant_input=True, channel_max=32)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, jnp.zeros((1, 32))
    )
    p = str(tmp_path / "exported.pt")
    save_torch_checkpoint(p, gen, variables)

    gen2, loaded = load_generator(p)
    assert gen2.size == 16
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    a, _ = gen.apply(variables, z, randomize_noise=False)
    b, _ = gen2.apply(loaded, z, randomize_noise=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_generator_ignores_conflicting_arch_overrides(tmp_path):
    """CLI defaults that disagree with the checkpoint (e.g. constant_input on
    a noconst ckpt, wrong size) must not build an unapplyable Generator: the
    state dict is authoritative for architecture keys — warn and proceed."""
    from maua_tpu.io import load_generator, save_torch_checkpoint

    gen = Generator(size=16, style_dim=32, n_mlp=1, channel_multiplier=1,
                    constant_input=False, channel_max=32)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, jnp.zeros((1, 32))
    )
    p = str(tmp_path / "noconst.pt")
    save_torch_checkpoint(p, gen, variables)

    with pytest.warns(UserWarning, match="constant_input"):
        gen2, loaded = load_generator(p, constant_input=True, size=1024, style_dim=512)
    assert gen2.size == 16 and not gen2.constant_input
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    img, _ = gen2.apply(loaded, z, randomize_noise=False)
    assert np.isfinite(np.asarray(img)).all()
