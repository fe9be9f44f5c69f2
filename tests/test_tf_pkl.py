"""TF .pkl converter tests: fabricate a dnnlib-style pickle (with fake
dnnlib modules), load without dnnlib, synthesize."""

import math
import pickle
import sys
import types

import jax
import numpy as np
import pytest

from maua_tpu.io.tf_pkl import load_tf_generator, load_tf_pickle_networks


def _fake_dnnlib_modules():
    """Install minimal fake dnnlib modules so pickling produces the real
    module path 'dnnlib.tflib.network.Network'."""
    dnnlib = types.ModuleType("dnnlib")
    tflib = types.ModuleType("dnnlib.tflib")
    network = types.ModuleType("dnnlib.tflib.network")

    class Network:
        def __init__(self, state=None):
            self._state = state or {}

        def __getstate__(self):
            return self._state

        def __setstate__(self, state):
            self._state = state

    # make the class picklable under the real dnnlib path
    Network.__module__ = "dnnlib.tflib.network"
    Network.__qualname__ = "Network"
    network.Network = Network
    tflib.network = network
    dnnlib.tflib = tflib
    sys.modules["dnnlib"] = dnnlib
    sys.modules["dnnlib.tflib"] = tflib
    sys.modules["dnnlib.tflib.network"] = network
    return Network


def fabricate_tf_pkl(path, size=16, style_dim=64, n_mlp=2, ch=32):
    Network = _fake_dnnlib_modules()
    rng = np.random.RandomState(0)
    log = int(math.log2(size))

    variables = []
    for i in range(n_mlp):
        variables.append((f"G_mapping/Dense{i}/weight", rng.randn(style_dim, style_dim).astype(np.float32)))
        variables.append((f"G_mapping/Dense{i}/bias", np.zeros(style_dim, np.float32)))
    variables.append(("G_synthesis/4x4/Const/const", rng.randn(1, ch, 4, 4).astype(np.float32)))

    def conv_vars(prefix, cin, cout):
        variables.extend(
            [
                (f"{prefix}/weight", (0.1 * rng.randn(3, 3, cin, cout)).astype(np.float32)),  # hwio
                (f"{prefix}/mod_weight", (0.1 * rng.randn(style_dim, cin)).astype(np.float32)),
                (f"{prefix}/mod_bias", np.zeros(cin, np.float32)),
                (f"{prefix}/noise_strength", np.float32(0.0)),
                (f"{prefix}/bias", np.zeros(cout, np.float32)),
            ]
        )

    def torgb_vars(prefix, cin):
        variables.extend(
            [
                (f"{prefix}/weight", (0.1 * rng.randn(1, 1, cin, 3)).astype(np.float32)),
                (f"{prefix}/mod_weight", (0.1 * rng.randn(style_dim, cin)).astype(np.float32)),
                (f"{prefix}/mod_bias", np.zeros(cin, np.float32)),
                (f"{prefix}/bias", np.zeros(3, np.float32)),
            ]
        )

    conv_vars("G_synthesis/4x4/Conv", ch, ch)
    torgb_vars("G_synthesis/4x4/ToRGB", ch)
    for i in range(log - 2):
        reso = 4 * 2 ** (i + 1)
        conv_vars(f"G_synthesis/{reso}x{reso}/Conv0_up", ch, ch)
        conv_vars(f"G_synthesis/{reso}x{reso}/Conv1", ch, ch)
        torgb_vars(f"G_synthesis/{reso}x{reso}/ToRGB", ch)
    for i in range((log - 2) * 2 + 1):
        res = (i + 5) // 2
        variables.append((f"G_synthesis/noise{i}", rng.randn(1, 1, 2**res, 2**res).astype(np.float32)))

    state = {
        "name": "Gs",
        "static_kwargs": {"resolution": size},
        "variables": variables,
        "components": {},
    }
    gs = Network(state)
    with open(path, "wb") as f:
        pickle.dump((None, None, gs), f)

    # remove the fake modules so loading must work WITHOUT dnnlib
    for m in ["dnnlib", "dnnlib.tflib", "dnnlib.tflib.network"]:
        sys.modules.pop(m, None)


def test_load_tf_pickle_without_dnnlib(tmp_path):
    p = str(tmp_path / "net.pkl")
    fabricate_tf_pkl(p)
    assert "dnnlib" not in sys.modules
    nets = load_tf_pickle_networks(p)
    assert "Gs" in nets
    assert "G_mapping/Dense0/weight" in nets["Gs"].variables


def test_tf_generator_synthesizes(tmp_path):
    p = str(tmp_path / "net.pkl")
    fabricate_tf_pkl(p, size=16, ch=32)
    gen, variables = load_tf_generator(p)
    assert gen.size == 16
    z = jax.random.normal(jax.random.PRNGKey(0), (2, gen.style_dim))
    img, _ = gen.apply(variables, z, randomize_noise=False)
    assert img.shape == (2, 3, 16, 16)
    assert np.isfinite(np.asarray(img)).all()
