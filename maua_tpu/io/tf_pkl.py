"""TF StyleGAN2 .pkl → maua_tpu variables (a WORKING weight converter).

The reference ships convert_weight.py but declares it broken
(reference: README.md:176, convert_weight.py:11 imports a nonexistent module
and needs a TF1 session). This converter needs neither TF nor dnnlib: a
custom Unpickler stubs out `dnnlib.tflib.network.Network` and captures its
pickled variable list directly (name → ndarray), then maps names with the
same rules as the reference converter (convert_weight.py:14-90):

  G_mapping/Dense{i}            dense [in,out]→ours [in,out] (torch transposes
                                twice, net effect identity for us)
  G_synthesis/{res}/Conv*       conv hwio→OIHW; Conv0_up additionally flips
                                spatial taps (convert_weight.py:34-36)
  mod_bias                      +1 folded in (modulation bias_init=1)
  noise_strength                scalar noise weight
  G_synthesis/noise{i}          stored noise buffers
"""

from __future__ import annotations

import io
import pickle
from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

__all__ = ["load_tf_pickle_networks", "generator_variables_from_tf", "load_tf_generator"]


class _NetworkStub:
    """Captures the pickled state of dnnlib.tflib.network.Network."""

    def __setstate__(self, state: dict):
        self.name = state.get("name")
        self.static_kwargs = dict(state.get("static_kwargs", {}))
        self.variables = {name: np.asarray(val) for name, val in state.get("variables", [])}
        self.components = dict(state.get("components", {}))


class _StubUnpickler(pickle.Unpickler):
    _PASSTHROUGH = {"EasyDict": dict}

    def find_class(self, module: str, name: str):
        if module.startswith("dnnlib") or module.startswith("torch_utils"):
            if name == "Network":
                return _NetworkStub
            if name in self._PASSTHROUGH:
                return self._PASSTHROUGH[name]

            class _Any(dict):
                def __setstate__(self, state):
                    if isinstance(state, dict):
                        self.update(state)

            return _Any
        return super().find_class(module, name)


def load_tf_pickle_networks(path: str) -> dict[str, _NetworkStub]:
    """Load a TF StyleGAN/StyleGAN2 pickle; returns {'G','D','Gs'} stubs
    (whichever are present)."""
    with open(path, "rb") as f:
        obj = _StubUnpickler(f).load()
    nets: dict[str, _NetworkStub] = {}
    if isinstance(obj, (tuple, list)):
        for name, net in zip(["G", "D", "Gs"], obj):
            if isinstance(net, _NetworkStub):
                nets[name] = net
    elif isinstance(obj, _NetworkStub):
        nets["Gs"] = obj
    elif isinstance(obj, dict):
        for k, v in obj.items():
            if isinstance(v, _NetworkStub):
                nets[k] = v
    if not nets:
        raise ValueError(f"{path}: no dnnlib Network objects found")
    # merge component variables (G_mapping/G_synthesis live in components)
    for net in nets.values():
        for comp_name, comp in net.components.items():
            if isinstance(comp, _NetworkStub):
                for vname, val in comp.variables.items():
                    net.variables.setdefault(f"{comp_name}/{vname}", val)
    return nets


def _modconv(v: Mapping[str, np.ndarray], src: str, flip: bool = False) -> dict[str, Any]:
    w = v[f"{src}/weight"].transpose(3, 2, 0, 1)  # hwio -> OIHW
    if flip:
        w = w[:, :, ::-1, ::-1]
    return {
        "weight": jnp.asarray(np.ascontiguousarray(w)),
        "modulation": {
            "weight": jnp.asarray(v[f"{src}/mod_weight"]),  # [in,out] already
            "bias": jnp.asarray(v[f"{src}/mod_bias"] + 1.0),
        },
    }


def _styled(v, src, flip=False) -> dict[str, Any]:
    return {
        "conv": _modconv(v, src, flip),
        "noise": {"weight": jnp.asarray(np.atleast_1d(v[f"{src}/noise_strength"]))},
        "act_bias": jnp.asarray(v[f"{src}/bias"]),
    }


def _torgb(v, src) -> dict[str, Any]:
    return {
        "conv": _modconv(v, src),
        "bias": jnp.asarray(v[f"{src}/bias"].reshape(1, 3, 1, 1)),
    }


def generator_variables_from_tf(net: _NetworkStub) -> tuple[dict[str, Any], dict[str, Any]]:
    """Map a Gs network onto maua_tpu Generator variables; returns
    (config, variables)."""
    v = net.variables
    res = int(net.static_kwargs.get("resolution", 0))
    if not res:
        res_names = [k.split("/")[1] for k in v if k.startswith("G_synthesis/") and "x" in k.split("/")[1]]
        res = max(int(r.split("x")[0]) for r in res_names)
    import math

    log_size = int(math.log2(res))

    params: dict[str, Any] = {}
    n_mlp = sum(1 for k in v if k.startswith("G_mapping/Dense") and k.endswith("/weight"))
    params["style"] = {
        f"dense_{i}": {
            "weight": jnp.asarray(v[f"G_mapping/Dense{i}/weight"]),
            "bias": jnp.asarray(v[f"G_mapping/Dense{i}/bias"]),
        }
        for i in range(n_mlp)
    }
    params["g_input"] = {"input": jnp.asarray(v["G_synthesis/4x4/Const/const"])}
    params["conv1"] = _styled(v, "G_synthesis/4x4/Conv")
    params["to_rgb1"] = _torgb(v, "G_synthesis/4x4/ToRGB")

    conv_i = 0
    for i in range(log_size - 2):
        reso = 4 * 2 ** (i + 1)
        params[f"convs_{conv_i}"] = _styled(v, f"G_synthesis/{reso}x{reso}/Conv0_up", flip=True)
        params[f"convs_{conv_i + 1}"] = _styled(v, f"G_synthesis/{reso}x{reso}/Conv1")
        params[f"to_rgbs_{i}"] = _torgb(v, f"G_synthesis/{reso}x{reso}/ToRGB")
        conv_i += 2

    buffers = {}
    for i in range((log_size - 2) * 2 + 1):
        key = f"G_synthesis/noise{i}"
        if key in v:
            buffers[f"noise_{i}"] = jnp.asarray(v[key])

    style_dim = int(v["G_mapping/Dense0/weight"].shape[0])
    widths = [int(v[f"G_synthesis/{4 * 2 ** (i + 1)}x{4 * 2 ** (i + 1)}/Conv1/weight"].shape[3]) for i in range(log_size - 2)]
    base64 = {64: 256, 128: 128, 256: 64, 512: 32, 1024: 16}
    channel_multiplier = 2
    if res >= 64:
        channel_multiplier = max(1, widths[-1] // base64[res])
    const_ch = int(v["G_synthesis/4x4/Const/const"].shape[1])
    config = dict(
        size=res,
        style_dim=style_dim,
        n_mlp=n_mlp,
        channel_multiplier=channel_multiplier,
        constant_input=True,
        channel_max=min(512, max(widths + [const_ch])),
    )
    return config, {"params": params, "buffers": buffers}


def load_tf_generator(path: str, key: str = "Gs", **overrides):
    """TF .pkl → (Generator, variables) — the working replacement for the
    reference's broken convert_weight.py."""
    from ..models import Generator

    nets = load_tf_pickle_networks(path)
    net = nets.get(key) or next(iter(nets.values()))
    config, variables = generator_variables_from_tf(net)
    config.update(overrides)
    return Generator(**config), variables
