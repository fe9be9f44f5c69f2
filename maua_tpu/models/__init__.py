"""L3 model families (reference: models/ + lucidrains.py)."""

from .stylegan2 import (
    Discriminator,
    Generator,
    MappingNetwork,
    auto_s2d_min_res,
    channel_map,
    noise_shapes,
)
from .stylegan1 import StyleGAN1, load_stylegan1, stylegan1_variables_from_torch

__all__ = [
    "Discriminator",
    "Generator",
    "MappingNetwork",
    "auto_s2d_min_res",
    "channel_map",
    "noise_shapes",
    "StyleGAN1",
    "load_stylegan1",
    "stylegan1_variables_from_torch",
]
