"""L3 model families (reference: models/ + lucidrains.py)."""

from .stylegan2 import Discriminator, Generator, MappingNetwork, channel_map, noise_shapes

__all__ = ["Discriminator", "Generator", "MappingNetwork", "channel_map", "noise_shapes"]
