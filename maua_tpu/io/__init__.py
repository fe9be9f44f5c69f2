"""L2 IO: torch-checkpoint ingestion, native orbax checkpoints, datasets."""

from .torch_ckpt import (
    discriminator_variables_from_torch,
    generator_variables_from_torch,
    infer_generator_config,
    load_generator,
    load_torch_checkpoint,
)

__all__ = [
    "discriminator_variables_from_torch",
    "generator_variables_from_torch",
    "infer_generator_config",
    "load_generator",
    "load_torch_checkpoint",
]
