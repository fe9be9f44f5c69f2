"""L2 IO: torch-checkpoint ingestion, TF-pkl conversion, orbax checkpoints."""

from .torch_ckpt import (
    discriminator_variables_from_torch,
    generator_variables_from_torch,
    infer_generator_config,
    load_generator,
    load_torch_checkpoint,
)
from .tf_pkl import load_tf_generator, load_tf_pickle_networks
from .torch_export import generator_state_dict_to_torch, save_torch_checkpoint

__all__ = [
    "discriminator_variables_from_torch",
    "generator_variables_from_torch",
    "infer_generator_config",
    "load_generator",
    "load_torch_checkpoint",
    "load_tf_generator",
    "load_tf_pickle_networks",
    "generator_state_dict_to_torch",
    "save_torch_checkpoint",
]
