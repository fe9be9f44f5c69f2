"""Evaluation: FID / PPL / PRDC / LPIPS.

Rebuilds reference validation/ (metrics.py, inception.py, lpips/) with the
same math; feature networks are flax re-implementations whose pretrained
weights ingest from the standard torch checkpoints (pytorch-fid InceptionV3,
torchvision VGG16/AlexNet + the richzhang LPIPS linear heads). Metrics are
network-agnostic so they are testable with small random feature nets.
"""

from .inception import InceptionV3, inception_variables_from_torch
from .lpips import LPIPS, lpips_variables_from_torch
from .metrics import (
    frechet_distance,
    compute_stats,
    fid_from_features,
    prdc,
    ppl,
    fid,
    vae_fid,
    weights_fingerprint,
)

__all__ = [
    "InceptionV3",
    "inception_variables_from_torch",
    "LPIPS",
    "lpips_variables_from_torch",
    "frechet_distance",
    "compute_stats",
    "fid_from_features",
    "prdc",
    "ppl",
    "fid",
    "vae_fid",
    "weights_fingerprint",
]
