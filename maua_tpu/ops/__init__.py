"""L1 compute primitives (reference: op/ CUDA kernels, rebuilt for XLA/TPU)."""

from .fused_act import fused_leaky_relu, leaky_relu_gain
from .upfirdn2d import setup_filter, upfirdn2d, upfirdn2d_native

__all__ = [
    "fused_leaky_relu",
    "leaky_relu_gain",
    "setup_filter",
    "upfirdn2d",
    "upfirdn2d_native",
]
