"""Observability: profiler phases, device-memory stats, spectral-norm tracking.

TPU-native replacement of the reference's observability side-channel
(SURVEY.md §2.8): torch.autograd.profiler + NVTX phases (train_profile.py),
the sys.settrace GPU-memory line profiler (gpu_profile.py), nvidia-smi clock
daemon (gpumon.py), and spectral-norm instrumentation
(validation/spectral_norm.py).
"""

from .profiling import phase, profile_trace, device_memory_stats, log_compile_stats, install_compile_metrics
from .memory import memory_snapshot, log_memory_deltas, save_device_memory_profile
from .spectral import init_spectral_state, spectral_norms

__all__ = [
    "phase",
    "profile_trace",
    "device_memory_stats",
    "log_compile_stats",
    "install_compile_metrics",
    "init_spectral_state",
    "spectral_norms",
    "memory_snapshot",
    "log_memory_deltas",
    "save_device_memory_profile",
]
