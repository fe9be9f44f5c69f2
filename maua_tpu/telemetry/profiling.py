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


_COMPILE_EVENT_TOTALS: dict[str, float] = {}
_COMPILE_EVENT_COUNTS: dict[str, int] = {}
_LISTENER_INSTALLED = False


def _on_event_duration(event: str, duration_secs: float, **_meta) -> None:
    _COMPILE_EVENT_TOTALS[event] = _COMPILE_EVENT_TOTALS.get(event, 0.0) + float(duration_secs)
    _COMPILE_EVENT_COUNTS[event] = _COMPILE_EVENT_COUNTS.get(event, 0) + 1


def install_compile_metrics() -> bool:
    """Start accumulating jax's internal event durations (trace/lower/compile
    times per executable). Idempotent; returns False when the monitoring hook
    is unavailable in this jax build."""
    global _LISTENER_INSTALLED
    if _LISTENER_INSTALLED:
        return True
    try:
        from jax._src import monitoring

        monitoring.register_event_duration_secs_listener(_on_event_duration)
    except Exception:
        return False
    _LISTENER_INSTALLED = True
    return True


def log_compile_stats() -> dict[str, float]:
    """Snapshot of accumulated compilation-time counters — the out-of-band
    compiler-health channel (gpumon.py's analogue for XLA). Keys are jax's
    event names (e.g. .../backend_compile_time) plus a `<event>/count` entry.
    Call `install_compile_metrics()` first (the train CLI does)."""
    out: dict[str, float] = {}
    for k, total in _COMPILE_EVENT_TOTALS.items():
        out[k] = total
        out[f"{k}/count"] = float(_COMPILE_EVENT_COUNTS[k])
    return out
