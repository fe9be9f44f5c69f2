"""Device-memory tracing.

Reference: gpu_profile.py — a sys.settrace line profiler logging >256MB GPU
memory deltas with live-tensor diffs (py3nvml). The JAX-native equivalents:

* `memory_snapshot()` / `log_memory_deltas()` — per-call HBM deltas from
  device.memory_stats(), the coarse-grained replacement for the line tracer
  (XLA allocates per-program, so per-python-line attribution is meaningless
  under jit; per-jitted-call deltas are the useful granularity).
* `save_device_memory_profile(path)` — pprof-format allocation dump via
  jax.profiler for offline analysis (the equivalent of the .prof.txt logs).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


def memory_snapshot(device: Optional[jax.Device] = None) -> dict[str, int]:
    dev = device or jax.devices()[0]
    try:
        return dict(dev.memory_stats() or {})
    except Exception:
        return {}


@contextlib.contextmanager
def log_memory_deltas(label: str, threshold_mb: float = 256.0, sink=print) -> Iterator[None]:
    """Log HBM deltas over a region when they exceed threshold_mb (the
    reference's >256MB line-delta rule, gpu_profile.py:28-110)."""
    before = memory_snapshot()
    yield
    after = memory_snapshot()
    delta = after.get("bytes_in_use", 0) - before.get("bytes_in_use", 0)
    if abs(delta) >= threshold_mb * 1024 * 1024:
        peak = after.get("peak_bytes_in_use", 0)
        sink(f"[mem] {label}: Δ{delta / 1e6:+.0f} MB (in_use {after.get('bytes_in_use', 0) / 1e6:.0f} MB, peak {peak / 1e6:.0f} MB)")


def save_device_memory_profile(path: str) -> None:
    """Dump a pprof device-memory profile (jax.profiler)."""
    jax.profiler.save_device_memory_profile(path)
