"""Host-keyed persistent XLA compile cache.

The persistent compilation cache stores CPU executables as AOT artifacts
specialized to the compiling host's CPU features. This environment's machines
get rescheduled (GKE), so a cache dir shared across hosts can serve artifacts
compiled for features the current host lacks — XLA's cpu_aot_loader warns
"Machine type used for XLA:CPU compilation doesn't match ... could lead to
execution errors such as SIGILL", and we observed an actual SIGSEGV executing
such a stale artifact mid-test-suite. Keying the directory by a hash of the
host's CPU flags makes a moved workload fall back to a cold (safe) cache
instead of crashing. TPU artifacts are target-keyed by XLA itself; they just
land in the per-host dir too, which only costs a recompile after a move.
"""

from __future__ import annotations

import hashlib
import os
import platform


def setup_compile_cache(min_compile_secs: float = 1.0) -> str:
    """Point jax at a per-host-CPU persistent compile cache; returns the dir."""
    import jax

    try:
        with open("/proc/cpuinfo") as f:
            sig = next(line for line in f if line.startswith("flags"))
    except Exception:
        sig = platform.processor() or platform.machine()
    key = hashlib.sha1(sig.encode()).hexdigest()[:10]
    cache_dir = os.path.expanduser(f"~/.cache/jax_comp_cache_{key}")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return cache_dir
