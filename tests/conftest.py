"""Test harness: force an 8-device virtual CPU mesh so data-parallel and
frame-sharded code paths are exercised without TPU hardware (SURVEY.md §4).

The session environment registers a tunneled real TPU chip ('axon' platform)
via sitecustomize and pins jax_platforms='axon,cpu' — tests must NOT run over
that tunnel, so we re-point the config at cpu and drop any initialized
backends before the CPU client (and its device-count flag) is created.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends  # noqa: E402

    clear_backends()
except Exception:
    pass

jax.config.update("jax_enable_x64", False)

# persistent compile cache, keyed by host CPU features: a shared dir served
# AOT executables compiled on a previous (different) node — SIGSEGV executing
# them (see maua_tpu/compile_cache.py)
from maua_tpu.compile_cache import setup_compile_cache  # noqa: E402

setup_compile_cache()

assert jax.devices()[0].platform == "cpu", jax.devices()


def pytest_collection_modifyitems(session, config, items):
    """Run the subprocess-launching CLI tests FIRST: their child processes
    need a quiet host, and on this 1-core box the parent's accumulated RSS +
    jit caches after ~200 tests measurably raise the child SIGSEGV rate
    (round-3 full-suite failure of test_train_cli_two_process). Alphabetical
    order already put them early; make it explicit and total."""
    items.sort(key=lambda it: 0 if "test_cli_train" in it.nodeid else 1)
