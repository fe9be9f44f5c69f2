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

# persistent compile cache: the suite is compile-bound on this 1-core box;
# repeat runs hit the cache and skip XLA backend compiles entirely
os.makedirs(os.path.expanduser("~/.cache/jax_comp_cache"), exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
