"""Test harness: force an 8-device virtual CPU platform so the suite runs
fast and deterministically without TPU hardware (and without contending for
the single tunneled chip), per the build-environment contract.

Note: the axon sitecustomize sets jax_platforms='axon,cpu' via jax.config at
interpreter start, which overrides the JAX_PLATFORMS env var — so we must
override the config again after importing jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# AGARCL_NO_CACHE=1 bypasses the persistent cache: concurrent pytest runs
# can tear cache files and later reads then SEGFAULT inside
# backend.deserialize_executable (seen after parallel suite runs)
if not os.environ.get("AGARCL_NO_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
