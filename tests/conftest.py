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
# AGARCL_NO_CACHE=1 bypasses the persistent cache. The cache dir is
# per-xdist-worker (gw0/gw1/... are stable across runs, so the caches
# stay warm): two workers compiling the same program concurrently tear
# the shared entry, and later reads SEGFAULT/abort inside
# get_executable_and_time — a cold-cache `-n 2` run crashed a worker
# twice in round 5 before this split.
if not os.environ.get("AGARCL_NO_CACHE"):
    worker = os.environ.get("PYTEST_XDIST_WORKER", "gw")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   f".jax_cache_{worker}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
