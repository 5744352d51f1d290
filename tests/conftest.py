"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4).

Note: this environment pre-sets JAX_PLATFORMS=axon and the plugin wins over
the env var, so we must force the platform through jax.config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on this single-core
# box (full train-step compiles take minutes); repeated runs hit the cache.
from gshell_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache("/root/.cache/gshell_jax_cache_tests")
