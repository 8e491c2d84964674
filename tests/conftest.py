"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU: data-parallel semantics (sharded batches,
gradient reduction, metric psums) are exercised on 8 virtual CPU devices,
the strategy SURVEY.md §4 prescribes. The axon TPU plugin ignores the
JAX_PLATFORMS env var, so the platform is forced via jax.config before any
backend initializes.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compilation cache: the detector/train-step compiles dominate
# suite wall time; repeat runs hit the cache and finish in minutes
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("CRCT_JAX_CACHE", "/tmp/crct_jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
