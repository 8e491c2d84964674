"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU: data-parallel semantics (sharded batches,
gradient reduction, metric psums) are exercised on 8 virtual CPU devices,
the strategy SURVEY.md §4 prescribes. The axon TPU plugin ignores the
JAX_PLATFORMS env var, so the platform is forced via jax.config before any
backend initializes.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
