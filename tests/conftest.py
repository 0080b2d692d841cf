"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/mesh tests work in
a single process (the driver benches on real TPU separately); this
also keeps jit compile times in the suite tolerable and deterministic.

The container's sitecustomize eagerly registers the axon TPU plugin,
so setting JAX_PLATFORMS env here is too late — we must force the
platform through jax.config before any backend use.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
