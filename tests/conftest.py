"""Test configuration: force an 8-device virtual CPU platform *before* any
computation, so data-parallel mesh tests run without TPU hardware
(SURVEY.md §4.3). Note the axon TPU plugin ignores the JAX_PLATFORMS env var,
so the config API is used instead."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
