"""Test harness: force a virtual 8-device CPU platform.

This is the JAX-native way to exercise multi-chip sharding logic without TPU
hardware (SURVEY.md §4): every sharding/pjit test sees 8 devices. Note the axon
TPU plugin in this image ignores the ``JAX_PLATFORMS`` env var, so the platform
is forced via ``jax.config`` (set ``TEAM_TESTS_TPU=1`` to run the suite on the
real chip instead, e.g. for the Pallas kernel tests).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not os.environ.get("TEAM_TESTS_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
