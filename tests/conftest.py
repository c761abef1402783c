"""Test harness configuration: force CPU backend with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (the standard JAX
host-platform trick; SURVEY.md section 4 test plan)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override (the session may set axon/tpu)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The session's TPU plugin ignores the JAX_PLATFORMS env var; force via config.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
