"""Test harness: force CPU with 8 virtual devices so multi-chip sharding is
exercised without TPUs (mirrors how the driver dry-runs the multichip path).

NOTE: in this environment a sitecustomize registers the TPU ('axon') platform
and overrides the JAX_PLATFORMS env var, so we must ALSO force the platform
through jax.config after import — env alone is not honored.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
