"""Test config: run everything on CPU with 8 virtual devices so that
multi-chip sharding tests (SURVEY.md §4.5) work without a TPU pod."""
import os

# The session environment pins JAX_PLATFORMS to the TPU tunnel; tests must
# run on host CPU with a virtual 8-device mesh, so force-override.  The env
# var alone is not enough: a sitecustomize hook may import jax at interpreter
# start (before this file runs), so also override via jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running (production-scale shapes on CPU)"
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
