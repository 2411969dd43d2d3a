"""Test config: force an 8-device CPU platform so sharding tests run
anywhere (mirrors the driver's dryrun_multichip environment).

Note: a site-level TPU plugin may hard-set ``jax_platforms`` via
``jax.config.update`` at interpreter start, which overrides the
JAX_PLATFORMS env var — so we override back through the config API."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
