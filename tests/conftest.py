"""Test harness: force a virtual 8-device CPU platform.

The environment's sitecustomize registers the TPU tunnel plugin and
*overrides* JAX_PLATFORMS via jax.config at interpreter start, so the env
var alone is not enough — the config must be re-updated after jax imports.
Sharding/collective tests run against this 8-device CPU mesh; the driver
separately dry-runs the multi-chip path (see __graft_entry__.py).

Set VLTK_TEST_TPU=1 to run the suite against the real device instead.
"""

import os

if os.environ.get("VLTK_TEST_TPU") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_datadir(tmp_path):
    return str(tmp_path)
