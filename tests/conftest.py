"""Test harness: force a virtual 8-device CPU platform before JAX imports.

Sharding/collective tests run against this mesh; the driver separately
dry-runs the multi-chip path (see __graft_entry__.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_datadir(tmp_path):
    return str(tmp_path)
