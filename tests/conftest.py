"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run against a fake CPU mesh (SURVEY.md §4): real
TPU hardware is exercised by bench.py, not by unit tests.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)
