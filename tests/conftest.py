"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run against a fake CPU mesh (SURVEY.md §4): real
TPU hardware is exercised by bench.py, not by unit tests. All backend/cache
setup lives in _jax_cpu_env.setup_cpu_jax (shared with the multichip
equivalence subprocess so the cache scheme cannot drift).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _jax_cpu_env import setup_cpu_jax  # noqa: E402

setup_cpu_jax()

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)
