"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding tests run against a fake CPU mesh (SURVEY.md §4): real
TPU hardware is exercised by bench.py, not by unit tests.
"""
import os

# force CPU: the surrounding environment exports JAX_PLATFORMS=axon (the
# remote TPU tunnel) which would make every eager op a ~10ms RPC.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "collective_call_terminate_timeout" not in flags:
    # XLA:CPU hard-aborts when partition threads miss a collective
    # rendezvous (default 40 s); on few-core hosts under compile load the
    # virtual-device threads get starved far longer. Be patient, not dead.
    flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=900"
              " --xla_cpu_collective_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags.strip()

import jax

# The axon TPU plugin overrides even the JAX_PLATFORMS env var; the config
# update is the only override that sticks.
jax.config.update("jax_platforms", "cpu")

# Machine-keyed CPU cache: XLA:CPU AOT blobs encode host CPU features, and
# /tmp persists across machine changes here — loading another machine's
# blobs risks SIGILL/aborts (cpu_aot_loader warns exactly this). Key the
# TEST cache by the host's feature set; the TPU cache (bench/tools) is
# machine-independent and keeps the unsuffixed dir.
import hashlib

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next((l for l in _f if l.startswith("flags")), "")
except OSError:
    _flags = ""
_mkey = hashlib.md5(_flags.encode()).hexdigest()[:8]
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/nicer_slam_tpu_jax_cache_cpu_{_mkey}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    import jax
    return jax.random.PRNGKey(0)
