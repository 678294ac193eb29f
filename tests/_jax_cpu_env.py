"""Shared CPU-test JAX environment setup (imported by conftest.py AND the
multichip-equivalence subprocess script, so the machine-keyed cache scheme
cannot drift between them).

Must be imported and applied BEFORE jax initializes a backend.
"""
import hashlib
import os


def setup_cpu_jax(cache_prefix: str = "/tmp/nicer_slam_tpu_jax_cache_cpu"):
    """Force the CPU backend with an 8-device virtual mesh and a
    machine-keyed persistent compile cache.

    - CPU, not the axon TPU tunnel: every eager op over the tunnel is a
      ~10 ms RPC; unit tests would crawl.
    - Long collective rendezvous timeouts: XLA:CPU hard-aborts when
      partition threads miss a rendezvous (default 40 s); on few-core hosts
      under compile load the virtual-device threads get starved far longer.
    - Machine-keyed cache: XLA:CPU AOT blobs encode host CPU features and
      /tmp persists across machine changes here — loading another machine's
      blobs risks SIGILL/aborts. The TPU cache (bench/tools) is
      machine-independent and keeps the unsuffixed dir.
    """
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += " --xla_force_host_platform_device_count=8"
    if "collective_call_terminate_timeout" not in flags:
        flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=900"
                  " --xla_cpu_collective_timeout_seconds=900")
    os.environ["XLA_FLAGS"] = flags.strip()

    import jax

    # The axon TPU plugin overrides even the JAX_PLATFORMS env var; the
    # config update is the only override that sticks.
    jax.config.update("jax_platforms", "cpu")

    try:
        with open("/proc/cpuinfo") as f:
            cpu_flags = next((l for l in f if l.startswith("flags")), "")
    except OSError:
        cpu_flags = ""
    mkey = hashlib.md5(cpu_flags.encode()).hexdigest()[:8]
    jax.config.update("jax_compilation_cache_dir", f"{cache_prefix}_{mkey}")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
