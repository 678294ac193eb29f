"""Device mesh + sharding helpers (the NCCL replacement, SURVEY.md §2.3).

The reference is single-GPU; its only multi-device code is NCCL DDP inside
the vendored GMFlow preprocessing harness (preprocess/extract_flows.py:
268-341). Here multi-chip scaling is first-class and TPU-native:

  * rays are data-parallel across chips ("rays" axis): the ray batch of a
    mapping/tracking step is sharded with a NamedSharding; params and the
    frame store are replicated. GSPMD then computes the EXACT single-chip
    math, inserting the one collective the algorithm needs — an all-reduce
    (psum) of hash-grid/MLP gradients over ICI.
  * hash tables are replicated, not sharded: even the logmap-24 color grid
    is ~1 GB — cheap next to re-gathering over ICI every sample.
  * scene-parallel sweeps (one scene per chip/host) need no collectives at
    all and are expressed by running independent runners per local device.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RAY_AXIS,))


def ray_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
