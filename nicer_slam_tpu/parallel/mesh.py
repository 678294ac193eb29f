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


def color_grid_sharding(mesh: Mesh) -> NamedSharding:
    """Row sharding for the [C, T] color hash table under the "sharded"
    collective mode (T is the lane axis, sharded across chips)."""
    return NamedSharding(mesh, P(None, RAY_AXIS))


def enable_grid_collectives(mesh: Optional[Mesh],
                            mode: str = "psum_bf16") -> None:
    """Configure the big-grid multi-chip collective mode (see
    hash_encoder.py "Multi-chip collective modes").

    The color hash grid is ~96% of the measured 1106 MB/step gradient
    all-reduce (BASELINE.md r4 projection). Modes:

      "replicated"  GSPMD default: f32 gradient all-reduce (exact).
      "psum_bf16"   table replicated, gradient all-reduce in bf16
                    (2x less ICI traffic; NCCL-fp16-allreduce-class
                    rounding).
      "sharded"     table + its Adam moments sharded on rows across the
                    mesh; forward does a bf16 row all-gather, backward a
                    bf16 reduce-scatter — half the f32 all-reduce bytes
                    AND ~3 GB/chip HBM freed at flagship scale (table +
                    2 Adam moments, x (N-1)/N). Put the table param on
                    color_grid_sharding(mesh) to realize the memory win.

    Call BEFORE the first traced step (jit caches don't key on this
    module config — changing it later requires map_step.clear_cache()).
    ``mesh=None`` restores single-chip behavior.
    """
    from ..ops import hash_encoder as he

    if mode not in ("replicated", "psum_bf16", "sharded"):
        raise ValueError(f"unknown grid collective mode: {mode}")
    he.GRID_SHARD_MESH = mesh if mode != "replicated" else None
    he.GRID_COLLECTIVE_MODE = mode
