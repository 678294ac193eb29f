"""Tracing/profiling utilities (SURVEY.md §5).

The reference has only vestigial timing helpers (utils/general.py:211-213
with cuda.synchronize, a module-level ``timing`` flag in hashgrid.py). Here
profiling is first-class:

  * PhaseTimer — per-phase (track / map / vis / mesh / io) wall-clock
    accumulators with device-sync-correct timing (a device->host fetch,
    since block_until_ready can return early under remote runtimes).
  * trace() — context manager around jax.profiler for on-demand XLA traces
    viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Dict, Optional


def sync(x=None):
    """Force completion: fetch a scalar to host (device-sync barrier)."""
    if x is None:
        return
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        arr = leaves[0]
        try:
            float(jnp.asarray(arr).ravel()[0])
        except (TypeError, IndexError):
            pass


class PhaseTimer:
    """Accumulates wall-clock per named phase.

    with timer.phase("tracking", sync_on=loss):
        ...
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            sync(box.get("sync", sync_on))
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"total_s": round(self.totals[k], 3),
                "count": self.counts[k],
                "mean_ms": round(1000 * self.totals[k] / max(self.counts[k], 1), 2)}
            for k in sorted(self.totals)
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def trace(logdir: str):
    """XLA profiler trace (TensorBoard/Perfetto-viewable)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
