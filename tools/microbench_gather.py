"""Microbenchmark: FORWARD-gather strategies for the logmap-24 color grid.

Counterpart of microbench_scatter.py (which fixed the backward): the
fine/highfreq map stage's remaining cost is the forward row gathers from
the [T=133M, C=2] color table — 7 hashed 2^24 levels x ~3.2M corner
lookups each per iter. Random gathers into big tables are
latency-serialized just like scatters; this measures whether the same
sort-for-locality trick pays in the forward direction, where the result
must come back in the caller's order (so the round trip costs TWO sorts):

  g_unsorted   emb_tc[rows] as today (_gcv_impl row gather)
  g_unsorted_pib  same + mode='promise_in_bounds' (drop the OOB clamp)
  g_presorted  gather with pre-sorted rows + indices_are_sorted hint
               (upper bound: what the gather costs once rows are sorted)
  sort_only    jax.lax.sort of [rows, iota] (the forward sort's cost)
  full_trip    sort rows -> sorted-hint gather -> unsort via second sort
               (the deployable forward path, caller order restored)
  small_ref    emb_tc[rows % 2^19] (small-table reference: pure latency
               floor at these shapes)

Run:  python tools/microbench_gather.py         (real TPU via axon)
"""
from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/nicer_slam_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    """Amortized-THROUGHPUT timing, not per-call latency: all ``iters``
    dispatches are enqueued asynchronously and synchronized once by the
    final device->host fetch, so dispatch/queue overlap is averaged in.
    That matches how these gathers run in the real training step (one
    stream, back-to-back), but understates standalone latency for the
    cheap cases (sort_only, small_ref)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[..., :1])                 # honest fetch under axon
    return (time.perf_counter() - t0) / iters


def bench_case(T: int, M: int, C: int = 2, label: str = ""):
    rng = np.random.default_rng(0)
    rows_np = rng.integers(0, T, M, dtype=np.uint32).astype(np.int32)
    rows = jnp.asarray(rows_np)
    emb_tc = jnp.asarray(rng.normal(size=(T, C)).astype(np.float32))
    rows_sorted = jnp.asarray(np.sort(rows_np))

    res = {}

    @jax.jit
    def g_unsorted(e, r):
        return e[r]

    res["g_unsorted"] = timeit(g_unsorted, emb_tc, rows)

    @jax.jit
    def g_unsorted_pib(e, r):
        return e.at[r].get(mode="promise_in_bounds")

    res["g_unsorted_pib"] = timeit(g_unsorted_pib, emb_tc, rows)

    @jax.jit
    def g_presorted(e, r):
        return e.at[r].get(indices_are_sorted=True,
                           mode="promise_in_bounds")

    res["g_presorted"] = timeit(g_presorted, emb_tc, rows_sorted)

    @jax.jit
    def sort_only(r):
        iota = jnp.arange(r.shape[0], dtype=jnp.int32)
        return jax.lax.sort([r, iota], num_keys=1)

    res["sort_only"] = timeit(sort_only, rows)

    @jax.jit
    def full_trip(e, r):
        iota = jnp.arange(r.shape[0], dtype=jnp.int32)
        sr, perm = jax.lax.sort([r, iota], num_keys=1)
        v = e.at[sr].get(indices_are_sorted=True, mode="promise_in_bounds")
        outs = jax.lax.sort([perm] + [v[:, c] for c in range(C)], num_keys=1)
        return jnp.stack(outs[1:], axis=1)

    res["full_trip"] = timeit(full_trip, emb_tc, rows)

    small_mask = (1 << 19) - 1

    @jax.jit
    def small_ref(e, r):
        return e[r & small_mask]

    res["small_ref"] = timeit(small_ref, emb_tc, rows)

    print(f"--- {label}  T={T:,} M={M:,} C={C}")
    for k, v in res.items():
        print(f"  {k:16s} {v*1e3:9.2f} ms   {v/M*1e9:7.2f} ns/el")
    return res


def main():
    print(f"devices: {jax.devices()}")
    # one hashed color level at map-iter shapes (4096 rays x ~98 samp x 8)
    bench_case(T=1 << 24, M=3_200_000, label="one level")
    # all 7 hashed levels fused through the shared [133M, 2] table
    bench_case(T=133_023_682, M=22_400_000, label="7 levels fused")


if __name__ == "__main__":
    main()
