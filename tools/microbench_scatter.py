"""Microbenchmark: backward-scatter strategies for the logmap-24 color grid.

Round-2 finding (memory/tpu-gather-costs.md): scalar scatter-add costs
~7 ns/el into a 2^19-entry table but ~113 ns/el into a 2^24-entry one —
big-table random scatter is latency-serialized. This script measures the
candidate fixes on the real TPU at the real shapes (N=803k points x 8
corners per hashed color level, 2^24-entry [T, C=2] tables):

  base    unsorted scalar scatter-add (what XLA transposes the gather to)
  row     unsorted row scatter ([T,2] rows)
  sort    sort keys+payload, then scatter with indices_are_sorted=True
  sortseg sort + in-run segment-sum (duplicates collapse to run starts,
          non-starts write zeros) + sorted scatter
  seg     jax.ops.segment_sum(sorted) straight to the dense table
  sortall ONE sort over all 7 hashed levels' updates (global row ids) +
          single sorted scatter into the whole table

Run:  python tools/microbench_scatter.py            (real TPU via axon)
"""
from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/nicer_slam_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    # honest timing on the axon runtime needs a device->host fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[..., :1])
    return (time.perf_counter() - t0) / iters


def main():
    T = 1 << 24            # one hashed color level
    C = 2
    N = 803_000 * 8        # corner updates per level
    L_HASHED = 7

    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, T, N, dtype=np.uint32)
    idx = jnp.asarray(idx_np.astype(np.int32))
    vals = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
    vals_flat = jnp.asarray(rng.normal(size=(N * C,)).astype(np.float32))
    # flat scalar formulation: element id = chan*T + row (matches the
    # [C, T] param layout the encoder trains)
    idx_flat = jnp.concatenate([idx, idx + T])

    results = {}

    @jax.jit
    def base(i, v):
        return jnp.zeros((C * T,), jnp.float32).at[i].add(v)

    results["base_scalar"] = timeit(base, idx_flat, vals_flat)

    @jax.jit
    def row(i, v):
        return jnp.zeros((T, C), jnp.float32).at[i].add(v)

    results["row_unsorted"] = timeit(row, idx, vals)

    @jax.jit
    def sort_only(i, v):
        si = jnp.sort(i)
        return si, v

    results["sort_keys_only"] = timeit(sort_only, idx, vals)

    @jax.jit
    def sort_scatter_row(i, v):
        si, v0, v1 = jax.lax.sort([i, v[:, 0], v[:, 1]], num_keys=1)
        sv = jnp.stack([v0, v1], -1)
        return jnp.zeros((T, C), jnp.float32).at[si].add(
            sv, indices_are_sorted=True)

    results["sort_row"] = timeit(sort_scatter_row, idx, vals)

    @jax.jit
    def sort_scatter_flat(i, v):
        si, sv = jax.lax.sort([i, v], num_keys=1)
        return jnp.zeros((C * T,), jnp.float32).at[si].add(
            sv, indices_are_sorted=True)

    results["sort_flat"] = timeit(sort_scatter_flat, idx_flat, vals_flat)

    @jax.jit
    def sortseg_row(i, v):
        si, v0, v1 = jax.lax.sort([i, v[:, 0], v[:, 1]], num_keys=1)
        sv = jnp.stack([v0, v1], -1)
        # collapse duplicate runs: cumsum minus cumsum at run starts
        cs = jnp.cumsum(sv, axis=0)
        is_start = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
        # run total lands on the LAST element of each run
        is_end = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
        run_tot = jnp.where(
            is_end[:, None],
            cs - jnp.concatenate([jnp.zeros((1, C)), cs[:-1]]) * 0
            , 0.0)
        # simpler: total at end = cs[end] - cs[previous end]; do via
        # segment trick: value at end minus exclusive prefix at run start
        start_excl = jnp.where(is_start[:, None],
                               jnp.concatenate([jnp.zeros((1, C)), cs[:-1]]),
                               0.0)
        # propagate start_excl forward within run via cummax on masked cs?
        # cheap version: scatter ends with (cs[end] - carried prefix).
        # For the BENCH we approximate cost with: ends-only scatter of cs
        return jnp.zeros((T, C), jnp.float32).at[si].add(
            jnp.where(is_end[:, None], run_tot, 0.0),
            indices_are_sorted=True)

    results["sortseg_row_costmodel"] = timeit(sortseg_row, idx, vals)

    @jax.jit
    def seg_sum(i, v):
        si, v0, v1 = jax.lax.sort([i, v[:, 0], v[:, 1]], num_keys=1)
        sv = jnp.stack([v0, v1], -1)
        return jax.ops.segment_sum(sv, si, num_segments=T,
                                   indices_are_sorted=True)

    results["sort_segment_sum"] = timeit(seg_sum, idx, vals)

    # all 7 hashed levels in ONE sort+scatter (global row ids)
    NL = N * L_HASHED
    gidx_np = np.concatenate([
        rng.integers(0, T, N, dtype=np.int64) + l * T for l in range(L_HASHED)])
    rng.shuffle(gidx_np)
    gidx = jnp.asarray(gidx_np.astype(np.int32))
    gvals = jnp.asarray(rng.normal(size=(NL, C)).astype(np.float32))

    @jax.jit
    def sortall(i, v):
        si, v0, v1 = jax.lax.sort([i, v[:, 0], v[:, 1]], num_keys=1)
        sv = jnp.stack([v0, v1], -1)
        return jnp.zeros((T * L_HASHED, C), jnp.float32).at[si].add(
            sv, indices_are_sorted=True)

    results["sortall_7lvl"] = timeit(sortall, gidx, gvals, iters=5)

    @jax.jit
    def baseall(i, v):
        return jnp.zeros((T * L_HASHED, C), jnp.float32).at[i].add(v)

    results["baseall_7lvl"] = timeit(baseall, gidx, gvals, iters=5)

    print(f"shapes: N={N} per level, T=2^24, C={C}; "
          f"7-level N={NL}", file=sys.stderr)
    for k, v in results.items():
        n = NL if "7lvl" in k else N
        print(f"{k:24s} {v*1e3:9.2f} ms   {v/n*1e9:7.2f} ns/row")


if __name__ == "__main__":
    main()
