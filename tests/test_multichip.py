"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4
item 4): the sharded mapping step must compile, run, and agree with the
single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_mesh_helpers():
    from nicer_slam_tpu.parallel.mesh import make_mesh, ray_sharding, replicated

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    s = ray_sharding(mesh)
    r = replicated(mesh)
    x = jax.device_put(jnp.arange(64), s)
    assert len(x.sharding.device_set) == 8


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_entry_compiles():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import entry

    fn, args = entry()
    # lower+compile only (full flagship forward, single chip)
    lowered = jax.jit(fn).lower(*args)
    assert "rgb" not in lowered.as_text()[:0]  # lowering succeeded


def test_multichip_equivalence_vs_single_device():
    """Sharded and unsharded map_step on the SAME inputs must produce the
    same loss and the same parameter update (SURVEY.md §4 item 4:
    1-chip-vs-N-chip numerical equivalence, fp-tolerant).

    Near-flagship-shaped: the real Replica conf's coarse+fine SDF grids
    (logmap 19), all loss terms incl. flow edges and BA camera steps — with
    a REDUCED sampling budget (96-eval prepass, 32+16 samples: XLA:CPU's
    collective rendezvous aborts if a partition thread is still grinding
    through the full 640-sample prepass when the all-gather fires) and the
    color hash grid disabled (a 900 MB table replicated per virtual device
    is too big for the CPU mesh; its gather/scatter semantics are identical
    to the SDF grids').

    Mesh width: 8 virtual devices on hosts with >=4 cores, falling back to
    2 on rendezvous-constrained (1-core) hosts; the subprocess prints which
    width actually ran (NICER_EQUIV_DEVICES overrides).

    Runs in a SUBPROCESS (tests/_multichip_equiv_main.py): this exact
    computation aborts inside XLA:CPU when executed late in the full suite
    (SIGABRT in jax Array._value; passes deterministically in a fresh
    process), so process isolation is load-bearing, not cosmetic."""
    import subprocess
    import sys
    import os

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multichip_equiv_main.py")
    res = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, timeout=1500)
    assert res.returncode == 0, (
        f"equivalence subprocess failed (rc={res.returncode}):\n"
        f"stdout:\n{res.stdout[-2000:]}\nstderr:\n{res.stderr[-4000:]}")
    assert "EQUIVALENCE OK" in res.stdout


def test_keyframe_selector_reference_rules():
    from nicer_slam_tpu.slam.keyframes import KeyframeConfig, KeyframeSelector

    cfg = KeyframeConfig(mapping_window_size=15, keyframe_every=10,
                         num_mapping_iters=100)
    sel = KeyframeSelector(cfg, seed=0)

    # frame 0: single keyframe
    w = sel.window(0, 0)
    assert w.keyframe_list == [0]
    assert w.edges is None

    # frame < 200: local = range(0, f, 10) + [f], no edges
    w = sel.window(57, 0)
    assert w.keyframe_list == [0, 10, 20, 30, 40, 50, 57]
    assert w.edges is None
    # at iters//2 the frames since the last keyframe are appended
    # (volsdf_train.py:496-497 — duplicates kept, as in the reference)
    w2 = sel.window(57, 50)
    assert w2.keyframe_list[-7:] == list(range(50, 57))
    assert 57 in w2.keyframe_list

    # frame >= 200: 5 global + local, edges exist
    w = sel.window(430, 0)
    n_global = 15 // 3
    assert len(w.keyframe_list) >= n_global + 1
    globals_ = w.keyframe_list[:n_global]
    assert all(g % 10 == 0 for g in globals_)
    assert all(g <= (430 // 10 - 4) * 10 for g in globals_)
    assert w.edges is not None
    idii, idjj, ii, jj = w.edges
    assert (idii >= n_global).all()  # placeholder offset
    assert all(abs(a - b) <= 30 and a % 10 == 0 for a, b in zip(ii, jj))
    # keyframe 0 and head-of-window entries are never written back
    w3 = sel.window(430, 80)
    head = set(w3.keyframe_list[: 15 // 2])
    for kf, ok in zip(w3.keyframe_list, w3.writeback_eligible):
        if kf == 0 or kf in head:
            assert not ok


def test_multichip_equivalence_biggrid_sorted_backward():
    """Same 1-vs-N equivalence, but with the color hash grid ON (shrunk to
    CPU scale) and SORTED_BWD_MIN_ENTRIES lowered so the encode routes
    through _grid_corner_values — checking the unified sorted-backward
    custom_vjp (hash_encoder.py) for correctness UNDER GSPMD SHARDING,
    which the standard run (color grid off) never exercises."""
    import subprocess
    import sys
    import os

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multichip_equiv_main.py")
    env = {**os.environ, "NICER_EQUIV_BIGGRID": "1"}
    res = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, timeout=1500, env=env)
    assert res.returncode == 0, (
        f"big-grid equivalence subprocess failed (rc={res.returncode}):\n"
        f"stdout:\n{res.stdout[-2000:]}\nstderr:\n{res.stderr[-4000:]}")
    assert "EQUIVALENCE OK" in res.stdout and "biggrid=1" in res.stdout


def test_grid_collective_modes_equivalence():
    """bf16-psum and sharded-table collective modes for the big (color)
    grid (hash_encoder.GRID_COLLECTIVE_MODE) must match the replicated
    gradient to bf16 tolerance, and the compiled HLO must actually carry
    the collectives (all-reduce / all-gather / reduce-scatter). Subprocess
    isolation for the same XLA:CPU rendezvous reasons as above."""
    import subprocess
    import sys
    import os

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_grid_collectives_main.py")
    res = subprocess.run([sys.executable, script], capture_output=True,
                         text=True, timeout=1500)
    assert res.returncode == 0, (
        f"grid collectives subprocess failed (rc={res.returncode}):\n"
        f"stdout:\n{res.stdout[-2000:]}\nstderr:\n{res.stderr[-4000:]}")
    assert "GRID COLLECTIVES OK" in res.stdout
