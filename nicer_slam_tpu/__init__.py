"""nicer_slam_tpu — a TPU-native (JAX/XLA/Pallas) dense RGB SLAM framework.

A from-scratch rebuild of the capabilities of cvg/nicer-slam (NICER-SLAM,
3DV 2024): simultaneous camera tracking and neural implicit mapping from an
RGB-only stream, supervised by photometric loss, monocular depth/normal
priors, optical flow, and warping consistency.

Architecture (TPU-first, not a port):
  * All state lives in pytrees (map params, Adam state, pose arrays, voxel
    counter); the per-frame tracking/mapping loops are jit-compiled
    ``lax.scan`` programs with on-device pixel sampling.
  * The multiresolution hash-grid encoder is a pure-JAX gather/smoothstep
    formulation (reference semantics: code/hashencoder/src/hashencoder.cu)
    with an optional Pallas kernel; second-order gradients (SDF normals in
    the loss) come from composing JAX autodiff instead of hand-written
    second-backward CUDA kernels.
  * Multi-chip scaling uses jax.sharding Mesh + shard_map: rays are
    data-parallel across chips, grid gradients are psum'd over ICI.

Layout:
  ops/        hash encoder, embedders, ray sampling, volume rendering, MC
  models/     SDF/color field networks, the scene model, the loss stack
  slam/       tracking/mapping steps, keyframe logic, runner, checkpoints
  datasets/   VolSDF on-disk format loader + synthetic scene generator
  parallel/   device-mesh helpers, sharded train steps
  utils/      camera math, IO, plotting, PLY
  evaluation/ ATE, mesh metrics, rendering metrics
"""

__version__ = "0.1.0"
