"""Scene model: the full per-ray-batch forward pass (render + priors).

Behavioral reference: cvg/nicer-slam ``code/model/network.py`` (SLAMNetwork):
ray generation, hierarchical sampling, field evaluation, SDF volume
rendering, depth/normal maps, flow prediction over a keyframe edge graph,
warp (photometric reprojection) machinery, eikonal sample points, and the
voxel visit counter feeding the adaptive density.

TPU-first layout: instead of the reference's ``[n_keyframes, pix_per_kf]``
batch whose shapes change with the keyframe window, rays live in ONE flat,
fixed-size array ``[R]`` with a per-ray keyframe-slot id. Slot-count changes
(window growth at mid-mapping, frame-0 single-keyframe batches) therefore
never change compiled shapes — the jitted step functions compile once.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..ops import density as density_ops
from ..ops.safe_math import safe_norm
from ..ops.ray_sampling import SamplerConfig, importance_z_vals
from ..ops.volume_rendering import render_weights
from ..utils.camera import rays_from_uv
from . import fields


class SceneConfig(NamedTuple):
    combine: fields.CombineConfig
    render: fields.RenderingNetConfig
    sampler: SamplerConfig
    density_method: str = "volsdf_gridpredefined"
    scene_bounding_sphere: float = 1.0
    voxel_res: int = 64
    white_bkgd: bool = False
    bg_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    use_warp_loss: bool = True
    H: int = 680
    W: int = 1200
    patchsizes: Tuple[int, ...] = (1,)
    # TPU-native optimization (not in the reference): during training,
    # evaluate the color network only at the color_topk highest-weight
    # samples per ray instead of all S. The compositing sum is dominated by
    # a handful of near-surface samples (transmittance kills the rest), so
    # the renormalized top-K sum approximates the full sum while cutting the
    # color encoder's gather/scatter volume — the measured mapping
    # bottleneck (the reference's logmap-24 color grid backward,
    # hashencoder.cu:286-373) — by S/K. 0 disables (exact reference path).
    color_topk: int = 0


def scene_config_from_conf(model_conf: Config, img_res, n_images: int) -> SceneConfig:
    feature_vector_size = model_conf.get_int("feature_vector_size")
    combine = fields.combine_config_from_conf(
        model_conf.get_config("implicit_network"), feature_vector_size)
    render = fields.rendering_config_from_conf(
        model_conf.get_config("rendering_network"), feature_vector_size,
        n_images=n_images,
        embedding_method=model_conf.get_string("embedding_method", "nerf"))
    rs = model_conf.get_config("ray_sampler")
    sampler = SamplerConfig(
        scene_bounding_sphere=model_conf.get_float("scene_bounding_sphere", 1.0),
        near=rs.get_float("near", 0.0),
        N_samples=rs.get_int("N_samples", 64),
        N_samples_eval=rs.get_int("N_samples_eval", 640),
        N_samples_extra=rs.get_int("N_samples_extra", 32),
        prepass_ray_chunk=rs.get_int("prepass_ray_chunk", 1024),
        prepass_mode=rs.get_string("prepass_mode", "exact"),
        prepass_cache_res=rs.get_int("prepass_cache_res", 128),
    )
    patchsizes = model_conf.get_list("mapping_patchsizes", [1])
    return SceneConfig(
        combine=combine,
        render=render,
        sampler=sampler,
        density_method=model_conf.get_string("density_method", "volsdf_gridpredefined"),
        scene_bounding_sphere=model_conf.get_float("scene_bounding_sphere", 1.0),
        voxel_res=model_conf.get_int("voxel_res", 64),
        white_bkgd=model_conf.get_bool("white_bkgd", False),
        use_warp_loss=model_conf.get_bool("use_warp_loss", False),
        H=int(img_res[0]),
        W=int(img_res[1]),
        patchsizes=tuple(int(p) for p in patchsizes),
        color_topk=model_conf.get_int("color_topk", 0),
    )


def init_scene_params(rng, cfg: SceneConfig) -> Dict[str, Any]:
    rng = fields._as_np_rng(rng)
    params = {
        "implicit": fields.init_combine(rng, cfg.combine),
        "render": fields.init_rendering_net(rng, cfg.render),
    }
    if cfg.density_method == "volsdf_laplace":
        params["density"] = {"beta": jnp.asarray(0.1)}
    return params


def init_voxels(cfg: SceneConfig) -> jnp.ndarray:
    return jnp.zeros((cfg.voxel_res,) * 3, dtype=jnp.float32)


def build_density_cache(cfg: SceneConfig, params: Dict[str, Any],
                        voxels: jnp.ndarray, beta_scale=None) -> jnp.ndarray:
    """Cell-blocked prepass-density volume [res^3, 8]: full-network SDF
    (packed-bf16 inference) + the voxel-counter beta on a uniform
    linspace(-1,1,res) grid, with row ``cell`` holding the cell's 8 corner
    densities (built by 8 cheap rolls). The importance sampler TRILINEARLY
    interpolates this with ONE row gather per sample (prepass_mode
    "cached"); refreshed periodically by the runner. Trilinear (vs the
    earlier nearest-neighbor read) keeps the sample-placement density C0 —
    the placement noise of the nearest cache was a measured tracking-drift
    contributor (BASELINE.md cached-vs-exact gap)."""
    res = cfg.sampler.prepass_cache_res
    xs = jnp.linspace(-1.0, 1.0, res)
    grid = jnp.stack(jnp.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    packed = fields.pack_combine_tables(cfg.combine, params["implicit"])

    def chunk_fn(pts):
        sdf = fields.combine_sdf_packed(cfg.combine, params["implicit"],
                                        packed, pts, "fine")
        return _density(cfg, params, voxels, sdf, pts, beta_scale)

    n_chunks = 16
    out = jax.lax.map(chunk_fn, grid.reshape(n_chunks, -1, 3))
    vol = out.reshape(res, res, res)
    blocks = []
    for c in range(8):
        v = vol
        if c & 1:
            v = jnp.roll(v, -1, axis=0)
        if c & 2:
            v = jnp.roll(v, -1, axis=1)
        if c & 4:
            v = jnp.roll(v, -1, axis=2)
        blocks.append(v.reshape(-1))
    return jnp.stack(blocks, axis=-1)                 # [res^3, 8]


def _density_cache_lookup(density_cache: jnp.ndarray, res: int,
                          pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear interpolation of the blocked cache: [N,3] -> [N]."""
    g = (pts + 1.0) * (0.5 * (res - 1))
    g0 = jnp.clip(jnp.floor(g).astype(jnp.int32), 0, res - 2)
    f = jnp.clip(g - g0.astype(g.dtype), 0.0, 1.0)
    flat = (g0[:, 0] * res + g0[:, 1]) * res + g0[:, 2]
    rows = density_cache[flat]                        # [N, 8]
    wx = jnp.stack([1.0 - f[:, 0], f[:, 0]], -1)      # [N, 2]
    wy = jnp.stack([1.0 - f[:, 1], f[:, 1]], -1)
    wz = jnp.stack([1.0 - f[:, 2], f[:, 2]], -1)
    # corner c: bit0 -> dim0, bit1 -> dim1, bit2 -> dim2 (build order above)
    w = (wx[:, (0, 1, 0, 1, 0, 1, 0, 1)]
         * wy[:, (0, 0, 1, 1, 0, 0, 1, 1)]
         * wz[:, (0, 0, 0, 0, 1, 1, 1, 1)])           # [N, 8]
    dens = (rows * w).sum(-1)
    inb = jnp.all(jnp.abs(pts) <= 1.0, axis=-1)
    return jnp.where(inb, dens, 0.0)


class RayBatch(NamedTuple):
    """One flat batch of rays spanning up to W keyframe slots."""

    uv: jnp.ndarray          # [R,2] pixel coords (x,y)
    kf_slot: jnp.ndarray     # [R] int32 slot index into poses/intrinsics
    poses: jnp.ndarray       # [S,4,4] c2w (differentiable for tracking/BA)
    intrinsics: jnp.ndarray  # [S,4,4]
    frame_ids: jnp.ndarray   # [S] int32 global frame index per slot
    slot_valid: jnp.ndarray  # [S] bool
    ray_valid: jnp.ndarray   # [R] bool
    # optional per-ray loss weight in [0,1] (confidence-weighted mapping:
    # downweight rays from recently-tracked, not-yet-BA-refined poses so
    # drifted poses don't write authoritative geometry). None = all-ones,
    # which is exactly the reference behavior.
    ray_weight: Optional[jnp.ndarray] = None  # [R] float32


class FlowEdges(NamedTuple):
    """Padded flow-graph edges (volsdf_train.py:312-324)."""

    idii: jnp.ndarray   # [E] int32 reference slot
    idjj: jnp.ndarray   # [E] int32 target slot
    valid: jnp.ndarray  # [E] bool


def _density(cfg: SceneConfig, params, voxels, sdf_flat, pts_flat,
             beta_scale=None):
    if cfg.density_method == "volsdf_laplace":
        beta = density_ops.learned_beta(params["density"]["beta"])
        if beta_scale is not None:
            beta = beta * beta_scale
        return density_ops.laplace_density(sdf_flat, beta)
    beta = density_ops.grid_predefined_beta(voxels, pts_flat, cfg.voxel_res)
    if beta_scale is not None:
        beta = beta * beta_scale
    return density_ops.laplace_density(sdf_flat[:, None], beta)[:, 0]


def render_rays(
    cfg: SceneConfig,
    params: Dict[str, Any],
    voxels: jnp.ndarray,
    batch: RayBatch,
    rng: jax.Array,
    *,
    stage: str = "fine",
    color_stage: str = "highfreq",
    training: bool = True,
    is_mapping: bool = False,
    edges: Optional[FlowEdges] = None,
    full_rgb: Optional[jnp.ndarray] = None,   # [S, H*W, 3] float in [0,1]
    full_depth: Optional[jnp.ndarray] = None,  # [S, H*W] mono depth (warp ps>1)
    density_cache: Optional[jnp.ndarray] = None,  # [res^3, 8] blocked prepass density
    beta_scale: Optional[jnp.ndarray] = None,  # density warmup multiplier
) -> Dict[str, jnp.ndarray]:
    """Forward pass over a flat ray batch (network.py:78-347 equivalent).

    Returns an output dict; when is_mapping, also returns the updated voxel
    counter under key "voxels" and eikonal gradients.
    """
    R = batch.uv.shape[0]
    k_sample, k_eik_uni, k_eik_nei = jax.random.split(rng, 3)

    K = batch.intrinsics[batch.kf_slot]      # [R,4,4]
    c2w = batch.poses[batch.kf_slot]         # [R,4,4]
    ray_dirs, cam_loc, depth_scale = rays_from_uv(batch.uv, c2w, K)

    # hierarchical sampling: no-grad prepass always uses the fine stage
    # (ray_sampler.py:102 calls get_sdf_vals with the default stage).
    # Modes (SamplerConfig.prepass_mode):
    #   cached — one nearest-neighbor read per sample from a periodically
    #            refreshed dense density volume (density_cache)
    #   exact  — full-network prepass via the packed-bf16 inference encoder
    if density_cache is not None and cfg.sampler.prepass_mode == "cached":
        res = cfg.sampler.prepass_cache_res

        def sdf_prepass(pts):
            return jnp.zeros((pts.shape[0],), pts.dtype)  # unused

        def density_prepass(sdf, pts):
            return _density_cache_lookup(density_cache, res, pts)
    else:
        if not cfg.combine.fine.concat_coarse_feature:
            packed_tables = fields.pack_combine_tables(cfg.combine,
                                                       params["implicit"])

            def sdf_prepass(pts):
                return fields.combine_sdf_packed(
                    cfg.combine, params["implicit"], packed_tables, pts, "fine")
        else:
            def sdf_prepass(pts):
                return fields.combine_sdf(cfg.combine, params["implicit"],
                                          pts, "fine")[:, 0]

        def density_prepass(sdf, pts):
            return _density(cfg, params, voxels, sdf, pts, beta_scale)

    pc = cfg.sampler.prepass_ray_chunk
    cached_prepass = (density_cache is not None
                      and cfg.sampler.prepass_mode == "cached")
    if pc and R > pc and R % pc == 0 and not cached_prepass:
        # sequential ray chunks bound the prepass working set (the 640-eval
        # no-grad pass is ~R*640 points; unchunked it dominates HBM).
        # Cached mode skips chunking: one row gather per sample has a tiny
        # working set and lax.map's serialization is pure overhead there.
        n_chunks = R // pc
        keys = jax.random.split(k_sample, n_chunks)

        def chunk_fn(args):
            o, d, k = args
            return importance_z_vals(cfg.sampler, o, d, sdf_prepass,
                                     density_prepass, k, training=training)

        z_vals, z_eik = jax.lax.map(
            chunk_fn, (cam_loc.reshape(n_chunks, pc, 3),
                       ray_dirs.reshape(n_chunks, pc, 3), keys))
        z_vals = z_vals.reshape(R, -1)
        z_eik = z_eik.reshape(R, 1)
    else:
        z_vals, z_eik = importance_z_vals(
            cfg.sampler, cam_loc, ray_dirs, sdf_prepass, density_prepass,
            k_sample, training=training)
    S = z_vals.shape[1]

    points = cam_loc[:, None, :] + z_vals[..., None] * ray_dirs[:, None, :]
    points_flat = points.reshape(-1, 3)

    new_voxels = voxels
    if is_mapping:
        new_voxels = density_ops.update_voxels(voxels, points_flat, cfg.voxel_res)

    dirs_flat = jnp.broadcast_to(ray_dirs[:, None, :], points.shape).reshape(-1, 3)

    # remat the per-point field evals, but SAVE the hashed-level gather
    # results (plain remat would re-gather in every backward pass — gathers
    # are the cost, recomputing math is free; see hash_encoder.py)
    _policy = jax.checkpoint_policies.save_only_these_names("hash_gather")
    get_outputs_ckpt = jax.checkpoint(
        lambda p, x: fields.combine_get_outputs(cfg.combine, p, x, stage),
        policy=_policy)
    sdf, feature_vectors, gradients = get_outputs_ckpt(
        params["implicit"], points_flat)

    point_frame_ids = batch.frame_ids[batch.kf_slot]
    point_frame_ids = jnp.broadcast_to(
        point_frame_ids[:, None], (R, S)).reshape(-1)

    render_fwd_ckpt = jax.checkpoint(
        lambda p, pts, g, d, f, idx: fields.rendering_forward(
            cfg.render, p, pts, g, d, f, image_indices=idx,
            color_stage=color_stage),
        policy=_policy)

    # density/weights first: the color pass may prune to the top-K samples
    density_flat = _density(cfg, params, new_voxels, sdf[:, 0], points_flat,
                            beta_scale)
    weights = render_weights(z_vals, density_flat.reshape(R, S))

    Kc = cfg.color_topk
    prune_color = training and 0 < Kc < S
    if prune_color:
        # gather the Kc highest-weight samples per ray; gradients still flow
        # to the kept weights via top_k's value output. The composite is
        # renormalized by the total/kept weight-mass ratio so pruned samples
        # are approximated by the kept samples' average color (unbiased in
        # brightness even while weights are still diffuse early in training).
        topk_w, topk_i = jax.lax.top_k(weights, Kc)            # [R,Kc]
        flat_i = (jnp.arange(R, dtype=topk_i.dtype)[:, None] * S
                  + topk_i).reshape(-1)
        rgb_flat = render_fwd_ckpt(
            params["render"], points_flat[flat_i], gradients[flat_i],
            dirs_flat[flat_i], feature_vectors[flat_i],
            point_frame_ids[flat_i])
        renorm = (weights.sum(1, keepdims=True)
                  / (topk_w.sum(1, keepdims=True) + 1e-8))     # [R,1]
        w_comp = topk_w * renorm                               # [R,Kc]
        S_color = Kc
    else:
        rgb_flat = render_fwd_ckpt(params["render"], points_flat, gradients,
                                   dirs_flat, feature_vectors,
                                   point_frame_ids)
        w_comp = weights
        S_color = S
    if cfg.render.model_exposure:
        rgb_flat, rgb_un_flat = rgb_flat
        rgb_un = rgb_un_flat.reshape(R, S_color, 3)
    rgb = rgb_flat.reshape(R, S_color, 3)

    rgb_values = (w_comp[..., None] * rgb).sum(axis=1)                  # [R,3]
    wsum = weights.sum(axis=1, keepdims=True)
    depth_values = (weights * z_vals).sum(axis=1, keepdims=True) / (wsum + 1e-8)
    rendered_depth = depth_values                                        # [R,1]
    surf_points = cam_loc + rendered_depth * ray_dirs                    # [R,3]

    out: Dict[str, jnp.ndarray] = {}

    # ---- optical-flow prediction over the edge graph (network.py:153-165)
    if edges is not None:
        tgt_pose = batch.poses[edges.idjj]              # [E,4,4]
        tgt_w2c = jnp.linalg.inv(tgt_pose)
        tgt_K = batch.intrinsics[edges.idjj]
        # project every ray's surface point into every edge's target frame;
        # the loss masks rays not belonging to edge.idii.
        cam_pts = (jnp.einsum("eij,rj->eri", tgt_w2c[:, :3, :3], surf_points)
                   + tgt_w2c[:, None, :3, 3])
        pix = jnp.einsum("eij,erj->eri", tgt_K[:, :3, :3], cam_pts)
        flow_uv = pix[..., :2] / (pix[..., 2:] + 1e-8)
        out["flow"] = flow_uv - batch.uv[None, :, :]    # [E,R,2]

    # ---- warp machinery (network.py:167-279). Each configured patchsize
    # lifts a psxps pixel patch around every sampled ray to the CENTER ray's
    # rendered depth (fronto-parallel), reprojects into every keyframe slot,
    # and bilinear-samples its RGB; the GT side integer-samples the ray's own
    # keyframe. For ps>1 a depth-variance mask (var of the patch's mono
    # depth < 0.01, network.py:260-271) kills patches across depth edges.
    if cfg.use_warp_loss and is_mapping and full_rgb is not None:
        w2c_all = jnp.linalg.inv(batch.poses)           # [S,4,4]
        for ps in cfg.patchsizes:
            pp = ps * ps
            if ps == 1:
                patch_uv = batch.uv[:, None, :]                   # [R,1,2]
                pts = surf_points[:, None, :]                     # [R,1,3]
            else:
                half = ps // 2
                gx, gy = np.meshgrid(np.arange(-half, half + 1),
                                     np.arange(-half, half + 1),
                                     indexing="ij")
                offs = jnp.asarray(
                    np.stack([gx, gy], -1).reshape(-1, 2).astype(np.float32))
                patch_uv = batch.uv[:, None, :] + offs[None]      # [R,pp,2]
                dirs_p, cam_p, _ = rays_from_uv(
                    patch_uv.reshape(-1, 2),
                    jnp.repeat(c2w, pp, axis=0),
                    jnp.repeat(K, pp, axis=0))
                depth_rep = jnp.repeat(rendered_depth, pp, axis=0)
                pts = (cam_p + depth_rep * dirs_p).reshape(R, pp, 3)

            flat = pts.reshape(-1, 3)                             # [R*pp,3]
            cam_pts = (jnp.einsum("sij,nj->sni", w2c_all[:, :3, :3], flat)
                       + w2c_all[:, None, :3, 3])
            pix_p = jnp.einsum("sij,snj->sni",
                               batch.intrinsics[:, :3, :3], cam_pts)
            tgt_uv = pix_p[..., :2] / (pix_p[..., 2:] + 1e-8)     # [S,R*pp,2]
            tgt_depth = pix_p[..., 2]
            # reference normalizes by W (not W-1) then grid_samples with
            # align_corners=True -> effective sample pos = uv*(dim-1)/dim
            sx = tgt_uv[..., 0] * (cfg.W - 1) / cfg.W
            sy = tgt_uv[..., 1] * (cfg.H - 1) / cfg.H
            sampled = _bilinear_sample_images(full_rgb, sx, sy, cfg.H, cfg.W)
            in_bounds = (
                (tgt_uv[..., 0] / cfg.W * 2 - 1 > -1)
                & (tgt_uv[..., 0] / cfg.W * 2 - 1 < 1)
                & (tgt_uv[..., 1] / cfg.H * 2 - 1 > -1)
                & (tgt_uv[..., 1] / cfg.H * 2 - 1 < 1)
                & (tgt_depth > 0)
            ).reshape(-1, R, pp)                                  # [S,R,pp]

            # GT side: integer sampling of the ray's OWN keyframe image;
            # out-of-bounds patch pixels get the reference's 1.0 placeholder
            # (network.py:230-247) and are masked out
            iu = patch_uv[..., 0].astype(jnp.int32)               # [R,pp]
            iv = patch_uv[..., 1].astype(jnp.int32)
            inb_gt = (iu >= 0) & (iu < cfg.W) & (iv >= 0) & (iv < cfg.H)
            pix_idx = (jnp.clip(iv, 0, cfg.H - 1) * cfg.W
                       + jnp.clip(iu, 0, cfg.W - 1))              # [R,pp]
            gt_rgb_patch = full_rgb[batch.kf_slot[:, None], pix_idx]
            if gt_rgb_patch.dtype == jnp.uint8:
                gt_rgb_patch = gt_rgb_patch.astype(jnp.float32) / 255.0
            gt_rgb_patch = jnp.where(inb_gt[..., None], gt_rgb_patch, 1.0)

            mask = (in_bounds & inb_gt[None]
                    & batch.slot_valid[:, None, None]
                    & batch.ray_valid[None, :, None])             # [S,R,pp]

            if ps > 1 and full_depth is not None:
                d_patch = full_depth[batch.kf_slot[:, None], pix_idx]
                d_patch = jnp.where(inb_gt, d_patch.astype(jnp.float32), 1.0)
                var = d_patch.var(axis=-1)                        # [R]
                mask = mask & (var < 0.01)[None, :, None]

            out[f"warp_sampled_rgb_{ps}"] = sampled.reshape(-1, R, pp, 3)
            out[f"warp_gt_rgb_{ps}"] = gt_rgb_patch               # [R,pp,3]
            out[f"warp_mask_{ps}"] = mask

    depth_values = depth_scale * depth_values

    if cfg.white_bkgd:
        acc = weights.sum(-1)
        rgb_values = rgb_values + (1.0 - acc[..., None]) * jnp.asarray(cfg.bg_color)

    out.update({
        "rgb": rgb,
        "rgb_values": rgb_values,
        "depth_values": depth_values,
        "z_vals": z_vals,
        "depth_vals": z_vals * depth_scale,
        "sdf": sdf.reshape(R, S),
        "weights": weights,
        "entropy": (-weights * jnp.log(weights + 1e-4)).sum(-1).mean(),
    })

    if cfg.render.model_exposure:
        out["rgb_un"] = rgb_un
        out["rgb_un_values"] = (w_comp[..., None] * rgb_un).sum(axis=1)

    # ---- eikonal points (network.py:313-336)
    if training and is_mapping:
        n_eik = R
        eik_uniform = jax.random.uniform(
            k_eik_uni, (n_eik * 10, 3),
            minval=-cfg.scene_bounding_sphere, maxval=cfg.scene_bounding_sphere)
        eik_near = jax.lax.stop_gradient(
            cam_loc + z_eik * ray_dirs)                  # [R,3]
        eik_pts = jnp.concatenate([eik_uniform, eik_near], axis=0)
        neighbours = eik_pts + (jax.random.uniform(k_eik_nei, eik_pts.shape) - 0.5) * 0.01
        all_pts = jnp.concatenate([eik_pts, neighbours], axis=0)
        grad_theta = jax.checkpoint(
            lambda p, x: fields.combine_gradient(cfg.combine, p, x, stage),
            policy=_policy)(params["implicit"], all_pts)
        half = all_pts.shape[0] // 2
        out["grad_theta"] = grad_theta[:half]
        out["grad_theta_nei"] = grad_theta[half:]

    # ---- normal map in camera coords (network.py:339-345)
    normals = gradients / (safe_norm(gradients, axis=-1, keepdims=True) + 1e-6)
    normals = normals.reshape(R, S, 3)
    normal_map = (weights[..., None] * normals).sum(axis=1)              # [R,3]
    rot = batch.poses[batch.kf_slot][:, :3, :3]
    normal_map = jnp.einsum("rij,ri->rj", rot, normal_map)
    out["normal_map"] = normal_map

    # ---- SDF at the camera origins (collapse guard input, beyond-reference)
    # Round-5 forensics: at scale the objective has a degenerate attractor —
    # the SDF drifts all-negative ("fog"), transmittance dies at the first
    # sample, and the idr color net (fed position+viewdir) fits the training
    # views as a LIGHT FIELD at the camera (anneal@300 checkpoint: interp
    # PSNR 43 with rendered depth 0.002 and zero geometry). Cameras are in
    # free space by construction, so sdf(cam) must stay positive; the hinge
    # in compute_losses (cam_freespace_w) uses this. ~S extra SDF points —
    # negligible.
    cam_pts = batch.poses[:, :3, 3]
    out["cam_sdf"] = fields.combine_sdf(cfg.combine, params["implicit"],
                                        cam_pts, stage)[:, 0]

    if is_mapping:
        out["voxels"] = new_voxels
    return out


def _bilinear_sample_images(images: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                            H: int, W: int) -> jnp.ndarray:
    """Bilinear sample with zero padding, grid_sample-equivalent.

    images: [S, H*W, C]; x,y: [S,R] pixel coords. Returns [S,R,C].
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(xi, yi):
        inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1)
        yi_c = jnp.clip(yi, 0, H - 1)
        flat = yi_c * W + xi_c                     # [S,R]
        vals = jnp.take_along_axis(images, flat[..., None], axis=1)
        if vals.dtype == jnp.uint8:
            vals = vals.astype(jnp.float32) / 255.0
        return jnp.where(inb[..., None], vals, 0.0)

    v00 = gather(x0i, y0i)
    v01 = gather(x0i + 1, y0i)
    v10 = gather(x0i, y0i + 1)
    v11 = gather(x0i + 1, y0i + 1)
    w00 = ((1 - fx) * (1 - fy))[..., None]
    w01 = (fx * (1 - fy))[..., None]
    w10 = ((1 - fx) * fy)[..., None]
    w11 = (fx * fy)[..., None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11
