"""Visual observability: rendered-vs-GT panels + mesh dumps.

Reference: code/utils/plots.py — per-plot-step it writes
  vis/rendering_<frame>_<idx>_<iter>.png   rendered RGB | GT RGB
  vis/normal_<frame>_<idx>_<iter>.png      rendered normals | GT normals
  vis/depth_<frame>_<idx>_<iter>.png       rendered depth | ssi-aligned GT
  vis/merge_<frame>_<idx>_<iter>.png       all panels stacked
  vis/surface_<frame:04d>.ply              colored marching-cubes mesh
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def colorize_depth(depth: np.ndarray, lo=None, hi=None) -> np.ndarray:
    lo = np.percentile(depth, 2) if lo is None else lo
    hi = np.percentile(depth, 98) if hi is None else hi
    d = np.clip((depth - lo) / max(hi - lo, 1e-8), 0, 1)
    try:
        import matplotlib.cm as cm

        return cm.get_cmap("viridis")(d)[..., :3]
    except Exception:
        return np.stack([d, d, d], -1)


def save_panels(plots_dir: str, frame_idx: int, inner_iter: int,
                rendered: Dict[str, np.ndarray],
                gt: Dict[str, np.ndarray], img_idx: int = 0) -> None:
    import imageio.v2 as imageio

    def u8(x):
        return np.clip(np.asarray(x) * 255.0 + 0.5, 0, 255).astype(np.uint8)

    tag = f"{frame_idx}_{img_idx}_{inner_iter}"
    rgb_panel = np.concatenate([rendered["rgb"], gt["rgb"]], axis=1)
    imageio.imwrite(os.path.join(plots_dir, f"rendering_{tag}.png"),
                    u8(rgb_panel))
    nrm_panel = np.concatenate([(rendered["normal"] + 1) / 2,
                                (gt["normal"] + 1) / 2], axis=1)
    imageio.imwrite(os.path.join(plots_dir, f"normal_{tag}.png"), u8(nrm_panel))
    dep_panel = np.concatenate(
        [colorize_depth(rendered["depth"]), colorize_depth(gt["depth"])], axis=1)
    imageio.imwrite(os.path.join(plots_dir, f"depth_{tag}.png"), u8(dep_panel))
    merge = np.concatenate([rgb_panel, nrm_panel, dep_panel], axis=0)
    imageio.imwrite(os.path.join(plots_dir, f"merge_{tag}.png"), u8(merge))


def save_mesh(runner, frame_idx: int, resolution: Optional[int] = None,
              suffix: str = "") -> Optional[str]:
    """Extract + export the colored SDF mesh (plots.py:102-155 analogue)."""
    import jax
    import jax.numpy as jnp

    from ..models import fields
    from ..ops.marching_cubes import extract_mesh
    from .ply import write_ply

    c = runner.conf
    resolution = resolution or c.get_int("plot.resolution", 512)
    gb = c.get_list("plot.grid_boundary", [-1.0, 1.0])
    cfg = runner.scene_cfg
    params = runner.params

    sdf_dev = jax.jit(lambda x: fields.combine_sdf(
        cfg.combine, params["implicit"], x, "fine")[:, 0])

    mesh = extract_mesh(lambda x: sdf_dev(jnp.asarray(x)),
                        resolution=resolution, grid_boundary=tuple(gb))
    if mesh is None:
        runner.log("unable to get a surface, NO MESH!")
        return None
    verts, faces, normals = mesh

    # vertex colors from the rendering network, viewdir = -normal
    # (plots.py:140-151)
    colors = np.zeros((verts.shape[0], 3), np.float32)
    color_fn = jax.jit(lambda pts, dirs: _vertex_colors(cfg, params, pts, dirs))
    chunk = 65536
    for s in range(0, verts.shape[0], chunk):
        e = min(s + chunk, verts.shape[0])
        colors[s:e] = np.asarray(
            color_fn(jnp.asarray(verts[s:e]), jnp.asarray(-normals[s:e])))

    path = os.path.join(runner.plots_dir, f"surface_{frame_idx:04d}{suffix}.ply")
    write_ply(path, verts, faces, normals=normals, colors=colors)
    return path


def _vertex_colors(cfg, params, pts, dirs):
    import jax.numpy as jnp

    from ..models import fields

    sdf, feat, grad = fields.combine_get_outputs(
        cfg.combine, params["implicit"], pts, "fine")
    return fields.rendering_forward(
        cfg.render, params["render"], pts, grad, dirs, feat,
        image_indices=None if not cfg.render.per_image_code
        else jnp.zeros((pts.shape[0],), "int32"),
        color_stage="highfreq")


def vis_hook(runner, frame_idx: int, inner_iter: int = 0,
             mesh_resolution: Optional[int] = None) -> None:
    """Default vis callback for SLAMRunner.run: render panels + mesh."""
    out = runner.render_full_image(frame_idx)
    data = runner.dataset.frame(frame_idx)
    H, W = runner.H, runner.W
    gt = {
        "rgb": data["rgb"].reshape(H, W, 3),
        "normal": data["normal"].reshape(H, W, 3),
        "depth": data["depth"].reshape(H, W),
    }
    save_panels(runner.plots_dir, frame_idx, inner_iter, out, gt)
    save_mesh(runner, frame_idx, resolution=mesh_resolution)
