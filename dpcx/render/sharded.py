"""Point-sharded renderer: shard N over the mesh, psum the grids.

No reference counterpart (the reference is single-GPU; SURVEY.md §2.3 names
this as the new framework's scale-up lever): the point axis is sharded over
the data mesh with shard_map, each device splats its point shard into a full
(replicated-shape) D^3 grid, and a single psum over ICI merges the partial
grids before blur + DRC run replicated. Because the splat is a linear
scatter, partial-grid summation is exact; for RGB the per-shard normalized
color grid is un-normalized (the density clamp inverts exactly), the
numerator and density are psum'd separately, and the merged grid is
re-normalized — bit-identical to splatting the full cloud on one device.

Differentiable end to end: psum transposes to an identity broadcast under
shard_map, so ``jax.grad`` through the sharded render equals the unsharded
gradient (tested on the 8-device CPU mesh, tests/test_sharded_render.py).

Use case: very large clouds (N >> 100k) or freeing HBM on small-batch
configs; for ordinary training batches, plain data parallelism
(dpcx.parallel.mesh) is the right axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from dpcx.config import Config
from dpcx.render.drc import (
    drc_event_probabilities,
    drc_projection,
    sum_projection,
)
from dpcx.render.gauss import kernel_radius, smoothen_voxels3d
from dpcx.render.project import RenderOut
from dpcx.render.transform import pc_perspective_transform
from dpcx.render.voxelize import pointcloud2voxels_matmul


def pointcloud_project_point_sharded(
    cfg: Config,
    mesh: Mesh,
    points: jax.Array,     # [B, N, 3], N divisible by mesh axis size
    quat: jax.Array,       # [B, 4]
    sigma_rel: jax.Array,
    point_weights: jax.Array | None = None,  # [B, N]
    rgb: jax.Array | None = None,            # [B, N, 3]
    axis: str = "data",
) -> RenderOut:
    """Full render (silhouette / optional depth / optional rgb) with the
    point axis sharded over ``axis``. Differentiable through the psum."""
    D = cfg.vox_size
    radius = kernel_radius(
        max(cfg.pc_relative_sigma, cfg.pc_relative_sigma_end),
        D,
        cfg.gauss_kernel_truncate,
    )
    sigma_vox = jnp.asarray(sigma_rel, points.dtype) * D
    with_rgb = rgb is not None
    with_pw = point_weights is not None

    pw_spec = P(None, axis) if with_pw else P()
    rgb_spec = P(None, axis, None) if with_rgb else P()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None), pw_spec, rgb_spec),
        out_specs=(
            P(None, None, None),
            P(None, None, None),
            P(None, None, None, None) if with_rgb else P(),
        ),
        check_vma=False,
    )
    def _render(pts_shard, q, pw_shard, rgb_shard):
        ndc = pc_perspective_transform(
            pts_shard,
            q,
            focal_length=cfg.focal_length,
            camera_distance=cfg.camera_distance,
        )
        pw = pw_shard if with_pw else None
        if with_rgb:
            partial_grid, rgb_norm = pointcloud2voxels_matmul(
                ndc, D, point_weights=pw, rgb=rgb_shard
            )
            # un-normalize: the voxelizer divides by max(density, 1e-6),
            # so multiplying the same clamp back recovers the raw color
            # numerator EXACTLY; numerator and density sum across shards
            col = rgb_norm * jnp.maximum(partial_grid[..., None], 1e-6)
            col = jax.lax.psum(col, axis)
        else:
            partial_grid = pointcloud2voxels_matmul(
                ndc, D, point_weights=pw
            )
        grid = jax.lax.psum(partial_grid, axis)  # merge shards over ICI
        grid = smoothen_voxels3d(grid, sigma_vox, radius)
        if cfg.proj_type == "drc":
            sil, depth = drc_projection(
                grid, logsum=cfg.drc_logsum, with_depth=cfg.proj_depth
            )
        else:
            sil, depth = sum_projection(grid)
        if not cfg.proj_depth:
            depth = jnp.zeros_like(sil)
        if with_rgb:
            rgb_grid = col / jnp.maximum(
                jax.lax.psum(partial_grid, axis)[..., None], 1e-6
            )
            p_stop, _ = drc_event_probabilities(
                grid, logsum=cfg.drc_logsum
            )
            rgb_proj = jnp.einsum("bzyx,bzyxc->byxc", p_stop, rgb_grid)
        else:
            rgb_proj = jnp.zeros(())
        return sil, depth, rgb_proj

    z = jnp.zeros(())
    sil, depth, rgb_proj = _render(
        points,
        quat,
        point_weights if with_pw else z,
        rgb if with_rgb else z,
    )
    return RenderOut(
        silhouette=sil,
        depth=depth if cfg.proj_depth else None,
        rgb=rgb_proj if with_rgb else None,
    )


def gt_pose_projection_loss_sharded(
    cfg: Config,
    mesh: Mesh,
    points: jax.Array,      # [M, N, 3] (M = batch x views, pre-tiled)
    quats: jax.Array,       # [M, 4]
    masks: jax.Array,       # [M, D, D]
    sigma_rel: jax.Array,
    rgb: jax.Array | None = None,
    images_tgt: jax.Array | None = None,  # [M, D, D, 3]
    point_weights: jax.Array | None = None,  # [M, N] (dropout / density)
) -> jax.Array:
    """GT-pose re-projection loss over the point-sharded renderer: the
    loss path for clouds too large to splat on one device (SURVEY.md
    §2.3). Same math as the GT branch of models/losses.py::compute_loss
    (squared-L2 silhouette + masked rgb), differentiable wrt points/rgb.
    ``point_weights`` carries dropout weights — or, for very dense
    clouds, a density normalization so the DRC occupancy stays in its
    differentiable range instead of saturating at 1."""
    out = pointcloud_project_point_sharded(
        cfg, mesh, points, quats, sigma_rel,
        point_weights=point_weights, rgb=rgb,
    )
    loss = jnp.mean((out.silhouette - masks) ** 2)
    if rgb is not None and images_tgt is not None:
        rgb_cmp = out.rgb + (
            1.0 - out.silhouette[..., None]
        ) * cfg.rgb_background
        w = masks[..., None]
        loss = loss + cfg.rgb_weight * (
            jnp.sum(w * (rgb_cmp - images_tgt) ** 2)
            / jnp.maximum(jnp.sum(w) * 3.0, 1.0)
        )
    return loss
