"""Point-sharded renderer: shard N over the mesh, psum the grids.

No reference counterpart (the reference is single-GPU; SURVEY.md §2.3 names
this as the new framework's scale-up lever): the point axis is sharded over
the data mesh with shard_map, each device splats its point shard into a full
(replicated-shape) D^3 grid, and a single psum over ICI merges the partial
grids before blur + DRC run replicated. Because the splat is a linear
scatter, partial-grid summation is exact.

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
from dpcx.render.drc import drc_projection, sum_projection
from dpcx.render.gauss import kernel_radius, smoothen_voxels3d
from dpcx.render.transform import pc_perspective_transform
from dpcx.render.voxelize import pointcloud2voxels_matmul


def pointcloud_project_point_sharded(
    cfg: Config,
    mesh: Mesh,
    points: jax.Array,     # [B, N, 3], N divisible by mesh axis size
    quat: jax.Array,       # [B, 4]
    sigma_rel: jax.Array,
    axis: str = "data",
) -> jax.Array:
    """Silhouettes [B, D, D] with the point axis sharded over ``axis``."""
    D = cfg.vox_size
    radius = kernel_radius(
        max(cfg.pc_relative_sigma, cfg.pc_relative_sigma_end),
        D,
        cfg.gauss_kernel_truncate,
    )
    sigma_vox = jnp.asarray(sigma_rel, points.dtype) * D

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None)),
        out_specs=P(None, None, None),
    )
    def _render(pts_shard, q):
        ndc = pc_perspective_transform(
            pts_shard,
            q,
            focal_length=cfg.focal_length,
            camera_distance=cfg.camera_distance,
        )
        partial_grid = pointcloud2voxels_matmul(ndc, D)
        grid = jax.lax.psum(partial_grid, axis)  # merge shards over ICI
        grid = smoothen_voxels3d(grid, sigma_vox, radius)
        if cfg.proj_type == "drc":
            sil, _ = drc_projection(grid, logsum=cfg.drc_logsum)
        else:
            sil, _ = sum_projection(grid)
        return sil

    return _render(points, quat)
