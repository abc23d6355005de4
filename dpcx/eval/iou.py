"""Volumetric 3D IoU between predicted and GT point clouds.

The voxel-overlap metric the DRC-family baselines report (the reference
paper, arXiv:1810.09381, compares against DRC at matched grid
resolutions; its own tables use Chamfer — dpcx reports both).

Occupancy is NEAREST-CELL binary (a cell is occupied iff at least one
point rounds into it) rather than thresholded trilinear mass: a mass
threshold couples the metric to point density (a 256-point prediction
cannot reach 0.5 mass/cell at 32^3 while a 16k-point GT cloud saturates
it). Grid mapping matches the renderer's
(dpcx/render/voxelize.py::ndc_to_grid, reference
dpc/util/point_cloud.py::pointcloud2voxels3d_fast).

Resolution must be matched to the point budget — surface SAMPLING floors
the score of even a perfect prediction (measured, synthetic chair,
independent samplings of the identical surface): at D=16, 2048-vs-2048
points = 0.92 and 2048-vs-16k = 0.96 (informative), while at D=32 the
same pairs score 0.48/0.60 (sampling-dominated); 256-point toy clouds
floor at ~0.24 even at D=16. evaluate() therefore reports D=16
(`iou_3d_16`), which is meaningful at the production pc_num_points of
2048-16384.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from dpcx.render.voxelize import ndc_to_grid


def _occupancy(points: jax.Array, vox_size: int) -> jax.Array:
    """[B, N, 3] NDC points -> [B, D, D, D] bool nearest-cell occupancy.
    Out-of-grid points are dropped (reference OOB semantics)."""
    B, N, _ = points.shape
    D = vox_size
    g = ndc_to_grid(points, D)  # continuous (z, y, x) cell coords
    idx = jnp.round(g).astype(jnp.int32)
    valid = jnp.all((idx >= 0) & (idx < D), axis=-1)
    idx = jnp.clip(idx, 0, D - 1)
    batch_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, N))
    occ = jnp.zeros((B, D, D, D), jnp.bool_)
    return occ.at[
        batch_idx, idx[..., 0], idx[..., 1], idx[..., 2]
    ].max(valid)


@partial(jax.jit, static_argnames=("vox_size",))
def voxel_iou(
    pred: jax.Array,          # [B, N, 3] in the +-0.5 NDC box
    gt: jax.Array,            # [B, M, 3]
    vox_size: int = 32,
) -> jax.Array:
    """[B] IoU of nearest-cell occupancy grids at vox_size^3."""
    occ_p = _occupancy(pred, vox_size)
    occ_g = _occupancy(gt, vox_size)
    inter = jnp.sum(occ_p & occ_g, axis=(1, 2, 3)).astype(jnp.float32)
    union = jnp.sum(occ_p | occ_g, axis=(1, 2, 3)).astype(jnp.float32)
    return inter / jnp.maximum(union, 1.0)
