"""Fused projection driver: transform -> splat -> blur -> DRC.

Reference parity: dpc/util/point_cloud.py::pointcloud_project_fast
(SURVEY.md §2.2 #4) — composes the four renderer stages and returns the
projection plus intermediates. Also hosts the sigma anneal and point-dropout
schedules (reference: global-step-driven schedules in model/train code).

The ``renderer`` switch selects the pure-XLA oracle path ("xla") or the fused
Pallas TPU kernel ("pallas") behind the identical interface; both produce
silhouettes that agree to fp32 tolerance (tests/test_pallas_kernel.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from dpcx.config import Config
from dpcx.render.drc import drc_projection, sum_projection
from dpcx.render.gauss import kernel_radius, smoothen_voxels3d
from dpcx.render.transform import (
    pc_perspective_transform,
    pc_perspective_transform_t,
)
from dpcx.render.voxelize import (
    pointcloud2voxels_matmul,
    pointcloud2voxels_scatter,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderOut:
    """Renderer outputs: projection [B, Y, X], optional depth, voxel grid."""

    silhouette: jax.Array
    depth: jax.Array | None = None
    voxels: jax.Array | None = None
    rgb: jax.Array | None = None


def sigma_schedule(cfg: Config, step: jax.Array) -> jax.Array:
    """Exponential coarse->fine anneal of the relative Gaussian sigma.

    Ref: sigma annealing by global step in dpc train/model code (SURVEY.md
    §2.2 #5, #15).
    """
    frac = jnp.clip(
        step.astype(jnp.float32) / max(cfg.sigma_anneal_steps, 1), 0.0, 1.0
    )
    log_s0 = jnp.log(cfg.pc_relative_sigma)
    log_s1 = jnp.log(cfg.pc_relative_sigma_end)
    return jnp.exp(log_s0 + (log_s1 - log_s0) * frac)


def keep_prob_schedule(cfg: Config, step: jax.Array) -> jax.Array:
    """Linear ramp of point-dropout keep-prob from initial value to 1.0."""
    frac = jnp.clip(
        step.astype(jnp.float32) / max(cfg.pc_point_dropout_steps, 1),
        0.0,
        1.0,
    )
    return cfg.pc_point_dropout + (1.0 - cfg.pc_point_dropout) * frac


def pointcloud_project_fn(
    cfg: Config,
    points: jax.Array,
    quat: jax.Array,
    sigma_rel: jax.Array,
    point_weights: jax.Array | None = None,
    rgb: jax.Array | None = None,
    translation: jax.Array | None = None,
    return_voxels: bool = False,
    splat: str = "scatter",
) -> RenderOut:
    """Project world-frame clouds [B, N, 3] through cameras [B, 4].

    ``splat`` chooses the XLA splat formulation ("scatter" oracle vs
    "matmul" MXU path); the Pallas fused kernel lives in pallas_kernel.py and
    is dispatched by the model layer when cfg.renderer == "pallas".
    """
    dtype = jnp.dtype(cfg.renderer_dtype)
    points = points.astype(dtype)
    quat = quat.astype(dtype)
    D = cfg.vox_size
    trans = None if translation is None else translation.astype(dtype)

    # radius must cover the widest sigma the anneal will ever use (an
    # upward anneal would otherwise truncate the kernel for most of
    # training)
    radius = kernel_radius(
        max(cfg.pc_relative_sigma, cfg.pc_relative_sigma_end),
        D,
        cfg.gauss_kernel_truncate,
    )
    sigma_vox = jnp.asarray(sigma_rel, dtype) * D

    if (
        cfg.renderer == "pallas"
        and rgb is None
        and cfg.proj_type == "drc"
        # the fused kernel has no log-space DRC variant; honor the flag
        # by falling through to the XLA path
        and not cfg.drc_logsum
        and not return_voxels
        # blur/DRC loops process z in groups of 8 slabs; non-multiples
        # would silently drop the top D % 8 slabs
        and D % 8 == 0
        # D <= 64 keeps the whole grid in VMEM; D > 64 uses the depth-
        # blocked kernel (pallas_blocked.py) whose VMEM footprint is one
        # z-block + blur halo. 128 is the largest shipped config; bigger
        # grids would need a smaller Dz selected for the VMEM budget.
        and D <= 128
    ):
        # fused TPU kernel path (stage 1 channel-major, 2-4 in one
        # pallas_call): the transform computes in [B, 3, N] rows so N
        # rides the lanes straight into the sort (the [B, N, 3] form costs
        # a lane-padded elementwise chain + stride-3 field slices)
        from dpcx.render.pallas_kernel import pallas_project_t

        ndc_t = pc_perspective_transform_t(
            points,
            quat,
            focal_length=cfg.focal_length,
            camera_distance=cfg.camera_distance,
            translation=trans,
        )
        sil, depth = pallas_project_t(
            ndc_t,
            D,
            sigma_vox,
            radius,
            point_weights=point_weights,
            with_depth=cfg.proj_depth,
            acc_dtype=cfg.pallas_acc_dtype,
            # remat = recompute render residuals in the backward: at
            # D > 64 that means the recompute two-pass backward instead
            # of stashing the 8 MB/sample blurred volume in HBM
            save_grid=not cfg.remat,
        )
        return RenderOut(silhouette=sil, depth=depth)

    ndc = pc_perspective_transform(
        points,
        quat,
        focal_length=cfg.focal_length,
        camera_distance=cfg.camera_distance,
        translation=trans,
    )

    rgb_grid = None
    if rgb is not None:
        # rgb rides the MXU matmul splat on TPU (the scatter path runs at
        # ~13 Mpts/s there) and the scatter oracle elsewhere
        if splat == "matmul" or cfg.renderer == "pallas":
            grid, rgb_grid = pointcloud2voxels_matmul(
                ndc, D, point_weights=point_weights, rgb=rgb.astype(dtype)
            )
        else:
            grid, rgb_grid = pointcloud2voxels_scatter(
                ndc, D, point_weights=point_weights, rgb=rgb.astype(dtype)
            )
    elif splat == "matmul" or cfg.renderer == "pallas":
        # (pallas configs that fell through, e.g. 128^3, keep the MXU
        # formulation rather than the scatter oracle)
        grid = pointcloud2voxels_matmul(ndc, D, point_weights=point_weights)
    else:
        grid = pointcloud2voxels_scatter(ndc, D, point_weights=point_weights)

    grid = smoothen_voxels3d(grid, sigma_vox, radius)

    if cfg.proj_type == "drc":
        sil, depth = drc_projection(
            grid, logsum=cfg.drc_logsum, with_depth=cfg.proj_depth
        )
    else:
        sil, depth = sum_projection(grid)

    rgb_proj = None
    if rgb_grid is not None:
        # Expected color along each ray, weighted by stop probabilities.
        from dpcx.render.drc import drc_event_probabilities

        p_stop, _ = drc_event_probabilities(grid, logsum=cfg.drc_logsum)
        rgb_proj = jnp.einsum("bzyx,bzyxc->byxc", p_stop, rgb_grid)

    return RenderOut(
        silhouette=sil,
        depth=depth,
        voxels=grid if return_voxels else None,
        rgb=rgb_proj,
    )


# Jitted convenience wrapper for DIRECT callers (tests, scripts, eval).
# Code that already runs inside a jit (losses, bench scan bodies) must call
# pointcloud_project_fn instead: on this TPU runtime a NESTED jit around a
# pallas_call executes as a separate dispatch costing ~0.9 ms per call
# (see NOTES.md "nested-jit pallas dispatch").
pointcloud_project = jax.jit(
    pointcloud_project_fn,
    static_argnames=("cfg", "return_voxels", "splat"),
)
