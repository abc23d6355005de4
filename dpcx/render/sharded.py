"""Point- and grid-sharded renderers over the device mesh (SURVEY §2.3).

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
        grid_raw = jax.lax.psum(partial_grid, axis)  # merge over ICI
        grid = smoothen_voxels3d(grid_raw, sigma_vox, radius)
        if cfg.proj_type == "drc":
            sil, depth = drc_projection(
                grid, logsum=cfg.drc_logsum, with_depth=cfg.proj_depth
            )
        else:
            sil, depth = sum_projection(grid)
        if depth is None:  # sum mode, or drc with proj_depth off
            depth = jnp.zeros_like(sil)
        if with_rgb:
            # reuse the already-reduced raw grid — no second psum
            rgb_grid = col / jnp.maximum(grid_raw[..., None], 1e-6)
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


def pointcloud_project_grid_sharded(
    cfg: Config,
    mesh: Mesh,
    points: jax.Array,     # [B, N, 3]
    quat: jax.Array,       # [B, 4]
    sigma_rel: jax.Array,
    point_weights: jax.Array | None = None,
    rgb: jax.Array | None = None,            # [B, N, 3]
    axis: str = "data",
) -> RenderOut:
    """GRID-sharded renderer: each device owns a z-BLOCK of the D^3 grid
    (SURVEY.md §2.3's grid-sharding lever; the distributed analogue of the
    depth-blocked pallas kernel).

    Per device: splat only into the local z-block extended by a blur-halo
    of ``radius`` slabs (points are replicated; the z-hat weights select
    the block), blur the extended block (z via a local Toeplitz band, y/x
    full-width) and crop — exact, because the halo carries the neighbor
    blocks' splat mass. The DRC reduction then runs BLOCKWISE ACROSS
    DEVICES: each device computes its in-block stop probabilities and
    block transmittance T_blk = prod_z(1 - o_z); an all_gather of the
    [B, Y, X] block transmittances gives every device its exclusive
    prefix (the transmittance entering its block), and silhouette/depth
    assemble with a psum. A D^3 grid never exists on any single device —
    memory per device is D^2 * (D/ndev + 2*radius).

    ``rgb`` [B, N, 3] adds per-point color: the block's raw (pre-blur)
    color numerator and density normalize locally — exact, since the
    unsharded path also normalizes by the RAW density — and the expected
    color composes blockwise through p_stop * t_in, psum'd. Both drc
    modes (prod and logsum) compose exactly: the block transmittance is
    the same quantity either way.
    """
    D = cfg.vox_size
    ndev = mesh.shape[axis]
    assert D % ndev == 0, (D, ndev)
    Zl = D // ndev
    radius = kernel_radius(
        max(cfg.pc_relative_sigma, cfg.pc_relative_sigma_end),
        D,
        cfg.gauss_kernel_truncate,
    )
    assert radius <= Zl, (
        f"blur radius {radius} exceeds z-block {Zl}; use fewer devices "
        "or a smaller sigma"
    )
    R = radius  # halo slabs carried on each side of the block
    sigma_vox = jnp.asarray(sigma_rel, points.dtype) * D
    from dpcx.render.gauss import blur_matrix
    from dpcx.render.voxelize import _hat_weights, ndc_to_grid

    pw_spec = P(None, None) if point_weights is not None else P()
    with_pw = point_weights is not None
    with_rgb = rgb is not None
    rgb_spec = P(None, None, None) if with_rgb else P()

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(None, None, None), P(None, None), pw_spec, rgb_spec,
        ),
        out_specs=(
            P(None, None, None),
            P(None, None, None),
            P(None, None, None, None) if with_rgb else P(),
        ),
        check_vma=False,
    )
    def _render(pts, q, pw, rgb_pts):
        di = jax.lax.axis_index(axis)
        z0 = di * Zl
        ndc = pc_perspective_transform(
            pts,
            q,
            focal_length=cfg.focal_length,
            camera_distance=cfg.camera_distance,
        )
        g = ndc_to_grid(ndc, D)  # [B, N, 3] (z, y, x)
        wz = _hat_weights(g[..., 0], D)  # [B, N, D]
        wy = _hat_weights(g[..., 1], D)
        wx = _hat_weights(g[..., 2], D)
        if with_pw:
            wz = wz * pw[..., None]
        # z-hat columns for the local block + halo (pad so boundary
        # blocks slice zeros — same as the grid edge's zero padding)
        wz_pad = jnp.pad(wz, ((0, 0), (0, 0), (R, R)))
        wz_loc = jax.lax.dynamic_slice_in_dim(
            wz_pad, z0, Zl + 2 * R, axis=2
        )  # [B, N, Zl + 2R]

        # local splat: one batched MXU matmul per extended slab
        def slab(s):
            wzy = wz_loc[:, :, s][..., None] * wy  # [B, N, D]
            return jnp.einsum(
                "bny,bnx->byx", wzy, wx,
                precision=jax.lax.Precision.HIGHEST,
            )

        grid = jnp.moveaxis(
            jax.lax.map(slab, jnp.arange(Zl + 2 * R)), 0, 1
        )  # [B, Zl+2R, D, D]

        if with_rgb:
            # raw (pre-blur) color numerator + density for the local block
            # ONLY (color is never blurred — same semantics as the
            # unsharded path: rgb_grid = raw color / raw density, composed
            # with the BLURRED grid's stop probabilities)
            raw_loc = grid[:, R : R + Zl]

            def col_slab(s):
                wzy = wz_loc[:, :, R + s][..., None] * wy  # [B, N, D]
                return jnp.einsum(
                    "bnyc,bnx->byxc",
                    wzy[..., None] * rgb_pts[:, :, None, :],
                    wx,
                    precision=jax.lax.Precision.HIGHEST,
                )

            col_loc = jnp.moveaxis(
                jax.lax.map(col_slab, jnp.arange(Zl)), 0, 1
            )  # [B, Zl, D, D, 3]
            rgb_grid_loc = col_loc / jnp.maximum(
                raw_loc[..., None], 1e-6
            )

        # blur: y/x with the full-width Toeplitz, z with a local band —
        # halo makes the crop exact
        p_hi = jax.lax.Precision.HIGHEST
        Kf = blur_matrix(sigma_vox, D, radius).astype(grid.dtype)
        Kz = blur_matrix(sigma_vox, Zl + 2 * R, radius).astype(grid.dtype)
        grid = jnp.einsum("bzyx,xi->bzyi", grid, Kf, precision=p_hi)
        grid = jnp.einsum("bzyx,yi->bzix", grid, Kf, precision=p_hi)
        grid = jnp.einsum("bzyx,zi->biyx", grid, Kz, precision=p_hi)
        o_loc = grid[:, R : R + Zl]

        zrgb = jnp.zeros(())
        if cfg.proj_type != "drc":
            # clipped-sum projection is linear in z: psum the local sums
            sil = jnp.clip(
                jax.lax.psum(jnp.sum(o_loc, axis=1), axis), 0.0, 1.0
            )
            return sil, jnp.zeros_like(sil), zrgb

        # blockwise DRC across devices
        p_loc, t_blk = drc_event_probabilities(
            o_loc, logsum=cfg.drc_logsum
        )
        t_all = jax.lax.all_gather(t_blk, axis)  # [ndev, B, Y, X]
        before = (
            jnp.arange(ndev) < di
        ).astype(t_all.dtype)[:, None, None, None]
        t_in = jnp.prod(
            t_all * before + (1.0 - before), axis=0
        )  # exclusive prefix transmittance
        total = jnp.prod(t_all, axis=0)
        sil = 1.0 - total
        if with_rgb:
            # expected color along each ray: the block's stop
            # probabilities, attenuated by the transmittance entering the
            # block, weight the block's raw-normalized colors; blocks sum
            rgb_proj = jax.lax.psum(
                jnp.einsum(
                    "bzyx,bzyxc->byxc",
                    p_loc * t_in[:, None],
                    rgb_grid_loc,
                ),
                axis,
            )
        else:
            rgb_proj = zrgb
        if not cfg.proj_depth:
            # skip the depth einsum AND its [B, Y, X] psum collective
            return sil, jnp.zeros_like(sil), rgb_proj
        zs = (
            (z0 + jnp.arange(Zl, dtype=o_loc.dtype) + 0.5) / D - 0.5
        )
        depth = (
            jax.lax.psum(
                jnp.einsum("bzyx,z->byx", p_loc * t_in[:, None], zs),
                axis,
            )
            + 1.0 * total
        )
        return sil, depth, rgb_proj

    if with_rgb and cfg.proj_type != "drc":
        raise ValueError(
            "grid-sharded rgb requires proj_type='drc' (color composites "
            "through the blockwise DRC stop probabilities)"
        )
    sil, depth, rgb_proj = _render(
        points, quat,
        point_weights if with_pw else jnp.zeros(()),
        rgb if with_rgb else jnp.zeros(()),
    )
    return RenderOut(
        silhouette=sil,
        depth=depth if cfg.proj_depth else None,
        rgb=rgb_proj if with_rgb else None,
    )
