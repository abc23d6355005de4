"""Stage 2: trilinear scatter-splat of N points into a D^3 occupancy grid.

Reference parity: dpc/util/point_cloud.py::pointcloud2voxels3d_fast
(SURVEY.md §2.2 #1): floor indices, 8-corner trilinear weights, scatter-add,
out-of-grid clipping, optional per-point RGB channels; and ::pc_point_dropout
(#7), realized here as per-point weights so shapes stay static under jit.

Two mathematically identical implementations:

- ``pointcloud2voxels_scatter``: literal translation of the semantics —
  ``grid.at[b, z, y, x].add(w)`` with ``mode="drop"`` for out-of-grid corners
  (matches TF ``scatter_nd`` with clipped+zeroed OOB updates). This is the
  correctness oracle; its gradient is the trilinear gather XLA derives
  automatically.

- ``pointcloud2voxels_matmul``: the TPU-native formulation. The trilinear
  "hat" weight of point n at cell i along one axis is
  ``w(i) = relu(1 - |g_n - i|)`` — so the per-axis weight matrices
  ``Wz, Wy, Wx [N, D]`` are dense rank-structured arrays built with a single
  broadcasted iota, and the grid is the contraction
  ``grid[z, y, x] = sum_n Wz[n,z] Wy[n,y] Wx[n,x]``
  evaluated per-z-slab as ``grid[z] = (Wz[:, z] * Wy)^T @ Wx`` — one [N,D]x
  [N,D] matmul per slab, all MXU work, no scatters at all. OOB clipping falls
  out of the hat function (identical to drop semantics — proven in
  tests/test_voxelize.py). This is the formulation the fused Pallas kernel
  uses (SURVEY.md §7 hard-part "Scatter backward on TPU": TPU has no atomic
  adds, so we don't scatter).

Grid convention: ``grid[b, z, y, x]``, z = depth (DRC reduces over axis 1).
NDC p in [-0.5, 0.5] maps to grid units g = (p + 0.5) * D - 0.5; cell i
covers centers at g = i, i.e. world position p_i = (i + 0.5)/D - 0.5.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ndc_to_grid(points_ndc: jax.Array, vox_size: int) -> jax.Array:
    """NDC [-0.5, 0.5] -> grid units, (x, y, z) -> (z, y, x) order."""
    g = (points_ndc + 0.5) * vox_size - 0.5
    return g[..., ::-1]  # (z, y, x)


def pc_point_dropout_weights(
    key: jax.Array, batch: int, num_points: int, keep_prob: jax.Array
) -> jax.Array:
    """Per-point Bernoulli keep weights, rescaled by 1/keep_prob.

    Ref: dpc/util/point_cloud.py::pc_point_dropout. Multiplying splat weights
    (instead of gathering a subset) keeps shapes static under jit.
    """
    keep = jax.random.bernoulli(key, keep_prob, (batch, num_points))
    return keep.astype(jnp.float32) / jnp.maximum(keep_prob, 1e-6)


def pointcloud2voxels_scatter(
    points_ndc: jax.Array,
    vox_size: int,
    point_weights: jax.Array | None = None,
    rgb: jax.Array | None = None,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Scatter-add splat. points_ndc [B, N, 3] -> grid [B, D, D, D].

    With ``rgb`` [B, N, 3], also returns rgb_grid [B, D, D, D, 3] holding
    weight-normalized colors (ref: pointcloud2voxels3d_fast's rgb path).
    """
    B, N, _ = points_ndc.shape
    D = vox_size
    g = ndc_to_grid(points_ndc, D)  # [B, N, 3] in (z, y, x)
    i0 = jnp.floor(g)
    frac = g - i0
    i0 = i0.astype(jnp.int32)

    grid = jnp.zeros((B, D, D, D), dtype=points_ndc.dtype)
    rgb_grid = (
        jnp.zeros((B, D, D, D, 3), dtype=points_ndc.dtype)
        if rgb is not None
        else None
    )
    batch_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, N))

    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                wz = frac[..., 0] if dz else 1.0 - frac[..., 0]
                wy = frac[..., 1] if dy else 1.0 - frac[..., 1]
                wx = frac[..., 2] if dx else 1.0 - frac[..., 2]
                w = wz * wy * wx
                if point_weights is not None:
                    w = w * point_weights
                iz, iy, ix = (
                    i0[..., 0] + dz,
                    i0[..., 1] + dy,
                    i0[..., 2] + dx,
                )
                # Out-of-grid corners get zero weight (the reference clips
                # indices and zeroes OOB updates; JAX negative indices WRAP,
                # so masking is mandatory, not just mode="drop").
                valid = (
                    (iz >= 0) & (iz < D)
                    & (iy >= 0) & (iy < D)
                    & (ix >= 0) & (ix < D)
                )
                w = jnp.where(valid, w, 0.0)
                iz = jnp.clip(iz, 0, D - 1)
                iy = jnp.clip(iy, 0, D - 1)
                ix = jnp.clip(ix, 0, D - 1)
                grid = grid.at[batch_idx, iz, iy, ix].add(w)
                if rgb_grid is not None:
                    rgb_grid = rgb_grid.at[batch_idx, iz, iy, ix].add(
                        w[..., None] * rgb
                    )
    if rgb_grid is not None:
        rgb_grid = rgb_grid / jnp.maximum(grid[..., None], 1e-6)
        return grid, rgb_grid
    return grid


def pointcloud2voxels_rbf(
    points_ndc: jax.Array,
    vox_size: int,
    sigma_vox: jax.Array,
    chunk: int = 512,
) -> jax.Array:
    """Slow/alternative voxelizer: per-point Gaussian RBF evaluated densely.

    Ref: dpc/util/point_cloud.py::pointcloud2voxels3d (the reference keeps
    this non-"fast" path as a check; SURVEY.md §2.2 #2). Equivalent to
    splat+blur in one step for isotropic Gaussians (up to the trilinear
    approximation), so it doubles as an independent oracle in tests.
    Separable: per-axis Gaussian weight matrices contracted like the hat
    splat, chunked over points to bound memory.
    """
    D = vox_size
    g = ndc_to_grid(points_ndc, D)  # [B, N, 3] (z, y, x)
    cells = jnp.arange(D, dtype=points_ndc.dtype)

    def gweights(col):
        d = col[..., None] - cells
        return jnp.exp(-0.5 * (d / jnp.maximum(sigma_vox, 1e-6)) ** 2) / (
            jnp.sqrt(2.0 * jnp.pi) * jnp.maximum(sigma_vox, 1e-6)
        )

    wz = gweights(g[..., 0])
    wy = gweights(g[..., 1])
    wx = gweights(g[..., 2])

    def slab(z_idx):
        wzy = jax.lax.dynamic_index_in_dim(
            wz, z_idx, axis=2, keepdims=True
        ) * wy
        return jnp.einsum(
            "bny,bnx->byx", wzy, wx, precision=jax.lax.Precision.HIGHEST
        )

    grid = jax.lax.map(slab, jnp.arange(D))
    return jnp.moveaxis(grid, 0, 1)


def _hat_weights(g_axis: jax.Array, vox_size: int) -> jax.Array:
    """[..., N] grid coords -> [..., N, D] trilinear hat weights."""
    cells = jax.lax.broadcasted_iota(
        g_axis.dtype, (1, vox_size), 1
    )  # [1, D]
    return jnp.maximum(0.0, 1.0 - jnp.abs(g_axis[..., None] - cells))


def pointcloud2voxels_matmul(
    points_ndc: jax.Array,
    vox_size: int,
    point_weights: jax.Array | None = None,
    rgb: jax.Array | None = None,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """MXU splat: per-z-slab rank-reduction matmuls, no scatter.

    grid[b, z] = (Wz[b, :, z] * Wy[b])^T @ Wx[b]    for each z slab.

    FLOPs ~= 2 * D * N * D^2 per sample — dense work, but it is all MXU
    matmul at near-peak utilization, which beats scatter on TPU.

    With ``rgb`` [B, N, 3], also returns the weight-normalized color grid
    [B, D, D, D, 3] (same semantics as pointcloud2voxels_scatter's rgb
    path, but 3 extra per-slab matmuls instead of scatter-adds — the TPU
    path for RGB training).
    """
    D = vox_size
    g = ndc_to_grid(points_ndc, D)  # [B, N, 3] (z, y, x)
    wz = _hat_weights(g[..., 0], D)  # [B, N, D]
    wy = _hat_weights(g[..., 1], D)
    wx = _hat_weights(g[..., 2], D)
    if point_weights is not None:
        wz = wz * point_weights[..., None]

    # Sequential over z-slabs so peak memory stays at O(B*N*D), not
    # O(B*N*D^2): each step is one batched [N,D]^T @ [N,D] MXU matmul with
    # the z-hat folded into the left operand.
    def slab(z_idx):
        wzy = jax.lax.dynamic_index_in_dim(
            wz, z_idx, axis=2, keepdims=True
        ) * wy  # [B, N, D]
        occ = jnp.einsum(
            "bny,bnx->byx", wzy, wx, precision=jax.lax.Precision.HIGHEST
        )
        if rgb is None:
            return occ
        col = jnp.einsum(
            "bnyc,bnx->byxc",
            wzy[..., None] * rgb[:, :, None, :],
            wx,
            precision=jax.lax.Precision.HIGHEST,
        )
        return occ, col

    if rgb is None:
        grid = jax.lax.map(slab, jnp.arange(D))  # [Dz, B, Dy, Dx]
        return jnp.moveaxis(grid, 0, 1)
    grid, col = jax.lax.map(slab, jnp.arange(D))
    grid = jnp.moveaxis(grid, 0, 1)
    rgb_grid = jnp.moveaxis(col, 0, 1) / jnp.maximum(
        grid[..., None], 1e-6
    )
    return grid, rgb_grid
