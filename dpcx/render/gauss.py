"""Stage 3: separable 3D Gaussian smoothing of the occupancy grid.

Reference parity: dpc/util/point_cloud.py::smoothen_voxels3d and
dpc/util/gauss_kernel.py::gauss_kernel_1d / ::smoothing_kernel (SURVEY.md
§2.2 #5): three 1-D Gaussian passes whose sigma is annealed over training
(coarse -> fine).

TPU-native realization: instead of three `conv3d` calls, each 1-D pass is a
contraction of the grid with a banded Toeplitz matrix K [D, D] built from the
1-D kernel — identical to SAME-padded convolution, but expressed as a plain
matmul so XLA tiles all three passes onto the MXU and fuses them with the
surrounding pipeline. Kernel SUPPORT (the band radius) is static for jit;
kernel VALUES are traced, so sigma annealing recompiles nothing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gauss_kernel_1d(
    sigma_vox: jax.Array, radius: int, dtype=jnp.float32
) -> jax.Array:
    """Normalized 1-D Gaussian taps [-radius..radius] -> [2*radius+1].

    sigma is in voxel units and may be a traced value; radius is static.
    Ref: dpc/util/gauss_kernel.py::gauss_kernel_1d.
    """
    x = jnp.arange(-radius, radius + 1, dtype=dtype)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma_vox, 1e-6)) ** 2)
    return k / jnp.sum(k)


def blur_matrix(sigma_vox: jax.Array, vox_size: int, radius: int) -> jax.Array:
    """Toeplitz band matrix K [D, D]: K[i, j] = kernel(i - j).

    ``grid @ K`` == SAME zero-padded 1-D convolution along that axis.
    """
    k = gauss_kernel_1d(sigma_vox, radius)
    idx = jnp.arange(vox_size)
    # offset in [-radius, radius] -> tap index; outside band -> weight 0
    off = idx[:, None] - idx[None, :] + radius  # [D, D]
    in_band = (off >= 0) & (off <= 2 * radius)
    return jnp.where(in_band, k[jnp.clip(off, 0, 2 * radius)], 0.0)


def kernel_radius(
    sigma_rel_max: float, vox_size: int, truncate: float = 2.5
) -> int:
    """Static band radius from the LARGEST sigma of the anneal schedule."""
    return max(1, min(vox_size - 1, int(sigma_rel_max * vox_size * truncate)))


def smoothen_voxels3d(
    grid: jax.Array, sigma_vox: jax.Array, radius: int
) -> jax.Array:
    """Separable 3-D Gaussian blur of grid [B, Z, Y, X] via Toeplitz matmuls.

    Ref: dpc/util/point_cloud.py::smoothen_voxels3d (3x conv3d passes).
    """
    K = blur_matrix(sigma_vox, grid.shape[-1], radius).astype(grid.dtype)
    p = jax.lax.Precision.HIGHEST
    grid = jnp.einsum("bzyx,xi->bzyi", grid, K, precision=p)
    grid = jnp.einsum("bzyx,yi->bzix", grid, K, precision=p)
    grid = jnp.einsum("bzyx,zi->biyx", grid, K, precision=p)
    return grid
